package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextHash
import graft.syntax._

/** Multimodal query surface: binary payload metadata (pure column ops) and
  * the mapPartitions decode path from [[graft.operators.Multimodal]]. Both
  * hash-match DuckDB oracles — the stub decoder's fake features are
  * deterministic md5 arithmetic, so even the imperative JVM path is
  * byte-verifiable against SQL. */
object MultimodalQ {

  /** Binary column metadata: length, magic bytes, byte-level probes — the
    * projection layer a media pipeline runs before any decode. Spark
    * operates on the real binary column; the oracle derives the same values
    * from the (ASCII) source text since DuckDB 1.0 lacks blob slicing. */
  def qMmMeta(spark: SparkSession, dir: String): DataFrame = {
    val payload = $"text".cast("binary")
    Tables.documents(spark, dir)
      .select(
        $"doc_id",
        length(payload).cast("long").as("n_bytes"),
        lower(hex(substring(payload, 1, 4))).as("magic_hex"),
        ascii(substring($"text", 1, 1)).cast("long").as("byte0"),
        when(substring($"text", 1, 1) === "t", "type-t")
          .when(substring($"text", 1, 1).isin("a", "b", "c"), "type-abc")
          .otherwise("other").as("sniffed"))
  }

  /** The mapPartitions (stub-)decode path — imperative JVM feature
    * extraction verified against pure SQL arithmetic. */
  def qMmFeatures(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.features(spark, dir)

  /** Every [[FrameStep]]-th frame sampled per media payload. */
  private val FrameStep = 10L
  private val ResizeBox = 224L

  /** Frame sampling + resize planning — the video-side plumbing: the
    * decoded per-payload frame count explodes into one row per sampled
    * frame (the media → frame-batch fan-out a vision pipeline feeds to the
    * encoder), each carrying its aspect-preserving fit into the model's
    * input box and a deterministic frame fingerprint. The explode is
    * narrow (no shuffle); downstream per-frame decode would run
    * mapPartitions exactly like [[graft.operators.Multimodal]]. */
  def qMmFrames(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.features(spark, dir)
      .select($"doc_id", $"width", $"height", $"n_frames")
      .withColumn("frame_idx",
        explode(sequence(lit(0L), $"n_frames" - 1L, lit(FrameStep))))
      .withColumn("rw",
        when($"width" >= $"height", lit(ResizeBox))
          .otherwise(expr(s"width * $ResizeBox div height")))
      .withColumn("rh",
        when($"width" >= $"height", expr(s"height * $ResizeBox div width"))
          .otherwise(lit(ResizeBox)))
      .withColumn("frame_fp",
        TextHash.h32(concat_ws("-", $"doc_id", $"frame_idx")))
      .select($"doc_id", $"frame_idx", $"rw", $"rh", $"frame_fp")

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_meta"     -> qMmMeta _,
    "q_mm_features" -> qMmFeatures _,
    "q_mm_frames"   -> qMmFrames _,
  )

  val oracles: Map[String, String] = Map(
    "q_mm_meta" ->
      """SELECT doc_id,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         lower(hex(encode(substring(text, 1, 4)))) AS magic_hex,
         CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS byte0,
         CASE WHEN substring(text, 1, 1) = 't' THEN 'type-t'
              WHEN substring(text, 1, 1) IN ('a','b','c') THEN 'type-abc'
              ELSE 'other' END AS sniffed
         FROM documents ORDER BY doc_id""",
    "q_mm_features" -> {
      val h = TextHash.sqlH32("text")
      val sum8 = (1 to 8).map(i => s"coalesce(ascii(substring(text, $i, 1)), 0)").mkString(" + ")
      s"""WITH f AS (
            SELECT doc_id,
              CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
              lower(hex(encode(substring(text, 1, 4)))) AS magic_hex,
              $h % 1920 + 16 AS width,
              ($h // 1920) % 1080 + 16 AS height,
              CAST($sum8 AS BIGINT) AS byte_sum8
            FROM documents)
          SELECT doc_id, n_bytes, magic_hex,
            CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
            CAST(n_bytes % 100 + 1 AS BIGINT) AS n_frames,
            CAST(width * 10000 // height AS BIGINT) AS aspect_e4,
            byte_sum8
          FROM f ORDER BY doc_id"""
    },
    "q_mm_frames" -> {
      val h = TextHash.sqlH32("text")
      s"""WITH f AS (
            SELECT doc_id,
              $h % 1920 + 16 AS width,
              ($h // 1920) % 1080 + 16 AS height,
              octet_length(encode(text)) % 100 + 1 AS n_frames
            FROM documents),
          fr AS (
            SELECT doc_id, width, height,
              unnest(generate_series(0, n_frames - 1, 10)) AS frame_idx
            FROM f)
          SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
            CAST(CASE WHEN width >= height THEN 224
                 ELSE width * 224 // height END AS BIGINT) AS rw,
            CAST(CASE WHEN width >= height THEN height * 224 // width
                 ELSE 224 END AS BIGINT) AS rh,
            ${TextHash.sqlH32("concat_ws('-', doc_id, frame_idx)")} AS frame_fp
          FROM fr ORDER BY doc_id, frame_idx"""
    },
  )
}
