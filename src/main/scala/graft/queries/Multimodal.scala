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
      .orderBy($"doc_id")
  }

  /** The mapPartitions (stub-)decode path — imperative JVM feature
    * extraction verified against pure SQL arithmetic. */
  def qMmFeatures(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Multimodal.features(spark, dir)

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_meta"     -> qMmMeta _,
    "q_mm_features" -> qMmFeatures _,
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
  )
}
