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

  /** Hamming threshold for a banded pHash candidate pair to read as a
    * perceptual duplicate (out of 64 signature bits). Equals bands−1: with
    * 4 exact-match bands, pigeonhole guarantees EVERY pair within Hamming
    * distance 3 shares an untouched band — so candidate generation is
    * provably complete for the verdict radius (spec-checked all-pairs). A
    * wider perceptual radius needs more/smaller bands (multi-index
    * hashing) — the same plan with a different split. */
  private val PhashDupBits = 3L

  /** Perceptual-hash near-dup banding over the binary payloads — the
    * image/video dedup pipeline shape (a real pHash is the 64-bit DCT
    * sign map; the media codec is out of sandbox, so the hash here is the
    * same deterministic md5 stand-in the decode stub uses — the
    * PLUMBING is the deliverable): 64-bit signature as two 32-bit words,
    * cut into 4 exact-match bands of 16 bits; same-band equi-join
    * nominates candidates, exact Hamming distance verifies, threshold
    * [[PhashDupBits]] = bands−1 decides — the radius for which the
    * banding is provably complete.
    *
    * Plan: 4-band explode of a narrow (doc_id, band, val) projection,
    * self-join on (band, 16-bit value), per-pair aggregate counting shared
    * bands, hashes re-attached by equi-join for the xor+popcount verify —
    * the exact LSH-banding shape of the text path ([[graft.queries.Dedup]]),
    * never all-pairs. */
  def qMmPhash(spark: SparkSession, dir: String): DataFrame = {
    val hashes = Tables.documents(spark, dir)
      .select($"doc_id",
        TextHash.h32($"text").as("lo"),
        TextHash.h32(reverse($"text")).as("hi"))
      .persist()
    hashes.count()
    val bands = hashes.select($"doc_id", posexplode(array(
      $"lo" % 65536L, expr("lo div 65536"),
      $"hi" % 65536L, expr("hi div 65536"))))
      .select($"doc_id", $"pos".as("band_idx"), $"col".as("band_val"))
    val cand = bands.toDF("a", "band_idx", "band_val")
      .join(bands.toDF("b", "band_idx", "band_val"), Seq("band_idx", "band_val"))
      .filter($"a" < $"b")
      .groupBy($"a", $"b").agg(count(lit(1)).as("n_bands"))
    val res = cand
      .join(hashes.toDF("a", "alo", "ahi"), Seq("a"))
      .join(hashes.toDF("b", "blo", "bhi"), Seq("b"))
      .withColumn("ham",
        (bit_count($"alo".bitwiseXOR($"blo")) +
          bit_count($"ahi".bitwiseXOR($"bhi"))).cast("long"))
      .select($"a", $"b", $"n_bands", $"ham",
        ($"ham" <= PhashDupBits).as("is_dup"))
    graft.queries.Dedup.freeing(res, hashes)
  }

  /** Audio-side decode + speech-frontend planning: synthesize REAL
    * RIFF/WAVE containers around the document bytes (16 kHz mono 16-bit
    * PCM, samples = the text bytes ×4 — the fixtures carry no media, the
    * container is spec-exact), drive them through the REAL chunk-walk
    * header parse ([[graft.operators.Multimodal.parseWavHeader]]), and
    * emit duration + the 25 ms/10 ms FFT hop count an ASR/embedding stage
    * batches by. Docs with doc_id % 17 == 0 are truncated mid-fmt, so the
    * corrupt side-channel is exercised deterministically and the oracle
    * can predict it. mapPartitions decode (the declared multimodal seam),
    * no shuffle; every output field is integer arithmetic on
    * octet_length(text), which is what the oracle recomputes. */
  def qMmAudio(spark: SparkSession, dir: String): DataFrame = {
    // only the encoders — graft.syntax already owns the $ interpolator here
    import spark.implicits.newProductEncoder
    val rows = Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        val b = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val wav = graft.operators.Multimodal.synthWav(
          16000, 1, 16, b ++ b ++ b ++ b)
        graft.operators.Multimodal.AudioRow(
          id, if (id % 17L == 0L) wav.take(20) else wav)
      }
    graft.operators.Multimodal.decodeAudioFeatures(rows)
      .toDF().orderBy($"doc_id")
  }

  /** Video-side decode + sampling plan — completes the image/audio/video
    * tier triple: synthesize REAL ISO-BMFF containers (ftyp + moov[mvhd,
    * trak[tkhd]], v0 boxes, spec-layout — the fixtures carry no media)
    * with per-doc duration and display dimensions, drive them through
    * the REAL box walk ([[graft.operators.Multimodal.parseMp4Header]]),
    * and emit the 1 fps thumbnail-sampling plan a vision pipeline sizes
    * its decode batches by. Docs with doc_id % 13 == 0 get a moov that
    * lies about its size (truncated container) — the corrupt lane,
    * oracle-predicted like the audio twin's. */
  def qMmVideo(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits.newProductEncoder
    val rows = Tables.documents(spark, dir)
      .select($"doc_id", $"text").as[(Long, String)]
      .map { case (id, text) =>
        val len = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
        val mp4 = graft.operators.Multimodal.synthMp4(
          timescaleHz = 1000, durationTicks = len.toLong * 25L,
          w = (160 + (id % 8L) * 160L).toInt, h = (90 + (id % 5L) * 90L).toInt)
        graft.operators.Multimodal.VideoRow(
          id, if (id % 13L == 0L) mp4.take(30) else mp4)
      }
    graft.operators.Multimodal.decodeVideoFeatures(rows)
      .toDF().orderBy($"doc_id")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_meta"     -> qMmMeta _,
    "q_mm_features" -> qMmFeatures _,
    "q_mm_frames"   -> qMmFrames _,
    "q_mm_phash"    -> qMmPhash _,
    "q_mm_audio"    -> qMmAudio _,
    "q_mm_video"    -> qMmVideo _,
  )

  val oracles: Map[String, String] = Map(
    // q_mm_audio: the synthesis is deterministic (16 kHz mono 16-bit PCM,
    // data = text bytes ×4, so frames = 2·len with block align 2 and no
    // pad byte; container overhead 44), hence every decoded field is
    // integer arithmetic on octet_length(text): duration = frames·1000/16000
    // = frames//16; fft window 400 frames, hop 160 at 16 kHz.
    "q_mm_audio" ->
      """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS len
                    FROM documents),
          g AS (SELECT doc_id, len, 2 * len AS frames FROM d)
          SELECT doc_id,
            CAST(CASE WHEN doc_id % 17 = 0 THEN 20
                      ELSE 44 + 4 * len END AS BIGINT) AS n_bytes,
            CAST(CASE WHEN doc_id % 17 = 0 THEN 0 ELSE 1 END AS BIGINT)
              AS channels,
            CAST(CASE WHEN doc_id % 17 = 0 THEN 0 ELSE 16000 END AS BIGINT)
              AS sample_rate_hz,
            CAST(CASE WHEN doc_id % 17 = 0 THEN 0 ELSE 16 END AS BIGINT)
              AS bits_per_sample,
            CAST(CASE WHEN doc_id % 17 = 0 THEN 0 ELSE frames END AS BIGINT)
              AS n_frames,
            CAST(CASE WHEN doc_id % 17 = 0 THEN 0 ELSE frames // 16 END
              AS BIGINT) AS duration_ms,
            CAST(CASE WHEN doc_id % 17 = 0 THEN 0
                      WHEN frames >= 400 THEN 1 + (frames - 400) // 160
                      ELSE 0 END AS BIGINT) AS n_fft_hops,
            CASE WHEN doc_id % 17 = 0 THEN 'corrupt' ELSE 'wav' END AS codec,
            CASE WHEN doc_id % 17 = 0 THEN 'wav: truncated fmt chunk'
                 ELSE NULL END AS decode_error
          FROM g ORDER BY doc_id""",
    // q_mm_video: deterministic synthesis (timescale 1000 -> duration_ms =
    // 25·len; dims from doc_id moduli; container size 16 + 8 + 108 + 100 =
    // 232 bytes regardless of text), so the oracle is pure integer
    // arithmetic; sampling plan = ceil(duration_ms / 1000).
    "q_mm_video" ->
      """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS len
                    FROM documents)
          SELECT doc_id,
            CAST(CASE WHEN doc_id % 13 = 0 THEN 30 ELSE 232 END AS BIGINT)
              AS n_bytes,
            CAST(CASE WHEN doc_id % 13 = 0 THEN 0
                      ELSE 160 + (doc_id % 8) * 160 END AS BIGINT) AS width,
            CAST(CASE WHEN doc_id % 13 = 0 THEN 0
                      ELSE 90 + (doc_id % 5) * 90 END AS BIGINT) AS height,
            CAST(CASE WHEN doc_id % 13 = 0 THEN 0 ELSE 1000 END AS BIGINT)
              AS timescale_hz,
            CAST(CASE WHEN doc_id % 13 = 0 THEN 0 ELSE 25 * len END AS BIGINT)
              AS duration_ms,
            CAST(CASE WHEN doc_id % 13 = 0 THEN 0
                      ELSE (25 * len + 999) // 1000 END AS BIGINT)
              AS n_sampled_1fps,
            CASE WHEN doc_id % 13 = 0 THEN 'corrupt' ELSE 'mp4' END AS codec,
            CASE WHEN doc_id % 13 = 0
                 THEN 'mp4: box ''moov'' lies about its size'
                 ELSE NULL END AS decode_error
          FROM d ORDER BY doc_id""",
    "q_mm_phash" -> {
      val lo = TextHash.sqlH32("text")
      val hi = TextHash.sqlH32("reverse(text)")
      s"""WITH h AS MATERIALIZED (
            SELECT doc_id, $lo AS lo, $hi AS hi FROM documents),
          bands AS MATERIALIZED (
            SELECT doc_id, band_idx,
              CASE band_idx WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
                            WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS band_val
            FROM h, (SELECT unnest(generate_series(0, 3)) AS band_idx)),
          cand AS (
            SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_bands
            FROM bands x JOIN bands y
              ON x.band_idx = y.band_idx AND x.band_val = y.band_val
              AND x.doc_id < y.doc_id
            GROUP BY 1, 2)
          SELECT c.a, c.b, CAST(n_bands AS BIGINT) AS n_bands,
            CAST(bit_count(xor(ha.lo, hb.lo)) + bit_count(xor(ha.hi, hb.hi))
              AS BIGINT) AS ham,
            bit_count(xor(ha.lo, hb.lo)) + bit_count(xor(ha.hi, hb.hi)) <= 3
              AS is_dup
          FROM cand c JOIN h ha ON c.a = ha.doc_id JOIN h hb ON c.b = hb.doc_id
          ORDER BY a, b""" },
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
