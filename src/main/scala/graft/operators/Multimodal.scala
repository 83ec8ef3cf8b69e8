package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with a partition-batched decode/feature-extract stage.
  *
  * The pattern mirrors how a training-data pipeline carries images/audio/
  * video: a `payload: binary` column plus a metadata struct, with decode
  * running per-partition against a codec library. This container has no
  * codec libraries, so [[decodeFeatures]] is a clearly-marked STUB — a
  * deterministic fake standing in for the real decoder — while everything
  * around it is real and load-bearing: the binary column, the typed
  * `Dataset` schema, the `mapPartitions` batch shape (one iterator per
  * partition, the place a real implementation would amortize codec init),
  * and the downstream columnar hand-off.
  *
  * Scale: decode is a narrow per-partition map — no shuffle; partition
  * sizing (`spark.sql.files.maxPartitionBytes`) is the only knob that
  * matters; decoded features are small relative to payloads, so the
  * payload column is dropped before any wide stage. */
object Multimodal {

  /** Input row: payload bytes + coarse media type from magic-byte sniff. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Decoded features (all deterministic functions of the payload). */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      magic_hex: String,
      width: Long,
      height: Long,
      n_frames: Long,
      aspect_e4: Long,
      byte_sum8: Long)

  /** Attach a binary payload column (here: the UTF-8 document text standing
    * in for media bytes — the fixtures carry no real media). */
  def attachPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))

  private def hexLower(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString

  /** STUB decode — deterministic fake features in place of a codec call.
    * A real implementation decodes `r.payload` with an image/audio library
    * here; the md5-derived "dimensions" keep the output verifiable. */
  def decodeOne(r: MediaRow): MediaFeatures = {
    val md5hex = hexLower(MessageDigest.getInstance("MD5").digest(r.payload))
    val h = java.lang.Long.parseLong(md5hex.substring(0, 8), 16)
    val width = h % 1920 + 16
    val height = (h / 1920) % 1080 + 16
    MediaFeatures(
      doc_id = r.doc_id,
      n_bytes = r.payload.length.toLong,
      magic_hex = hexLower(r.payload.take(4)),
      width = width,
      height = height,
      n_frames = r.payload.length.toLong % 100 + 1,
      aspect_e4 = width * 10000 / height,
      byte_sum8 = r.payload.take(8).map(b => (b & 0xff).toLong).sum)
  }

  /** Partition-batched decode: one iterator per partition so a real codec
    * would init once per task, not once per row. */
  def decodeFeatures(ds: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decodeOne))
  }

  /** documents → payloads → decoded features, as a DataFrame plan. */
  def features(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = attachPayload(graft.Tables.documents(spark, dir))
      .select(col("doc_id"), col("payload"))
      .as[MediaRow]
    decodeFeatures(media).toDF().orderBy("doc_id")
  }
}
