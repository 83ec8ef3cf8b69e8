package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.TextHash

/** The imperative mapPartitions decode stub must agree byte-for-byte with
  * the declarative column-expression formulation of the same fake decode —
  * the property that makes the multimodal path oracle-verifiable. */
class MultimodalSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("mapPartitions stub decode == column-expression equivalent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "tiny"),
      (3L, "a b c d e f g h i j k l m n o p"))
      .toDF("doc_id", "text")

    val viaMap = Multimodal
      .decodeFeatures(Multimodal.attachPayload(docs)
        .select($"doc_id", $"payload").as[Multimodal.MediaRow])
      .toDF().orderBy("doc_id")

    val h = TextHash.h32($"text")
    val width = h % 1920 + 16
    val height = (h / 1920).cast("long") % 1080 + 16
    val sum8 = (1 to 8)
      .map(i => coalesce(ascii(substring($"text", i, 1)), lit(0)).cast("long"))
      .reduce(_ + _)
    val strlen = org.apache.spark.sql.functions.length($"text").cast("long")
    val viaExpr = docs.select(
      $"doc_id",
      strlen.as("n_bytes"),
      lower(hex(substring($"text".cast("binary"), 1, 4))).as("magic_hex"),
      width.cast("long").as("width"),
      height.cast("long").as("height"),
      (strlen % 100 + 1).as("n_frames"),
      floor(width * 10000 / height).cast("long").as("aspect_e4"),
      sum8.as("byte_sum8")).orderBy("doc_id")

    viaMap.collect().map(_.toSeq) shouldBe viaExpr.collect().map(_.toSeq)
  }

  test("payload column is real binary with the text's UTF-8 bytes") {
    import spark.implicits._
    val df = Multimodal.attachPayload(Seq((7L, "abc")).toDF("doc_id", "text"))
    val bytes = df.select($"payload").collect().head.getAs[Array[Byte]](0)
    bytes.toSeq shouldBe "abc".getBytes("UTF-8").toSeq
  }
}
