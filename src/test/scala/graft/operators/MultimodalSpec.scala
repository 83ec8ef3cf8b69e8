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

  test("phash banding is COMPLETE for its verdict radius (bands-1 bits)") {
    val dir = "/root/testdata/sf0.001"
    val hs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextHash.h32(col("text")).as("lo"),
        TextHash.h32(reverse(col("text"))).as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def ham(a: (Long, Long, Long), b: (Long, Long, Long)): Int =
      java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
    val withinRadius = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
      if ham(hs(i), hs(j)) <= 3
    } yield {
      val (x, y) = (hs(i)._1, hs(j)._1)
      (math.min(x, y), math.max(x, y))
    }).toSet
    val got = graft.queries.MultimodalQ.qMmPhash(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(3), r.getBoolean(4))))
    val gotPairs = got.map(_._1).toSet
    // pigeonhole: 4 bands, <= 3 differing bits — at least one band is
    // untouched, so the pair MUST be nominated by the band join
    withinRadius.subsetOf(gotPairs) shouldBe true
    // and the reported distances/verdicts are exact
    val hsMap = hs.map(h => h._1 -> h).toMap
    got.foreach { case ((a, b), (d, dup)) =>
      d shouldBe ham(hsMap(a), hsMap(b)).toLong
      dup shouldBe (d <= 3L)
    }
  }
}
