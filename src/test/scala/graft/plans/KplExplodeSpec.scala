package graft.plans

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.kpl.KplCodec
import graft.operators.Deaggregate

class KplExplodeSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def fixture() = {
    import spark.implicits._
    Seq(
      (1L, KplCodec.aggregate("pk", Seq("a", "bb", "ccc").map(_.getBytes(UTF_8)))),
      (2L, "bare".getBytes(UTF_8)),
      (3L, KplCodec.Magic ++ Array.fill[Byte](40)(0x7F)), // corrupt aggregate
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "data")
  }

  test("native generator output matches the UDF+explode reference path") {
    val df = fixture().filter(col("data").isNotNull)
    def normalize(d: org.apache.spark.sql.DataFrame) =
      d.select(col("id"), col("_corrupt_aggregate"), col("payload"))
        .collect()
        .map(r => (r.getLong(0), r.getBoolean(1),
          Option(r.getAs[Array[Byte]](2)).map(_.toSeq)))
        .sortBy(t => (t._1, t._3.map(_.mkString(",")).getOrElse("")))
    normalize(Deaggregate.explodePayloadsNative(df)) shouldBe
      normalize(Deaggregate.explodePayloads(df))
  }

  test("generator streams aggregate payloads and flags corrupt rows") {
    val rows = Deaggregate.explodePayloadsNative(fixture())
      .select(col("id"), col("_corrupt_aggregate"), col("payload"))
      .collect()
      .map(r => (r.getLong(0), r.getBoolean(1), new String(r.getAs[Array[Byte]](2), UTF_8)))
      .sortBy(r => (r._1, r._3))
    rows.count(_._1 == 1L) shouldBe 3
    rows.filter(_._1 == 1L).map(_._3) shouldBe Array("a", "bb", "ccc")
    rows.filter(_._1 == 2L).map(_._3) shouldBe Array("bare")
    rows.filter(_._1 == 3L).map(_._2) shouldBe Array(true)
    rows.count(_._1 == 4L) shouldBe 0 // null input generates nothing
  }

  test("strict-drop mode removes corrupt aggregates (reference parity)") {
    val rows = Deaggregate.explodePayloadsNative(fixture(), keepCorrupt = false)
    rows.filter(col("id") === 3L).count() shouldBe 0
    rows.count() shouldBe 4
  }

  test("works from SQL once extensions are registered") {
    graft.GraftExtensions.register(spark)
    fixture().createOrReplaceTempView("kpl_fixture")
    val n = spark.sql(
      "SELECT graft_kpl_explode(data) FROM kpl_fixture WHERE data IS NOT NULL")
      .count()
    n shouldBe 5 // 3 payloads + 1 bare + 1 corrupt
  }
}
