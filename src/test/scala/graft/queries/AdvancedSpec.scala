package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.TopKAggregator

class AdvancedSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct stays within the configured relative error") {
    import org.apache.spark.sql.functions._
    import graft.syntax._
    val approx = Advanced.qApproxDistinct(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag").agg(countDistinct($"l_orderkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      math.abs(approx(k) - n).toDouble / n should be < 0.1
    }
  }

  test("TopKAggregator reduce/merge keep the k largest in order") {
    val agg = new TopKAggregator(3)
    val buf = Seq(5.0, 1.0, 9.0, 7.0, 3.0).foldLeft(agg.zero)(agg.reduce)
    buf shouldBe Seq(9.0, 7.0, 5.0)
    agg.merge(Seq(9.0, 7.0, 5.0), Seq(8.0, 6.0)) shouldBe Seq(9.0, 8.0, 7.0)
    agg.finish(buf) shouldBe Seq(9.0, 7.0, 5.0)
  }

  test("hash sample is deterministic across runs") {
    val a = Advanced.qSampleHash(spark, dir).collect().map(_.toSeq)
    val b = Advanced.qSampleHash(spark, dir).collect().map(_.toSeq)
    a shouldBe b
  }
}
