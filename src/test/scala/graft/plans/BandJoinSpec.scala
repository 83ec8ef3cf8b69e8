package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[BandJoinRewrite]]: a user-written band θ-join must plan as a
  * bucketized equi-join (no nested loop) with byte-identical results,
  * including mixed-sign operands (truncating-division bucket widths), the
  * `<=` form, nulls, and the equi-key / disable guards. */
class BandJoinSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val W = 1000L

  graft.GraftExtensions.register(spark)

  /** Events at mixed-sign positions: clusters around 0, ±W boundaries, and
    * a sprinkle of nulls. */
  private def fixture(): (DataFrame, DataFrame) = {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    def rows(idBase: Long) = (0 until 400).map { i =>
      val pos =
        if (i % 19 == 0) null.asInstanceOf[java.lang.Long]
        else java.lang.Long.valueOf(rnd.nextLong() % (20L * W))
      (idBase + i, pos)
    }
    (rows(0).toDF("aid", "ax"), rows(100000).toDF("bid", "bx"))
  }

  private def withRule[T](enabled: Boolean)(f: => T): T = {
    spark.conf.set("spark.graft.bandJoinRewrite.enabled", enabled.toString)
    try f finally spark.conf.unset("spark.graft.bandJoinRewrite.enabled")
  }

  test("pure band join: rewritten to an equi-join, results identical") {
    val (a, b) = fixture()
    // a QueryExecution memoizes its optimized plan, so each conf setting
    // needs a FRESH DataFrame for the rule toggle to be observable
    def joined() = a.join(b, abs(col("ax") - col("bx")) < W)
    val planOn = withRule(true)(joined().queryExecution.executedPlan.toString)
    planOn should not include "BroadcastNestedLoopJoin"
    planOn should not include "CartesianProduct"
    planOn should include("Generate") // the 3-bucket explode

    val off = withRule(false) {
      val j = joined()
      val p = j.queryExecution.executedPlan.toString
      p should include regex "BroadcastNestedLoopJoin|CartesianProduct"
      j.collect().map(_.toSeq).toSet
    }
    val on = withRule(true)(joined().collect().map(_.toSeq))
    on.length shouldBe off.size // exactly-once matching: no dup pairs
    on.toSet shouldBe off
    on.length should be > 0
  }

  test("<= form rewrites too, boundary pairs kept") {
    import spark.implicits._
    val a = Seq((1L, 0L), (2L, W)).toDF("aid", "ax")
    val b = Seq((10L, W), (11L, 2 * W), (12L, 2 * W + 1)).toDF("bid", "bx")
    val j = a.join(b, abs($"ax" - $"bx") <= W)
    val plan = withRule(true)(j.queryExecution.executedPlan.toString)
    plan should not include "BroadcastNestedLoopJoin"
    val got = withRule(true)(
      j.select($"aid", $"bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    got shouldBe Set((1L, 10L), (2L, 10L), (2L, 11L)) // (2,12) is at distance W+1
  }

  test("a band predicate riding an existing equi key is left alone") {
    import spark.implicits._
    val a = Seq((1L, 5L), (2L, 50L)).toDF("k", "ax")
    val b = Seq((1L, 7L), (2L, 5000L)).toDF("k", "bx")
    val j = a.join(b, Seq("k")).filter(abs($"ax" - $"bx") < W)
    val plan = withRule(true)(j.queryExecution.executedPlan.toString)
    plan should not include "__graft_band_bucket" // no rewrite
    withRule(true)(j.select($"k").collect().map(_.getLong(0)).toSeq) shouldBe Seq(1L)
  }

  test("property: rewrite equals the nested loop on random data and widths (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(3, 23, 101)) {
      val rnd = new scala.util.Random(seed)
      val w = (rnd.nextInt(5000) + 1).toLong
      val span = w * (rnd.nextInt(30) + 2)
      def rows(n: Int, base: Long) = Seq.fill(n) {
        (base + rnd.nextInt(100000),
         rnd.nextLong() % span) // mixed-sign, multiple buckets wide
      }
      val a = rows(300, 0).toDF("aid", "ax")
      val b = rows(300, 1000000).toDF("bid", "bx")
      def j() = a.join(b, abs(col("ax") - col("bx")) < w)
        .select(col("aid"), col("bid"))
      val off = withRule(false)(j().collect().map(r => (r.getLong(0), r.getLong(1))))
      val on = withRule(true)(j().collect().map(r => (r.getLong(0), r.getLong(1))))
      withClue(s"seed=$seed W=$w: ") {
        on.length shouldBe off.length // multiplicity preserved, no dup matches
        on.sorted.toSeq shouldBe off.sorted.toSeq
        off.length should be > 0
      }
    }
  }

  test("SQL surface: the rule fires through spark.sql as well") {
    val (a, b) = fixture()
    a.createOrReplaceTempView("band_a")
    b.createOrReplaceTempView("band_b")
    val j = spark.sql(
      s"SELECT aid, bid FROM band_a JOIN band_b ON abs(ax - bx) < $W")
    val plan = withRule(true)(j.queryExecution.executedPlan.toString)
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
  }
}
