package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Misra-Gries guarantees, exercised on a Zipfian stream (the fixtures are
  * deliberately uniform, so the skew the sketch exists for is synthesized
  * here): est ≤ freq, freq − est ≤ N/(k+1) across arbitrary partitionings
  * (the mergeable-summaries bound), superset guarantee for true heavy
  * hitters, and exactness when the dictionary fits the counter budget. */
class MisraGriesSpec extends AnyFunSuite with Matchers with SparkSpec {

  /** Deterministic Zipf-ish stream: key `k_r` (rank r = 1..40) appears
    * ⌈2000/r⌉ times, shuffled by a seeded RNG so heavy keys interleave. */
  private lazy val zipf: Seq[String] = {
    val raw = (1 to 40).flatMap(r => Seq.fill(2000 / r)(s"k_$r"))
    new scala.util.Random(7).shuffle(raw)
  }

  private def summarize(k: Int, partitions: Int): Map[String, Long] = {
    import spark.implicits._
    val mg = udaf(new MisraGriesAggregator(k))
    zipf.toDF("t").repartition(partitions)
      .agg(mg($"t")).head().getMap[String, Long](0).toMap
  }

  private lazy val freq: Map[String, Long] =
    zipf.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }

  test("ε-N bound: est ≤ freq and freq − est ≤ N/(k+1), any partitioning") {
    val n = zipf.size.toLong
    for (k <- Seq(8, 16); parts <- Seq(1, 4, 13)) {
      val est = summarize(k, parts)
      est.size should be <= k
      est.foreach { case (t, e) =>
        e should be <= freq(t)
        (freq(t) - e) should be <= n / (k + 1)
      }
      // keys absent from the summary have est 0 → same bound applies
      freq.foreach { case (t, f) =>
        (f - est.getOrElse(t, 0L)) should be <= n / (k + 1)
      }
    }
  }

  test("superset guarantee: every key with freq > N/(k+1) is in the summary") {
    val n = zipf.size.toLong
    for (k <- Seq(8, 16); parts <- Seq(1, 4, 13)) {
      val est = summarize(k, parts)
      val trueHh = freq.collect { case (t, f) if f * (k + 1) > n => t }.toSet
      trueHh should not be empty
      trueHh.foreach(t => est.keySet should contain(t))
    }
  }

  test("exact when the dictionary fits in k counters") {
    val est = summarize(k = 64, partitions = 5) // 40 distinct keys < 64
    est shouldBe freq
  }

  test("q_heavyhitters_mg equals the exact GROUP BY/HAVING on the fixture") {
    import graft.syntax._
    val dir = "/root/testdata/sf0.001"
    val got = graft.queries.Advanced.qHeavyHittersMg(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    val toks = graft.Tables.documents(spark, dir)
      .select(explode(TextHash.tokens($"text")).as("token"))
    val n = toks.count()
    val want = toks.groupBy($"token").agg(count(lit(1)).as("n"))
      .filter($"n" * (graft.queries.Advanced.MgK + 1) > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
    got should not be empty
    got shouldBe want
  }
}
