package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The bench lane prices OPERATORS, not their oracle verifiers: for the
  * stored-index queries whose registry form carries an in-plan full-corpus
  * recompute (the bit-identity pin the DuckDB gate needs), `Bench`
  * substitutes a `_bench` variant that runs the production probe plus
  * O(|result|) invariants. This spec pins the substitution set — a bench
  * variant silently dropped (bench stops covering the operator) or a
  * verifier-form leak back into the lane (bench re-prices the oracle
  * construct) both fail here — and runs each variant end-to-end with its
  * in-plan verdict TRUE. */
class BenchLaneSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("benchQueries = queries with exactly the verifier-form substitutions") {
    val subs = Map(
      "q_dedup_index_append" -> "q_dedup_index_append_bench",
      "q_dedup_index_merge" -> "q_dedup_index_merge_bench",
      "q_dedup_index_forget" -> "q_dedup_index_forget_bench",
      "q_dedup_indexed" -> "q_dedup_indexed_bench",
      "q_dedup_ppjoin_indexed" -> "q_dedup_ppjoin_indexed_bench")
    val q = SparkEntry.queries.keySet
    val b = SparkEntry.benchQueries.keySet
    (q -- b) shouldBe subs.keySet
    (b -- q) shouldBe subs.values.toSet
    b.size shouldBe q.size
  }

  test("q_dedup_indexed_bench: stored probe + edit tier, index_ok TRUE") {
    val out = SparkEntry.benchQueries("q_dedup_indexed_bench")(spark, dir)
    out.columns shouldBe
      Array("a", "b", "lev", "max_len", "dist_e4", "is_dup", "index_ok")
    val rows = out.collect()
    rows.length should be > 0
    all(rows.map(_.getBoolean(6))) shouldBe true
    // same pair set as the registry form (the operator, minus the verifier)
    val full = SparkEntry.queries("q_dedup_indexed")(spark, dir)
      .select("a", "b").collect().map(_.toSeq).toSet
    rows.map(r => Seq(r.get(0), r.get(1))).toSet shouldBe full
  }

  test("q_dedup_ppjoin_indexed_bench: stored prefix probe, same pairs as the registry form") {
    val out = SparkEntry.benchQueries("q_dedup_ppjoin_indexed_bench")(spark, dir)
    out.columns shouldBe Array("da", "db", "common", "jacc_e4", "is_dup")
    val got = out.collect().map(_.toSeq.take(4)).toSet
    val full = SparkEntry.queries("q_dedup_ppjoin_indexed")(spark, dir)
      .select("da", "db", "common", "jacc_e4").collect().map(_.toSeq).toSet
    got shouldBe full
    got.size should be > 0
  }
}
