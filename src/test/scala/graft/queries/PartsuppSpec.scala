package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.syntax._

/** Pins the relational invariants of the deterministic synthetic partsupp
  * (the stand-in for the absent partsupp.parquet fixture): the five
  * TPC-H shapes built on it assume a well-formed relation, and the DuckDB
  * oracle CTE assumes the exact same tuples. */
class PartsuppSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("synthetic partsupp is a well-formed, deterministic relation") {
    import org.apache.spark.sql.functions._
    val ps = Analytics.partsuppSyn(spark, dir)
    val nParts = graft.Tables.part(spark, dir).count()
    val nSupp = graft.Tables.supplier(spark, dir).count()

    // exactly 4 supplier slots per part, all distinct -> PK (partkey, suppkey)
    ps.count() shouldBe nParts * 4
    ps.select($"ps_partkey", $"ps_suppkey").distinct().count() shouldBe nParts * 4
    ps.groupBy($"ps_partkey").count()
      .agg(min($"count"), max($"count")).head().toSeq shouldBe Seq(4L, 4L)

    // foreign keys land in their parents' domains
    val b = ps.agg(
      min($"ps_suppkey"), max($"ps_suppkey"),
      min($"ps_availqty"), max($"ps_availqty"),
      min($"ps_supplycost_c"), max($"ps_supplycost_c")).head()
    b.getLong(0) should be >= 1L
    b.getLong(1) should be <= nSupp
    b.getLong(2) should be >= 1L     // availqty in [1, 9999]
    b.getLong(3) should be <= 9999L
    b.getLong(4) should be >= 100L   // cost in [100, 99999] cents
    b.getLong(5) should be <= 99999L

    // supplier load is uniform: every supplier carries the same +-1 share
    val load = ps.groupBy($"ps_suppkey").count()
      .agg(min($"count"), max($"count"), count(lit(1))).head()
    load.getLong(2) shouldBe nSupp // every supplier appears
    (load.getLong(1) - load.getLong(0)) should be <= 4L

    // deterministic across runs (the oracle CTE depends on it)
    ps.collect().map(_.toSeq).sortBy(_.toString) shouldBe
      Analytics.partsuppSyn(spark, dir).collect().map(_.toSeq).sortBy(_.toString)
  }

  test("q_tpch_q2 slice is non-empty, so the hash gate has real coverage") {
    // Guards the BETWEEN(14,16) + LIKE '%AR%' slice: an empty result would
    // make the oracle comparison vacuous (none of the min-cost tie join,
    // cents rounding, or LIMIT ordering would actually be exercised).
    val out = Analytics.qTpchQ2(spark, dir).collect()
    out.length should be > 0
    // ties kept: every returned cost equals its part's minimum, and the
    // ordering contract holds on the first column
    val costs = out.map(r => r.getLong(r.fieldIndex("s_acctbal_c")))
    costs.toSeq shouldBe costs.sortBy(-_).toSeq
  }
}
