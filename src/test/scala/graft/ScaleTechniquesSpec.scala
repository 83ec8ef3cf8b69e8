package graft


import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.syntax._

/** The shuffle-management techniques the engine relies on at cluster scale,
  * demonstrated and asserted at the plan level (SURVEY.md §4 shuffle row):
  * bucketing for co-located joins, salting for skewed aggregation. */
class ScaleTechniquesSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("bucketed tables join without any shuffle exchange") {
    // Clean any leftover managed-table locations from prior JVMs (the
    // in-memory catalog forgets tables on restart but files persist).
    Seq("orders_bkt", "customer_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"/tmp/graft-test-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    Tables.orders(spark, dir)
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_bkt")
    Tables.customer(spark, dir)
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_bkt")
    // Disable broadcast so the join would otherwise need a shuffle, and AQE
    // so the plan tree is directly inspectable (AdaptiveSparkPlanExec hides
    // its inner plan from collect()).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      // The join itself is exchange-free (bucket-co-located); the only
      // shuffle left is the final aggregation on c_mktsegment.
      exchanges.length shouldBe 1
      joined.agg(sum($"n")).collect().head.getLong(0) shouldBe
        Tables.orders(spark, dir).count()
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("runtime bloom-filter pruning injects into a selective fact join") {
    // The runtime filter derives a bloom filter from the selective dim side
    // and pushes it into the fact scan — at 100 TB this prunes most of the
    // probe side before the shuffle. Thresholds are lowered so the tiny
    // fixture qualifies; broadcast is disabled because a broadcast join
    // already prunes implicitly (the filter only fires for shuffle joins).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val dim = Tables.orders(spark, dir).filter($"o_totalprice" > 300000)
      val fact = Tables.lineitem(spark, dir)
      val joined = fact.join(dim, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      joined.queryExecution.optimizedPlan.toString should include("bloom_filter")
      // and the filtered join still returns correct totals
      val expect = fact.join(dim.hint("broadcast"), $"l_orderkey" === $"o_orderkey").count()
      expect should be > 0L
      joined.agg(coalesce(sum($"n"), lit(0L))).collect().head.getLong(0) shouldBe expect
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    }
  }

  test("observe() metrics report data-quality counters without extra passes") {
    // The observability hook of a production pipeline: named aggregates ride
    // the existing job (no second scan) and surface via the listener /
    // Observation API — row counts, null counts, value bounds.
    val obs = new org.apache.spark.sql.Observation("quality")
    val docs = Tables.documents(spark, dir)
      .observe(obs,
        count(lit(1)).as("rows"),
        sum(when($"text".isNull, 1L).otherwise(0L)).as("null_texts"),
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.length($"text")).as("max_len"))
    val n = docs.count()
    val metrics = obs.get
    assert(metrics("rows").asInstanceOf[Number].longValue() == n)
    assert(metrics("null_texts").asInstanceOf[Number].longValue() == 0L)
    assert(metrics("max_len").asInstanceOf[Number].longValue() > 0L)
  }

  test("salted aggregation of a skewed key equals the direct aggregation") {
    val events = Tables.events(spark, dir) // event_type is low-cardinality/skewed
    val direct = events.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum(round($"value" * 100).cast("long")).as("c"))
      .orderBy($"event_type").collect().map(_.toSeq)
    val salted = events
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy($"event_type", $"salt")
      .agg(count(lit(1)).as("pn"), sum(round($"value" * 100).cast("long")).as("pc"))
      .groupBy($"event_type")
      .agg(sum($"pn").as("n"), sum($"pc").as("c"))
      .orderBy($"event_type").collect().map(_.toSeq)
    salted shouldBe direct
  }

  test("partsupp TPC-H shapes: slices pushed to the scan, dims broadcast") {
    // Q9: the part slice must reach the parquet scan (pre-aggregation
    // pruning is what keeps the fact join candidate-bounded), and every
    // dim join is a broadcast — no nested loop anywhere (RegistryPlanSpec
    // covers the NL audit; this pins the pushdown).
    val q9 = graft.queries.Analytics.qTpchQ9(spark, dir)
      .queryExecution.executedPlan.toString
    q9 should include("StringContains(p_name,red)")
    q9 should include("BroadcastHashJoin")
    // Q12: both the class slice and the ship-year range land in
    // PushedFilters, so the join input is pruned at row-group level.
    val q12 = graft.queries.Analytics.qTpchQ12(spark, dir)
      .queryExecution.executedPlan.toString
    q12 should include("In(l_returnflag, [A,R")
    q12 should include("GreaterThanOrEqual(l_shipdate")
  }

  test("q_dq_keys reads each audited table exactly once") {
    val plan = graft.queries.Advanced.qDqKeys(spark, dir)
      .queryExecution.executedPlan.toString
    "events\\.parquet".r.findAllIn(plan).length shouldBe 1
    "orders\\.parquet".r.findAllIn(plan).length shouldBe 1
  }
}
