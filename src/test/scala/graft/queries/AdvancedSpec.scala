package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.{ScoredNeighbor, TopKAggregator, TopPairsAggregator}

class AdvancedSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("approx_count_distinct: exact columns match, in-plan verdict is TRUE") {
    import org.apache.spark.sql.functions._
    import graft.syntax._
    val rows = Advanced.qApproxDistinct(spark, dir).collect()
    val exact = graft.Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag").agg(countDistinct($"l_orderkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.length shouldBe exact.size
    rows.foreach { r =>
      r.getLong(1) shouldBe exact(r.getString(0)) // exact_orders is exact
      r.getBoolean(3) shouldBe true               // HLL++ within 10% of exact
    }
  }

  test("approx_percentile: exact columns match qPercentile, verdicts TRUE") {
    val exact = Advanced.qPercentile(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    Advanced.qApproxPercentile(spark, dir).collect().foreach { r =>
      val (p50, p90) = exact(r.getString(0))
      r.getLong(1) shouldBe p50
      r.getLong(2) shouldBe p90
      r.getBoolean(4) shouldBe true // sketch p50 inside the ±1% rank window
      r.getBoolean(5) shouldBe true // sketch p90 inside the ±1% rank window
    }
  }

  test("bucketized interval join: equi-join plan, θ-join results") {
    import org.apache.spark.sql.functions.{abs, lit, unix_micros}
    import graft.syntax._
    val q = Events.qJoinInterval(spark, dir)
    val plan = q.queryExecution.executedPlan.toString
    plan should not include "BroadcastNestedLoopJoin"
    plan should not include "CartesianProduct"
    // exact equivalence with the naive non-equi self-join it replaces
    val e = graft.Tables.events(spark, dir)
      .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
    val a = e.toDF("user_id", "ea", "ua")
    val b = e.toDF("user_id", "eb", "ub")
    val naive = a.join(b, Seq("user_id"))
      .filter($"ea" < $"eb" && abs($"ua" - $"ub") < 300000000L)
      .select($"user_id", $"ea", $"eb",
              (lit(300000000L) - abs($"ua" - $"ub")).as("overlap_us"))
      .collect().map(_.toSeq).toSet
    naive should not be empty
    q.collect().map(_.toSeq).toSet shouldBe naive
  }

  test("bucketized interval join equals the θ-join on random event sets (3 seeds)") {
    import org.apache.spark.sql.functions.{abs, lit}
    import spark.implicits._
    val W = 300000000L
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      // clustered timestamps so overlaps actually occur
      val rows = (0 until 400).map { i =>
        (i.toLong, rnd.nextInt(20).toLong,
         rnd.nextInt(48) * W / 2 + rnd.nextInt(1000000).toLong)
      }
      val e = rows.toDF("event_id", "user_id", "us")
      val bucketized = {
        val x = e.withColumn("b0", org.apache.spark.sql.functions.expr(s"us div $W"))
        val ex = x.select($"user_id", $"event_id", $"us",
          org.apache.spark.sql.functions.explode(
            org.apache.spark.sql.functions.array($"b0", $"b0" + 1L)).as("bucket"))
        ex.toDF("user_id", "ea", "ua", "bucket")
          .join(ex.toDF("user_id", "eb", "ub", "bucket"), Seq("user_id", "bucket"))
          .filter($"ea" < $"eb" && abs($"ua" - $"ub") < W &&
            $"bucket" === org.apache.spark.sql.functions.expr(s"greatest(ua, ub) div $W"))
          .select($"user_id", $"ea", $"eb")
      }
      val naive = e.select($"user_id", $"event_id".as("ea"), $"us".as("ua"))
        .join(e.select($"user_id", $"event_id".as("eb"), $"us".as("ub")),
              Seq("user_id"))
        .filter($"ea" < $"eb" && abs($"ua" - $"ub") < W)
        .select($"user_id", $"ea", $"eb")
      bucketized.collect().map(_.toSeq).toSet shouldBe
        naive.collect().map(_.toSeq).toSet
    }
  }

  test("ArgMaxAggregator is partition-invariant (any reduce/merge tree, same winner)") {
    import graft.functions.{ArgMaxAggregator, Keyed}
    val agg = new ArgMaxAggregator
    // includes a first-component tie broken by key2, and key values past
    // the 106-day packed-long overflow horizon (real-date µs timestamps)
    val big = 1767225600000000L // 2026-01-01 in µs
    val rows = Seq(Keyed(big + 5, 0, "a", 1), Keyed(big + 9, 2, "b", 2),
                   Keyed(big + 9, 7, "c", 3), Keyed(big + 3, 0, "d", 4),
                   Keyed(big + 8, 0, "e", 5))
    val expected = Keyed(big + 9, 7, "c", 3)
    // every 2-way split: reduce each side, merge in both orders
    for (mask <- 0 until (1 << rows.size)) {
      val (l, r) = rows.zipWithIndex.partition { case (_, i) => (mask & (1 << i)) != 0 }
      val lb = l.map(_._1).foldLeft(agg.zero)(agg.reduce)
      val rb = r.map(_._1).foldLeft(agg.zero)(agg.reduce)
      agg.finish(agg.merge(lb, rb)) shouldBe expected
      agg.finish(agg.merge(rb, lb)) shouldBe expected
    }
    // empty input stays the marked-empty state
    agg.finish(agg.zero).key shouldBe Long.MinValue
  }

  test("count-min heavy hitters: exact top-10 counts, CMS contract verdict TRUE") {
    import org.apache.spark.sql.functions._
    import graft.syntax._
    val rows = Advanced.qApproxHeavyHitters(spark, dir).collect()
    rows.length shouldBe 10
    val exact = graft.Tables.lineitem(spark, dir)
      .groupBy($"l_partkey").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      r.getLong(1) shouldBe exact(r.getLong(0)) // exact_n is truly exact
      // in-plan verdict: exact <= est <= exact + eps*N (CMS never under-counts)
      r.getBoolean(2) shouldBe true
    }
  }

  test("TopKAggregator reduce/merge keep the k largest in order") {
    val agg = new TopKAggregator(3)
    val buf = Seq(5.0, 1.0, 9.0, 7.0, 3.0).foldLeft(agg.zero)(agg.reduce)
    buf shouldBe Seq(9.0, 7.0, 5.0)
    agg.merge(Seq(9.0, 7.0, 5.0), Seq(8.0, 6.0)) shouldBe Seq(9.0, 8.0, 7.0)
    agg.finish(buf) shouldBe Seq(9.0, 7.0, 5.0)
  }

  test("TopPairsAggregator keeps k best pairs with id tie-break") {
    val agg = new TopPairsAggregator(2)
    val in = Seq(ScoredNeighbor(5, 9), ScoredNeighbor(7, 3),
                 ScoredNeighbor(7, 1), ScoredNeighbor(2, 0))
    val buf = in.foldLeft(agg.zero)(agg.reduce)
    buf shouldBe Seq(ScoredNeighbor(7, 1), ScoredNeighbor(7, 3))
    agg.merge(buf, Seq(ScoredNeighbor(8, 4))) shouldBe
      Seq(ScoredNeighbor(8, 4), ScoredNeighbor(7, 1))
  }

  test("flattened UDAF top-k matches a window-ranked reference") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import graft.syntax._
    val got = Advanced.qUdafTopk(spark, dir).collect().map(_.toSeq)
    val w = Window.partitionBy($"c_mktsegment")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    val want = graft.Tables.orders(spark, dir)
      .join(broadcast(graft.Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3)
      .select($"c_mktsegment", $"rank",
        round($"o_totalprice" * 100).cast("long").as("price_c"))
      .orderBy($"c_mktsegment", $"rank")
      .collect().map(_.toSeq)
    got shouldBe want
  }

  test("TopPairsAggregator: any reduce/merge tree equals the brute-force top-k") {
    // Property: for random inputs split into random partitions, reducing
    // each partition then merging in any order must equal sorting the whole
    // input and taking the first k — the partial-aggregation correctness
    // contract Spark relies on.
    val rnd = new scala.util.Random(41)
    val ord = Ordering.by((s: ScoredNeighbor) => (-s.cosE4, s.nb))
    for (_ <- 1 to 200) {
      val k = rnd.nextInt(5) + 1
      val agg = new TopPairsAggregator(k)
      val n = rnd.nextInt(40)
      val input = Seq.fill(n)(ScoredNeighbor(rnd.nextInt(10).toLong, rnd.nextInt(100).toLong))
      val nParts = rnd.nextInt(4) + 1
      val partitions = input.grouped(math.max(1, (n + nParts - 1) / nParts)).toSeq
      val partials = partitions.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = rnd.shuffle(partials).foldLeft(agg.zero)(agg.merge)
      agg.finish(merged) shouldBe input.sorted(ord).take(k)
    }
  }

  test("hash sample is deterministic across runs") {
    val a = Advanced.qSampleHash(spark, dir).collect().map(_.toSeq)
    val b = Advanced.qSampleHash(spark, dir).collect().map(_.toSeq)
    a shouldBe b
  }

  test("interval join skew: the (user,bucket) key splits a heavy user's history") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val W = 300000000L
    // One user with 1000 events (2 per 5-minute window, 500 windows) — the
    // hot key a user-partitioned join would funnel into ONE task, paying
    // ~10^6 candidate pairs there. Plus 49 normal users, 10 sparse events
    // each (no self-overlaps: 7 windows apart).
    val heavy = (0 until 1000).map { i =>
      (1L, 10000L + i, (i / 2).toLong * W + (i % 2).toLong * 1000000L)
    }
    val normal = for (u <- 2 to 50; i <- 0 until 10)
      yield (u.toLong, u * 100000L + i, i.toLong * 7L * W + u * 777L)
    val e = (heavy ++ normal).toDF("user_id", "event_id", "us")

    // correctness under skew: exactly the θ-join's pairs
    val a = e.toDF("user_id", "ea", "ua")
    val b = e.toDF("user_id", "eb", "ub")
    val naive = a.join(b, Seq("user_id"))
      .filter($"ea" < $"eb" && abs($"ua" - $"ub") < W)
      .select($"user_id", $"ea", $"eb",
              (lit(W) - abs($"ua" - $"ub")).as("overlap_us"))
      .collect().map(_.toSeq).toSet
    naive.nonEmpty shouldBe true
    Events.intervalPairs(e, W).collect().map(_.toSeq).toSet shouldBe naive

    // key-load balance: the heavy user's exploded rows spread over ~500
    // (user, bucket) keys of ≤4 rows each, so the worst join-key load — and
    // with it the worst task's candidate-pair count — collapses from the
    // user-only key's 10^6 to a constant. Σ cnt² (total equi-join candidate
    // work) drops by >100× vs the single-task user key.
    val exploded = e.withColumn("b0", expr(s"us div $W"))
      .select($"user_id", explode(array($"b0", $"b0" + 1L)).as("bucket"))
    val stats = exploded.groupBy($"user_id", $"bucket").count()
      .agg(max($"count").as("max_key"),
           sum($"count" * $"count").as("candidate_work"))
      .head()
    stats.getLong(0) should be <= 4L
    val heavyUserRows = 1000L
    stats.getLong(1) should be < heavyUserRows * heavyUserRows / 100L
  }

  test("hll union is merge-lossless and lands inside the lgK=12 error envelope") {
    import org.apache.spark.sql.functions.{countDistinct, expr}
    import graft.syntax._
    val dir = "/root/testdata/sf0.001"
    val r = Advanced.qApproxHllUnion(spark, dir).head()
    val (exact, nSources) = (r.getLong(0), r.getLong(1))
    nSources should be > 1L
    r.getBoolean(2) shouldBe true // in-plan verdict: union est within 7%
    val docs = graft.Tables.documents(spark, dir)
    exact shouldBe docs.agg(countDistinct($"doc_id")).head().getLong(0)
    // recompute the merged estimate the query gates on, and pin it to a
    // direct whole-corpus sketch (the union densifies the target
    // representation, so the estimates are near but not bit-equal — the
    // honest contract)
    val est = docs.groupBy($"source")
      .agg(expr("hll_sketch_agg(doc_id, 12)").as("sk"))
      .agg(expr("CAST(hll_sketch_estimate(hll_union_agg(sk, true)) AS BIGINT)"))
      .head().getLong(0)
    val direct = docs
      .agg(expr("CAST(hll_sketch_estimate(hll_sketch_agg(doc_id, 12)) AS BIGINT)"))
      .head().getLong(0)
    (math.abs(est - direct).toDouble / direct) should be < 0.03
    // lgK=12 relative standard error ~1.6%; allow 4 sigma
    math.abs(est - exact).toDouble / exact should be < 0.07
  }

  test("table checksum equals an order-independent scala XOR of the row hashes") {
    val dir = "/root/testdata/sf0.001"
    val got = Advanced.qDqChecksum(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val hs = graft.Tables.documents(spark, dir)
      .select(graft.functions.TextHash.h60(
        org.apache.spark.sql.functions.concat_ws("|",
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.col("source"))).as("h"))
      .collect().map(_.getLong(0))
    // XOR in REVERSED order — order independence is the operator's point
    got("documents") shouldBe ((hs.length.toLong, hs.reverse.foldLeft(0L)(_ ^ _)))
    // and a single-row perturbation changes the checksum
    val perturbed = hs.updated(0, hs(0) + 1L).foldLeft(0L)(_ ^ _)
    perturbed should not be got("documents")._2
  }

  test("refint audit: planted orphans are counted, null FK is a violation") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(99L), Some(99L),
      Some(42L), None).toDF("fk")
    val r = Analytics.refintRow("t.fk", child, "fk", parent, "pk").head()
    r.getString(0) shouldBe "t.fk"
    r.getLong(1) shouldBe 7L   // child rows
    r.getLong(2) shouldBe 4L   // 99, 99, 42, null
    r.getLong(3) shouldBe 2L   // distinct orphan KEYS: 99, 42 (null not a key)
    r.getBoolean(4) shouldBe false
    // and a clean child passes
    val clean = Analytics.refintRow("t.ok", Seq(1L, 3L).toDF("fk"), "fk", parent, "pk").head()
    clean.getLong(2) shouldBe 0L
    clean.getBoolean(4) shouldBe true
  }
}
