package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.syntax._

/** Connected-components invariants for the near-dup clustering step. */
class DedupClustersSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private lazy val clusters =
    Dedup.qDedupClusters(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val edges =
    Dedup.qDedupLshPairs(spark, dir)
      .filter($"est_e4" >= Dedup.ClusterEdgeE4)
      .select($"da", $"db").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

  test("the clustered fixture graph is non-trivial") {
    edges.length should be > 0
    clusters.size should be > 0
  }

  test("every edge's endpoints land in the same cluster") {
    edges.foreach { case (a, b) => clusters(a) shouldBe clusters(b) }
  }

  test("cluster ids are the minimum member id") {
    clusters.values.toSet.foreach { cid: Long =>
      clusters(cid) shouldBe cid // the representative is in its own cluster
    }
    clusters.foreach { case (doc, cid) => cid should be <= doc }
  }

  test("split assignment is leak-free: every near-dup cluster maps to exactly one split") {
    val rows = Dedup.qDedupSplit(spark, dir)
      .select("doc_id", "group_id", "split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // structural guarantee: split is a function of group_id
    rows.groupBy(_._2).foreach { case (_, members) =>
      members.map(_._3).toSet.size shouldBe 1
    }
    // the graph's clusters really are the groups (no doc left unassigned)
    clusters.foreach { case (doc, cid) =>
      rows.find(_._1 == doc).get._2 shouldBe cid
    }
    rows.map(_._3).toSet shouldBe Set("train", "val", "test")
  }

  test("survivors = corpus minus non-representative cluster members, counts conserved") {
    val survivors = Dedup.qDedupSurvivors(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    val nDocs = graft.Tables.documents(spark, dir).count()
    val nonReps = clusters.count { case (doc, cid) => doc != cid }

    survivors.length.toLong shouldBe nDocs - nonReps
    // no non-representative survives; every representative does
    val survivorIds = survivors.map(_._1).toSet
    clusters.foreach { case (doc, cid) =>
      survivorIds.contains(doc) shouldBe (doc == cid)
    }
    // each survivor's n_merged accounts for every corpus doc exactly once
    survivors.map(_._3).sum shouldBe nDocs
    // the flag marks exactly the docs that headed a near-dup cluster
    survivors.foreach { case (doc, cid, nMerged, isRep) =>
      isRep shouldBe clusters.contains(doc)
      if (isRep) { cid shouldBe clusters(doc); nMerged should be > 1L }
      else { cid shouldBe doc; nMerged shouldBe 1L }
    }
  }

  test("k-core matches an independent run-to-convergence reference peeling") {
    val got = Dedup.qGraphKcore(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got should not be empty
    // reference: peel to FULL convergence (no fixed round count) in Scala
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val degree = und.groupBy(_._1).map { case (n, es) => n -> es.length.toLong }
    def core(k: Int): Set[Long] = {
      var cur = degree.keySet
      var changed = true
      while (changed) {
        val d = und.filter(e => cur(e._1) && cur(e._2)).groupBy(_._1)
          .collect { case (n, es) if es.length >= k => n }.toSet
        changed = d != cur
        cur = d
      }
      cur
    }
    val (c2, c3) = (core(2), core(3))
    got.map(_._1).toSet shouldBe degree.keySet
    got.foreach { case (doc, deg, coreness) =>
      deg shouldBe degree(doc)
      coreness shouldBe (1L + (if (c2(doc)) 1L else 0L) + (if (c3(doc)) 1L else 0L))
      coreness should be <= deg // a k-core member needs k in-subgraph neighbors
    }
    // cores nest: every 3-core member is a 2-core member
    c3.subsetOf(c2) shouldBe true
  }

  test("exact-substring runs match a direct DP longest-common-run reference") {
    val got = Dedup.qDedupSubstr(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(5))).toMap
    got should not be empty
    got.keySet shouldBe edges.toSet // every candidate edge stays visible
    val texts = graft.Tables.documents(spark, dir)
      .select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def toks(s: String): Array[String] =
      s.toLowerCase.trim.split("\\s+")
    // longest common token substring via the classic DP row sweep
    def lcRun(a: Array[String], b: Array[String]): Int = {
      var best = 0
      var prev = new Array[Int](b.length + 1)
      var cur = new Array[Int](b.length + 1)
      for (i <- 1 to a.length) {
        for (j <- 1 to b.length) {
          cur(j) = if (a(i - 1) == b(j - 1)) prev(j - 1) + 1 else 0
          if (cur(j) > best) best = cur(j)
        }
        val t = prev; prev = cur; cur = t
        java.util.Arrays.fill(cur, 0)
      }
      best
    }
    got.foreach { case ((a, b), gramTokens) =>
      val exact = lcRun(toks(texts(a)), toks(texts(b)))
      // a run of r ≥ 8 shared tokens is r−7 consecutive shared grams;
      // below the gram width the query reports 0 by construction
      if (exact >= 8) gramTokens shouldBe exact.toLong
      else gramTokens shouldBe 0L
    }
  }

  test("calibration audit agrees with the exact jaccard tier where both report") {
    val cal = Dedup.qDedupCalibration(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(5), r.getLong(6)))).toMap
    cal should not be empty
    cal.foreach { case (_, (est, jacc, err)) =>
      est should (be >= 0L and be <= 10000L)
      jacc should (be >= 0L and be <= 10000L)
      err shouldBe est - jacc
    }
    // pairs the exact-jaccard query reports (its own shingle-join pair
    // generation, NOT banding) must carry the identical exact score when
    // the banding also nominated them
    val exact = Dedup.qDedupJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    val both = exact.keySet.intersect(cal.keySet)
    both should not be empty
    both.foreach { p => cal(p)._2 shouldBe exact(p) }
  }

  test("curation pipeline: stage verdicts nest and the budget binds") {
    val rows = Dedup.qPipelineCurate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3), r.getBoolean(4),
                 Option(r.get(5)).map(_.asInstanceOf[Long]), r.getBoolean(6)))
    rows should not be empty
    val budget = 50000L
    rows.foreach { case (_, _, passes, isRep, cum, kept) =>
      if (isRep) passes shouldBe true        // reps are chosen among passers
      if (kept) isRep shouldBe true          // kept docs are representatives
      cum.isDefined shouldBe isRep           // cum exists exactly for reps
      if (kept) cum.get should be <= budget
      if (isRep && !kept) cum.get should be > budget
    }
    // among quality passers, each near-dup group keeps exactly one rep
    val labels = clusters // near-dup cluster labels (doc -> cluster head)
    val passers = rows.filter(_._3)
    passers.groupBy(r => labels.getOrElse(r._1, r._1)).foreach {
      case (_, members) => members.count(_._4) shouldBe 1
    }
    // the ledger is the WHOLE corpus, not just survivors
    rows.length shouldBe graft.Tables.documents(spark, dir).count().toInt
  }

  test("prefix-filtering join is COMPLETE: every high-jaccard pair is found") {
    val pp = Dedup.qDedupPpjoin(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(3), r.getBoolean(4))))
      .toMap
    pp should not be empty
    // the exact-jaccard tier generates pairs from the FULL postings join —
    // every pair at or above the ppjoin threshold must be a ppjoin
    // candidate with the identical exact score and a true verdict
    val exact = Dedup.qDedupJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3))
      .filter(_._2 >= 5000L).toMap
    exact should not be empty
    exact.foreach { case (p, jacc) =>
      pp.contains(p) shouldBe true
      pp(p)._1 shouldBe jacc
      pp(p)._2 shouldBe true
    }
    // and verdicts are exactly the threshold test
    pp.values.foreach { case (jacc, dup) => dup shouldBe (jacc >= 5000L) }
  }

  test("survivors plan: CC output consumed via one anti-join + one equi-join") {
    val plan = Dedup.qDedupSurvivors(spark, dir).queryExecution.executedPlan.toString
    plan should include("LeftAnti")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }
}
