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

  test("survivors plan: CC output consumed via one anti-join + one equi-join") {
    val plan = Dedup.qDedupSurvivors(spark, dir).queryExecution.executedPlan.toString
    plan should include("LeftAnti")
    plan should not include "CartesianProduct"
    plan should not include "BroadcastNestedLoopJoin"
  }
}
