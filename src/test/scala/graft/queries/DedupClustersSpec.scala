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
}
