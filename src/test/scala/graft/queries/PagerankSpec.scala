package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.syntax._

/** [[Dedup.pagerankFrom]] against a naive in-memory reference with the
  * identical integer fixed-point arithmetic, plus rank-mass and shape
  * invariants on the fixture near-dup graph. */
class PagerankSpec extends AnyFunSuite with Matchers with SparkSpec {

  /** The loop's arithmetic, restated sequentially: uniform init, then
    * [[Dedup.PagerankIters]] rounds of
    * pr'(v) = base + (85 · Σ_{u∼v} (pr(u) div deg(u))) div 100. */
  private def naivePagerank(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = (pairs ++ pairs.map(_.swap))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    val n = adj.size
    val base = 15L * Dedup.PagerankScale / (100L * n)
    var pr = adj.keys.map(_ -> Dedup.PagerankScale / n).toMap
    for (_ <- 1 to Dedup.PagerankIters)
      pr = adj.map { case (v, nbrs) =>
        v -> (base + 85L * nbrs.map(u => pr(u) / adj(u).size).sum / 100L)
      }
    pr
  }

  private def runOn(pairs: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    import spark.implicits._
    Dedup.pagerankFrom(pairs.toDF("a", "b")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("matches the naive reference on a barbell graph (two triangles + bridge)") {
    // Asymmetric structure: bridge endpoints 3,4 see more mass than leaves.
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
                    (4L, 5L), (4L, 6L), (5L, 6L))
    val got = runOn(pairs)
    val want = naivePagerank(pairs)
    got.view.mapValues(_._2).toMap shouldBe want
    // degrees: bridge endpoints have 3, the rest 2
    got(3L)._1 shouldBe 3L
    got(1L)._1 shouldBe 2L
    // the bridge endpoints out-rank the leaves
    got(3L)._2 should be > got(1L)._2
    got(4L)._2 should be > got(5L)._2
  }

  test("matches the naive reference on a star (hub concentrates rank)") {
    val pairs = (2L to 9L).map(i => (1L, i))
    val got = runOn(pairs)
    got.view.mapValues(_._2).toMap shouldBe naivePagerank(pairs)
    val hub = got(1L)._2
    (2L to 9L).foreach(i => hub should be > got(i)._2 * 3)
  }

  test("fixture graph: mass conserved within floor-division loss, nodes = graph nodes") {
    val dir = "/root/testdata/sf0.01"
    val rows = Dedup.qGraphPagerank(spark, dir).collect()
    val nodes = Dedup.qDedupClusters(spark, dir).select($"doc_id")
      .collect().map(_.getLong(0)).toSet
    rows.map(_.getLong(0)).toSet shouldBe nodes
    // each round floors at most (n + 1) units per node; stays within 1e-4
    val mass = rows.map(_.getLong(2)).sum
    mass should be <= Dedup.PagerankScale
    mass should be > (Dedup.PagerankScale * 9999L / 10000L)
    rows.foreach(_.getLong(2) should be > 0L)
  }
}
