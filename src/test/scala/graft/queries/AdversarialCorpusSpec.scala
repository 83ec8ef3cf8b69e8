package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.syntax._

/** Worst-case generated corpus for the dedup family's skew defenses (the
  * round-7 verdict's item 8): a boilerplate sentence shared by 90% of the
  * corpus, one mega-cluster of near-identical documents larger than every
  * cap, one genuine cluster under the caps, and clean unique documents.
  * Written as a fixture-shaped `documents.parquet` so the REAL registry
  * queries run against it unchanged.
  *
  * What each defense must deliver here:
  *  - the shingle DF cap ([[Dedup.MaxShingleDf]]) removes boilerplate and
  *    mega-cluster shingles from the jaccard/ppjoin path, so no pair is
  *    nominated on shared boilerplate alone;
  *  - the band-bucket cap ([[Dedup.MaxBandBucket]]) bounds the LSH band
  *    self-join: boilerplate drags ~1/3 of the corpus onto shared minhash
  *    minima (mega band-buckets), and without the cap the bucket join is
  *    quadratic in bucket size; hot buckets fall back to a LINEAR star of
  *    candidates around the bucket representative, so an above-cap
  *    template family still collapses instead of silently surviving;
  *  - the under-cap cluster must still be found by BOTH generators — the
  *    caps may only linearize what is boilerplate-degenerate, never make
  *    a duplicate family invisible to the clustering deliverables.
  *
  * Runtime budgets are deliberately loose (the queries take seconds; the
  * uncapped failure mode is orders of magnitude more work) — the sharp
  * assertions are the candidate-volume and per-doc-degree bounds, which
  * fail on ANY quadratic regression regardless of machine speed.
  */
class AdversarialCorpusSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val BudgetSec = 150.0

  /** LSH in-degree bound: a doc appears as the pair's `db` at most
    * (cap−1) times per band from cold buckets (all-pairs with smaller
    * ids) and ONCE per band from a hot bucket (the star edge from the
    * bucket representative) — so ≤ (cap−1)·bands total. Out-degree of a
    * hot-bucket representative is deliberately unbounded by the cap
    * (linear in bucket size — that is the star fallback), so the sharp
    * quadratic-regression tripwire is the in-degree. */
  private val MaxLshInDegree =
    (Dedup.MaxBandBucket - 1) * (graft.functions.TextHash.MinhashK / graft.functions.TextHash.BandRows)

  private val nSkew = 4500
  private val megaIds = 9000L until 9300L   // 300 near-identical docs (> both caps)
  private val smallIds = 8000L until 8040L  // 40 near-identical docs (under both caps)

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_adv").toString
    val sqlCtx = spark
    import sqlCtx.implicits._
    val boiler = "this message and any attachments are confidential and " +
      "intended solely for the use of the addressee"
    def uniq(tag: String, k: Int) = (0 until k).map(j => s"$tag$j").mkString(" ")
    val skew = (0L until nSkew.toLong).map(i => (i, s"$boiler ${uniq(s"u${i}x", 8)}"))
    val megaBody = (0 until 40).map(j => s"m$j").mkString(" ")
    val mega = megaIds.map(id => (id, s"$megaBody v$id"))
    val smallBody = (0 until 30).map(j => s"s$j").mkString(" ")
    val small = smallIds.map(id => (id, s"$smallBody w$id"))
    val clean = (5000L until 5200L).map(id => (id, uniq(s"c${id}y", 20)))
    (skew ++ mega ++ small ++ clean).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("adv"))
      .withColumn("n_chars", expr("length(text)").cast("long"))
      .coalesce(4)
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def runQ(name: String) =
    timed(graft.SparkEntry.queries(name)(spark, dir).collect())

  test("LSH candidates stay bounded under boilerplate skew; under-cap cluster recovered") {
    val (pairs, sec) = runQ("q_dedup_lsh_pairs")
    sec should be < BudgetSec
    // Volume: cold buckets contribute O(n·cap) pairs, hot buckets a linear
    // star (bsz−1 each). Uncapped, the boilerplate mega-buckets alone
    // contribute millions of pairs.
    pairs.length should be < 60000
    // In-degree: a doc is nominated as `db` ≤ (cap−1) times per band cold
    // plus once per band hot — the tripwire that fails on ANY quadratic
    // regression regardless of machine speed.
    val inDeg = scala.collection.mutable.Map.empty[Long, Int].withDefaultValue(0)
    pairs.foreach { r => inDeg(r.getLong(1)) += 1 }
    inDeg.values.max.toLong should be <= MaxLshInDegree
    // Recall: the 40-doc cluster survives the cap — ≥ 90% of its C(40,2)
    // pairs nominated, and every nominated one scored as a near-dup.
    val smallPairs = pairs.filter { r =>
      smallIds.contains(r.getLong(0)) && smallIds.contains(r.getLong(1))
    }
    smallPairs.length should be >= (smallIds.size * (smallIds.size - 1) / 2 * 9 / 10)
    all(smallPairs.map(_.getAs[Long]("est_e4"))) should be >= Dedup.ClusterEdgeE4
    // The above-cap mega-cluster is NOT silently dropped: its hot buckets
    // emit star candidates around the min-id representative, so nearly
    // every member is nominated against a sibling and scored near-dup —
    // the linear-cost path that keeps template families collapsible.
    val megaDocsPaired = pairs.iterator.filter { r =>
      megaIds.contains(r.getLong(0)) && megaIds.contains(r.getLong(1)) &&
        r.getAs[Long]("est_e4") >= Dedup.ClusterEdgeE4
    }.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    megaDocsPaired.size should be >= (megaIds.size * 95 / 100)
  }

  test("mega template family collapses in the clusters + survivors deliverables") {
    // The deliverable-level guarantee behind the star fallback: a
    // near-identical family LARGER than the bucket cap must still collapse
    // to (essentially) one representative — a survivors run may not
    // silently retain every copy of a mega template.
    val (clusters, cSec) = runQ("q_dedup_clusters")
    cSec should be < BudgetSec
    val megaClusters = clusters.filter(r => megaIds.contains(r.getLong(0)))
      .groupBy(_.getLong(1)).map { case (cid, rs) => cid -> rs.length }
    megaClusters.values.max should be >= (megaIds.size * 95 / 100)
    val (surv, sSec) = runQ("q_dedup_survivors")
    sSec should be < BudgetSec
    val megaSurvivors = surv.count(r => megaIds.contains(r.getLong(0)))
    megaSurvivors.toLong should be <= (megaIds.size.toLong / 20 + 1)
  }

  test("capped jaccard path: no boilerplate-only pair, under-cap cluster found") {
    val (rows, sec) = runQ("q_dedup_ppjoin")
    sec should be < BudgetSec
    // Shared boilerplate is capped out of the shingle index, so no pair may
    // join two skew docs; the only genuine overlap is the small cluster.
    rows.foreach { r =>
      val (da, db) = (r.getLong(0), r.getLong(1))
      withClue(s"pair ($da,$db): ") {
        smallIds.contains(da) shouldBe true
        smallIds.contains(db) shouldBe true
      }
    }
    // PPJoin is the provably-complete generator at tau: EVERY pair of the
    // 40-doc cluster clears tau=0.5 (29 shared of 31 shingles) and must
    // appear, flagged is_dup.
    rows.length shouldBe smallIds.size * (smallIds.size - 1) / 2
    all(rows.map(_.getAs[Boolean]("is_dup"))) shouldBe true
  }

  test("containment audit completes and nominates nothing boilerplate-only") {
    val (rows, sec) = runQ("q_dedup_containment")
    sec should be < BudgetSec
    rows.foreach { r =>
      val (da, db) = (r.getLong(0), r.getLong(1))
      withClue(s"pair ($da,$db): ") {
        smallIds.contains(da) shouldBe true
        smallIds.contains(db) shouldBe true
      }
    }
  }

  test("graph + verification tiers complete within budget on the adversarial graph") {
    val (pr, prSec) = runQ("q_graph_pagerank")
    prSec should be < BudgetSec
    // The near-dup graph is the under-cap cluster (plus possible sporadic
    // band collisions); the clique must be present.
    pr.count(r => smallIds.contains(r.getLong(0))) shouldBe smallIds.size
    val (_, calSec) = runQ("q_dedup_calibration")
    calSec should be < BudgetSec
    val (_, subSec) = runQ("q_dedup_substr")
    subSec should be < BudgetSec
  }
}
