package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.syntax._

/** The opt-in ACT policy behind [[VectorSearch.maintainIvfIndex]]
  * (`actOnRetrain = true`): when the measured drift trigger fires, the
  * retrain EXECUTES — gated by a recall A/B on a bounded deterministic
  * probe sample (candidate quantizer recall vs current, both against the
  * same exact top-k). A candidate that would LOWER measured recall is
  * refused: the recommendation stands, the index is untouched, and the
  * refusal is on the audit ledger. Recommendation-only remains the
  * default (`AdmissionMouthSpec`/`IndexMaintenanceSpec` cover that face;
  * the `q_sim_ivf_maintain` oracle row is default-parameter and
  * unchanged). */
class IvfRetrainPolicySpec extends AnyFunSuite with Matchers with SparkSpec {

  private val Dim = graft.queries.Similarity.Dim

  private def basis(i: Int, scale: Float = 1.0f): Seq[Float] =
    Seq.tabulate(Dim)(j => if (j == i) scale else 0.0f)
  /** Family member: dominant direction b_i plus a small per-copy jitter
    * along a DISTINCT secondary basis direction — mates are near-dups
    * (cos ≈ 0.96) with no ties, cross-family cos ≈ 0. */
  private def member(i: Int, j: Int): Seq[Float] =
    Seq.tabulate(Dim)(d =>
      (if (d == i) 1.0f else 0.0f) +
        (if (d == 16 + (i + j) % 16) 0.2f else 0.0f))

  private def vecsDf(rows: (Long, Seq[Float])*) = {
    val sess = spark
    import sess.implicits.{localSeqToDatasetHolder, newProductEncoder}
    rows.toDF("vec_id", "embedding")
  }

  test("act-on-trigger: the drift trigger + actOnRetrain executes the retrain and resets the drift") {
    val dir = java.nio.file.Files.createTempDirectory("retrain-act").toString
    // 16 families x 4 members — a clusterable corpus the trainer handles
    val corpus = for (i <- 0 until 16; j <- 0 until 4)
      yield ((i * 4 + j + 1).toLong, member(i, j))
    VectorSearch.buildIvfIndex(vecsDf(corpus: _*), "vec_id", "embedding", dir)
    val centsBefore = spark.read.parquet(s"$dir/centroids")
      .collect().map(_.toSeq).toSet
    // force the trigger (impossible skew ceiling), act enabled
    val r = VectorSearch.maintainIvfIndex(spark, dir, skewCeil = 0L,
        actOnRetrain = true)
      .collect().map(x => x.getString(0) ->
        ((x.getBoolean(1), x.getLong(2), x.getLong(3)))).toMap
    r.keySet shouldBe Set("compact", "retrain", "retrain_act")
    r("retrain")._1 shouldBe true
    val (acted, recallBefore, recallAfter) = r("retrain_act")
    withClue(s"recall $recallBefore -> $recallAfter: ") { acted shouldBe true }
    recallAfter should be >= recallBefore
    // the retrain really ran: ledger carries retrain_ab AND retrain
    val events = CorpusDedup.history(spark, dir)
      .select($"event").collect().map(_.getString(0))
    events should contain("retrain_ab")
    events should contain("retrain")
    // every vector conserved, assignment complete
    spark.catalog.refreshByPath(dir)
    val idx = VectorSearch.fromIvfIndex(spark, dir)
    idx.vectors.select($"vec_id").collect().map(_.getLong(0)).sorted shouldBe
      corpus.map(_._1).sorted.toArray
    // a healthy retrained quantizer: the immediate re-run reports no
    // trigger at the DEFAULT ceiling
    VectorSearch.maintainIvfIndex(spark, dir)
      .collect().foreach(_.getBoolean(1) shouldBe false)
    // the promoted quantizer equals the deterministic trainer's output
    // over the (unchanged) stored corpus — for THIS fixture that is the
    // same centroid set the build produced, which is exactly the
    // retrain-equals-rebuild contract (the ledger above is the proof the
    // rebuild ran; on a drifted corpus the set would differ)
    val centsAfter = spark.read.parquet(s"$dir/centroids")
      .collect().map(_.toSeq).toSet
    centsAfter shouldBe centsBefore
  }

  test("refuse-on-recall-drop: a candidate quantizer that measures lower recall is refused, index untouched") {
    val dir = java.nio.file.Files.createTempDirectory("retrain-refuse").toString
    val corpus = for (i <- 0 until 16; j <- 0 until 4)
      yield ((i * 4 + j + 1).toLong, member(i, j))
    VectorSearch.buildIvfIndex(vecsDf(corpus: _*), "vec_id", "embedding", dir)
    val before = {
      spark.catalog.refreshByPath(dir)
      val idx = VectorSearch.fromIvfIndex(spark, dir)
      (idx.centroids.collect().map(_.toSeq).toSet,
        idx.vectors.collect().map(_.toSeq).toSet)
    }
    // handcrafted BAD candidate: centroids along the 16 JITTER directions
    // only — every member assigns by its jitter component, so the 4
    // mates of a family scatter across 4 different lists and an
    // nprobe-bounded probe misses most of the exact top-k (the good
    // quantizer co-assigns mates by the dominant direction). This is the
    // degenerate train a drifted/unlucky sample can produce at scale.
    val bad = Array.tabulate(16)(a =>
      Array.tabulate(Dim)(d => if (d == 16 + a) 1.0 else 0.0))
    val (acted, recallBefore, recallAfter) =
      VectorSearch.retrainIfNotWorse(spark, dir,
        recallProbes = 16, recallK = 3,
        nprobe = graft.queries.Similarity.IvfProbes,
        candCents0 = Some(bad))
    withClue(s"recall $recallBefore -> $recallAfter: ") {
      acted shouldBe false
      recallAfter should be < recallBefore
    }
    // REFUSED: artifacts untouched, refusal audited, no retrain event
    spark.catalog.refreshByPath(dir)
    val idx = VectorSearch.fromIvfIndex(spark, dir)
    idx.centroids.collect().map(_.toSeq).toSet shouldBe before._1
    idx.vectors.collect().map(_.toSeq).toSet shouldBe before._2
    val events = CorpusDedup.history(spark, dir)
      .select($"event").collect().map(_.getString(0))
    events should contain("retrain_ab")
    events should not contain "retrain"
  }

  test("stale-gate abort: an ingest landing between the recall A/B and the leased promotion aborts the act") {
    val dir = java.nio.file.Files.createTempDirectory("retrain-stale").toString
    val corpus = for (i <- 0 until 16; j <- 0 until 4)
      yield ((i * 4 + j + 1).toLong, member(i, j))
    VectorSearch.buildIvfIndex(vecsDf(corpus: _*), "vec_id", "embedding", dir)
    val centsBefore = spark.read.parquet(s"$dir/centroids")
      .collect().map(_.toSeq).toSet
    // the beforeAct seam is exactly the lease-free window the fence
    // exists for: a concurrent ingest appends vectors AFTER the A/B
    // measured recall but BEFORE the promotion takes the lease
    val (acted, recallBefore, recallAfter) =
      VectorSearch.retrainIfNotWorse(spark, dir,
        recallProbes = 16, recallK = 3,
        nprobe = graft.queries.Similarity.IvfProbes,
        beforeAct = () => {
          VectorSearch.appendToIvfIndex(
            vecsDf((1000L, member(3, 7)), (1001L, member(11, 2))),
            "vec_id", "embedding", dir)
          ()
        })
    withClue(s"recall $recallBefore -> $recallAfter: ") {
      // the gate itself PASSED (same-corpus candidate), but the act must
      // abort on the stale vector-set watermark
      acted shouldBe false
    }
    // index untouched by the retrain: centroids unchanged, the two
    // appended vectors present (the ingest won), abort audited
    spark.catalog.refreshByPath(dir)
    val idx = VectorSearch.fromIvfIndex(spark, dir)
    idx.centroids.collect().map(_.toSeq).toSet shouldBe centsBefore
    idx.vectors.select($"vec_id").collect().map(_.getLong(0)).sorted shouldBe
      (corpus.map(_._1) ++ Seq(1000L, 1001L)).sorted.toArray
    val ab = CorpusDedup.history(spark, dir)
      .filter($"event" === "retrain_ab")
      .select($"acted", $"stale_abort").collect()
    ab should have size 1
    ab.head.getLong(0) shouldBe 0L
    ab.head.getLong(1) shouldBe 1L
    val events = CorpusDedup.history(spark, dir)
      .select($"event").collect().map(_.getString(0))
    events should not contain "retrain"
  }

  test("stale-gate abort on EQUAL-COUNT mutation: an erase+append in the gate window is caught by the content mark, not just the count") {
    val dir = java.nio.file.Files.createTempDirectory("retrain-stale-eq").toString
    val corpus = for (i <- 0 until 16; j <- 0 until 4)
      yield ((i * 4 + j + 1).toLong, member(i, j))
    VectorSearch.buildIvfIndex(vecsDf(corpus: _*), "vec_id", "embedding", dir)
    val centsBefore = spark.read.parquet(s"$dir/centroids")
      .collect().map(_.toSeq).toSet
    // the round-14 fence keyed on COUNT alone and this mutation preserves
    // it: one vector erased, a different one appended — the stored SET the
    // gate measured no longer exists, but its cardinality does
    val (acted, recallBefore, recallAfter) =
      VectorSearch.retrainIfNotWorse(spark, dir,
        recallProbes = 16, recallK = 3,
        nprobe = graft.queries.Similarity.IvfProbes,
        beforeAct = () => {
          val sess = spark
          import sess.implicits.{localSeqToDatasetHolder, newLongEncoder}
          VectorSearch.removeFromIvfIndex(spark, dir,
            Seq(1L).toDF("vec_id"))
          VectorSearch.appendToIvfIndex(
            vecsDf((2000L, member(5, 1))), "vec_id", "embedding", dir)
          ()
        })
    withClue(s"recall $recallBefore -> $recallAfter: ") {
      acted shouldBe false
    }
    // index untouched by the retrain: centroids unchanged, the mutation's
    // own effect present (id 1 gone, 2000 in), abort audited
    spark.catalog.refreshByPath(dir)
    val idx = VectorSearch.fromIvfIndex(spark, dir)
    idx.centroids.collect().map(_.toSeq).toSet shouldBe centsBefore
    val ids = idx.vectors.select($"vec_id").collect().map(_.getLong(0)).sorted
    ids should have length corpus.length.toLong
    ids should contain(2000L)
    ids should not contain 1L
    val ab = CorpusDedup.history(spark, dir)
      .filter($"event" === "retrain_ab")
      .select($"acted", $"stale_abort").collect()
    ab should have size 1
    ab.head.getLong(0) shouldBe 0L
    ab.head.getLong(1) shouldBe 1L
    val events = CorpusDedup.history(spark, dir)
      .select($"event").collect().map(_.getString(0))
    events should not contain "retrain"
  }
}
