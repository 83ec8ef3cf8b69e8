package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.syntax._

/** The √n-scaled quantizer (round 14 — the operational fix for the
  * measured ann_gate decade growth, SCALE.md §5): above
  * [[graft.queries.Similarity.LiteralCentroidMax]] centroids the
  * assignment/probe math dispatches from plan-literal expressions to a
  * broadcast join against the (cid, c) centroid frame. This spec pins
  *
  *  1. VALUE equivalence of the join path against a driver brute force
  *     (same (distance, cid) tie-break as the literal path's
  *     `array_sort`), for assignment, probe-cid selection, and the
  *     membership-check frame;
  *  2. the end-to-end scaled retrain: `retrainIvfIndexScaled` on a
  *     corpus big enough that k = ⌈√n⌉ > LiteralCentroidMax promotes a
  *     k-sized quantizer under the recall gate, conserves every vec_id,
  *     reports healthy stats (n_misassigned = 0 through the join-path
  *     reassignment), and the gate/score path still works against the
  *     large-k index.
  */
class ScaledQuantizerSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val Dim = 8

  /** Deterministic pseudo-random corpus: `nClusters` well-separated
    * cluster centers on coordinate axes scaled by (1 + cluster/10), each
    * with `per` members jittered in a distinct secondary coordinate.
    * `dim` = 8 for the brute-force equivalence test; the e2e retrain test
    * uses [[graft.queries.Similarity.Dim]] because `buildIvfIndex`'s
    * historical trainer pins that dimensionality. */
  private def corpus(nClusters: Int, per: Int, dim: Int = Dim)
      : Seq[(Long, Seq[Double])] =
    for (c <- 0 until nClusters; j <- 0 until per) yield {
      val v = Array.fill(dim)(0.0)
      v(c % dim) = 1.0 + (c / dim) * 0.35
      v((c + 1 + j % (dim - 1)) % dim) += 0.04 * ((j % 5) + 1)
      ((c.toLong * per + j + 1), v.toSeq)
    }

  private def vecsDf(rows: Seq[(Long, Seq[Double])]) = {
    val sess = spark
    import sess.implicits.{localSeqToDatasetHolder, newProductEncoder}
    rows.toDF("vec_id", "v")
  }

  private def bruteNearest(
      v: Seq[Double], cents: Array[Array[Double]]): Int =
    cents.zipWithIndex.map { case (c, i) =>
      (v.zip(c).map { case (a, b) => val d = a - b; d * d }.sum, i)
    }.min._2

  test("join-path assignment and probe selection match the driver brute force above the literal ceiling") {
    val S = graft.queries.Similarity
    val rows = corpus(20, 12) // 240 vectors
    val base = vecsDf(rows)
    val k = S.LiteralCentroidMax + 6 // forces the join path
    val cents = S.trainCentroidsK(S.trainSampleK(base, k), k)
    cents.length shouldBe k

    // 1. assignment: (vec_id -> cid) equals brute-force argmin with
    //    (d, cid) tie-break
    val assigned = S.assignedOf(base, cents)
      .select($"vec_id", $"cid", $"nrm")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    rows.foreach { case (id, v) =>
      val exp = bruteNearest(v, cents)
      withClue(s"vec $id: ") { assigned(id)._1 shouldBe exp }
      assigned(id)._2 shouldBe
        math.sqrt(v.map(x => x * x).sum) +- 1e-12
    }
    // nearestCidFrame agrees with assignedOf
    val near = S.nearestCidFrame(base, cents)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    near shouldBe assigned.view.mapValues(_._1).toMap

    // 2. probe selection + top-k: probeAssigned over the assigned corpus
    //    equals a driver brute force over the nprobe nearest lists
    val queries = vecsDf(rows.take(7))
    val nprobe = 4
    val got = S.probeAssigned(S.assignedOf(base, cents), queries,
        cents, nprobe, 3)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1))
        .map(r => (r.getLong(2), r.getLong(3))).toSeq).toMap
    rows.take(7).foreach { case (qid, qv) =>
      val probeCids = cents.zipWithIndex.map { case (c, i) =>
        (qv.zip(c).map { case (a, b) => val d = a - b; d * d }.sum, i)
      }.sorted.take(nprobe).map(_._2).toSet
      val qn = math.sqrt(qv.map(x => x * x).sum)
      val cand = rows.filter { case (id, v) =>
        id != qid && probeCids.contains(bruteNearest(v, cents))
      }.map { case (id, v) =>
        val nn = math.sqrt(v.map(x => x * x).sum)
        val cos = qv.zip(v).map { case (a, b) => a * b }.sum / (qn * nn)
        (id, math.floor(cos * 10000L).toLong)
      }
      // TopPairsAggregator keeps max cos_e4, ties by smaller id
      val exp = cand.sortBy { case (id, c) => (-c, id) }.take(3)
      withClue(s"query $qid: ") { got(qid) shouldBe exp }
    }
  }

  test("retrainIvfIndexScaled: the strict top-k gate refuses coverage loss; the threshold gate (the novelty-gate semantic) acts") {
    val S = graft.queries.Similarity
    val rows = corpus(500, 10, graft.queries.Similarity.Dim)
    // 5,000 vectors -> k = ceil(sqrt(5000)) = 71 > the 64 literal ceiling
    val dir = java.nio.file.Files.createTempDirectory("scaled-retrain").toString
    val sess = spark
    import sess.implicits.{localSeqToDatasetHolder, newProductEncoder}
    VectorSearch.buildIvfIndex(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding", dir)
    spark.read.parquet(s"$dir/centroids").count() shouldBe S.IvfClusters.toLong

    // STRICT gate: probing nprobe of 71 lists covers 4/71 of the corpus
    // where the k=16 index covered 4/16 — generic top-10 recall DROPS and
    // the gate must refuse, leaving the index untouched
    val (refused, rb0, ra0) = VectorSearch.retrainIvfIndexScaled(spark, dir)
    withClue(s"strict gate recall $rb0 -> $ra0: ") {
      refused shouldBe false
      ra0 should be < rb0
    }
    spark.catalog.refreshByPath(dir)
    spark.read.parquet(s"$dir/centroids").count() shouldBe S.IvfClusters.toLong

    // co-scaling is NOT a rubber stamp: this fixture's same-axis scale
    // shells are cosine-near but L2-FAR, so probing ⌈4·√(71/16)⌉ = 9 of
    // 71 lists still misses them (measured: recall flat at 78 until
    // nprobe ≈ 24, past coverage parity) — the strict gate keeps refusing
    // the co-scaled candidate too, and the index stays untouched
    val (actedCo, rbCo, raCo) = VectorSearch.retrainIvfIndexScaled(spark, dir,
      coScaleNprobe = true)
    withClue(s"co-scaled strict gate recall $rbCo -> $raCo: ") {
      actedCo shouldBe false
      raCo should be < rbCo
    }
    spark.catalog.refreshByPath(dir)
    spark.read.parquet(s"$dir/centroids").count() shouldBe S.IvfClusters.toLong

    // THRESHOLD gate (the ANN novelty tier's semantic): a probe query's
    // near-dup mates share its dominant direction, so they co-assign at
    // ANY quantizer size — threshold-match recall holds and the act runs
    val (acted, rb, ra) = VectorSearch.retrainIvfIndexScaled(spark, dir,
      gateTauE4 = Some(9000L))
    withClue(s"threshold gate recall $rb -> $ra: ") { acted shouldBe true }
    ra should be >= rb

    spark.catalog.refreshByPath(dir)
    val idx = VectorSearch.fromIvfIndex(spark, dir)
    idx.centroids.count() shouldBe VectorSearch.scaledK(5000L).toLong
    VectorSearch.scaledK(5000L) should be > S.LiteralCentroidMax
    // every vector conserved
    idx.vectors.select($"vec_id").collect().map(_.getLong(0)).sorted shouldBe
      rows.map(_._1).sorted.toArray
    // stats through the join-path reassignment: nothing misassigned, the
    // scaled quantizer partitions strictly better than the 1-mean
    val st = VectorSearch.ivfStats(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    st("n_misassigned") shouldBe 0L
    st("n_vectors") shouldBe 5000L
    st("within_sse_e6") should be < st("global_sse_e6")
    // the gate path works against the large-k index: fresh ids score
    // without refusal, known-dup directions verdict as matches
    val probe = rows.take(50)
      .map { case (id, v) => (id + 1000000L, v) }.toDF("vec_id", "embedding")
    val scored = VectorSearch.scoreBatchAgainstIvf(
      probe, "vec_id", "embedding", dir)
    scored.count() shouldBe 50L
    // each probe duplicates a stored vector exactly -> cos 1.0 matches
    scored.filter($"is_novel" === false).count() shouldBe 50L
  }

  /** Unit-norm angular-cluster corpus — the NORMALIZED-embedding workload
    * (cosine order == L2 order), with jitter heavy enough (ε = 0.9) that
    * a fine quantizer splits clusters across cell boundaries. Measured
    * strict-gate landscape (32 probes, top-10): stale k=16/nprobe=4
    * recall 68; √n candidate k=71 at FIXED nprobe=4 → 55 (refused); at
    * co-scaled nprobe=9 → 72 (accepted). Contrast with [[corpus]], whose
    * same-axis scale shells are cosine-near but L2-far — there recall
    * stays at 78 until nprobe ≈ 24 (past coverage parity), so the gate
    * keeps refusing even a co-scaled candidate: co-scaling is a measured
    * adoption path, not a rubber stamp. */
  private def normalizedCorpus(
      nClusters: Int, per: Int, eps: Double): Seq[(Long, Seq[Double])] = {
    val dim = graft.queries.Similarity.Dim
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    def unit(seed: Long): Array[Double] = {
      val v = Array.tabulate(dim)(i =>
        mix(seed * 131 + i).toDouble / Long.MaxValue)
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    for (c <- 0 until nClusters; j <- 0 until per) yield {
      val raw = unit(c.toLong).zip(unit(c.toLong * 100003 + j + 1))
        .map { case (a, b) => a + eps * b }
      val n = math.sqrt(raw.map(x => x * x).sum)
      ((c.toLong * per + j + 1), raw.map(_ / n).toSeq)
    }
  }

  test("co-scaled nprobe: the STRICT top-k gate refuses the √n candidate at fixed nprobe but accepts at nprobe' = ⌈nprobe·√(k'/k)⌉, probed rows still ~√(k'/k) smaller") {
    val S = graft.queries.Similarity
    val rows = normalizedCorpus(200, 25, 0.9) // 5,000 unit vectors
    val dir = java.nio.file.Files.createTempDirectory("coscaled-retrain").toString
    val sess = spark
    import sess.implicits.{localSeqToDatasetHolder, newProductEncoder}
    VectorSearch.buildIvfIndex(
      rows.toDF("vec_id", "embedding"), "vec_id", "embedding", dir)

    // driver-side probed-rows audit: Σ over the 32 gate queries of the
    // sizes of their nprobe nearest lists — the candidate-join input the
    // co-scaling claim is about
    def probedRows(nprobe: Int): Long = {
      val idx = VectorSearch.fromIvfIndex(spark, dir)
      val cents = idx.centroidArray
      val sizes = idx.vectors.groupBy($"cid").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val qs = idx.vectors.select($"vec_id", $"v")
        .orderBy($"vec_id").limit(32)
        .collect().map(_.getSeq[Double](1))
      qs.map { q =>
        cents.zipWithIndex.map { case (c, i) =>
          (q.zip(c).map { case (a, b) => val d = a - b; d * d }.sum, i)
        }.sorted.take(nprobe).map(p => sizes.getOrElse(p._2, 0L)).sum
      }.sum
    }
    val probedBefore = probedRows(S.IvfProbes)

    // FIXED nprobe first: probing 4 of 71 lists on a boundary-split
    // corpus drops generic recall below the stale quantizer's — refused
    val (actedFixed, rbF, raF) = VectorSearch.retrainIvfIndexScaled(spark, dir)
    withClue(s"fixed-nprobe strict gate recall $rbF -> $raF: ") {
      actedFixed shouldBe false
      raF should be < rbF
    }

    // the SAME strict gate ACCEPTS once the candidate is measured at the
    // coverage-compensating width
    val (acted, rb, ra) = VectorSearch.retrainIvfIndexScaled(spark, dir,
      coScaleNprobe = true)
    withClue(s"co-scaled strict gate recall $rb -> $ra: ") {
      acted shouldBe true
      ra should be >= rb
    }
    spark.catalog.refreshByPath(dir)
    val kAfter = spark.read.parquet(s"$dir/centroids").count()
    kAfter shouldBe VectorSearch.scaledK(5000L).toLong
    val nprobeAfter = VectorSearch.coScaledNprobeFor(
      S.IvfProbes, S.IvfClusters.toLong, kAfter)
    // the adopted width is on the audit ledger next to the A/B verdict
    // (only the co-scaled row carries the nprobe fields; the fixed-nprobe
    // refusal row keeps the round-14 shape, so they read as null there)
    val ab = CorpusDedup.history(spark, dir)
      .filter($"event" === "retrain_ab" && $"acted" === 1L)
      .select($"nprobe_before", $"nprobe_after").collect()
    ab should have size 1
    ab.head.getLong(0) shouldBe S.IvfProbes.toLong
    ab.head.getLong(1) shouldBe nprobeAfter.toLong

    // probed rows after adoption: reduced, but by ~√(k'/k) — NOT the
    // k'/k a fixed-nprobe adoption would claim (that width was refused)
    val probedAfter = probedRows(nprobeAfter)
    val reduction = probedBefore.toDouble / probedAfter
    val kRatio = kAfter.toDouble / S.IvfClusters
    withClue(s"probed $probedBefore -> $probedAfter (x$reduction), k ratio $kRatio: ") {
      reduction should be > 1.4
      reduction should be < kRatio // honest: the √ win, not the full k'/k
    }
  }

  test("q_sim_ivf_scaled runs the broadcast (cid,c) join plan, not the literal path") {
    val S = graft.queries.Similarity
    val dir = "/root/testdata/sf0.001"
    val scaled = S.ivfScaledRaw(spark, dir)
    val plan = scaled.queryExecution.executedPlan.toString
    // the join-path signature: the centroid frame broadcast under the
    // cross join that feeds the argmin / probe-cid selection
    withClue(plan.linesIterator.take(40).mkString("\n")) {
      plan should include("BroadcastNestedLoopJoin")
    }
    // the k=16 registry query keeps the literal plan (no centroid join)
    val literal = S.ivfRaw(spark, dir)
    (literal.queryExecution.executedPlan.toString
      should not include "BroadcastNestedLoopJoin")
    // and the scaled face returns verdict-true rows at this fixture
    val out = S.qSimIvfScaled(spark, dir)
    out.filter($"recall_ok" === false).count() shouldBe 0L
    out.count() should be > 0L
  }
}
