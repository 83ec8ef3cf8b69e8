package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.syntax._

/** The ANN novelty gate ([[VectorSearch.scoreBatchAgainstIvf]] /
  * [[VectorSearch.gateStream]]): verdict incoming embeddings against the
  * stored IVF index, admit only novel ones, and LEARN — a later batch
  * re-submitting an earlier batch's novel embedding is flagged against
  * it. Crafted 64-dim fixture: basis vectors are mutually orthogonal
  * (cos 0), dense ±1/8 patterns have |cos| ≤ 0.125 against every basis
  * vector and each other — all far below the 0.3 near-dup threshold —
  * while identical copies hit cos 1. The verdict math at fixture scale
  * is oracle-gated (`q_sim_gate`); this spec pins the operator API and
  * the streaming lifecycle. */
class VectorGateSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val Dim = 64

  private def basis(i: Int): Seq[Float] =
    Seq.tabulate(Dim)(j => if (j == i) 1.0f else 0.0f)

  /** Dense ±1/8 pattern from a sign mask: unit norm, cos ≤ 1/8 against
    * any basis vector; two patterns with half their signs differing are
    * orthogonal. */
  private def pattern(signs: Int => Boolean): Seq[Float] =
    Seq.tabulate(Dim)(j => if (signs(j)) 0.125f else -0.125f)

  private val pC = pattern(j => j % 2 == 0)
  private val pD = pattern(j => j % 4 < 2)
  private val pE = pattern(j => j % 8 < 4)

  private def df(rows: (Long, Seq[Float])*) = {
    val sess = spark
    import sess.implicits.{localSeqToDatasetHolder, newProductEncoder}
    rows.toDF("vec_id", "embedding")
  }

  private def baseRows: Seq[(Long, Seq[Float])] =
    (0 until 32).map(i => (i + 1).toLong -> basis(i))

  private lazy val baseIndexDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("vgate-base").toString
    VectorSearch.buildIvfIndex(df(baseRows: _*), "vec_id", "embedding", tmp)
    tmp
  }

  test("batch verdicts: stored dup, novel, and the within-batch min-id survivor rule") {
    val batch = df(110L -> basis(0), 111L -> pC, 112L -> pD, 113L -> pD)
    val out = VectorSearch
      .scoreBatchAgainstIvf(batch, "vec_id", "embedding", baseIndexDir)
      .orderBy($"vec_id").collect()
    out.map(_.getLong(0)) shouldBe Array(110L, 111L, 112L, 113L)
    // 110 ≡ stored basis(0) (vec_id 1): dup, cos 1
    out(0).getBoolean(4) shouldBe false
    out(0).getLong(2) shouldBe 1L
    out(0).getLong(3) shouldBe 10000L
    // 111: novel (pattern far from every basis vector)
    out(1).getBoolean(4) shouldBe true
    out(1).isNullAt(2) shouldBe true
    // 112 ≡ 113: min-id 112 survives, 113 defers
    out(2).getBoolean(4) shouldBe true
    out(3).getBoolean(4) shouldBe false
    out(3).getLong(2) shouldBe 112L
    // scoring mutated nothing
    VectorSearch.fromIvfIndex(spark, baseIndexDir)
      .vectors.count() shouldBe 32L
  }

  test("partial ingestion refuses loudly: a batch id already stored never re-scores") {
    // The crash window between a gate's appendToIvfIndex and its commit
    // marker: redelivery must TRIP on the membership check (the crashed
    // append's copies of the batch's other vectors would otherwise count
    // as stored matches with no smaller-id mate rule — silently flipped
    // verdicts), mirroring the dedup gate's signature-keyed refusal.
    val dir = java.nio.file.Files.createTempDirectory("vgate-crash").toString
    VectorSearch.buildIvfIndex(df(baseRows: _*), "vec_id", "embedding", dir)
    val batch = df(210L -> pC, 211L -> pD)
    // simulate the crashed predecessor: the append landed, no marker
    VectorSearch.appendToIvfIndex(batch, "vec_id", "embedding", dir)
    val e = the[IllegalArgumentException] thrownBy
      VectorSearch.scoreBatchAgainstIvf(batch, "vec_id", "embedding", dir)
    e.getMessage should include("partially ingested")
    // a clean batch against the same index still scores (the check is
    // per-batch membership, not a poisoned-dir latch)
    VectorSearch.scoreBatchAgainstIvf(
      df(220L -> pE), "vec_id", "embedding", dir).count() shouldBe 1L
  }

  test("gateStream: novel-only appends against the stored quantizer; the gate learns") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val sess = spark
    import sess.implicits.newProductEncoder
    val idxDir = java.nio.file.Files.createTempDirectory("vgate-idx").toString
    val verdictDir = java.nio.file.Files.createTempDirectory("vgate-verdicts").toString
    val ck = java.nio.file.Files.createTempDirectory("vgate-ck").toString
    VectorSearch.buildIvfIndex(df(baseRows: _*), "vec_id", "embedding", idxDir)

    val stream = MemoryStream[(Long, Seq[Float])](spark)
    val q = VectorSearch.gateStream(
      stream.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      idxDir, verdictDir, ck, trigger = Trigger.ProcessingTime(0))
    try {
      stream.addData(Seq(110L -> basis(0), 111L -> pC, 112L -> pD, 113L -> pD))
      q.processAllAvailable()
      // 120 re-submits batch 1's NOVEL embedding pC — flagged against 111
      stream.addData(Seq(120L -> pC, 121L -> pE))
      q.processAllAvailable()
    } finally q.stop()

    CorpusDedup.refreshIndex(spark, idxDir)

    val v = spark.read.parquet(verdictDir)
      .orderBy($"vec_id")
      .select($"vec_id", $"first_match", $"is_novel",
        $"batch_id".cast("long").as("batch_id"))
      .collect()
    v.map(_.getLong(0)) shouldBe Array(110L, 111L, 112L, 113L, 120L, 121L)
    v.map(_.getBoolean(2)) shouldBe Array(false, true, true, false, false, true)
    v(3).getLong(1) shouldBe 112L
    v(4).getLong(1) shouldBe 111L // learned
    v.map(_.getLong(3)) shouldBe Array(0L, 0L, 0L, 0L, 1L, 1L)

    // index grew by exactly the novel vectors
    spark.read.parquet(s"$idxDir/vectors").select($"vec_id")
      .collect().map(_.getLong(0)).sorted.takeRight(3) shouldBe
      Array(111L, 112L, 121L)
    // per-(kind, checkpoint) watermark — see DedupGateSpec's twin assert
    CorpusDedup.lastIngestedBatch(
      spark, idxDir, CorpusDedup.commitMarker("gate", ck)) shouldBe 1L
    CorpusDedup.lastIngestedBatch(spark, idxDir) shouldBe -1L
  }
}
