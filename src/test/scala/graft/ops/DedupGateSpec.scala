package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.syntax._

/** The dedup gate ([[CorpusDedup.scoreBatchAgainstIndex]] /
  * [[CorpusDedup.gateStream]]): verdict incoming documents against the
  * stored corpus index, admit only novel ones — and LEARN: a later batch
  * duplicating an earlier batch's novel doc is flagged, because the gate
  * appended that doc when it passed. The verdict math itself is
  * oracle-gated (`q_dedup_gate`); this spec pins the operator API, the
  * within-batch min-id survivor rule, and the streaming learn/append/
  * idempotence lifecycle the oracle can't express (order-dependent). */
class DedupGateSpec extends AnyFunSuite with Matchers with SparkSpec {

  // Distinct 21-word templates: identical text ⇒ est 10000 (certain dup
  // candidate through every band); different templates share no shingles.
  private val tA = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
    "lambda mu nu xi omicron pi rho sigma tau upsilon phi"
  private val tC = "red orange yellow green blue indigo violet crimson teal " +
    "amber coral jade ivory onyx pearl ruby topaz garnet opal quartz slate"
  private val tD = "north south east west summit valley river delta canyon " +
    "mesa tundra prairie fjord atoll lagoon reef dune crag moor heath glen"
  private val tE = "oak elm ash birch cedar maple willow poplar spruce fir " +
    "pine yew hazel alder rowan beech hornbeam larch juniper cypress holly"
  private val tB = "zero one two three four five six seven eight nine ten " +
    "eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen " +
    "nineteen twenty"

  private def df(rows: (Long, String)*) = {
    val sess = spark
    import sess.implicits._
    rows.toDF("doc_id", "text")
  }

  private lazy val baseIndexDir: String = {
    val tmp = java.nio.file.Files.createTempDirectory("gate-base").toString
    CorpusDedup.buildIndex(df(1L -> tA, 2L -> tB), "doc_id", "text", tmp)
    tmp
  }

  test("batch verdicts: stored dup, novel, and the within-batch min-id survivor rule") {
    val batch = df(10L -> tA, 11L -> tC, 12L -> tD, 13L -> tD)
    val out = CorpusDedup
      .scoreBatchAgainstIndex(batch, "doc_id", "text", baseIndexDir)
      .orderBy($"doc_id").collect()
    out.map(_.getLong(0)) shouldBe Array(10L, 11L, 12L, 13L)
    // 10 ≡ stored 1: dup of the canonical corpus
    out(0).getBoolean(4) shouldBe false
    out(0).getLong(2) shouldBe 1L // first_match
    out(0).getLong(3) shouldBe 10000L // best_est_e4
    // 11: novel (nulls on the match columns)
    out(1).getBoolean(4) shouldBe true
    out(1).isNullAt(2) shouldBe true
    // 12 ≡ 13 within the batch: min-id 12 survives, 13 defers to it
    out(2).getBoolean(4) shouldBe true
    out(3).getBoolean(4) shouldBe false
    out(3).getLong(2) shouldBe 12L
    // scoring mutated nothing: the stored index still has exactly 2 docs
    CorpusDedup.fromIndex(spark, baseIndexDir)
      .signatures.count() shouldBe 2L
  }

  test("a doc too short to shingle still gets its verdict row (trivially novel)") {
    val out = CorpusDedup
      .scoreBatchAgainstIndex(df(30L -> "tiny", 31L -> tA),
        "doc_id", "text", baseIndexDir)
      .orderBy($"doc_id").collect()
    out.map(_.getLong(0)) shouldBe Array(30L, 31L)
    out(0).getBoolean(4) shouldBe true
    out(1).getBoolean(4) shouldBe false
  }

  test("gateStream: verdicts per batch, novel-only appends, and the gate LEARNS") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val sess = spark
    import sess.implicits.newProductEncoder
    val idxDir = java.nio.file.Files.createTempDirectory("gate-idx").toString
    val verdictDir = java.nio.file.Files.createTempDirectory("gate-verdicts").toString
    val ck = java.nio.file.Files.createTempDirectory("gate-ck").toString
    CorpusDedup.buildIndex(df(1L -> tA, 2L -> tB), "doc_id", "text", idxDir)

    val stream = MemoryStream[(Long, String)](spark)
    val q = CorpusDedup.gateStream(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      idxDir, verdictDir, ck, trigger = Trigger.ProcessingTime(0))
    try {
      stream.addData(Seq(10L -> tA, 11L -> tC, 12L -> tD, 13L -> tD))
      q.processAllAvailable()
      // batch 2: 20 duplicates batch 1's NOVEL doc 11 — the gate must
      // have appended 11, so 20 is flagged against it; 21 is novel
      stream.addData(Seq(20L -> tC, 21L -> tE))
      q.processAllAvailable()
    } finally q.stop()

    // the appends ran in the stream's cloned sessions: refresh this
    // session's cached table relations (REFRESH TABLE contract)
    CorpusDedup.refreshIndex(spark, idxDir)

    val v = spark.read.parquet(verdictDir)
      .orderBy($"doc_id")
      .select($"doc_id", $"first_match", $"is_novel",
        $"batch_id".cast("long").as("batch_id"))
      .collect()
    v.map(_.getLong(0)) shouldBe Array(10L, 11L, 12L, 13L, 20L, 21L)
    v.map(_.getBoolean(2)) shouldBe Array(false, true, true, false, false, true)
    v(0).getLong(1) shouldBe 1L
    v(3).getLong(1) shouldBe 12L
    v(4).getLong(1) shouldBe 11L // learned: 11 entered the corpus in batch 1
    v.map(_.getLong(3)) shouldBe Array(0L, 0L, 0L, 0L, 1L, 1L)

    // index grew by exactly the novel docs
    CorpusDedup.fromIndex(spark, idxDir).signatures
      .select($"doc_id").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 2L, 11L, 12L, 21L)

    // watermark advanced: redelivering the last batch id is a no-op.
    // The gate's watermark is keyed by (kind, checkpoint) — a shared
    // marker would let an ingest stream's high-water mark mask a fresh
    // gate checkpoint's restarted batch ids (and vice versa).
    CorpusDedup.lastIngestedBatch(
      spark, idxDir, CorpusDedup.commitMarker("gate", ck)) shouldBe 1L
    CorpusDedup.lastIngestedBatch(spark, idxDir) shouldBe -1L

    // FUSED-append bit-identity on EVERY artifact: the gate-grown index
    // (base + two drained batches of novel-only appends, statistics
    // deferred per batch then restated once) must equal the ONE-SHOT
    // build over base ∪ survivors — edges included, which pins the
    // fused path's derivation (the scoring pass's candidate rows
    // filtered to stored-or-novel endpoints) against the from-scratch
    // generator. A dropped cross-batch pair (batch-2's 20 vs stored 11
    // exercises the learned side), a leaked dup-endpoint edge (13, 20
    // were refused), or a double-appended artifact all fail here.
    CorpusDedup.restateIndexStats(spark, idxDir)
    val refDir = java.nio.file.Files.createTempDirectory("gate-ref").toString
    val ref = CorpusDedup.buildIndex(
      df(1L -> tA, 2L -> tB, 11L -> tC, 12L -> tD, 21L -> tE),
      "doc_id", "text", refDir)
    val grown = CorpusDedup.fromIndex(spark, idxDir)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    rows(grown.postings) shouldBe rows(ref.postings)
    rows(grown.signatures) shouldBe rows(ref.signatures)
    rows(grown.bands) shouldBe rows(ref.bands)
    rows(grown.edges) shouldBe rows(ref.edges)
    rows(grown.capped) shouldBe rows(ref.capped)
    rows(grown.prefix) shouldBe rows(ref.prefix)
  }
}
