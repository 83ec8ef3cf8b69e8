package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.syntax._

/** The composed crawl mouth ([[CrawlMouth.admissionStream]] /
  * [[CrawlMouth.admitBatch]]): quality → language → dedup gate → ANN
  * novelty in one micro-batch pass across BOTH index families. The
  * verdict math of each stage is oracle-gated on its own
  * (`q_pipeline_admit` for the composed batch face, `q_dedup_gate` /
  * `q_sim_gate` for the gates); this spec pins the streaming lifecycle
  * the oracle can't express: per-tier LEARNING across batches, the
  * tier-memoization semantics (a semantically-rejected doc still teaches
  * the cheaper TEXT index, so its future text-duplicates are refused
  * before paying the ANN probe), exactly-once across the TWO index
  * commits (a crash between them redelivers cleanly, stage-1 verdicts
  * read back from disk rather than re-scored against the mutated index),
  * and full-replay idempotence.
  *
  * Crafted fixture: 21-word templates each carrying the 'the' marker
  * (quality- and language-passing) with disjoint shingle spaces;
  * VectorGateSpec's 64-dim basis/±1/8-pattern vectors (orthogonal
  * families, far below the 0.3 near-dup threshold; copies hit cos 1). */
class AdmissionMouthSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val Dim = 64
  private def basis(i: Int): Seq[Float] =
    Seq.tabulate(Dim)(j => if (j == i) 1.0f else 0.0f)
  private def pattern(signs: Int => Boolean): Seq[Float] =
    Seq.tabulate(Dim)(j => if (signs(j)) 0.125f else -0.125f)
  private val pC = pattern(j => j % 2 == 0)
  private val pD = pattern(j => j % 4 < 2)

  // Each template: the 'the' marker (language-passing, 'en') + 20 words
  // from a vocabulary DISJOINT from every other template — the only
  // shared word is the leading 'the', whose 3-gram shingles still differ
  // (the following words differ), so templates share ZERO shingles and
  // only identical copies are near-dups.
  private val tA = "the alpha beta gamma delta epsilon zeta eta theta " +
    "iota kappa lambda mu nu xi omicron pi rho sigma tau phi"
  private val tB = "the zero one two three four five six seven eight " +
    "nine ten eleven twelve thirteen fourteen fifteen sixteen seventeen " +
    "eighteen nineteen"
  private val tC = "the red orange yellow green blue indigo violet " +
    "crimson teal amber coral jade ivory onyx pearl ruby topaz garnet " +
    "opal quartz"
  private val tD = "the north south east west summit valley river basin " +
    "canyon mesa tundra prairie fjord atoll lagoon reef dune crag moor " +
    "heath"
  private val tE = "the oak elm ash birch cedar maple willow poplar " +
    "spruce fir pine yew hazel alder rowan beech hornbeam larch juniper " +
    "cypress"
  private val tF = "the lion tiger bear wolf fox otter lynx seal hawk " +
    "crow owl deer moose bison hare mole bat toad newt crab"
  private val tG = "the iron copper zinc tin gold silver nickel cobalt " +
    "chrome brass bronze steel pewter mercury platinum titanium sodium " +
    "lithium neon argon"
  // >=20 tokens, no language marker anywhere -> pred 'und', lang gate fails
  private val tNoLang = "zero uno dos tres quattro cinque sechs sieben " +
    "acht neuf dix once doce trece bir iki uc dort bes alti yedi"

  private def docsDf(rows: (Long, String, Option[Seq[Float]])*) = {
    val sess = spark
    import sess.implicits.{localSeqToDatasetHolder, newProductEncoder}
    rows.toDF("doc_id", "text", "embedding")
  }
  private def plainDf(rows: (Long, String)*) = {
    val sess = spark
    import sess.implicits.{localSeqToDatasetHolder, newProductEncoder}
    rows.toDF("doc_id", "text")
  }
  private def vecsDf(rows: (Long, Seq[Float])*) = {
    val sess = spark
    import sess.implicits.{localSeqToDatasetHolder, newProductEncoder}
    rows.toDF("vec_id", "embedding")
  }

  /** Fresh base pair: dedup index over docs {1:tA, 2:tB}, IVF over the
    * 32 basis vectors (ids 301..332 — disjoint from doc ids). */
  private def freshBases(): (String, String) = {
    val dd = java.nio.file.Files.createTempDirectory("mouth-dedup").toString
    CorpusDedup.buildIndex(plainDf(1L -> tA, 2L -> tB), "doc_id", "text", dd)
    val vd = java.nio.file.Files.createTempDirectory("mouth-ivf").toString
    VectorSearch.buildIvfIndex(
      vecsDf((0 until 32).map(i => (301L + i) -> basis(i)): _*),
      "vec_id", "embedding", vd)
    (dd, vd)
  }

  private val batch1 = Seq[(Long, String, Option[Seq[Float]])](
    (10L, tA, Some(pC)), // text-dup of stored 1: rejected at dedup
    (11L, tC, Some(basis(0))), // text-novel, sem-dup of stored 301
    (12L, tD, Some(pC)), // novel both ways: ADMITTED
    (13L, "tiny doc.", Some(pD)), // quality fail (3 tokens)
    (14L, tNoLang, Some(pD))) // language fail
  private val batch2 = Seq[(Long, String, Option[Seq[Float]])](
    (20L, tD, Some(pD)), // text-dup of batch-1's ADMITTED 12: learned
    (21L, tE, Some(pC)), // text-novel, sem-dup of 12's embedding: learned
    (22L, tF, Some(pD)), // novel both ways: ADMITTED
    (23L, tG, None)) // no embedding: admitted on the text gates alone

  private def manifest(dir: String) =
    spark.read.parquet(s"$dir/manifest")
      .select($"doc_id", $"quality_ok", $"lang_ok", $"is_dup", $"has_emb",
        $"sem_novel", $"admitted", $"batch_id".cast("long").as("batch_id"))
      .orderBy($"doc_id")

  test("admissionStream: per-stage verdicts, tier memoization, cross-batch learning") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val sess = spark
    import sess.implicits.newProductEncoder
    val (dedupDir, ivfDir) = freshBases()
    val vDir = java.nio.file.Files.createTempDirectory("mouth-v").toString
    val ck = java.nio.file.Files.createTempDirectory("mouth-ck").toString

    val stream = MemoryStream[(Long, String, Option[Seq[Float]])](spark)
    val q = CrawlMouth.admissionStream(
      stream.toDF().toDF("doc_id", "text", "embedding"),
      "doc_id", "text", "embedding", dedupDir, ivfDir, vDir, ck,
      trigger = Trigger.ProcessingTime(0))
    try {
      stream.addData(batch1)
      q.processAllAvailable()
      stream.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()

    val m = manifest(vDir).collect()
    m.map(_.getLong(0)) shouldBe Array(10L, 11L, 12L, 13L, 14L, 20L, 21L, 22L, 23L)
    def row(id: Long) = m.find(_.getLong(0) == id).get
    // batch 1
    row(10L).getBoolean(1) shouldBe true // quality_ok
    row(10L).getBoolean(3) shouldBe true // is_dup (stored 1)
    row(10L).isNullAt(5) shouldBe true // sem never evaluated
    row(10L).getBoolean(6) shouldBe false
    row(11L).getBoolean(3) shouldBe false // text-novel
    row(11L).getBoolean(5) shouldBe false // sem-dup of stored 301
    row(11L).getBoolean(6) shouldBe false
    row(12L).getBoolean(3) shouldBe false
    row(12L).getBoolean(5) shouldBe true
    row(12L).getBoolean(6) shouldBe true // ADMITTED
    row(13L).getBoolean(1) shouldBe false // quality fail
    row(13L).isNullAt(3) shouldBe true // dedup never evaluated
    row(13L).getBoolean(6) shouldBe false
    row(14L).getBoolean(1) shouldBe true
    row(14L).getBoolean(2) shouldBe false // lang fail
    row(14L).isNullAt(3) shouldBe true
    // batch 2: both tiers LEARNED from batch 1
    row(20L).getBoolean(3) shouldBe true // text-dup of admitted 12
    row(21L).getBoolean(3) shouldBe false
    row(21L).getBoolean(5) shouldBe false // sem-dup of 12's embedding
    row(22L).getBoolean(6) shouldBe true
    row(23L).getBoolean(4) shouldBe false // has_emb
    row(23L).isNullAt(5) shouldBe true
    row(23L).getBoolean(6) shouldBe true // admitted on text gates alone
    m.map(_.getLong(7)).toSeq shouldBe Seq(0L, 0L, 0L, 0L, 0L, 1L, 1L, 1L, 1L)

    // TIER MEMOIZATION: the text index learned every TEXT-novel passer
    // (including sem-rejected 11 and 21 — their future text-duplicates
    // are refused before paying the ANN probe), never the early-rejected
    CorpusDedup.refreshIndex(spark, dedupDir)
    CorpusDedup.fromIndex(spark, dedupDir).signatures
      .select($"doc_id").collect().map(_.getLong(0)).sorted shouldBe
      Array(1L, 2L, 11L, 12L, 21L, 22L, 23L)
    // the IVF learned exactly the fully-admitted embeddings
    VectorSearch.refreshIvfIndex(spark, ivfDir)
    VectorSearch.fromIvfIndex(spark, ivfDir).vectors
      .select($"vec_id").collect().map(_.getLong(0)).sorted shouldBe
      ((301L to 332L) ++ Seq(12L, 22L)).sorted.toArray
    // per-index markers advanced independently under their own kinds
    CorpusDedup.lastIngestedBatch(
      spark, dedupDir, CorpusDedup.commitMarker("admit-dedup", ck)) shouldBe 1L
    CorpusDedup.lastIngestedBatch(
      spark, ivfDir, CorpusDedup.commitMarker("admit-ivf", ck)) shouldBe 1L
  }

  test("extractMarkup: crawl HTML in, the same verdicts as clean text in") {
    // The crawl feed delivers markup; with extractMarkup the mouth runs
    // the boilerplate-removal chain as stage -1. Draining the
    // SYNTHESIZED pages must produce bit-identical manifests and index
    // growth to draining the underlying clean text — the whole
    // crawl-bytes → corpus path in one call.
    def pageOf(id: Long, text: String): String =
      docsDf((id, text, None)).select(
        graft.queries.TextAnalysis.htmlOf($"text", $"doc_id"))
        .collect().head.getString(0)
    def run(markup: Boolean): Set[Seq[Any]] = {
      val (dedupDir, ivfDir) = freshBases()
      val vDir = java.nio.file.Files.createTempDirectory("mouth-ext").toString
      val ck = java.nio.file.Files.createTempDirectory("mouth-ext-ck").toString
      val rows =
        if (markup) batch1.map { case (id, t, v) => (id, pageOf(id, t), v) }
        else batch1
      CrawlMouth.admitBatch(
        docsDf(rows: _*), "doc_id", "text", "embedding",
        dedupDir, ivfDir, vDir, ck, 0L,
        graft.queries.Dedup.ClusterEdgeE4,
        graft.queries.Similarity.NearDupE4,
        graft.queries.Similarity.IvfProbes, extractMarkup = markup)
      manifest(vDir).collect().map(_.toSeq).toSet
    }
    run(markup = true) shouldBe run(markup = false)
  }

  test("an all-rejected batch still commits both markers and a full manifest") {
    // Every doc dies at stage 0 (quality or language): the dedup stage
    // scores an EMPTY passer set, the ANN stage an empty query set —
    // both stages must still write their (empty) verdict partitions and
    // record their markers, neither index may move, and the manifest
    // carries one row per doc with the later stages NULL. This is the
    // batch shape that exercises the zero-row replay guard end to end.
    val (dedupDir, ivfDir) = freshBases()
    val vDir = java.nio.file.Files.createTempDirectory("mouth-empty").toString
    val ck = java.nio.file.Files.createTempDirectory("mouth-empty-ck").toString
    CrawlMouth.admitBatch(
      docsDf((13L, "tiny doc.", Some(pD)), (14L, tNoLang, None)),
      "doc_id", "text", "embedding", dedupDir, ivfDir, vDir, ck, 0L,
      graft.queries.Dedup.ClusterEdgeE4,
      graft.queries.Similarity.NearDupE4,
      graft.queries.Similarity.IvfProbes)
    val m = manifest(vDir).collect()
    m.map(_.getLong(0)) shouldBe Array(13L, 14L)
    m.foreach { r =>
      r.isNullAt(3) shouldBe true // is_dup never evaluated
      r.isNullAt(5) shouldBe true // sem never evaluated
      r.getBoolean(6) shouldBe false
    }
    CorpusDedup.refreshIndex(spark, dedupDir)
    CorpusDedup.fromIndex(spark, dedupDir).signatures.count() shouldBe 2L
    VectorSearch.refreshIvfIndex(spark, ivfDir)
    VectorSearch.fromIvfIndex(spark, ivfDir).vectors.count() shouldBe 32L
    CorpusDedup.lastIngestedBatch(
      spark, dedupDir, CorpusDedup.commitMarker("admit-dedup", ck)) shouldBe 0L
    CorpusDedup.lastIngestedBatch(
      spark, ivfDir, CorpusDedup.commitMarker("admit-ivf", ck)) shouldBe 0L
    // and a full replay of the all-rejected batch converges (the
    // zero-row read-back path, explicit schema over empty partitions)
    CrawlMouth.admitBatch(
      docsDf((13L, "tiny doc.", Some(pD)), (14L, tNoLang, None)),
      "doc_id", "text", "embedding", dedupDir, ivfDir, vDir, ck, 0L,
      graft.queries.Dedup.ClusterEdgeE4,
      graft.queries.Similarity.NearDupE4,
      graft.queries.Similarity.IvfProbes)
    manifest(vDir).collect().map(_.getLong(0)) shouldBe Array(13L, 14L)
  }

  test("crash between the two index commits: redelivery resumes, never re-scores") {
    val sess = spark
    import sess.implicits.newProductEncoder

    def run(failAfterStage: Int*): (String, String, String, String) = {
      val (dedupDir, ivfDir) = freshBases()
      val vDir = java.nio.file.Files.createTempDirectory("mouth-crash").toString
      val ck = java.nio.file.Files.createTempDirectory("mouth-crash-ck").toString
      failAfterStage.foreach { f =>
        val attempt = () => CrawlMouth.admitBatch(
          docsDf(batch1: _*), "doc_id", "text", "embedding",
          dedupDir, ivfDir, vDir, ck, 0L,
          graft.queries.Dedup.ClusterEdgeE4,
          graft.queries.Similarity.NearDupE4,
          graft.queries.Similarity.IvfProbes, failAfterStage = f)
        if (f == Int.MaxValue) attempt()
        else (the[IllegalArgumentException] thrownBy attempt()).getMessage
          .should(include("injected crash"))
      }
      (dedupDir, ivfDir, vDir, ck)
    }
    def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet

    // uninterrupted reference on twin dirs
    val (refDedup, refIvf, refV, refCk) = run(Int.MaxValue)
    // crash after the dedup commit, then redeliver to completion
    val (d1, i1, v1, _) = run(1, Int.MaxValue)
    // crash after the ANN commit (manifest unwritten), then redeliver
    val (d2, i2, v2, _) = run(2, Int.MaxValue)
    for ((d, i, v) <- Seq((d1, i1, v1), (d2, i2, v2))) {
      rows(manifest(v)) shouldBe rows(manifest(refV))
      CorpusDedup.refreshIndex(spark, d)
      CorpusDedup.refreshIndex(spark, refDedup)
      rows(CorpusDedup.fromIndex(spark, d).signatures) shouldBe
        rows(CorpusDedup.fromIndex(spark, refDedup).signatures)
      rows(CorpusDedup.fromIndex(spark, d).edges) shouldBe
        rows(CorpusDedup.fromIndex(spark, refDedup).edges)
      VectorSearch.refreshIvfIndex(spark, i)
      VectorSearch.refreshIvfIndex(spark, refIvf)
      rows(VectorSearch.fromIvfIndex(spark, i).vectors) shouldBe
        rows(VectorSearch.fromIvfIndex(spark, refIvf).vectors)
    }

    // Crash INSIDE stage 2 — after its appendToIvfIndex, before its
    // marker: redelivery re-enters stage 2 and must trip the ANN gate's
    // partial-ingestion refusal (silently re-scoring against the mutated
    // index would flip the mouth's sem verdicts), the same loud-refusal
    // contract as the dedup tier.
    val (d3, i3, v3, ck3) = run(1, Int.MaxValue) // complete run...
    // ...then simulate the crashed predecessor'S append of a NEW batch 1
    // whose marker never landed (batch2's admitted docs 22 carries pD,
    // but inject a fresh vector id to model the appended-but-unrecorded
    // copy of an incoming doc)
    VectorSearch.appendToIvfIndex(
      vecsDf(40L -> pD), "vec_id", "embedding", i3)
    val redelivered = docsDf((40L, tF, Some(pD))) // dedup-novel + embedded
    val err = the[IllegalArgumentException] thrownBy CrawlMouth.admitBatch(
      redelivered, "doc_id", "text", "embedding", d3, i3, v3, ck3, 1L,
      graft.queries.Dedup.ClusterEdgeE4,
      graft.queries.Similarity.NearDupE4,
      graft.queries.Similarity.IvfProbes)
    err.getMessage should include("partially ingested")

    // FULL replay of a completed batch (same checkpoint key): both
    // markers skip, the manifest rewrites identically, neither index
    // moves and the gate's partial-ingestion refusal never fires
    val before = rows(manifest(refV))
    val sigsBefore = rows(CorpusDedup.fromIndex(spark, refDedup).signatures)
    CrawlMouth.admitBatch(
      docsDf(batch1: _*), "doc_id", "text", "embedding",
      refDedup, refIvf, refV, refCk, 0L,
      graft.queries.Dedup.ClusterEdgeE4,
      graft.queries.Similarity.NearDupE4,
      graft.queries.Similarity.IvfProbes)
    rows(manifest(refV)) shouldBe before
    CorpusDedup.refreshIndex(spark, refDedup)
    rows(CorpusDedup.fromIndex(spark, refDedup).signatures) shouldBe sigsBefore
  }
}
