package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.syntax._

/** ONE-CALL MAINTENANCE ([[CorpusDedup.maintainIndex]] /
  * [[VectorSearch.maintainIvfIndex]]) — the scheduled entry point that
  * executes the documented maintenance triggers (PLANS.md "documented
  * cutovers"), each gated on its own MEASURED metric. The contract under
  * test: actions fire exactly when their trigger trips (never
  * unconditionally), the post-call state satisfies the policy invariants
  * (fresh statistics, fragmentation within bound), the maintained index
  * is bit-identical to a from-scratch build (maintenance is repair +
  * layout, never semantics), and an immediate second call is a no-op —
  * the idempotence that makes an unattended maintenance cron safe. */
class IndexMaintenanceSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def t(id: Long, tail: String) = (id,
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda " +
      "mu nu xi omicron pi rho sigma tau " + tail)

  private def docsDf(rows: (Long, String)*) = {
    val sess = spark
    import sess.implicits._
    rows.toDF("doc_id", "text")
  }

  private def worstFiles(dir: String): Long =
    Seq("postings", "capped", "prefix", "signatures", "bands", "edges")
      .map(a => CorpusDedup.dataFileCount(spark, s"$dir/$a")).max

  test("bucketsOf reads the dir's OWN layout, not the default constant") {
    // The fragmentation verdicts must bound against the index's persisted
    // bucket count: comparing against the IndexBuckets constant silently
    // fails any index built with buckets > default and silently passes a
    // genuinely fragmented one built with buckets < default.
    val dir = java.nio.file.Files.createTempDirectory("buckets-of").toString
    CorpusDedup.buildIndex(
      docsDf(t(1, "one"), t(2, "two")), "doc_id", "text", dir, buckets = 8)
    CorpusDedup.bucketsOf(spark, dir) shouldBe 8
    CorpusDedup.bucketsOf(spark, dir) should not be CorpusDedup.IndexBuckets
    // and a dir with no _meta falls back to the default
    val bare = java.nio.file.Files.createTempDirectory("buckets-bare").toString
    CorpusDedup.bucketsOf(spark, bare) shouldBe CorpusDedup.IndexBuckets
  }

  test("maintainIndex: measured triggers, policy invariants, bit-identity, idempotence") {
    val dir = java.nio.file.Files.createTempDirectory("maint-dedup").toString
    CorpusDedup.buildIndex(
      docsDf(t(1, "one"), t(2, "two")), "doc_id", "text", dir)
    // a gate/ingest stream's O(batch) appends: statistics DEFERRED
    CorpusDedup.appendToIndex(
      docsDf(t(10, "ten"), t(11, "eleven")), "doc_id", "text", dir,
      restateStats = false)
    CorpusDedup.appendToIndex(
      docsDf(t(12, "twelve")), "doc_id", "text", dir, restateStats = false)
    CorpusDedup.statsFresh(spark, dir) shouldBe false
    // an interrupted compaction's leftover staging dir: vacuum's trigger
    val (fs, staging) = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/edges.compacting")
      (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
    }
    fs.mkdirs(staging)
    val fragBefore = worstFiles(dir)

    val r1 = CorpusDedup.maintainIndex(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getLong(3)))).toMap
    r1.keySet shouldBe Set("compact", "restate", "vacuum")
    // vacuum: the planted staging dir tripped it
    r1("vacuum")._1 shouldBe true
    r1("vacuum")._2 should be >= 1L
    fs.exists(staging) shouldBe false
    // restate: deferred statistics tripped it, and it cleared the flag
    r1("restate") shouldBe ((true, 1L, 0L))
    CorpusDedup.statsFresh(spark, dir) shouldBe true
    // compact: fires EXACTLY when the measured fragmentation says so —
    // never unconditionally (the gating, not a fixed layout, is the
    // contract; the restate itself can move the measured count)
    val (didCompact, cBefore, cAfter) = r1("compact")
    cBefore should be >= fragBefore // measured after the restate
    didCompact shouldBe (cBefore > 2L * CorpusDedup.IndexBuckets)
    if (didCompact) cAfter should be <= CorpusDedup.IndexBuckets.toLong
    // policy invariant, unconditional: within the fragmentation bound
    cAfter should be <= math.max(cBefore, 2L * CorpusDedup.IndexBuckets)
    worstFiles(dir) shouldBe cAfter

    // maintenance is repair + layout, never semantics: the maintained
    // index equals a from-scratch build over the same corpus
    val refDir = java.nio.file.Files.createTempDirectory("maint-ref").toString
    val ref = CorpusDedup.buildIndex(
      docsDf(t(1, "one"), t(2, "two"), t(10, "ten"), t(11, "eleven"),
        t(12, "twelve")),
      "doc_id", "text", refDir)
    val got = CorpusDedup.fromIndex(spark, dir)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toSeq).toSet
    rows(got.prefix) shouldBe rows(ref.prefix)
    rows(got.capped) shouldBe rows(ref.capped)
    rows(got.edges) shouldBe rows(ref.edges)

    // idempotence: every trigger reports clear on the immediate re-run
    val r2 = CorpusDedup.maintainIndex(spark, dir).collect()
    r2.foreach(_.getBoolean(1) shouldBe false)
    // and the maintenance passes are on the audit ledger
    val events = CorpusDedup.history(spark, dir)
      .filter($"event" === "maintain").count()
    events shouldBe 2L
  }

  test("maintainIvfIndex: gated compaction, drift-based retrain recommendation, idempotence") {
    val sess = spark
    import sess.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val dir = java.nio.file.Files.createTempDirectory("maint-ivf").toString
    def vecs(ids: Range) = ids.map(i =>
        (i.toLong, Seq.tabulate(graft.queries.Similarity.Dim)(d =>
          (i * 3 + d).toFloat)))
      .toDF("vec_id", "embedding")
    VectorSearch.buildIvfIndex(vecs(1 to 8), "vec_id", "embedding", dir)
    VectorSearch.appendToIvfIndex(vecs(9 to 12), "vec_id", "embedding", dir)
    val before = CorpusDedup.dataFileCount(spark, s"$dir/vectors")
    val pre = VectorSearch.fromIvfIndex(spark, dir)
      .vectors.select($"vec_id", $"cid").collect().map(_.toSeq).toSet

    val r1 = VectorSearch.maintainIvfIndex(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getBoolean(1), r.getLong(2), r.getLong(3)))).toMap
    r1.keySet shouldBe Set("compact", "retrain")
    // compaction fires exactly when the measured file count says so
    val (didCompact, cBefore, cAfter) = r1("compact")
    cBefore shouldBe before
    didCompact shouldBe (before > 2L * CorpusDedup.IndexBuckets)
    cAfter should be <= math.max(cBefore, 2L * CorpusDedup.IndexBuckets)
    // the healthy fixture quantizer must NOT trip the drift trigger
    r1("retrain")._1 shouldBe false
    // maintenance never moves a vector or changes an assignment
    spark.catalog.refreshByPath(dir)
    VectorSearch.fromIvfIndex(spark, dir)
      .vectors.select($"vec_id", $"cid").collect()
      .map(_.toSeq).toSet shouldBe pre

    // idempotence on the healthy index
    VectorSearch.maintainIvfIndex(spark, dir)
      .collect().foreach(_.getBoolean(1) shouldBe false)

    // the trigger WIRE: an impossible skew ceiling must flip the
    // recommendation (report-only — the index is not rebuilt)
    val r3 = VectorSearch.maintainIvfIndex(spark, dir, skewCeil = 0L)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    r3("retrain") shouldBe true
    spark.catalog.refreshByPath(dir)
    VectorSearch.fromIvfIndex(spark, dir)
      .vectors.select($"vec_id", $"cid").collect()
      .map(_.toSeq).toSet shouldBe pre
  }
}
