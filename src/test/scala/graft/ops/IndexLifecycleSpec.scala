package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.syntax._

/** CAPSTONE: the full stored-index CRUD lifecycle composed end to end —
  * build → streaming ingest → streaming erasure → compaction → partition-
  * wise merge — must land bit-identical to a from-scratch build over the
  * NET corpus (what survived the whole history). Each stage is pinned
  * individually by its own spec; this suite pins that the stages COMPOSE:
  * an ingest followed by an erasure followed by a layout rewrite followed
  * by a merge hits every cross-stage seam at once (appended files being
  * erased, erased statistics being compacted, compacted artifacts being
  * unioned), which is exactly the operating history a production index
  * accumulates and no single-stage spec exercises.
  *
  * Corpus split by doc_id % 4: A = base build, B = stream-ingested then
  * fully erased, C = stream-ingested and kept, D = a separate shard index
  * merged in at the end. Net corpus = A ∪ C ∪ D.
  */
class IndexLifecycleSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, dir).select($"doc_id", $"text")
  private def vecs = graft.Tables.embeddings(spark, dir)

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("dedup index: build -> ingest -> forget -> compact -> merge == one-shot build of the net corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val sess = spark
    import sess.implicits.{newLongEncoder, newProductEncoder}
    val tmp = java.nio.file.Files.createTempDirectory("lifecycle-dedup").toString
    def part(m: Long) = docs.filter($"doc_id" % 4 === m)

    // 1. BUILD over A
    CorpusDedup.buildIndex(part(0), "doc_id", "text", tmp)

    // 2. STREAMING INGEST of B then C (two micro-batches)
    def tuples(m: Long) = part(m)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val ingest = MemoryStream[(Long, String)](spark)
    val qi = CorpusDedup.ingestStream(
      ingest.toDF().toDF("doc_id", "text"), "doc_id", "text", tmp,
      java.nio.file.Files.createTempDirectory("lifecycle-ick").toString,
      Trigger.ProcessingTime(0))
    try {
      ingest.addData(tuples(1)); qi.processAllAvailable()
      ingest.addData(tuples(2)); qi.processAllAvailable()
    } finally qi.stop()

    // 3. STREAMING ERASURE of all of B (the appended files are rewritten)
    val forget = MemoryStream[Long](spark)
    val qf = CorpusDedup.forgetStream(
      forget.toDF().toDF("doc_id"), tmp,
      java.nio.file.Files.createTempDirectory("lifecycle-fck").toString,
      Trigger.ProcessingTime(0))
    try {
      forget.addData(part(1).select($"doc_id").collect().map(_.getLong(0)).toSeq)
      qf.processAllAvailable()
    } finally qf.stop()

    // 4. COMPACTION (the post-erasure statistics + surviving appends are
    // rewritten to <=1 file per bucket)
    CorpusDedup.refreshIndex(spark, tmp)
    CorpusDedup.compactIndex(spark, tmp)
    CorpusDedup.indexFileCount(spark, tmp) should
      be <= 6L * CorpusDedup.IndexBuckets

    // 5. PARTITION-WISE MERGE with a shard index over D
    val shardD = java.nio.file.Files.createTempDirectory("lifecycle-shardD").toString
    CorpusDedup.buildIndex(part(3), "doc_id", "text", shardD)
    val outDir = java.nio.file.Files.createTempDirectory("lifecycle-merged").toString
    val merged = CorpusDedup.mergeIndexes(spark, tmp, shardD, outDir)

    // The whole history == one-shot build over the NET corpus (A ∪ C ∪ D),
    // on every artifact, bit for bit.
    val netDir = java.nio.file.Files.createTempDirectory("lifecycle-net").toString
    val net = CorpusDedup.buildIndex(
      docs.filter($"doc_id" % 4 =!= 1), "doc_id", "text", netDir)
    rows(merged.postings) shouldBe rows(net.postings)
    rows(merged.signatures) shouldBe rows(net.signatures)
    rows(merged.bands) shouldBe rows(net.bands)
    rows(merged.edges) shouldBe rows(net.edges)
    rows(merged.capped) shouldBe rows(net.capped)
    rows(merged.prefix) shouldBe rows(net.prefix)
    // and the erased shard left no bytes anywhere in the merged files —
    // certified by the bounded raw-file probe a forgotten-data audit runs
    val cert = CorpusDedup.erasureCertificate(
      spark, outDir, part(1).select($"doc_id"))
    cert.columns shouldBe Array("artifact", "residual_rows", "erased_ok")
    cert.collect().foreach { r =>
      withClue(s"${r.getString(0)}: ") {
        r.getLong(1) shouldBe 0L
        r.getBoolean(2) shouldBe true
      }
    }
    // the certificate can FAIL: kept ids are present, so their
    // "certificate" reads residue on every per-doc artifact
    val notErased = CorpusDedup.erasureCertificate(
      spark, outDir, part(0).select($"doc_id").limit(5)).collect()
    notErased.foreach(_.getBoolean(2) shouldBe false)
    notErased.count(_.getLong(1) > 0L) should be >= 3

    // the lifecycle LEDGER recorded the whole mutation history, in order:
    // the mutated index saw build -> append -> append -> forget -> compact,
    // and the merged output's own ledger opens with its merge provenance
    val hist = CorpusDedup.history(spark, tmp)
      .select($"seq", $"event").collect().map(r => (r.getLong(0), r.getString(1)))
    hist.toSeq shouldBe Seq(
      0L -> "build", 1L -> "append", 2L -> "append",
      3L -> "forget", 4L -> "compact")
    val mergedHist = CorpusDedup.history(spark, outDir).collect()
    mergedHist.length shouldBe 1
    mergedHist.head.getAs[String]("event") shouldBe "merge"
    mergedHist.head.getAs[String]("left") shouldBe tmp
    mergedHist.head.getAs[String]("right") shouldBe shardD
    // the ledger holds NO erased ids (it must not retain what erasure
    // removed) — only event names, counts, and timestamps
    CorpusDedup.history(spark, tmp).columns.toSet shouldBe
      Set("seq", "ts_ms", "event", "buckets", "n_docs", "n_ids",
        "files_before", "files_after")
  }

  test("forgetStream restart resumes from its checkpoint: committed erasure files never re-apply") {
    import org.apache.spark.sql.streaming.Trigger
    val tmp = java.nio.file.Files.createTempDirectory("restart-forget").toString
    val req = java.nio.file.Files.createTempDirectory("restart-req").toString
    val ck = java.nio.file.Files.createTempDirectory("restart-ck").toString
    CorpusDedup.buildIndex(docs, "doc_id", "text", tmp)
    def enqueue(m: Long): Long = {
      val ids = docs.filter($"doc_id" % 4 === m).select($"doc_id")
      ids.coalesce(1).write.mode("append").parquet(req)
      ids.count()
    }
    val n1 = enqueue(1)
    def drain(): Unit = {
      val q = CorpusDedup.forgetStream(
        spark.readStream
          .schema("doc_id LONG").parquet(req), tmp, ck, Trigger.AvailableNow())
      try q.awaitTermination() finally q.stop()
    }
    drain()
    CorpusDedup.refreshIndex(spark, tmp)
    CorpusDedup.erasureCertificate(
      spark, tmp, docs.filter($"doc_id" % 4 === 1).select($"doc_id"))
      .collect().foreach(_.getBoolean(2) shouldBe true)
    // a SECOND queue drain from the same checkpoint: only the NEW request
    // files apply — the ledger's per-event erased-id counts prove the
    // first batch was not reprocessed (a restart that re-read the whole
    // request dir would log one forget event covering n1 + n2 ids)
    val n2 = enqueue(2)
    drain()
    CorpusDedup.refreshIndex(spark, tmp)
    val forgetEvents = CorpusDedup.history(spark, tmp)
      .filter($"event" === "forget")
      .orderBy($"seq").select($"n_ids").collect().map(_.getLong(0))
    forgetEvents.toSeq shouldBe Seq(n1, n2)
    // and the net index equals the remaining-corpus build
    val remDir = java.nio.file.Files.createTempDirectory("restart-rem").toString
    val rem = CorpusDedup.buildIndex(
      docs.filter($"doc_id" % 4 === 0 || $"doc_id" % 4 === 3),
      "doc_id", "text", remDir)
    val after = CorpusDedup.fromIndex(spark, tmp)
    rows(after.edges) shouldBe rows(rem.edges)
    rows(after.postings) shouldBe rows(rem.postings)
    rows(after.prefix) shouldBe rows(rem.prefix)
  }

  test("IVF index: build -> ingest -> forget -> compact -> merge == one-pass assignment of the net corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val sess = spark
    import sess.implicits.{newLongEncoder, newProductEncoder}
    val tmp = java.nio.file.Files.createTempDirectory("lifecycle-ivf").toString
    def part(m: Long) = vecs.filter($"vec_id" % 4 === m)

    VectorSearch.buildIvfIndex(part(0), "vec_id", "embedding", tmp)

    def tuples(m: Long) = part(m)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val ingest = MemoryStream[(Long, Seq[Float])](spark)
    val qi = VectorSearch.ingestStream(
      ingest.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", tmp,
      java.nio.file.Files.createTempDirectory("lifecycle-ivf-ick").toString,
      Trigger.ProcessingTime(0))
    try {
      ingest.addData(tuples(1)); qi.processAllAvailable()
      ingest.addData(tuples(2)); qi.processAllAvailable()
    } finally qi.stop()

    val forget = MemoryStream[Long](spark)
    val qf = VectorSearch.forgetStream(
      forget.toDF().toDF("vec_id"), tmp,
      java.nio.file.Files.createTempDirectory("lifecycle-ivf-fck").toString,
      Trigger.ProcessingTime(0))
    try {
      forget.addData(part(1).select($"vec_id").collect().map(_.getLong(0)).toSeq)
      qf.processAllAvailable()
    } finally qf.stop()

    spark.catalog.refreshByPath(tmp)
    VectorSearch.compactIvfIndex(spark, tmp)
    CorpusDedup.dataFileCount(spark, s"$tmp/vectors") should
      be <= CorpusDedup.IndexBuckets.toLong

    val shardD = java.nio.file.Files.createTempDirectory("lifecycle-ivf-shardD").toString
    VectorSearch.buildIvfIndex(part(3), "vec_id", "embedding", shardD)
    val outDir = java.nio.file.Files.createTempDirectory("lifecycle-ivf-merged").toString
    val merged = VectorSearch.mergeIvfIndexes(spark, tmp, shardD, outDir)

    // The senior (A-trained) quantizer is adopted through every stage, so
    // the final lists == one-pass assignment of the NET corpus against it.
    val cents = merged.centroidArray
    val onePass = graft.queries.Similarity.assignedOf(
      vecs.filter($"vec_id" % 4 =!= 1).select($"vec_id",
        org.apache.spark.sql.functions.transform($"embedding",
          x => x.cast("double")).as("v")),
      cents).select($"cid", $"vec_id", $"v", $"nrm")
    rows(spark.read.parquet(s"$outDir/vectors")) shouldBe rows(onePass)

    // erasure certified from the raw merged lists; ledger in order
    val cert = VectorSearch.erasureCertificate(
      spark, outDir, part(1).select($"vec_id")).collect()
    cert.map(r => (r.getString(0), r.getLong(1), r.getBoolean(2))).toSeq shouldBe
      Seq(("vectors", 0L, true))
    VectorSearch.erasureCertificate(
      spark, outDir, part(0).select($"vec_id").limit(5))
      .collect().head.getBoolean(2) shouldBe false
    CorpusDedup.history(spark, tmp)
      .select($"event").collect().map(_.getString(0)).toSeq shouldBe
      Seq("build", "append", "append", "forget", "compact")
    CorpusDedup.history(spark, outDir)
      .collect().head.getAs[String]("event") shouldBe "merge"
  }
}
