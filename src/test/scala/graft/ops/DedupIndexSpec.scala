package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.syntax._

/** The persisted dedup-index lifecycle ([[CorpusDedup.buildIndex]] /
  * [[CorpusDedup.fromIndex]]): stored artifacts round-trip exactly, the
  * verification tiers read the stored edges, and the bucket metadata
  * actually removes the stored side's exchange — the property that makes a
  * materialized index worth storing at 100 TB. */
class DedupIndexSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.Tables.documents(spark, dir).select($"doc_id", $"text")

  private lazy val indexDir = {
    val tmp = java.nio.file.Files.createTempDirectory("dedup-index-spec").toString
    CorpusDedup.buildIndex(docs, "doc_id", "text", tmp)
    tmp
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("stored artifacts equal their recomputed definitions, column for column") {
    val idx = CorpusDedup.fromIndex(spark, indexDir)
    // postings ≡ postingsOf(docs)
    rows(idx.postings) shouldBe
      rows(graft.queries.Dedup.postingsOf(docs))
    // signatures ≡ signaturesOf(postings)
    rows(idx.signatures) shouldBe
      rows(graft.queries.Dedup.signaturesOf(graft.queries.Dedup.postingsOf(docs)))
    // edges ≡ scoredPairsFromSigs(signatures)
    val sigs = graft.queries.Dedup
      .signaturesOf(graft.queries.Dedup.postingsOf(docs)).persist()
    sigs.count()
    rows(idx.edges) shouldBe rows(graft.queries.Dedup.scoredPairsFromSigs(sigs))
    sigs.unpersist(false)
    // and the thresholded edge view matches the public near-dup pairs
    rows(idx.nearDupEdges) shouldBe
      rows(CorpusDedup.nearDupPairs(docs, "doc_id", "text")
        .filter($"est_e4" >= graft.queries.Dedup.ClusterEdgeE4)
        .select($"da", $"db"))
  }

  test("same-session reads come back bucketed: postings self-join plans no exchange") {
    val idx = CorpusDedup.fromIndex(spark, indexDir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = idx.postings.select($"s", $"doc_id".as("a"))
      val b = idx.postings.select($"s", $"doc_id".as("b"))
      val plan = a.join(b, "s").queryExecution.executedPlan.toString
      // both sides carry the bucket spec on `s` → sort-merge join with
      // ZERO shuffle exchanges (the stored index is join-ready)
      plan should not include "Exchange hashpartitioning"
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("cross-session fallback: plain parquet read of the same files is identical") {
    // simulate a fresh session's view (no catalog entry) by reading the
    // directories directly
    val plain = CorpusDedup.DedupIndex(
      spark.read.parquet(s"$indexDir/postings"),
      spark.read.parquet(s"$indexDir/capped"),
      spark.read.parquet(s"$indexDir/prefix"),
      spark.read.parquet(s"$indexDir/signatures"),
      spark.read.parquet(s"$indexDir/bands"),
      spark.read.parquet(s"$indexDir/edges"))
    val idx = CorpusDedup.fromIndex(spark, indexDir)
    rows(plain.postings) shouldBe rows(idx.postings)
    rows(plain.prefix) shouldBe rows(idx.prefix)
    rows(plain.edges) shouldBe rows(idx.edges)
  }

  test("stored capped + prefix artifacts equal their recomputed definitions") {
    val idx = CorpusDedup.fromIndex(spark, indexDir)
    val postings = graft.queries.Dedup.postingsOf(docs).persist()
    postings.count()
    val capped = graft.queries.Dedup
      .cappedFromPostings(postings, graft.queries.Dedup.MaxShingleDf).persist()
    capped.count()
    rows(idx.capped) shouldBe rows(capped)
    rows(idx.prefix) shouldBe
      rows(graft.queries.Dedup.ppjoinPrefix(capped, graft.queries.Dedup.PpjoinTauE4))
    capped.unpersist(false)
    postings.unpersist(false)
  }

  test("stored ppjoin probe: prefix self-join plans no exchange and no document scan") {
    val idx = CorpusDedup.fromIndex(spark, indexDir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val cand = idx.prefix.select($"doc_id".as("da"), $"s")
        .join(idx.prefix.select($"doc_id".as("db"), $"s"), Seq("s"))
        .filter($"da" < $"db")
      val plan = cand.queryExecution.executedPlan.toString
      // both sides carry the bucket spec on `s` → zero shuffle exchanges,
      // and the candidate generator never touches the raw corpus: the
      // tokenize + corpus-DF passes happened at index WRITE time
      plan should not include "Exchange hashpartitioning"
      plan.toLowerCase should not include "documents"
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("verification tier over the stored index equals the recomputed path") {
    val idx = CorpusDedup.fromIndex(spark, indexDir)
    val storedVerify = CorpusDedup.editVerify(
      docs, "doc_id", "text",
      idx.nearDupEdges, aCol = "a", bCol = "b")
    val liveVerify = CorpusDedup.editVerify(
      docs, "doc_id", "text",
      CorpusDedup.nearDupPairs(docs, "doc_id", "text")
        .filter($"est_e4" >= graft.queries.Dedup.ClusterEdgeE4))
    rows(storedVerify) shouldBe rows(liveVerify)
  }

  test("q_dedup_indexed emits the editdist contract plus a TRUE stored_ok verdict") {
    val out = graft.queries.Dedup.qDedupIndexed(spark, dir)
    out.columns shouldBe
      Array("a", "b", "lev", "max_len", "dist_e4", "is_dup", "stored_ok")
    val collected = out.collect()
    collected.length should be > 0
    collected.foreach(_.getBoolean(6) shouldBe true)
    // and the non-verdict columns equal q_dedup_editdist exactly
    collected.map(_.toSeq.dropRight(1)).toSet shouldBe
      graft.queries.Dedup.qDedupEditdist(spark, dir).collect().map(_.toSeq).toSet
  }

  test("appendToIndex lands exactly the from-scratch index on every artifact") {
    val tmp = java.nio.file.Files.createTempDirectory("dedup-append-spec").toString
    val base = docs.filter($"doc_id" % 5 =!= 0)
    val batch = docs.filter($"doc_id" % 5 === 0)
    CorpusDedup.buildIndex(base, "doc_id", "text", tmp)
    val appended = CorpusDedup.appendToIndex(batch, "doc_id", "text", tmp)
    // every artifact equals the one buildIndex would produce for the
    // union corpus — the incremental path may not drift from the batch
    // path on any of the five derived tables
    val tmpFull = java.nio.file.Files.createTempDirectory("dedup-full-spec").toString
    val full = CorpusDedup.buildIndex(docs, "doc_id", "text", tmpFull)
    rows(appended.postings) shouldBe rows(full.postings)
    rows(appended.signatures) shouldBe rows(full.signatures)
    rows(appended.bands) shouldBe rows(full.bands)
    rows(appended.edges) shouldBe rows(full.edges)
    rows(appended.capped) shouldBe rows(full.capped)
    rows(appended.prefix) shouldBe rows(full.prefix)
  }

  test("deferred-statistics append: stats stay at the last restate; restate lands the rebuild") {
    val tmp = java.nio.file.Files.createTempDirectory("dedup-defer-spec").toString
    val base = docs.filter($"doc_id" % 5 =!= 0)
    val batch = docs.filter($"doc_id" % 5 === 0)
    val built = CorpusDedup.buildIndex(base, "doc_id", "text", tmp)
    val cappedBefore = rows(built.capped)
    val prefixBefore = rows(built.prefix)
    CorpusDedup.statsFresh(spark, tmp) shouldBe true
    val appended = CorpusDedup.appendToIndex(
      batch, "doc_id", "text", tmp, restateStats = false)
    CorpusDedup.statsFresh(spark, tmp) shouldBe false
    val tmpFull = java.nio.file.Files.createTempDirectory("dedup-deferfull").toString
    val full = CorpusDedup.buildIndex(docs, "doc_id", "text", tmpFull)
    // the O(batch) artifacts grew exactly as a full restate append would
    rows(appended.postings) shouldBe rows(full.postings)
    rows(appended.signatures) shouldBe rows(full.signatures)
    rows(appended.bands) shouldBe rows(full.bands)
    rows(appended.edges) shouldBe rows(full.edges)
    // ... while the corpus statistics are the PRE-append generation
    // (read through the stored-form accessor: the PUBLIC capped/prefix
    // accessors refuse on a stale index — pinned below)
    rows(appended.cappedAsStored) shouldBe cappedBefore
    rows(appended.prefixAsStored) shouldBe prefixBefore
    // stored-probe enforcement: a deferred-append index probed without a
    // restate REFUSES loudly instead of silently missing duplicates
    val e1 = intercept[IllegalStateException] { appended.capped }
    e1.getMessage should include("DEFERRED statistics")
    val e2 = intercept[IllegalStateException] {
      CorpusDedup.fromIndex(spark, tmp).prefix
    }
    e2.getMessage should include("restateIndexStats")
    // ... while the gate/append artifacts stay readable on the same index
    appended.bands.count() should be > 0L
    appended.signatures.count() should be > 0L
    // capped/prefix are pure functions of postings, so the deferred
    // restate lands bit-identical to the from-scratch build
    val restated = CorpusDedup.restateIndexStats(spark, tmp)
    CorpusDedup.statsFresh(spark, tmp) shouldBe true
    rows(restated.capped) shouldBe rows(full.capped)
    rows(restated.prefix) shouldBe rows(full.prefix)
  }

  test("compactIndex restates deferred statistics implicitly; erasure clears staleness too") {
    val tmp = java.nio.file.Files.createTempDirectory("dedup-defer-compact").toString
    val base = docs.filter($"doc_id" % 5 =!= 0)
    val batch = docs.filter($"doc_id" % 5 === 0)
    CorpusDedup.buildIndex(base, "doc_id", "text", tmp)
    CorpusDedup.appendToIndex(batch, "doc_id", "text", tmp, restateStats = false)
    CorpusDedup.statsFresh(spark, tmp) shouldBe false
    val compacted = CorpusDedup.compactIndex(spark, tmp)
    CorpusDedup.statsFresh(spark, tmp) shouldBe true
    val tmpFull = java.nio.file.Files.createTempDirectory("dedup-defercfull").toString
    val full = CorpusDedup.buildIndex(docs, "doc_id", "text", tmpFull)
    rows(compacted.capped) shouldBe rows(full.capped)
    rows(compacted.prefix) shouldBe rows(full.prefix)
    rows(compacted.edges) shouldBe rows(full.edges)
    // an erasure restates from the remaining postings — also clears
    CorpusDedup.appendToIndex(
      docs.filter($"doc_id" % 5 === 0)
        .select(($"doc_id" + 100000L).as("doc_id"), $"text"),
      "doc_id", "text", tmp, restateStats = false)
    CorpusDedup.statsFresh(spark, tmp) shouldBe false
    CorpusDedup.removeFromIndex(spark, tmp,
      docs.filter($"doc_id" % 5 === 0)
        .select(($"doc_id" + 100000L).as("doc_id")))
    CorpusDedup.statsFresh(spark, tmp) shouldBe true
  }

  test("appendToIndex preserves stored rows when the session has no catalog entry for the dir") {
    // A fresh process (or a file COPY of an index) has the parquet files
    // but no catalog tables. saveAsTable("append") on an UNREGISTERED
    // non-empty location does NOT adopt the files — it replaces the
    // location's content; appendBucketed must register the table over
    // the existing files first or the stored artifact is silently
    // deleted. Regression for the shared-base-index copy losing its
    // base edges (caught by the oracle gate's row-count mismatch).
    val sess = spark
    import sess.implicits.{localSeqToDatasetHolder, newProductEncoder}
    def t(id: Long, tail: String) = (id,
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda " +
        "mu nu xi omicron pi rho sigma tau " + tail)
    val base = Seq(t(1, "one"), t(2, "one x")).toDF("doc_id", "text")
    val batch = Seq(t(10, "one y")).toDF("doc_id", "text")
    val src = java.nio.file.Files.createTempDirectory("dedup-copyapp-src").toString
    CorpusDedup.buildIndex(base, "doc_id", "text", src)
    val baseCounts = Seq("postings", "signatures", "bands", "edges")
      .map(a => a -> spark.read.parquet(s"$src/$a").count()).toMap
    baseCounts("edges") should be >= 1L // (1,2) is a near-dup pair
    val copy = graft.TempIndexDirs.copyOf(src, "dedup-copyapp-copy")
    CorpusDedup.appendToIndex(batch, "doc_id", "text", copy)
    // every appended artifact still holds its base rows plus the batch's
    Seq("postings", "signatures", "bands", "edges").foreach { a =>
      withClue(s"$a: ") {
        spark.read.parquet(s"$copy/$a").count() should be > baseCounts(a)
      }
    }
    // and the batch's cross pairs landed next to the preserved base edge
    val got = spark.read.parquet(s"$copy/edges")
      .select($"da", $"db").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    got should contain allOf ((1L, 2L), (1L, 10L), (2L, 10L))
  }

  test("appendToIndex refuses a batch re-using stored doc_ids") {
    val tmp = java.nio.file.Files.createTempDirectory("dedup-appdup-spec").toString
    CorpusDedup.buildIndex(docs, "doc_id", "text", tmp)
    val e = intercept[IllegalArgumentException] {
      CorpusDedup.appendToIndex(docs.limit(1), "doc_id", "text", tmp)
    }
    e.getMessage should include("disjoint")
  }

  test("appendToIndex refuses a batch that pushes a band bucket past the cap") {
    val sess = spark
    import sess.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("dedup-appcap-spec").toString
    // near-identical docs share every band bucket; cap=2 trips on the
    // third member landing in the stored bucket
    def clone(id: Long) = (id, "alpha beta gamma delta epsilon zeta eta theta " +
      s"iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon v$id")
    val base = Seq(clone(1L), clone(2L)).toDF("doc_id", "text")
    val batch = Seq(clone(3L)).toDF("doc_id", "text")
    CorpusDedup.buildIndex(base, "doc_id", "text", tmp)
    val e = intercept[IllegalArgumentException] {
      CorpusDedup.appendToIndex(batch, "doc_id", "text", tmp, maxBandBucket0 = 2L)
    }
    e.getMessage should include("rebuild")
  }

  test("mergeIndexes lands exactly the from-scratch index on every artifact") {
    val l = java.nio.file.Files.createTempDirectory("dedup-merge-l").toString
    val r = java.nio.file.Files.createTempDirectory("dedup-merge-r").toString
    val out = java.nio.file.Files.createTempDirectory("dedup-merge-out").toString
    CorpusDedup.buildIndex(docs.filter($"doc_id" % 5 =!= 0), "doc_id", "text", l)
    CorpusDedup.buildIndex(docs.filter($"doc_id" % 5 === 0), "doc_id", "text", r)
    val merged = CorpusDedup.mergeIndexes(spark, l, r, out)
    // bit-identity to the single whole-corpus build on all six artifacts
    // — cross-shard pairs found, no pair double-counted, corpus-wide
    // stats (DF cap, prefix order) restated over the union. The capped +
    // prefix comparisons additionally pin the union-of-bucketed-scans
    // exchange-elision hazard: merging through the two shards' CATALOG
    // tables made every aggregation over the union claim the bucket
    // partitioning and compute per-shard DF ranks (duplicated prefix
    // rows) — the merge reads the junior shard raw for exactly this.
    val tmpFull = java.nio.file.Files.createTempDirectory("dedup-merge-full").toString
    val full = CorpusDedup.buildIndex(docs, "doc_id", "text", tmpFull)
    rows(merged.postings) shouldBe rows(full.postings)
    rows(merged.signatures) shouldBe rows(full.signatures)
    rows(merged.bands) shouldBe rows(full.bands)
    rows(merged.edges) shouldBe rows(full.edges)
    rows(merged.capped) shouldBe rows(full.capped)
    rows(merged.prefix) shouldBe rows(full.prefix)
    // and both input indexes are untouched (merge is read-only on them)
    rows(CorpusDedup.fromIndex(spark, l).edges) shouldBe
      rows(CorpusDedup.buildIndex(docs.filter($"doc_id" % 5 =!= 0), "doc_id",
        "text", java.nio.file.Files.createTempDirectory("dedup-merge-l2").toString)
        .edges)
  }

  test("merge unions read raw: exchange planned before cross-shard aggregation") {
    // THE HAZARD (why mergeIndexes reads the junior shard raw): a union
    // of two same-bucket-spec CATALOG scans claims the bucket hash
    // partitioning while physically concatenating the shards' bucket
    // files as unaligned partitions — aggregations over the union then
    // elide their exchange and emit per-shard groups. Self-hiding, too:
    // probing for duplicate groups with another groupBy over the same
    // union elides the same exchange and reports none. This pins the
    // production contract: the raw-read union (what mergeIndexes plans)
    // keeps its exchange, and its per-key counts are GLOBAL.
    val l = java.nio.file.Files.createTempDirectory("dedup-uxe-l").toString
    val r = java.nio.file.Files.createTempDirectory("dedup-uxe-r").toString
    CorpusDedup.buildIndex(docs.filter($"doc_id" % 5 =!= 0), "doc_id", "text", l)
    CorpusDedup.buildIndex(docs.filter($"doc_id" % 5 === 0), "doc_id", "text", r)
    val rawUnion = spark.read.parquet(s"$l/postings")
      .unionByName(spark.read.parquet(s"$r/postings"))
    val counts = rawUnion.groupBy($"s")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("df"))
    val plan = counts.queryExecution.executedPlan.toString
    plan should include("Exchange hashpartitioning")
    // per-key counts are global: one row per key, totals add up
    val rows = counts.collect()
    rows.map(_.getLong(0)).distinct.length shouldBe rows.length
    rows.map(_.getLong(1)).sum shouldBe rawUnion.count()
  }

  test("merges compose as a tree: ((A+B)+(C+D)) equals the from-scratch build") {
    // The 100-TB claim is a merge TREE (shard builds → pairwise merges →
    // a root), so composition must hold: a merged index is a valid
    // senior input to the next merge, including its restated capped/
    // prefix statistics and its bucketed artifact layout.
    def shard(m: Long): String = {
      val d = java.nio.file.Files.createTempDirectory(s"dedup-tree-$m").toString
      CorpusDedup.buildIndex(
        docs.filter($"doc_id" % 4 === m), "doc_id", "text", d)
      d
    }
    val Seq(a, b, c, d) = (0L to 3L).map(shard)
    val ab = java.nio.file.Files.createTempDirectory("dedup-tree-ab").toString
    val cd = java.nio.file.Files.createTempDirectory("dedup-tree-cd").toString
    val root = java.nio.file.Files.createTempDirectory("dedup-tree-root").toString
    CorpusDedup.mergeIndexes(spark, a, b, ab)
    CorpusDedup.mergeIndexes(spark, c, d, cd)
    val merged = CorpusDedup.mergeIndexes(spark, ab, cd, root)
    val full = CorpusDedup.buildIndex(docs, "doc_id", "text",
      java.nio.file.Files.createTempDirectory("dedup-tree-full").toString)
    rows(merged.postings) shouldBe rows(full.postings)
    rows(merged.signatures) shouldBe rows(full.signatures)
    rows(merged.bands) shouldBe rows(full.bands)
    rows(merged.edges) shouldBe rows(full.edges)
    rows(merged.capped) shouldBe rows(full.capped)
    rows(merged.prefix) shouldBe rows(full.prefix)
  }

  test("mergeIndexes refuses overlapping corpora") {
    val l = java.nio.file.Files.createTempDirectory("dedup-mergedup-l").toString
    val r = java.nio.file.Files.createTempDirectory("dedup-mergedup-r").toString
    CorpusDedup.buildIndex(docs.filter($"doc_id" % 5 =!= 0), "doc_id", "text", l)
    CorpusDedup.buildIndex(docs.limit(5), "doc_id", "text", r)
    val e = intercept[IllegalArgumentException] {
      CorpusDedup.mergeIndexes(spark, l, r,
        java.nio.file.Files.createTempDirectory("dedup-mergedup-out").toString)
    }
    e.getMessage should include("disjoint")
  }

  test("mergeIndexes refuses a merge that pushes a band bucket past the cap") {
    val sess = spark
    import sess.implicits._
    def clone(id: Long) = (id, "alpha beta gamma delta epsilon zeta eta theta " +
      s"iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon v$id")
    val l = java.nio.file.Files.createTempDirectory("dedup-mergecap-l").toString
    val r = java.nio.file.Files.createTempDirectory("dedup-mergecap-r").toString
    CorpusDedup.buildIndex(
      Seq(clone(1L), clone(2L)).toDF("doc_id", "text"), "doc_id", "text", l)
    CorpusDedup.buildIndex(
      Seq(clone(3L)).toDF("doc_id", "text"), "doc_id", "text", r)
    val e = intercept[IllegalArgumentException] {
      CorpusDedup.mergeIndexes(spark, l, r,
        java.nio.file.Files.createTempDirectory("dedup-mergecap-out").toString,
        maxBandBucket0 = 2L)
    }
    e.getMessage should include("rebuild")
  }

  test("removeFromIndex: append -> forget round-trips to the base index on every artifact") {
    val tmp = java.nio.file.Files.createTempDirectory("dedup-forget-spec").toString
    val base = docs.filter($"doc_id" % 5 =!= 0)
    val batch = docs.filter($"doc_id" % 5 === 0)
    CorpusDedup.buildIndex(base, "doc_id", "text", tmp)
    CorpusDedup.appendToIndex(batch, "doc_id", "text", tmp)
    val forgotten = CorpusDedup.removeFromIndex(
      spark, tmp, batch.select($"doc_id"))
    val baseOnly = CorpusDedup.buildIndex(base, "doc_id", "text",
      java.nio.file.Files.createTempDirectory("dedup-forget-base").toString)
    rows(forgotten.postings) shouldBe rows(baseOnly.postings)
    rows(forgotten.signatures) shouldBe rows(baseOnly.signatures)
    rows(forgotten.bands) shouldBe rows(baseOnly.bands)
    rows(forgotten.edges) shouldBe rows(baseOnly.edges)
    rows(forgotten.capped) shouldBe rows(baseOnly.capped)
    rows(forgotten.prefix) shouldBe rows(baseOnly.prefix)
    // erasure removes BYTES: the raw files hold no erased doc rows and
    // no previous-generation staging dirs remain
    val erased = batch.select($"doc_id").collect().map(_.getLong(0)).toSet
    Seq("postings", "signatures", "bands").foreach { a =>
      withClue(s"$a: ") {
        spark.read.parquet(s"$tmp/$a").select($"doc_id")
          .collect().map(_.getLong(0)).toSet.intersect(erased) shouldBe empty
      }
    }
    CorpusDedup.vacuumIndex(spark, tmp) shouldBe 0 // promotion left no staging
    // idempotent: a redelivered (now absent) erasure request is a no-op
    val again = CorpusDedup.removeFromIndex(spark, tmp, batch.select($"doc_id"))
    rows(again.edges) shouldBe rows(baseOnly.edges)
    rows(again.prefix) shouldBe rows(baseOnly.prefix)
  }

  test("removeFromIndex refuses erasing from an over-cap band bucket") {
    val sess = spark
    import sess.implicits._
    def clone(id: Long) = (id, "alpha beta gamma delta epsilon zeta eta theta " +
      s"iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon v$id")
    val tmp = java.nio.file.Files.createTempDirectory("dedup-forgetcap").toString
    CorpusDedup.buildIndex(
      Seq(clone(1L), clone(2L), clone(3L)).toDF("doc_id", "text"),
      "doc_id", "text", tmp, maxBandBucket = 2L)
    val e = intercept[IllegalArgumentException] {
      CorpusDedup.removeFromIndex(spark, tmp,
        Seq(2L).toDF("doc_id"), maxBandBucket0 = 2L)
    }
    e.getMessage should include("rebuild")
  }

  test("q_dedup_index_forget emits the post-erasure edges plus a TRUE forget_ok") {
    val out = graft.queries.Dedup.qDedupIndexForget(spark, dir)
    out.columns shouldBe
      Array("da", "db", "n_shared_bands", "n_eq", "est_e4", "forget_ok")
    val collected = out.collect()
    collected.length should be > 0
    collected.foreach(_.getBoolean(5) shouldBe true)
  }

  test("compactIndex preserves every artifact bit for bit and shrinks the file count") {
    val tmp = java.nio.file.Files.createTempDirectory("dedup-compact-spec").toString
    val base = docs.filter($"doc_id" % 5 =!= 0)
    val batch = docs.filter($"doc_id" % 5 === 0)
    CorpusDedup.buildIndex(base, "doc_id", "text", tmp)
    val pre = CorpusDedup.appendToIndex(batch, "doc_id", "text", tmp)
    // snapshot the pre-compaction contents (collected — compaction
    // rewrites the files under the same paths)
    val preRows = Seq(pre.postings, pre.capped, pre.prefix,
      pre.signatures, pre.bands, pre.edges).map(rows)
    val filesBefore = CorpusDedup.indexFileCount(spark, tmp)
    val post = CorpusDedup.compactIndex(spark, tmp)
    val filesAfter = CorpusDedup.indexFileCount(spark, tmp)
    // layout contract: strictly fewer files, at most one per bucket per
    // artifact — the small-files decay the appends accumulated is gone
    filesAfter should be < filesBefore
    filesAfter should be <= 6L * CorpusDedup.IndexBuckets
    // content contract: bit-identical rows on every artifact
    Seq(post.postings, post.capped, post.prefix,
      post.signatures, post.bands, post.edges).map(rows)
      .zip(preRows).foreach { case (a, b) => a shouldBe b }
  }

  test("compacted reads stay bucketed: postings self-join plans no exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("dedup-compactb-spec").toString
    CorpusDedup.buildIndex(docs, "doc_id", "text", tmp)
    val idx = CorpusDedup.compactIndex(spark, tmp)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = idx.postings.select($"s", $"doc_id".as("a"))
      val b = idx.postings.select($"s", $"doc_id".as("b"))
      val plan = a.join(b, "s").queryExecution.executedPlan.toString
      plan should not include "Exchange hashpartitioning"
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("ingestStream appends each micro-batch once; final index equals the one-shot build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val sess = spark
    // only the tuple Encoder — importing all implicits would make the $
    // interpolator ambiguous with graft.syntax's
    import sess.implicits.newProductEncoder
    val tmp = java.nio.file.Files.createTempDirectory("dedup-ingest-spec").toString
    val ck = java.nio.file.Files.createTempDirectory("dedup-ingest-ck").toString
    val base = docs.filter($"doc_id" % 3 === 0)
    def tuples(m: Long) = docs.filter($"doc_id" % 3 === m)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    CorpusDedup.buildIndex(base, "doc_id", "text", tmp)
    val stream = MemoryStream[(Long, String)](spark)
    val q = CorpusDedup.ingestStream(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text", tmp, ck,
      Trigger.ProcessingTime(0))
    try {
      stream.addData(tuples(1))
      q.processAllAvailable()
      stream.addData(tuples(2))
      q.processAllAvailable()
    } finally q.stop()
    // final stored index ≡ the one-shot build over the whole corpus.
    // The appends ran in the stream's cloned session, so THIS session's
    // cached pre-append file listings are stale — the documented
    // REFRESH TABLE contract for externally-updated tables.
    CorpusDedup.refreshIndex(spark, tmp)
    val tmpFull = java.nio.file.Files.createTempDirectory("dedup-ingfull-spec").toString
    val full = CorpusDedup.buildIndex(docs, "doc_id", "text", tmpFull)
    val ingested = CorpusDedup.fromIndex(spark, tmp)
    rows(ingested.edges) shouldBe rows(full.edges)
    rows(ingested.postings) shouldBe rows(full.postings)
    // streaming appends DEFER the O(index) capped/prefix restate (the
    // per-batch cost must be O(batch)); the maintenance restate brings
    // the stats current and equal to the one-shot build's
    CorpusDedup.statsFresh(spark, tmp) shouldBe false
    rows(CorpusDedup.restateIndexStats(spark, tmp).prefix) shouldBe
      rows(full.prefix)
    CorpusDedup.statsFresh(spark, tmp) shouldBe true
    // idempotence watermark: redelivering the last applied batch no-ops
    // (the foreachBatch replay-after-restart case) instead of tripping
    // the duplicate-id refusal or double-counting edges
    val marker = CorpusDedup.commitMarker("ingest", ck)
    val last = CorpusDedup.lastIngestedBatch(spark, tmp, marker)
    last should be >= 1L
    val replay = docs.filter($"doc_id" % 3 === 2)
    CorpusDedup.appendBatchIdempotent(
      replay, "doc_id", "text", tmp, last, marker) shouldBe false
    rows(CorpusDedup.fromIndex(spark, tmp).edges) shouldBe rows(full.edges)
  }

  test("forgetStream erases each micro-batch once; final index equals the remaining-corpus build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val sess = spark
    import sess.implicits.newLongEncoder
    val tmp = java.nio.file.Files.createTempDirectory("dedup-forgetq-spec").toString
    val ck = java.nio.file.Files.createTempDirectory("dedup-forgetq-ck").toString
    CorpusDedup.buildIndex(docs, "doc_id", "text", tmp)
    def idsOf(m: Long) = docs.filter($"doc_id" % 3 === m)
      .select($"doc_id").collect().map(_.getLong(0)).toSeq
    val stream = MemoryStream[Long](spark)
    val q = CorpusDedup.forgetStream(
      stream.toDF().toDF("doc_id"), tmp, ck, Trigger.ProcessingTime(0))
    try {
      stream.addData(idsOf(1))
      q.processAllAvailable()
      stream.addData(idsOf(2))
      q.processAllAvailable()
    } finally q.stop()
    // the erasures ran in the stream's cloned session — refresh this
    // session's cached file listings (REFRESH TABLE contract)
    CorpusDedup.refreshIndex(spark, tmp)
    val tmpRem = java.nio.file.Files.createTempDirectory("dedup-forgetq-rem").toString
    val rem = CorpusDedup.buildIndex(
      docs.filter($"doc_id" % 3 === 0), "doc_id", "text", tmpRem)
    val forgotten = CorpusDedup.fromIndex(spark, tmp)
    rows(forgotten.edges) shouldBe rows(rem.edges)
    rows(forgotten.postings) shouldBe rows(rem.postings)
    rows(forgotten.prefix) shouldBe rows(rem.prefix)
    // redelivering the last applied batch skips on the forget watermark
    // (a replayed erasure would otherwise pay a full artifact rewrite)
    val marker = CorpusDedup.commitMarker("forget", ck)
    val last = CorpusDedup.lastIngestedBatch(spark, tmp, marker)
    last should be >= 1L
    CorpusDedup.forgetBatchIdempotent(
      docs.filter($"doc_id" % 3 === 2).select($"doc_id"), tmp, last,
      marker) shouldBe false
    // the erasure watermark is its OWN marker: the ingest watermark is
    // untouched, so a later ingest stream starts from scratch correctly
    CorpusDedup.lastIngestedBatch(spark, tmp) shouldBe -1L
  }

  test("mutators resolve build parameters from _meta: a non-default cap binds the erasure queue") {
    val sess = spark
    import sess.implicits._
    def clone(id: Long) = (id, "alpha beta gamma delta epsilon zeta eta theta " +
      s"iota kappa lambda mu nu xi omicron pi rho sigma tau upsilon v$id")
    val tmp = java.nio.file.Files.createTempDirectory("dedup-metacap").toString
    CorpusDedup.buildIndex(
      Seq(clone(1L), clone(2L), clone(3L)).toDF("doc_id", "text"),
      "doc_id", "text", tmp, maxBandBucket = 2L)
    CorpusDedup.indexMeta(spark, tmp)("maxBandBucket") shouldBe 2L
    // an ALL-DEFAULTS call — exactly what the streaming erasure queue
    // issues — must refuse against the BUILD's cap (2), not the engine
    // default (which would silently corrupt the star bucket's edges)
    val e = intercept[IllegalArgumentException] {
      CorpusDedup.removeFromIndex(spark, tmp, Seq(2L).toDF("doc_id"))
    }
    e.getMessage should include("maxBandBucket=2")
  }

  test("healArtifact restores the no-live-artifact crash window; vacuum heals, never destroys") {
    val tmp = java.nio.file.Files.createTempDirectory("dedup-heal-spec").toString
    CorpusDedup.buildIndex(docs.limit(50), "doc_id", "text", tmp)
    val preEdges = rows(CorpusDedup.fromIndex(spark, tmp).edges)
    val prePostings = rows(spark.read.parquet(s"$tmp/postings"))
    // simulate a crash BETWEEN the two promotion renames: the live
    // postings dir is gone, the previous generation sits at .old, the
    // half-promoted staging dir is present
    import java.nio.file.{Files, Paths}
    Files.move(Paths.get(s"$tmp/postings"), Paths.get(s"$tmp/postings.old"))
    Files.createDirectories(Paths.get(s"$tmp/postings.compacting"))
    // vacuum HEALS first (restores the only remaining copy), then
    // reclaims the superseded staging dir — it must never delete .old
    // while the live artifact is missing
    CorpusDedup.vacuumIndex(spark, tmp) shouldBe 1
    spark.catalog.refreshByPath(tmp)
    rows(spark.read.parquet(s"$tmp/postings")) shouldBe prePostings
    // and a redelivered erasure on the healed index just works
    val someId = docs.limit(1).select($"doc_id")
    CorpusDedup.removeFromIndex(spark, tmp, someId)
    rows(CorpusDedup.fromIndex(spark, tmp).edges).size should be <= preEdges.size
  }

  test("vacuumIndex reclaims interrupted-compaction staging dirs, leaves the index intact") {
    val tmp = java.nio.file.Files.createTempDirectory("dedup-vacuum-spec").toString
    CorpusDedup.buildIndex(docs.limit(50), "doc_id", "text", tmp)
    val preEdges = rows(CorpusDedup.fromIndex(spark, tmp).edges)
    // simulate a crash: staging leftovers next to two live artifacts
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$tmp/postings.compacting"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$tmp/edges.old"))
    CorpusDedup.vacuumIndex(spark, tmp) shouldBe 2
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$tmp/postings.compacting")) shouldBe false
    rows(CorpusDedup.fromIndex(spark, tmp).edges) shouldBe preEdges
    // idempotent: nothing left to reclaim
    CorpusDedup.vacuumIndex(spark, tmp) shouldBe 0
  }

  test("q_dedup_index_compact emits the appended edge table plus a TRUE compact_ok") {
    val out = graft.queries.Dedup.qDedupIndexCompact(spark, dir)
    out.columns shouldBe
      Array("da", "db", "n_shared_bands", "n_eq", "est_e4", "compact_ok")
    val collected = out.collect()
    collected.length should be > 0
    collected.foreach(_.getBoolean(5) shouldBe true)
  }

  test("q_dedup_index_merge emits the merged edge table plus a TRUE merge_ok") {
    val out = graft.queries.Dedup.qDedupIndexMerge(spark, dir)
    out.columns shouldBe
      Array("da", "db", "n_shared_bands", "n_eq", "est_e4", "merge_ok")
    val collected = out.collect()
    collected.length should be > 0
    collected.foreach(_.getBoolean(5) shouldBe true)
  }

  test("q_dedup_ppjoin_indexed emits the ppjoin contract plus a TRUE stored_ok verdict") {
    val out = graft.queries.Dedup.qDedupPpjoinIndexed(spark, dir)
    out.columns shouldBe
      Array("da", "db", "common", "jacc_e4", "is_dup", "stored_ok")
    val collected = out.collect()
    collected.length should be > 0
    collected.foreach(_.getBoolean(5) shouldBe true)
    // and the non-verdict columns equal q_dedup_ppjoin exactly
    collected.map(_.toSeq.dropRight(1)).toSet shouldBe
      graft.queries.Dedup.qDedupPpjoin(spark, dir).collect().map(_.toSeq).toSet
  }
}
