package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.syntax._

/** The persisted IVF-index lifecycle ([[VectorSearch.buildIvfIndex]] /
  * [[VectorSearch.fromIvfIndex]] / [[VectorSearch.probeStored]]) — the
  * vector twin of [[DedupIndexSpec]]: the stored quantizer and assignment
  * round-trip exactly, the stored probe equals the live recomputed probe,
  * the bucket metadata removes the index side's exchange, and a plain
  * parquet read of the same files (a fresh session's view) is identical. */
class IvfIndexSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def vecs = graft.Tables.embeddings(spark, dir)

  private lazy val indexDir = {
    val tmp = java.nio.file.Files.createTempDirectory("ivf-index-spec").toString
    VectorSearch.buildIvfIndex(vecs, "vec_id", "embedding", tmp)
    tmp
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("stored quantizer is the deterministic trainer's output; assignment covers the corpus") {
    val idx = VectorSearch.fromIvfIndex(spark, indexDir)
    idx.centroids.count() shouldBe graft.queries.Similarity.IvfClusters.toLong
    // every vector appears exactly once, assigned to a valid centroid
    idx.vectors.count() shouldBe vecs.count()
    idx.vectors.select($"vec_id").distinct().count() shouldBe vecs.count()
    val cids = idx.vectors.select($"cid").distinct().collect().map(_.getInt(0))
    all(cids) should (be >= 0 and be < graft.queries.Similarity.IvfClusters)
  }

  test("stored probe equals the live recomputed probe row for row") {
    val idx = VectorSearch.fromIvfIndex(spark, indexDir)
    val stored = VectorSearch.probeStored(idx,
      vecs.filter($"vec_id" < 10), "vec_id", "embedding")
    rows(stored) shouldBe rows(graft.queries.Similarity.ivfRaw(spark, dir))
  }

  test("same-session probe join plans no exchange on the stored vectors side") {
    val idx = VectorSearch.fromIvfIndex(spark, indexDir)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probe = idx.vectors.select($"cid").distinct()
        .join(idx.vectors, "cid")
      val plan = probe.queryExecution.executedPlan.toString
      // the vectors scan carries its cid bucket spec — the fact side of the
      // probe join never re-shuffles; only the (bounded) probe rows move
      plan.split("Exchange hashpartitioning").length - 1 should be <= 1
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("cross-session fallback: plain parquet read of the same files is identical") {
    val idx = VectorSearch.fromIvfIndex(spark, indexDir)
    val plain = VectorSearch.IvfIndex(
      spark.read.parquet(s"$indexDir/centroids"),
      spark.read.parquet(s"$indexDir/vectors"))
    rows(plain.centroids) shouldBe rows(idx.centroids)
    rows(plain.vectors) shouldBe rows(idx.vectors)
  }

  test("appendToIvfIndex lands exactly the one-pass assignment with the stored quantizer") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf-append-spec").toString
    val base = vecs.filter($"vec_id" % 7 =!= 3)
    val batch = vecs.filter($"vec_id" % 7 === 3)
    VectorSearch.buildIvfIndex(base, "vec_id", "embedding", tmp)
    val appended = VectorSearch.appendToIvfIndex(batch, "vec_id", "embedding", tmp)
    // quantizer unchanged by the append
    val baseOnly = java.nio.file.Files.createTempDirectory("ivf-base-spec").toString
    VectorSearch.buildIvfIndex(base, "vec_id", "embedding", baseOnly)
    rows(appended.centroids) shouldBe
      rows(VectorSearch.fromIvfIndex(spark, baseOnly).centroids)
    // appended lists == assigning the WHOLE corpus against the stored
    // quantizer in one pass (the incremental path may not drift)
    val cents = appended.centroidArray
    val onePass = graft.queries.Similarity.assignedOf(
      vecs.select($"vec_id",
        org.apache.spark.sql.functions.transform($"embedding",
          x => x.cast("double")).as("v")),
      cents).select($"cid", $"vec_id", $"v", $"nrm")
    rows(appended.vectors) shouldBe rows(onePass)
  }

  test("retrainIvfIndex == from-scratch rebuild; ids conserved; drift signals reset") {
    // Grow an index by assignment (the drift scenario): build on half the
    // corpus, append the other half against the STALE quantizer.
    val tmp = java.nio.file.Files.createTempDirectory("ivf-retrain-spec").toString
    val base = vecs.filter($"vec_id" % 2 === 0)
    val batch = vecs.filter($"vec_id" % 2 =!= 0)
    VectorSearch.buildIvfIndex(base, "vec_id", "embedding", tmp)
    VectorSearch.appendToIvfIndex(batch, "vec_id", "embedding", tmp)
    val staleCentroids = rows(VectorSearch.fromIvfIndex(spark, tmp).centroids)
    val retrained = VectorSearch.retrainIvfIndex(spark, tmp)
    // the quantizer actually changed (trained on the FULL corpus now)…
    rows(retrained.centroids) should not be staleCentroids
    // …and the result is exactly buildIvfIndex over the same vector set
    val fromScratch = java.nio.file.Files
      .createTempDirectory("ivf-retrain-ref").toString
    VectorSearch.buildIvfIndex(vecs, "vec_id", "embedding", fromScratch)
    val ref = VectorSearch.fromIvfIndex(spark, fromScratch)
    rows(retrained.centroids) shouldBe rows(ref.centroids)
    rows(retrained.vectors) shouldBe rows(ref.vectors)
    // ids conserved, stats healthy (assignment matches the new quantizer)
    retrained.vectors.count() shouldBe vecs.count()
    val st = VectorSearch.ivfStats(spark, tmp)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    st("n_misassigned") shouldBe 0L
    st("within_sse_e6") should be < st("global_sse_e6")
    // the history ledger records the deliberate operation
    val hist = spark.read.json(s"$tmp/_history")
    hist.filter($"event" === "retrain").count() shouldBe 1L
  }

  test("appendToIvfIndex refuses a batch re-using stored vec_ids") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf-appdup-spec").toString
    VectorSearch.buildIvfIndex(vecs, "vec_id", "embedding", tmp)
    val e = intercept[IllegalArgumentException] {
      VectorSearch.appendToIvfIndex(vecs.limit(1), "vec_id", "embedding", tmp)
    }
    e.getMessage should include("disjoint")
  }

  test("q_sim_ivf_append emits the exact side plus TRUE recall_ok and stored_ok") {
    val out = graft.queries.Similarity.qSimIvfAppend(spark, dir)
    out.columns shouldBe
      Array("qid", "rank", "nb", "cos_e4", "recall_ok", "stored_ok")
    val collected = out.collect()
    collected.length should be > 0
    collected.foreach { r =>
      r.getBoolean(4) shouldBe true
      r.getBoolean(5) shouldBe true
    }
  }

  test("q_sim_ivf_indexed emits the exact side plus TRUE recall_ok and stored_ok") {
    val out = graft.queries.Similarity.qSimIvfIndexed(spark, dir)
    out.columns shouldBe
      Array("qid", "rank", "nb", "cos_e4", "recall_ok", "stored_ok")
    val collected = out.collect()
    collected.length should be > 0
    collected.foreach { r =>
      r.getBoolean(4) shouldBe true
      r.getBoolean(5) shouldBe true
    }
  }

  test("mergeIvfIndexes equals appending the junior shard; inputs untouched") {
    val l = java.nio.file.Files.createTempDirectory("ivf-merge-l").toString
    val r = java.nio.file.Files.createTempDirectory("ivf-merge-r").toString
    val out = java.nio.file.Files.createTempDirectory("ivf-merge-out").toString
    val base = vecs.filter($"vec_id" % 7 =!= 3)
    val shard = vecs.filter($"vec_id" % 7 === 3)
    VectorSearch.buildIvfIndex(base, "vec_id", "embedding", l)
    VectorSearch.buildIvfIndex(shard, "vec_id", "embedding", r)
    val lVecPre = rows(VectorSearch.fromIvfIndex(spark, l).vectors)
    val merged = VectorSearch.mergeIvfIndexes(spark, l, r, out)
    // the senior quantizer is adopted unchanged
    rows(merged.centroids) shouldBe
      rows(VectorSearch.fromIvfIndex(spark, l).centroids)
    // merged lists == the one-pass whole-corpus assignment against the
    // senior quantizer (identical to appendToIvfIndex of the raw shard)
    val onePass = graft.queries.Similarity.assignedOf(
      vecs.select($"vec_id",
        org.apache.spark.sql.functions.transform($"embedding",
          x => x.cast("double")).as("v")),
      merged.centroidArray).select($"cid", $"vec_id", $"v", $"nrm")
    rows(merged.vectors) shouldBe rows(onePass)
    // and the left input index is untouched (merge is read-only on it)
    rows(VectorSearch.fromIvfIndex(spark, l).vectors) shouldBe lVecPre
  }

  test("mergeIvfIndexes refuses overlapping shards") {
    val l = java.nio.file.Files.createTempDirectory("ivf-mergedup-l").toString
    val r = java.nio.file.Files.createTempDirectory("ivf-mergedup-r").toString
    VectorSearch.buildIvfIndex(vecs, "vec_id", "embedding", l)
    VectorSearch.buildIvfIndex(vecs.limit(3), "vec_id", "embedding", r)
    val e = intercept[IllegalArgumentException] {
      VectorSearch.mergeIvfIndexes(spark, l, r,
        java.nio.file.Files.createTempDirectory("ivf-mergedup-out").toString)
    }
    e.getMessage should include("disjoint")
  }

  test("q_sim_ivf_merge emits the exact side plus TRUE recall_ok and merge_ok") {
    val out = graft.queries.Similarity.qSimIvfMerge(spark, dir)
    out.columns shouldBe
      Array("qid", "rank", "nb", "cos_e4", "recall_ok", "merge_ok")
    val collected = out.collect()
    collected.length should be > 0
    collected.foreach { r =>
      r.getBoolean(4) shouldBe true
      r.getBoolean(5) shouldBe true
    }
  }

  test("removeFromIvfIndex: append -> forget round-trips to the base lists") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf-forget-spec").toString
    val base = vecs.filter($"vec_id" % 7 =!= 3)
    val batch = vecs.filter($"vec_id" % 7 === 3)
    VectorSearch.buildIvfIndex(base, "vec_id", "embedding", tmp)
    val preVec = rows(VectorSearch.fromIvfIndex(spark, tmp).vectors)
    val preCent = rows(VectorSearch.fromIvfIndex(spark, tmp).centroids)
    VectorSearch.appendToIvfIndex(batch, "vec_id", "embedding", tmp)
    val forgotten = VectorSearch.removeFromIvfIndex(
      spark, tmp, batch.select($"vec_id"))
    rows(forgotten.vectors) shouldBe preVec
    rows(forgotten.centroids) shouldBe preCent
    // bytes gone: the raw list files hold no erased vec_id rows
    val erased = batch.select($"vec_id").collect().map(_.getLong(0)).toSet
    spark.read.parquet(s"$tmp/vectors").select($"vec_id")
      .collect().map(_.getLong(0)).toSet.intersect(erased) shouldBe empty
    // idempotent: redelivered erasure is a no-op
    rows(VectorSearch.removeFromIvfIndex(
      spark, tmp, batch.select($"vec_id")).vectors) shouldBe preVec
  }

  test("q_sim_ivf_forget emits the exact side plus TRUE recall_ok and forget_ok") {
    val out = graft.queries.Similarity.qSimIvfForget(spark, dir)
    out.columns shouldBe
      Array("qid", "rank", "nb", "cos_e4", "recall_ok", "forget_ok")
    val collected = out.collect()
    collected.length should be > 0
    collected.foreach { r =>
      r.getBoolean(4) shouldBe true
      r.getBoolean(5) shouldBe true
    }
  }

  test("compactIvfIndex preserves vectors and quantizer bit for bit, shrinks files") {
    val tmp = java.nio.file.Files.createTempDirectory("ivf-compact-spec").toString
    val base = vecs.filter($"vec_id" % 7 =!= 3)
    val batch = vecs.filter($"vec_id" % 7 === 3)
    VectorSearch.buildIvfIndex(base, "vec_id", "embedding", tmp)
    val pre = VectorSearch.appendToIvfIndex(batch, "vec_id", "embedding", tmp)
    val preVec = rows(pre.vectors)
    val preCent = rows(pre.centroids)
    val filesBefore = CorpusDedup.dataFileCount(spark, s"$tmp/vectors")
    val post = VectorSearch.compactIvfIndex(spark, tmp)
    val filesAfter = CorpusDedup.dataFileCount(spark, s"$tmp/vectors")
    filesAfter should be < filesBefore
    filesAfter should be <= CorpusDedup.IndexBuckets.toLong
    rows(post.vectors) shouldBe preVec
    rows(post.centroids) shouldBe preCent
  }

  test("ingestStream appends each vector micro-batch once; final lists equal one-pass") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val sess = spark
    import sess.implicits.newProductEncoder
    val tmp = java.nio.file.Files.createTempDirectory("ivf-ingest-spec").toString
    val ck = java.nio.file.Files.createTempDirectory("ivf-ingest-ck").toString
    val base = vecs.filter($"vec_id" % 3 === 0)
    VectorSearch.buildIvfIndex(base, "vec_id", "embedding", tmp)
    def tuples(m: Long) = vecs.filter($"vec_id" % 3 === m)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val stream = MemoryStream[(Long, Seq[Float])](spark)
    val q = VectorSearch.ingestStream(
      stream.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      tmp, ck, Trigger.ProcessingTime(0))
    try {
      stream.addData(tuples(1))
      q.processAllAvailable()
      stream.addData(tuples(2))
      q.processAllAvailable()
    } finally q.stop()
    // the appends ran in the stream's cloned session: refresh this
    // session's cached listings under the index path (REFRESH contract)
    spark.catalog.refreshByPath(tmp)
    val grown = VectorSearch.fromIvfIndex(spark, tmp)
    // quantizer untouched; lists == one-pass assignment of the whole
    // corpus against the stored quantizer
    val cents = grown.centroidArray
    val onePass = graft.queries.Similarity.assignedOf(
      vecs.select($"vec_id",
        org.apache.spark.sql.functions.transform($"embedding",
          x => x.cast("double")).as("v")),
      cents).select($"cid", $"vec_id", $"v", $"nrm")
    rows(spark.read.parquet(s"$tmp/vectors")) shouldBe rows(onePass)
    // idempotent redelivery of the last applied batch is a no-op
    val marker = CorpusDedup.commitMarker("ingest", ck)
    val last = CorpusDedup.lastIngestedBatch(spark, tmp, marker)
    last should be >= 1L
    VectorSearch.appendBatchIdempotent(
      vecs.filter($"vec_id" % 3 === 2), "vec_id", "embedding",
      tmp, last, marker) shouldBe false
  }

  test("forgetStream erases each id micro-batch once; final lists equal the remaining corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val sess = spark
    import sess.implicits.newLongEncoder
    val tmp = java.nio.file.Files.createTempDirectory("ivf-forgetq-spec").toString
    val ck = java.nio.file.Files.createTempDirectory("ivf-forgetq-ck").toString
    VectorSearch.buildIvfIndex(vecs, "vec_id", "embedding", tmp)
    def idsOf(m: Long) = vecs.filter($"vec_id" % 3 === m)
      .select($"vec_id").collect().map(_.getLong(0)).toSeq
    val stream = MemoryStream[Long](spark)
    val q = VectorSearch.forgetStream(
      stream.toDF().toDF("vec_id"), tmp, ck, Trigger.ProcessingTime(0))
    try {
      stream.addData(idsOf(1))
      q.processAllAvailable()
      stream.addData(idsOf(2))
      q.processAllAvailable()
    } finally q.stop()
    spark.catalog.refreshByPath(tmp)
    val forgotten = VectorSearch.fromIvfIndex(spark, tmp)
    // quantizer untouched; lists == one-pass assignment of the REMAINING
    // corpus against the stored quantizer
    val cents = forgotten.centroidArray
    val onePass = graft.queries.Similarity.assignedOf(
      vecs.filter($"vec_id" % 3 === 0).select($"vec_id",
        org.apache.spark.sql.functions.transform($"embedding",
          x => x.cast("double")).as("v")),
      cents).select($"cid", $"vec_id", $"v", $"nrm")
    rows(spark.read.parquet(s"$tmp/vectors")) shouldBe rows(onePass)
    // redelivery of the last applied erasure batch skips on the forget
    // watermark; the ingest watermark is a separate marker, untouched
    val marker = CorpusDedup.commitMarker("forget", ck)
    val last = CorpusDedup.lastIngestedBatch(spark, tmp, marker)
    last should be >= 1L
    VectorSearch.forgetBatchIdempotent(
      vecs.filter($"vec_id" % 3 === 2).select($"vec_id"), tmp, last,
      marker) shouldBe false
    CorpusDedup.lastIngestedBatch(spark, tmp) shouldBe -1L
  }

  test("ivfStats reports the full numeric health dashboard over the stored lists") {
    val st = VectorSearch.ivfStats(spark, indexDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // conservation + list accounting
    st("n_vectors") shouldBe vecs.count()
    st("n_lists") should be <= graft.queries.Similarity.IvfClusters.toLong
    st("max_list") should be >= st("min_list")
    // skew_e4 = max/avg in e4: >= 10000 by construction (max >= avg)
    st("skew_e4") should be >= 10000L
    // a stored index fresh from build/append has integral assignment
    st("n_misassigned") shouldBe 0L
    // quantization error accounting: mean <= max, and the trained
    // quantizer strictly beats the trivial 1-mean quantizer — drift
    // toward parity is the documented retrain trigger
    st("mean_qerr_e6") should be <= st("max_qerr_e6")
    st("within_sse_e6") should be < st("global_sse_e6")
    // a corrupted list (wrong cid) flips the integrity counter
    val broken = java.nio.file.Files.createTempDirectory("ivf-stats-broken").toString
    val idx = VectorSearch.fromIvfIndex(spark, indexDir)
    idx.centroids.write.parquet(s"$broken/centroids")
    idx.vectors
      .withColumn("cid",
        (($"cid" + 1) % graft.queries.Similarity.IvfClusters).cast("int"))
      .write.parquet(s"$broken/vectors")
    VectorSearch.ivfStats(spark, broken)
      .filter($"metric" === "n_misassigned")
      .collect()(0).getLong(1) should be > 0L
  }

  test("q_sim_ivf_stats emits the oracle face: conservation + healthy verdicts") {
    val out = graft.queries.Similarity.qSimIvfStats(spark, dir).collect()
    out.map(_.getString(0)) shouldBe
      Array("list_skew", "misassigned", "quant_gain", "vectors_total")
    out.foreach(_.getBoolean(2) shouldBe true)
    out.find(_.getString(0) == "vectors_total").get.getLong(1) shouldBe
      vecs.count()
  }

  test("q_sim_ivf_compact emits the exact side plus TRUE recall_ok and compact_ok") {
    val out = graft.queries.Similarity.qSimIvfCompact(spark, dir)
    out.columns shouldBe
      Array("qid", "rank", "nb", "cos_e4", "recall_ok", "compact_ok")
    val collected = out.collect()
    collected.length should be > 0
    collected.foreach { r =>
      r.getBoolean(4) shouldBe true
      r.getBoolean(5) shouldBe true
    }
  }
}
