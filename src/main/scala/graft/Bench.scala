package graft

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{count, lit}
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Queries execute into the `noop` sink (not `count()`): count lets
  * Catalyst prune projections and skip sorts, which would flatter the
  * numbers; noop forces full materialization of the real result. A small
  * warmup query runs first so JVM/codegen startup isn't billed to the
  * first measured query.
  *
  * The full metrics JSON is also written to `bench_out.json` in the
  * working directory — the driver's log capture keeps only a tail of
  * stdout, which has truncated round totals before; the file is the
  * durable artifact.
  *
  * After the batch suite, a streaming throughput section drains a KPL
  * backlog synthesized from the same events table through the full
  * [[graft.streaming.RecordsStream]] pipeline (DSv2 source → KPL
  * de-aggregate → JSON decode → filter) under `Trigger.AvailableNow` —
  * the "Kinesis reader at scale" number: user-records/s, micro-batch
  * count, and per-batch p50/p99 from the query progress. Skipped when
  * `SPARK_GRAFT_QUERIES` restricts the run (local iteration).
  */
object Bench {

  /** Build the on-disk KPL backlog: `nShards` shard files, each frame a
    * KPL aggregate of [[graft.kpl.KplCodec]]-encoded JSON user records.
    * Fixture construction (driver-side by design — it writes local files),
    * not part of the measured drain. Returns (dir, userRecordCount).
    *
    * With `reshard = true` the backlog models a MID-BACKLOG SPLIT — the
    * catch-up shape a consumer faces after the stream scaled out under
    * load: 4 CLOSED parents hold the first half of the traffic, their 8
    * children (2 per parent, `shards.json` lineage) hold the second half.
    * The drain then runs under [[graft.sources.ReshardAdmission]]: children
    * are held at their committed offsets until their parent is fully
    * consumed, and the row budget re-concentrates on admitted shards. */
  private def buildKplBacklog(
      spark: SparkSession, sfDir: String, nowMs: Long,
      reshard: Boolean): (String, Long) = {
    val perFrame = 50
    val payloads = spark.read.parquet(s"$sfDir/events.parquet")
      .selectExpr("to_json(struct(event_id, user_id, event_type, value)) AS j")
      .collect().map(_.getString(0))
    val dir = Files.createTempDirectory("graft_bench_kpl").toString
    val tsMs = nowMs - 300000L // 5 min "ago": inside the default 10-min window
    def writeShards(items: Array[String], shardIds: Seq[Int]): Unit =
      items.grouped(items.length / shardIds.size + 1).zipWithIndex.foreach {
        case (shardPayloads, k) =>
          val shardId = shardIds(k)
          val frames = shardPayloads.grouped(perFrame).zipWithIndex.map {
            case (batch, i) =>
              graft.sources.KplShardFiles.Frame(
                tsMs, s"pk-$shardId-$i",
                graft.kpl.KplCodec.aggregate(
                  s"pk-$shardId-$i", batch.map(_.getBytes(UTF_8)).toSeq))
          }.toSeq
          graft.sources.KplShardFiles.write(dir, shardId, frames)
      }
    if (!reshard) writeShards(payloads, 0 until 8)
    else {
      val (pre, post) = payloads.splitAt(payloads.length / 2)
      writeShards(pre, 0 until 4) // parents: traffic before the split
      writeShards(post, 4 until 12) // children: traffic after it
      import graft.sources.{KplShardFiles => F, ShardMeta}
      F.writeMetas(dir,
        (0 until 4).map(p => ShardMeta(F.shardFileName(p), Nil, closed = true)) ++
          (4 until 12).map(c => ShardMeta(
            F.shardFileName(c), Seq(F.shardFileName((c - 4) / 2)), closed = false)))
    }
    (dir, payloads.length.toLong)
  }

  /** AvailableNow drain of the backlog through the records pipeline;
    * returns the JSON fragment with throughput + per-batch stats. Metrics
    * accumulate through a [[StreamingQueryListener]] — `recentProgress`
    * retains only the last `numRecentProgressUpdates` entries, which would
    * silently undercount a backlog of more micro-batches than that (a
    * 100×-scale drain has thousands). */
  private def streamingBench(spark: SparkSession, sfDir: String): String = {
    val nowMs = 960L * 60000L // fixture clock, epoch-relative like the specs
    // SPARK_GRAFT_RESHARD=1: drain a mid-backlog-split topology instead of
    // the flat 8-shard one (see buildKplBacklog) — the reshard lane.
    val reshard = sys.env.get("SPARK_GRAFT_RESHARD").contains("1")
    val (dir, nRecords) = buildKplBacklog(spark, sfDir, nowMs, reshard)
    val q = graft.api.RecordsQuery.validate(Map("streamname" -> "bench"))
      .toOption.get
    val envelope = graft.streaming.RecordsStream
      .envelopeStream(spark, dir, q, nowMs)
    val out = graft.streaming.RecordsStream.records(envelope, q)
      .observe("graft_stream", count(lit(1)).as("n"))
    val ckpt = Files.createTempDirectory("graft_bench_ckpt").toString

    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long, Long, Long)]()
    @volatile var terminated = false
    @volatile var queryId: java.util.UUID = null
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        if (p.id == queryId && p.numInputRows > 0) {
          val obs = Option(p.observedMetrics.get("graft_stream"))
            .map(_.getLong(0)).getOrElse(0L)
          // State-store footprint per micro-batch: a drain whose state
          // grows with backlog depth would OOM a long catch-up — the
          // records pipeline is stateless by design (source offsets are
          // the only state), and recording the operator metrics is the
          // evidence (the scaled lanes assert it stays flat).
          val stRows = p.stateOperators.map(_.numRowsTotal).sum
          val stMemB = p.stateOperators.map(_.memoryUsedBytes).sum
          batches.add((obs, p.durationMs.get("triggerExecution").toLong,
            stRows, stMemB))
        }
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == queryId) terminated = true
    }
    spark.streams.addListener(listener)
    try {
      val t0 = System.nanoTime()
      val sq = out.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      queryId = sq.id
      sq.awaitTermination()
      val wallSec = (System.nanoTime() - t0) / 1e9
      // listener events are delivered asynchronously; the terminated event
      // trails every progress event for this query, so waiting for it
      // guarantees the batch list is complete
      val deadline = System.nanoTime() + 10_000_000_000L
      while (!terminated && System.nanoTime() < deadline) Thread.sleep(50)
      val all = batches.toArray(Array.empty[(Long, Long, Long, Long)])
      val rowsOut = all.map(_._1).sum
      val batchMs = all.map(_._2).sorted
      def pct(p: Double): Long =
        if (batchMs.isEmpty) 0L
        else batchMs(math.min(batchMs.length - 1, (p * batchMs.length).toInt))
      val rps = if (wallSec > 0) rowsOut / wallSec else 0.0
      val stRowsMax = if (all.isEmpty) 0L else all.map(_._3).max
      val stMemMaxMb = if (all.isEmpty) 0.0 else all.map(_._4).max / 1048576.0
      // Fixed-cost attribution: the FIRST micro-batch carries one-time
      // machinery (stream planning, shard listing, the frame-offset index
      // build over the whole backlog, codegen for the pipeline) that a
      // deep drain amortizes but a small backlog bills entirely to its
      // rate — `records_per_sec_steady` prices the drain with the first
      // batch excluded, so the small-backlog row and the 10×/100× lanes
      // are comparable.
      val firstMs = all.headOption.map(_._2).getOrElse(0L)
      val steadyRows = rowsOut - all.headOption.map(_._1).getOrElse(0L)
      val steadyMs = all.drop(1).map(_._2).sum
      val steadyRps = if (steadyMs > 0) steadyRows * 1000.0 / steadyMs else 0.0
      s""""streaming":{"records":$rowsOut,"expected":$nRecords,""" +
        s""""wall_sec":$wallSec,"records_per_sec":$rps,""" +
        f""""first_batch_ms":$firstMs,"records_per_sec_steady":$steadyRps%.1f,""" +
        s""""n_batches":${all.length},""" +
        s""""batch_p50_ms":${pct(0.50)},"batch_p99_ms":${pct(0.99)},""" +
        f""""state_rows_max":$stRowsMax,"state_mem_mb_max":$stMemMaxMb%.1f}"""
    } finally spark.streams.removeListener(listener)
  }

  /** CRAWL-MOUTH GATE throughput lane (`SPARK_GRAFT_GATE_STREAM=1`): a
    * multi-batch drain of the new-sources docs through the REAL
    * [[graft.ops.CorpusDedup.gateStream]] — verdict against the stored
    * base index, append only the novel docs (the gate LEARNS), audit
    * rows per batch — measured end to end. The base-index build is timed
    * separately (`build_sec`); the drain numbers price the gate itself:
    * docs/s over the drain wall, per-batch p50/p99, and the index growth
    * (exactly the novel docs). Run against the derived 10× fixture for
    * the scaled row. Batches arrive sequentially (single-writer gate by
    * contract), so per-batch wall IS the operator's latency. */
  private def gateStreamBench(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.col
    val sess = spark
    import sess.implicits.newProductEncoder
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val newSrc = graft.queries.Dedup.NewSources
    val base = docs.filter(!col("source").isin(newSrc: _*))
      .select(col("doc_id"), col("text"))
    val incoming = docs.filter(col("source").isin(newSrc: _*))
      .select(col("doc_id").cast("long"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val idxDir = Files.createTempDirectory("graft_gate_idx").toString
    val verdictDir = Files.createTempDirectory("graft_gate_verdicts").toString
    val ckpt = Files.createTempDirectory("graft_gate_ckpt").toString
    val tb0 = System.nanoTime()
    graft.ops.CorpusDedup.buildIndex(base, "doc_id", "text", idxDir)
    val buildSec = (System.nanoTime() - tb0) / 1e9
    val docsBefore = graft.ops.CorpusDedup.fromIndex(spark, idxDir)
      .signatures.count()
    val nBatches = 8
    val chunks = incoming.grouped(
      math.max(1, (incoming.length + nBatches - 1) / nBatches)).toSeq
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)](spark)
    val q = graft.ops.CorpusDedup.gateStream(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      idxDir, verdictDir, ckpt, trigger = Trigger.ProcessingTime(0))
    val batchMs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val t0 = System.nanoTime()
    try {
      chunks.foreach { c =>
        val b0 = System.nanoTime()
        stream.addData(c.toIndexedSeq)
        q.processAllAvailable()
        batchMs += (System.nanoTime() - b0) / 1000000L
      }
    } finally q.stop()
    val wallSec = (System.nanoTime() - t0) / 1e9
    graft.ops.CorpusDedup.refreshIndex(spark, idxDir)
    val docsAfter = graft.ops.CorpusDedup.fromIndex(spark, idxDir)
      .signatures.count()
    val v = spark.read.parquet(verdictDir)
    val nVerdicts = v.count()
    val nNovel = v.filter(col("is_novel")).count()
    val sorted = batchMs.sorted
    def pct(p: Double): Long =
      if (sorted.isEmpty) 0L
      else sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))
    val dps = if (wallSec > 0) incoming.length / wallSec else 0.0
    f""""gate_stream":{"docs":${incoming.length},"verdicts":$nVerdicts,""" +
      f""""novel":$nNovel,"index_docs_before":$docsBefore,""" +
      f""""index_docs_after":$docsAfter,"build_sec":$buildSec%.2f,""" +
      f""""wall_sec":$wallSec%.2f,"docs_per_sec":$dps%.1f,""" +
      s""""n_batches":${batchMs.length},""" +
      s""""batch_p50_ms":${pct(0.50)},"batch_p99_ms":${pct(0.99)}}"""
  }

  /** ANN NOVELTY GATE throughput lane — the vector twin of
    * [[gateStreamBench]], drained through the REAL
    * [[graft.ops.VectorSearch.gateStream]]: verdict each embedding
    * micro-batch against the stored IVF index (nprobe-bounded probe +
    * batch self-compare), append only the novel vectors (assignment
    * against the stored quantizer — no retrain), audit rows per batch. */
  private def gateStreamAnnBench(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.col
    val sess = spark
    import sess.implicits.newProductEncoder
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 7 =!= 3)
      .select(col("vec_id"), col("embedding"))
    val incoming = emb.filter(col("vec_id") % 7 === 3)
      .select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val idxDir = Files.createTempDirectory("graft_anngate_idx").toString
    val verdictDir = Files.createTempDirectory("graft_anngate_v").toString
    val ckpt = Files.createTempDirectory("graft_anngate_ckpt").toString
    val tb0 = System.nanoTime()
    graft.ops.VectorSearch.buildIvfIndex(base, "vec_id", "embedding", idxDir)
    val buildSec = (System.nanoTime() - tb0) / 1e9
    val vecsBefore = graft.ops.VectorSearch.fromIvfIndex(spark, idxDir)
      .vectors.count()
    val nBatches = 8
    val chunks = incoming.grouped(
      math.max(1, (incoming.length + nBatches - 1) / nBatches)).toSeq
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])](spark)
    val q = graft.ops.VectorSearch.gateStream(
      stream.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
      idxDir, verdictDir, ckpt, trigger = Trigger.ProcessingTime(0))
    val batchMs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val t0 = System.nanoTime()
    try {
      chunks.foreach { c =>
        val b0 = System.nanoTime()
        stream.addData(c.toIndexedSeq)
        q.processAllAvailable()
        batchMs += (System.nanoTime() - b0) / 1000000L
      }
    } finally q.stop()
    val wallSec = (System.nanoTime() - t0) / 1e9
    graft.ops.VectorSearch.refreshIvfIndex(spark, idxDir)
    val vecsAfter = graft.ops.VectorSearch.fromIvfIndex(spark, idxDir)
      .vectors.count()
    val v = spark.read.parquet(verdictDir)
    val nVerdicts = v.count()
    val nNovel = v.filter(col("is_novel")).count()
    val sorted = batchMs.sorted
    def pct(p: Double): Long =
      if (sorted.isEmpty) 0L
      else sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))
    val vps = if (wallSec > 0) incoming.length / wallSec else 0.0
    f""""gate_stream_ann":{"vecs":${incoming.length},"verdicts":$nVerdicts,""" +
      f""""novel":$nNovel,"index_vecs_before":$vecsBefore,""" +
      f""""index_vecs_after":$vecsAfter,"build_sec":$buildSec%.2f,""" +
      f""""wall_sec":$wallSec%.2f,"vecs_per_sec":$vps%.1f,""" +
      s""""n_batches":${batchMs.length},""" +
      s""""batch_p50_ms":${pct(0.50)},"batch_p99_ms":${pct(0.99)}}"""
  }

  /** COMPOSED ADMISSION MOUTH throughput lane
    * (`SPARK_GRAFT_MOUTH_STREAM=1`): the new-sources docs LEFT-joined to
    * their embeddings, drained through the REAL
    * [[graft.ops.CrawlMouth.admissionStream]] — quality + language +
    * dedup gate + ANN novelty, BOTH indexes learning, one manifest row
    * per doc — in sequential micro-batches. Prices the whole mouth
    * (what a crawl ingest pays per batch), next to the single-gate
    * lanes that price each tier alone. Both base-index builds are timed
    * separately (`build_sec`). */
  private def admissionMouthBench(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.col
    val sess = spark
    import sess.implicits.newProductEncoder
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val newSrc = graft.queries.Dedup.NewSources
    val newIds = docs.filter(col("source").isin(newSrc: _*))
      .select(col("doc_id").as("vec_id"))
    val baseDocs = docs.filter(!col("source").isin(newSrc: _*))
      .select(col("doc_id"), col("text"))
    val baseVecs = emb.join(newIds, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("embedding"))
    val incoming = docs.filter(col("source").isin(newSrc: _*))
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      .join(emb.select(col("vec_id"), col("embedding")),
        col("doc_id") === col("vec_id"), "left")
      .select(col("doc_id"), col("text"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) Option.empty[Seq[Float]]
        else Some(r.getSeq[Float](2))))
    val dedupDir = Files.createTempDirectory("graft_mouth_dedup").toString
    val ivfDir = Files.createTempDirectory("graft_mouth_ivf").toString
    val vDir = Files.createTempDirectory("graft_mouth_v").toString
    val ckpt = Files.createTempDirectory("graft_mouth_ckpt").toString
    val tb0 = System.nanoTime()
    graft.ops.CorpusDedup.buildIndex(baseDocs, "doc_id", "text", dedupDir)
    graft.ops.VectorSearch.buildIvfIndex(baseVecs, "vec_id", "embedding", ivfDir)
    val buildSec = (System.nanoTime() - tb0) / 1e9
    val docsBefore = graft.ops.CorpusDedup.fromIndex(spark, dedupDir)
      .signatures.count()
    val vecsBefore = graft.ops.VectorSearch.fromIvfIndex(spark, ivfDir)
      .vectors.count()
    val nBatches = 8
    val chunks = incoming.grouped(
      math.max(1, (incoming.length + nBatches - 1) / nBatches)).toSeq
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Option[Seq[Float]])](spark)
    // per-stage wall collector: foreachBatch runs stages sequentially on
    // the driver, so a plain synchronized map suffices
    val stageWall = scala.collection.mutable.Map.empty[String, Double]
      .withDefaultValue(0.0)
    val stageLast = scala.collection.mutable.Map.empty[String, Double]
    val q = graft.ops.CrawlMouth.admissionStream(
      stream.toDF().toDF("doc_id", "text", "embedding"),
      "doc_id", "text", "embedding", dedupDir, ivfDir, vDir, ckpt,
      trigger = Trigger.ProcessingTime(0),
      onStageWall = (_, stage, sec) => stageWall.synchronized {
        stageWall(stage) += sec; stageLast(stage) = sec
      })
    val batchMs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val t0 = System.nanoTime()
    try {
      chunks.foreach { c =>
        val b0 = System.nanoTime()
        stream.addData(c.toIndexedSeq)
        q.processAllAvailable()
        batchMs += (System.nanoTime() - b0) / 1000000L
      }
    } finally q.stop()
    val wallSec = (System.nanoTime() - t0) / 1e9
    graft.ops.CorpusDedup.refreshIndex(spark, dedupDir)
    graft.ops.VectorSearch.refreshIvfIndex(spark, ivfDir)
    val docsAfter = graft.ops.CorpusDedup.fromIndex(spark, dedupDir)
      .signatures.count()
    val vecsAfter = graft.ops.VectorSearch.fromIvfIndex(spark, ivfDir)
      .vectors.count()
    // per-stage wall JSON (shared by the drain table and the retrain
    // wave rows below)
    def stageJson(m: collection.Map[String, Double]): String =
      Seq("extract", "dedup_gate", "ann_gate", "manifest")
        .map(s => f""""$s":${m.getOrElse(s, 0.0)}%.2f""").mkString("{", ",", "}")
    // dot-scoped substage walls (e.g. dedup_gate.stored_probe) — the
    // round-16 per-substage attribution of the flat per-batch constant
    def subStageJson(m: collection.Map[String, Double]): String =
      m.keys.filter(_.contains('.')).toSeq.sorted
        .map(s => f""""$s":${m(s)}%.2f""").mkString("{", ",", "}")
    // SPARK_GRAFT_MOUTH_RETRAIN=1 (round 15: IN-SITU): run the
    // maintenance cycle INSIDE the composed mouth — the drain above
    // already priced the stale k=16 quantizer per stage; now drain one
    // fresh-doc wave against a COPY of the grown indexes (stale
    // quantizer), run the recall-gated √n-scaled retrain on the live
    // index (the cycle a production mouth crons between drains), drain
    // the IDENTICAL wave against the retrained index, and assert
    // drain-to-drain verdict equality the way WireMouthBench does. The
    // ann_gate stage wall of the two wave drains is the in-situ
    // before/after the round-14 standalone probe only approximated.
    val retrainJson =
      if (!sys.env.get("SPARK_GRAFT_MOUTH_RETRAIN").contains("1")) ""
      else {
        // Fresh-doc wave: texts carry the 'the' marker plus 20 vocab
        // words picked by a splitmix64 of the id — quality- and
        // language-passing, and shingle-novel against every stored doc
        // (distinct token n-grams), so the wave reaches the ANN gate
        // instead of dying at dedup. Embeddings are EXACT COPIES of
        // already-stored vectors: an exact-copy query co-assigns with
        // its stored twin at ANY quantizer size (same argmin), so the
        // sem verdict (cos 1.0 ≥ τ, not novel) is deterministic on both
        // plans and the two wave manifests must match bit-for-bit.
        // 2×10^11 id offset: the replica fixtures use r×10^8 key
        // offsets (ids to ~10^10 at 100×), so the wave ids stay out of
        // every ingested id space.
        val vocab = Array("oak", "elm", "ash", "birch", "cedar", "maple",
          "willow", "poplar", "spruce", "fir", "pine", "yew", "hazel",
          "alder", "rowan", "beech", "larch", "juniper", "cypress", "lion",
          "tiger", "bear", "wolf", "fox", "otter", "lynx", "seal", "hawk",
          "crow", "owl", "deer", "moose", "bison", "hare", "mole", "bat",
          "toad", "newt", "crab", "iron", "copper", "zinc", "tin", "gold",
          "silver", "nickel", "cobalt", "chrome", "brass", "bronze",
          "steel", "pewter", "mercury", "platinum", "titanium", "sodium",
          "lithium", "neon", "argon", "north", "south", "east", "west",
          "summit")
        def mix(z0: Long): Long = {
          var z = z0 + 0x9e3779b97f4a7c15L
          z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
          z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
          z ^ (z >>> 31)
        }
        def waveText(id: Long): String =
          "the " + (0 until 20).map(i =>
            vocab(java.lang.Math.floorMod(mix(id * 21 + i),
              vocab.length.toLong).toInt)).mkString(" ")
        // Wave membership (round-17 fix): embeddings are exact copies of
        // STORED vectors, read from the grown index itself. The old wave
        // copied INCOMING docs' embeddings and relied on those values
        // being stored — true for the round-15 fixture generation (the
        // main drain appended 114 of them), silently false for the
        // current one (sem_novel = 0: every incoming vector is a
        // NEAR-dup of a base vector, none bit-identical, none appended).
        // A near-dup query's best match sits in some OTHER vector's
        // centroid list, and whether a probe reaches that list is
        // quantizer-dependent — measured: 3 of 200 wave docs flipped
        // sem_novel false→true after the k 16→43 retrain, and the lane's
        // verdicts_equal went false. An exact VALUE copy of a stored
        // vector co-assigns with its twin under ANY quantizer (same
        // argmin), so the twin is always in probe list 1 and the sem
        // verdict is drain-invariant BY CONSTRUCTION — the property this
        // lane's equality check is specified to certify — independent of
        // how the fixture generation pairs incoming and base vectors.
        // (Stored v is the canon-widened float embedding, so the
        // double→float→double round trip below is exact.)
        val wave = spark.read.parquet(s"$ivfDir/vectors")
          .select(col("vec_id"), col("v"))
          .orderBy(col("vec_id")).limit(2000)
          .collect().iterator.map { r =>
            val id = r.getLong(0)
            (id + 200000000000L, waveText(id),
              Some(r.getSeq[Double](1).map(_.toFloat)))
          }.toIndexedSeq

        def drainWave(label: String, dDir: String, iDir: String)
            : (Double, Map[String, Double],
               Map[Long, (Option[Any], Option[Any], Boolean)]) = {
          val vDirW = Files.createTempDirectory(s"graft_mouth_wave_$label")
            .toString
          val ckW = Files.createTempDirectory(s"graft_mouth_wck_$label")
            .toString
          val waveStream = org.apache.spark.sql.execution.streaming.runtime
            .MemoryStream[(Long, String, Option[Seq[Float]])](spark)
          val walls = scala.collection.mutable.Map.empty[String, Double]
            .withDefaultValue(0.0)
          val wq = graft.ops.CrawlMouth.admissionStream(
            waveStream.toDF().toDF("doc_id", "text", "embedding"),
            "doc_id", "text", "embedding", dDir, iDir, vDirW, ckW,
            trigger = Trigger.ProcessingTime(0),
            onStageWall = (_, stage, sec) => walls.synchronized {
              walls(stage) += sec
            })
          val tw0 = System.nanoTime()
          try {
            wave.grouped(math.max(1, (wave.length + 3) / 4)).foreach { c =>
              waveStream.addData(c)
              wq.processAllAvailable()
            }
          } finally wq.stop()
          val wall = (System.nanoTime() - tw0) / 1e9
          val mW = spark.read.parquet(s"$vDirW/manifest")
            .select(col("doc_id"), col("is_dup"), col("sem_novel"),
              col("admitted"))
            .collect().map(r => r.getLong(0) ->
              ((Option(r.get(1)), Option(r.get(2)), r.getBoolean(3)))).toMap
          (wall, walls.toMap, mW)
        }

        // stale side drains a file-copy of the grown indexes, so the live
        // index's retrain below cannot see the wave and both drains start
        // from the identical stored state
        val staleDedup =
          graft.TempIndexDirs.copyOf(dedupDir, "graft-mouth-stale-dedup")
        val staleIvf =
          graft.TempIndexDirs.copyOf(ivfDir, "graft-mouth-stale-ivf")
        val kBefore = spark.read.parquet(s"$ivfDir/centroids").count()
        val (staleWall, staleStages, staleManifest) =
          drainWave("stale", staleDedup, staleIvf)
        val tR = System.nanoTime()
        // gate at the mouth's own novelty threshold (threshold-match
        // recall — the ANN tier's operational semantic), not generic
        // top-k ranking recall, which a coverage-shrinking scaled
        // quantizer rightly fails on unclustered corpora
        val (acted, rb, ra) =
          graft.ops.VectorSearch.retrainIvfIndexScaled(spark, ivfDir,
            gateTauE4 = Some(graft.queries.Similarity.NearDupE4))
        val retrainSec = (System.nanoTime() - tR) / 1e9
        graft.ops.VectorSearch.refreshIvfIndex(spark, ivfDir)
        val kAfter = spark.read.parquet(s"$ivfDir/centroids").count()
        // the retrained drain ALSO runs against copies (round-16 ADVICE
        // fix): draining the live dirs would permanently admit the wave
        // docs into the grown indexes, so a later stage or re-run of the
        // lane against the same dirs would see contaminated stored state
        // (wave signatures/vectors already present) and shifted verdicts
        val freshDedup =
          graft.TempIndexDirs.copyOf(dedupDir, "graft-mouth-fresh-dedup")
        val freshIvf =
          graft.TempIndexDirs.copyOf(ivfDir, "graft-mouth-fresh-ivf")
        val (freshWall, freshStages, freshManifest) =
          drainWave("retrained", freshDedup, freshIvf)
        val verdictsEqual = staleManifest == freshManifest
        if (!verdictsEqual) {
          val diff = (staleManifest.keySet ++ freshManifest.keySet).toSeq
            .sorted
            .filter(k => staleManifest.get(k) != freshManifest.get(k))
            .take(10)
          System.err.println(
            s"[mouth-retrain] WAVE VERDICT MISMATCH on doc_ids: $diff")
          diff.foreach(k => System.err.println(
            s"[mouth-retrain]   $k stale=${staleManifest.get(k)} " +
              s"retrained=${freshManifest.get(k)}"))
        }
        f""""ann_retrain":{"acted":$acted,"recall_before_pct":$rb,""" +
          f""""recall_after_pct":$ra,"k_before":$kBefore,"k_after":$kAfter,""" +
          f""""retrain_sec":$retrainSec%.2f,"wave_docs":${wave.length},""" +
          f""""stale_drain_sec":$staleWall%.2f,""" +
          f""""retrained_drain_sec":$freshWall%.2f,""" +
          s""""stale_stage_sec":${stageJson(staleStages)},""" +
          s""""retrained_stage_sec":${stageJson(freshStages)},""" +
          s""""verdicts_equal":$verdictsEqual},"""
      }
    val m = spark.read.parquet(s"$vDir/manifest")
    val nManifest = m.count()
    val nAdmitted = m.filter(col("admitted")).count()
    // per-stage passer counts: the scale claim is only as good as the
    // workload — a fixture whose replicas die at the language gate (or
    // whose embeddings saturate the near-dup threshold) prices a stage-0
    // scan, not the composed mouth, and these counts make that visible
    // in the artifact instead of needing a manifest autopsy
    val nLangPass = m.filter(col("quality_ok") && col("lang_ok")).count()
    val nDedupNovel = m.filter(col("is_dup") === false).count()
    val nSemEval = m.filter(col("sem_novel").isNotNull).count()
    val nSemNovel = m.filter(col("sem_novel") === true).count()
    val sorted = batchMs.sorted
    def pct(p: Double): Long =
      if (sorted.isEmpty) 0L
      else sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))
    val dps = if (wallSec > 0) incoming.length / wallSec else 0.0
    // per-stage wall: total seconds over the drain plus the LAST batch's
    // seconds (within-drain growth — a stage whose last-batch cost is far
    // above its mean is the one growing with the stored index)
    f""""mouth_stream":{"docs":${incoming.length},"manifest":$nManifest,""" +
      retrainJson +
      s""""stage_sec":${stageJson(stageWall)},""" +
      s""""stage_sub_sec":${subStageJson(stageWall)},""" +
      s""""stage_last_sec":${stageJson(stageLast)},""" +
      f""""admitted":$nAdmitted,"lang_pass":$nLangPass,""" +
      f""""dedup_novel":$nDedupNovel,"sem_evaluated":$nSemEval,""" +
      f""""sem_novel":$nSemNovel,"index_docs_before":$docsBefore,""" +
      f""""index_docs_after":$docsAfter,"index_vecs_before":$vecsBefore,""" +
      f""""index_vecs_after":$vecsAfter,"build_sec":$buildSec%.2f,""" +
      f""""wall_sec":$wallSec%.2f,"docs_per_sec":$dps%.1f,""" +
      s""""n_batches":${batchMs.length},""" +
      s""""batch_p50_ms":${pct(0.50)},"batch_p99_ms":${pct(0.99)}}"""
  }

  /** STATEFUL-STREAMING lane (`SPARK_GRAFT_STATEFUL_STREAM=1`): the two
    * stateful operators whose scale story was previously inference-only —
    * the watermarked seen-key dedup (`dropDuplicatesWithinWatermark`) and
    * the `flatMapGroupsWithState` sessionizer — drained over the events
    * fixture in EVENT-TIME order (so the watermark advances per batch and
    * state actually EVICTS; a shuffled feed would hold the watermark at
    * the minimum and measure an eviction-free accumulation instead). The
    * measured claim is BOUNDED STATE: per-micro-batch state-store rows
    * and bytes from the operator metrics (max AND last — a last well
    * below the max is the eviction visible), next to throughput and
    * per-batch latency. Run against sf0.1 and the derived 10× fixture
    * for the growth rows. */
  private def statefulStreamBench(spark: SparkSession, sfDir: String): String = {
    import org.apache.spark.sql.functions.col
    val sess = spark
    import sess.implicits.{newProductEncoder, newLongEncoder}
    val nChunks = 32

    /** Drain one stateful pipeline: `mkQuery` builds the StreamingQuery
      * from a per-batch row-count callback; returns its JSON fragment. */
    def drain(
        name: String, nIn: Long,
        mkQuery: (Long => Unit) => org.apache.spark.sql.streaming.StreamingQuery,
        feed: (Int, org.apache.spark.sql.streaming.StreamingQuery) => Unit): String = {
      // Capture progress UNCONDITIONALLY, keyed by query id, and filter
      // AFTER the drain: assigning `qid` only after mkQuery returns used
      // to race the initial micro-batch (ProcessingTime(0) can emit a
      // QueryProgressEvent before the assignment), silently dropping its
      // state snapshot. A fresh listener per drain + post-hoc filter by
      // q.id loses nothing and still excludes any late events from the
      // previous (stopped) drain's query.
      val stateSnaps =
        new java.util.concurrent.ConcurrentLinkedQueue[(java.util.UUID, Long, Long)]()
      val listener = new StreamingQueryListener {
        override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          stateSnaps.add((p.id, p.stateOperators.map(_.numRowsTotal).sum,
            p.stateOperators.map(_.memoryUsedBytes).sum))
        }
        override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      }
      spark.streams.addListener(listener)
      val rowsOut = new java.util.concurrent.atomic.AtomicLong(0L)
      val batchMs = scala.collection.mutable.ArrayBuffer.empty[Long]
      val t0 = System.nanoTime()
      val q = mkQuery(n => { rowsOut.addAndGet(n); () })
      try {
        (0 until nChunks).foreach { i =>
          val b0 = System.nanoTime()
          feed(i, q)
          q.processAllAvailable()
          batchMs += (System.nanoTime() - b0) / 1000000L
        }
      } finally {
        q.stop()
        spark.streams.removeListener(listener)
      }
      val wallSec = (System.nanoTime() - t0) / 1e9
      val snaps = stateSnaps.toArray(Array.empty[(java.util.UUID, Long, Long)])
        .filter(_._1 == q.id).map(s => (s._2, s._3))
      val stRowsMax = if (snaps.isEmpty) 0L else snaps.map(_._1).max
      val stRowsLast = if (snaps.isEmpty) 0L else snaps.last._1
      val stMemMaxMb = if (snaps.isEmpty) 0.0 else snaps.map(_._2).max / 1048576.0
      val sorted = batchMs.sorted
      def pct(p: Double): Long =
        if (sorted.isEmpty) 0L
        else sorted(math.min(sorted.length - 1, (p * sorted.length).toInt))
      val eps = if (wallSec > 0) nIn / wallSec else 0.0
      f""""$name":{"events":$nIn,"rows_out":${rowsOut.get},""" +
        f""""wall_sec":$wallSec%.2f,"events_per_sec":$eps%.1f,""" +
        s""""n_batches":${batchMs.length},""" +
        s""""batch_p50_ms":${pct(0.50)},"batch_p99_ms":${pct(0.99)},""" +
        f""""state_rows_max":$stRowsMax,"state_rows_last":$stRowsLast,""" +
        f""""state_mem_mb_max":$stMemMaxMb%.1f}"""
    }

    // events in event-time order, chunked: each micro-batch advances the
    // watermark past the previous batch's max ts
    val evRows = graft.Tables.events(spark, sfDir)
      .select(col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .orderBy(col("ts"), col("user_id"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2), r.getDouble(3)))
    val chunksOf = evRows.grouped(
      math.max(1, (evRows.length + nChunks - 1) / nChunks)).toIndexedSeq

    val dedupJson = {
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(java.sql.Timestamp, Long, String, Double)](spark)
      drain("dedup_watermark", evRows.length,
        onRows => graft.streaming.EventStreams.dedupWithinWatermark(
          stream.toDF().toDF("ts", "user_id", "event_type", "value"))
          .writeStream
          .option("checkpointLocation",
            Files.createTempDirectory("graft_stful_dedup_ck").toString)
          .trigger(Trigger.ProcessingTime(0))
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: java.lang.Long) => onRows(b.count())
          }.start(),
        (i, _) => if (i < chunksOf.length)
          stream.addData(chunksOf(i).toIndexedSeq))
    }
    val sessionJson = {
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.EventStreams.Ev](spark)
      drain("sessionize", evRows.length,
        onRows => graft.streaming.EventStreams.sessionize(stream.toDS())
          .writeStream
          .option("checkpointLocation",
            Files.createTempDirectory("graft_stful_sess_ck").toString)
          .trigger(Trigger.ProcessingTime(0))
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[graft.streaming.EventStreams.Session],
             _: java.lang.Long) => onRows(b.count())
          }.start(),
        (i, _) => if (i < chunksOf.length)
          stream.addData(chunksOf(i).map(r =>
            graft.streaming.EventStreams.Ev(r._2, r._1, r._4)).toIndexedSeq))
    }
    // Round 14: the remaining two stateful operators get measured rows
    // (the split-drain specs pin their semantics; these pin their cost).
    // Stream-stream join: 'view' events are the impression side, 'click'
    // events the click side, joined per user within 30 min — both sides
    // watermarked 1 h, fed in event-time lockstep so both watermarks
    // advance together and join state actually evicts.
    val ssjoinJson = {
      val imps = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp)](spark)
      val clks = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp)](spark)
      val impRows = evRows.filter(_._3 == "view").map(r => (r._2, r._1))
      val clkRows = evRows.filter(_._3 == "click").map(r => (r._2, r._1))
      val impChunks = impRows.grouped(
        math.max(1, (impRows.length + nChunks - 1) / nChunks)).toIndexedSeq
      val clkChunks = clkRows.grouped(
        math.max(1, (clkRows.length + nChunks - 1) / nChunks)).toIndexedSeq
      drain("ss_join", impRows.length + clkRows.length,
        onRows => graft.streaming.EventStreams.impressionClickJoin(
          imps.toDF().toDF("imp_user", "imp_ts"),
          clks.toDF().toDF("click_user", "click_ts"))
          .writeStream
          .option("checkpointLocation",
            Files.createTempDirectory("graft_stful_ssj_ck").toString)
          .trigger(Trigger.ProcessingTime(0))
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
             _: java.lang.Long) => onRows(b.count())
          }.start(),
        (i, _) => {
          if (i < impChunks.length) imps.addData(impChunks(i).toIndexedSeq)
          if (i < clkChunks.length) clks.addData(clkChunks(i).toIndexedSeq)
        })
    }
    // transformWithState running totals: TimeMode.None by design (a
    // running total never expires), so state is linear in DISTINCT USERS
    // and the honest expectation is state_rows_last == state_rows_max ==
    // the user count — the bounded-by-key-domain shape, vs the
    // bounded-by-watermark shape of the other three.
    val twsJson = {
      // transformWithState needs the RocksDB provider (multiple column
      // families); scope the session conf to this drain and restore,
      // like the StreamingSpec contract tests do
      val prevProvider =
        spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
      val stream = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[graft.streaming.EventStreams.Ev](spark)
      drain("tws_running_totals", evRows.length,
        onRows => graft.streaming.EventStreams.runningTotals(stream.toDS())
          .writeStream
          .option("checkpointLocation",
            Files.createTempDirectory("graft_stful_tws_ck").toString)
          .trigger(Trigger.ProcessingTime(0))
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[
               graft.streaming.EventStreams.RunningTotal],
             _: java.lang.Long) => onRows(b.count())
          }.start(),
        (i, _) => if (i < chunksOf.length)
          stream.addData(chunksOf(i).map(r =>
            graft.streaming.EventStreams.Ev(r._2, r._1, r._4)).toIndexedSeq))
      } finally prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    // Round 15: the TTL variant — bounded-by-POLICY state next to the
    // bounded-by-watermark three and the key-domain-linear TTL-free row.
    // Fed in USER order (not event-time order): a TTL expires keys that
    // go COLD, so the access pattern that demonstrates it is keys
    // arriving, finishing, and never returning — under the uniform
    // event-time feed every user stays warm and the TTL (correctly)
    // evicts nothing. Eviction visible = state_rows_last < state_rows_max.
    val twsTtlJson = {
      val prevProvider =
        spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        // TimeMode.ProcessingTime (the TTL contract) keeps constructing
        // clock-advance batches, so neither processAllAvailable nor
        // AvailableNow ever settles against real data volume (measured:
        // an AvailableNow restart protocol livelocked past 1,800 empty
        // batches as 3 s expirations kept arriving). The TTL drain is
        // therefore WALL-CLOCK PACED: one long-lived ProcessingTime
        // query, chunks fed on a fixed schedule, a settle window of
        // ~2×TTL after the last feed so the cold keys' eviction lands
        // in the captured progress stream, then an explicit stop. The
        // row's claim is the STATE shape (last << max = eviction by
        // policy); wall/throughput report the paced schedule honestly.
        val byUser = evRows.sortBy(r => (r._2, r._1.getTime))
        val ttlChunks = 8
        val userChunks = byUser.grouped(
          math.max(1, (byUser.length + ttlChunks - 1) / ttlChunks))
          .toIndexedSeq
        val stream = org.apache.spark.sql.execution.streaming.runtime
          .MemoryStream[graft.streaming.EventStreams.Ev](spark)
        val ck = Files.createTempDirectory("graft_stful_twsttl_ck").toString
        val stateSnaps =
          new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
        val listener = new StreamingQueryListener {
          override def onQueryStarted(
              e: StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryProgress(
              e: StreamingQueryListener.QueryProgressEvent): Unit = {
            val p = e.progress
            if (p.stateOperators.nonEmpty)
              stateSnaps.add((p.stateOperators.map(_.numRowsTotal).sum,
                p.stateOperators.map(_.memoryUsedBytes).sum))
            ()
          }
          override def onQueryTerminated(
              e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        }
        spark.streams.addListener(listener)
        val rowsOut = new java.util.concurrent.atomic.AtomicLong(0L)
        val t0 = System.nanoTime()
        val q = graft.streaming.EventStreams.runningTotalsTtl(
          stream.toDS(), ttlMs = 3000L)
          .writeStream
          .option("checkpointLocation", ck)
          .trigger(Trigger.ProcessingTime(500))
          .foreachBatch {
            (b: org.apache.spark.sql.Dataset[
               graft.streaming.EventStreams.RunningTotal],
             _: java.lang.Long) => { rowsOut.addAndGet(b.count()); () }
          }.start()
        try {
          userChunks.foreach { c =>
            stream.addData(c.map(r =>
              graft.streaming.EventStreams.Ev(r._2, r._1, r._4)).toIndexedSeq)
            Thread.sleep(1500)
          }
          Thread.sleep(6500) // ~2×TTL settle: cold keys expire and evict
        } finally {
          q.stop()
          spark.streams.removeListener(listener)
        }
        val wallSec = (System.nanoTime() - t0) / 1e9
        val snaps = stateSnaps.toArray(Array.empty[(Long, Long)])
        val stRowsMax = if (snaps.isEmpty) 0L else snaps.map(_._1).max
        val stRowsLast = if (snaps.isEmpty) 0L else snaps.last._1
        val stMemMaxMb =
          if (snaps.isEmpty) 0.0 else snaps.map(_._2).max / 1048576.0
        val eps = if (wallSec > 0) evRows.length / wallSec else 0.0
        f""""tws_running_totals_ttl":{"events":${evRows.length},""" +
          f""""rows_out":${rowsOut.get},"ttl_ms":3000,"paced":true,""" +
          f""""wall_sec":$wallSec%.2f,"events_per_sec":$eps%.1f,""" +
          s""""n_snaps":${snaps.length},""" +
          f""""state_rows_max":$stRowsMax,"state_rows_last":$stRowsLast,""" +
          f""""state_mem_mb_max":$stMemMaxMb%.1f}"""
      } finally prevProvider match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    s""""stateful_stream":{$dedupJson,$sessionJson,$ssjoinJson,$twsJson,$twsTtlJson}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // InferFiltersFromGenerate inlines the full generator expression into an
      // inferred size()>0 filter; for expensive array builders (shingling)
      // that re-runs the tokenizer per element per row — measured 12s vs
      // 0.7s on 5k docs. The inferred filter is useless for our non-empty
      // arrays, so exclude the rule.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); see Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.range(1 << 20).selectExpr("sum(id * 2)").collect() // JVM/codegen warmup

    // Machine-speed reference: a fixed deterministic Spark workload, timed
    // after warmup. Bench totals are only comparable across rounds when the
    // machines are — round 9's VM ran identical JVM workloads ~2× slower
    // than round 8's (stable across repeats) — so every bench line carries
    // the number that lets a reader normalize: wall-clock for 2^26 rows of
    // codegen'd arithmetic + one 32-way aggregate, ~constant per machine.
    val cpuRefSec = {
      val t0 = System.nanoTime()
      spark.range(1L << 26).selectExpr("sum(id * 3 + (id % 7))").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // Touch one small parquet so Hadoop FS + parquet reader initialization
    // (~2 s of first-scan machinery) isn't billed to the first measured
    // query; the table is tiny, so no fixture data is meaningfully cached.
    // The mouth-realistic fixture ships only documents/embeddings, so fall
    // back to documents when the dimension table is absent.
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: org.apache.spark.sql.AnalysisException =>
      spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id").count()
    }

    // SPARK_GRAFT_QUERIES=a,b,c restricts the run (local iteration only;
    // the driver runs the full suite). SPARK_GRAFT_STREAM_ONLY=1 skips the
    // batch suite and measures just the streaming drain — the
    // "Kinesis reader at scale" lane (run it against the derived 10×
    // fixture for the scaled-stream number).
    val streamOnly = sys.env.get("SPARK_GRAFT_STREAM_ONLY").contains("1")
    // SPARK_GRAFT_GATE_STREAM=1: dedicated crawl-mouth gate drain lane
    // (skips the batch suite and the records drain, like STREAM_ONLY).
    val gateOnly = sys.env.get("SPARK_GRAFT_GATE_STREAM").contains("1")
    // SPARK_GRAFT_MOUTH_STREAM=1: the composed admission-mouth drain lane
    val mouthOnly = sys.env.get("SPARK_GRAFT_MOUTH_STREAM").contains("1")
    // SPARK_GRAFT_STATEFUL_STREAM=1: the stateful-operator drain lane
    // (watermarked dedup + flatMapGroupsWithState sessionizer)
    val statefulOnly = sys.env.get("SPARK_GRAFT_STATEFUL_STREAM").contains("1")
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val selected =
      if (streamOnly || gateOnly || mouthOnly || statefulOnly) Seq.empty
      else SparkEntry.benchQueries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_(name)) }

    var failed = List.empty[String]
    // Variance-proof lane protocol (round 14): the single-run lane could
    // not distinguish a real regression from the sandbox's machine-state
    // band — two same-code runs at the round-13 HEAD recorded individual
    // rows swinging 3.5× in BOTH directions (12.4 ↔ 43.4 s on one query)
    // with identical shuffle bytes. The batch lane therefore runs
    // SPARK_GRAFT_BENCH_REPS full passes (default 3; 1 when iterating
    // with SPARK_GRAFT_QUERIES), each pass in a fresh session with
    // cleared caches and reset stored-index memos — i.e. each pass IS
    // the old single-run lane, intra-pass cache sharing included — and
    // reports the per-query MEDIAN as the headline number with min/max
    // alongside, so a cross-round reader sees band, not phantom moves.
    // (A fresh JVM per pass is not reachable in-process; System.gc()
    // between passes bounds old-gen carryover, and the heavy operators'
    // fresh-JVM discipline lives in the ScaleBench curve lane.)
    val reps =
      if (selected.isEmpty) 1 // streaming-lane-only runs have no batch pass
      else sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt)
        .getOrElse(if (only.isDefined) 1 else 3)
    val passes: Seq[Seq[(String, Double)]] = (1 to reps).map { _ =>
      val s = spark.newSession()
      s.catalog.clearCache()
      graft.queries.Dedup.resetStoredIndexMemos()
      graft.queries.Similarity.resetStoredIndexMemos()
      val passResults = selected.map { case (name, fn) =>
        val t0 = System.nanoTime()
        try fn(s, sfDir).write.format("noop").mode("overwrite").save()
        catch { case e: Throwable =>
          if (!failed.contains(name)) failed ::= name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        name -> (System.nanoTime() - t0) / 1e9
      }
      System.gc() // bound old-gen carryover between passes
      passResults
    }
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.length / 2) }
    val results = selected.map(_._1).map { name =>
      name -> med(passes.map(_.find(_._1 == name).get._2))
    }
    val perQueryBand = selected.map(_._1).map { name =>
      val xs = passes.map(_.find(_._1 == name).get._2)
      name -> (xs.min, xs.max)
    }
    val streaming =
      if ((only.isDefined && !streamOnly) || gateOnly || mouthOnly || statefulOnly) None
      else
        try Some(streamingBench(spark, sfDir))
        catch { case e: Throwable =>
          failed ::= "streaming"
          System.err.println(s"[bench] streaming failed: ${e.getMessage}")
          None
        }
    val gate =
      if (!gateOnly) None
      else
        try Some(gateStreamBench(spark, sfDir))
        catch { case e: Throwable =>
          failed ::= "gate_stream"
          System.err.println(s"[bench] gate_stream failed: ${e.getMessage}")
          None
        }
    val gateAnn =
      if (!gateOnly) None
      else
        try Some(gateStreamAnnBench(spark, sfDir))
        catch { case e: Throwable =>
          failed ::= "gate_stream_ann"
          System.err.println(s"[bench] gate_stream_ann failed: ${e.getMessage}")
          None
        }
    val mouth =
      if (!mouthOnly) None
      else
        try Some(admissionMouthBench(spark, sfDir))
        catch { case e: Throwable =>
          failed ::= "mouth_stream"
          System.err.println(s"[bench] mouth_stream failed: ${e.getMessage}")
          None
        }
    val stateful =
      if (!statefulOnly) None
      else
        try Some(statefulStreamBench(spark, sfDir))
        catch { case e: Throwable =>
          failed ::= "stateful_stream"
          System.err.println(s"[bench] stateful_stream failed: ${e.getMessage}")
          None
        }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    // The band columns: per-query min/max across the passes, plus each
    // pass's total — "value"/"queries" stay schema-compatible (medians).
    val bandJson =
      if (reps <= 1) ""
      else {
        val mins = perQueryBand.map { case (k, (mn, _)) => "\"" + k + "\":" + mn }
          .mkString("{", ",", "}")
        val maxs = perQueryBand.map { case (k, (_, mx)) => "\"" + k + "\":" + mx }
          .mkString("{", ",", "}")
        val passTotals = passes.map(_.map(_._2).sum).mkString("[", ",", "]")
        s""""reps":$reps,"queries_min":$mins,"queries_max":$maxs,""" +
          s""""pass_totals":$passTotals,"""
      }
    def metricLine(band: String) =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
        band +
        streaming.map(_ + ",").getOrElse("") +
        gate.map(_ + ",").getOrElse("") +
        gateAnn.map(_ + ",").getOrElse("") +
        mouth.map(_ + ",").getOrElse("") +
        stateful.map(_ + ",").getOrElse("") +
        f""""cpu_ref_sec":$cpuRefSec%.3f,""" +
        // total / cpu_ref: machine-speed-normalized total (round-15 ask —
        // cross-round comparisons stop needing a reader to divide two
        // cpu_refs; the raw total stays the headline "value")
        f""""total_per_cpu_ref":${total / cpuRefSec}%.1f,""" +
        s""""failed":$failedJson,"sf":"$sfDir"}"""
    // stdout gets the contract line WITHOUT the per-query min/max band maps
    // (they tripled the line to ~20 KB; the driver's stdout capture keeps
    // only a small tail, and a line that long can never sit complete inside
    // it). Medians, pass totals and the streaming lanes stay inline; the
    // full band detail lives in bench_out.json, the durable artifact.
    val passTotalsJson =
      if (reps <= 1) ""
      else s""""reps":$reps,"pass_totals":${
        passes.map(_.map(_._2).sum).mkString("[", ",", "]")},"""
    println(metricLine(passTotalsJson))
    try Files.writeString(Paths.get("bench_out.json"), metricLine(bandJson) + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write bench_out.json: ${e.getMessage}")
    }
    spark.stop()
    // A silently-broken query must not hide inside a healthy-looking bench
    // line: surface it in the exit code too.
    if (failed.nonEmpty) sys.exit(1)
  }
}
