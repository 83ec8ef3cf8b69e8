package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.queries.{Dedup, Similarity}
import graft.syntax._

/** The engine's PUBLIC frame-parametric operator API: every flagship
  * pipeline operator over the caller's OWN DataFrames, not the benchmark
  * fixtures. The registry queries in [[graft.queries]] are these same cores
  * bound to the fixture tables (equivalence is spec-asserted), so the
  * oracle gate transitively checks this surface.
  *
  * Conventions: id columns are cast to long; result frames carry the
  * caller's column names where they pass through; every operator keeps the
  * scale shape documented on its core (no cartesian pair generation, hash
  * partial aggregation, bounded driver traffic). Callers own persistence of
  * their inputs; operators persist only their internal indexes and release
  * them before returning (materialized results).
  */
object CorpusDedup {

  private def canon(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    CorpusOps.requireIntegralId(docs, idCol)
    docs.select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
  }

  /** Exact-duplicate groups: md5 fingerprint of normalized text → one row
    * per distinct content with the min-id representative and copy count. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    canon(docs, idCol, textCol)
      .groupBy(md5(TextHash.normText($"text")).as("fp"))
      .agg(min($"doc_id").as("rep_id"), count(lit(1)).as("n_copies"))

  /** N-gram Jaccard near-duplicate pairs (shingle equi-join with the
    * stop-phrase document-frequency cap — never an all-pairs comparison).
    * Output: (da, db, common, jacc_e4) for pairs above the engine
    * threshold. */
  def jaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxShingleDf: Long = Dedup.MaxShingleDf): DataFrame =
    Dedup.jaccardPairs(canon(docs, idCol, textCol), maxShingleDf)

  /** MinHash signatures + LSH band buckets per document (k=8 hashes,
    * 4 bands × 2 rows) — the near-dup index a pipeline materializes. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    Dedup.signaturesOf(Dedup.postingsOf(canon(docs, idCol, textCol)))

  /** Scored LSH candidate pairs (da, db, n_shared_bands, n_eq, est_e4):
    * candidates from band-bucket equi-joins, never pairwise. Buckets with
    * more than `maxBandBucket` members (boilerplate-degenerate skew)
    * generate a linear star of candidates around the bucket's min-id
    * representative instead of quadratic all-pairs — tune the cap down for
    * heavier boilerplate, up when template families must surface as
    * explicit pairs rather than transitively through clustering. */
  def nearDupPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxBandBucket: Long = Dedup.MaxBandBucket): DataFrame = {
    val sigs = minhashSignatures(docs, idCol, textCol).persist()
    sigs.count() // feeds the band explode and both pair-side joins
    val out = Dedup.scoredPairsFromSigs(sigs, maxBandBucket).persist()
    out.count()
    sigs.unpersist(false)
    out
  }

  /** Connected-component cluster labels over the near-dup graph:
    * (doc_id, cluster_id = min member id), graph nodes only. */
  def clusterLabels(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    clustered(docs, idCol, textCol).labels

  private def clustered(docs: DataFrame, idCol: String, textCol: String)
      : Dedup.ClusterLabels = {
    val pairs = nearDupPairs(docs, idCol, textCol)
      .filter($"est_e4" >= Dedup.ClusterEdgeE4)
      .select($"da".as("a"), $"db".as("b"))
      .persist()
    pairs.count()
    val cc = Dedup.propagateLabels(pairs)
    pairs.unpersist(false)
    cc
  }

  /** Character-level Levenshtein verification of candidate pairs — the
    * exact confirmation tier after any candidate generator (the defaults
    * compose directly with [[nearDupPairs]]/[[jaccardPairs]] output).
    * Output per pair: raw distance, the longer text's length, normalized
    * distance (e4) and the verdict at the engine threshold. O(L²) per
    * PAIR — priced strictly against the caller's candidate list, never a
    * generator. A pair referencing an id ABSENT from `docs` stays in the
    * output with NULL metrics and verdict (unverifiable, visibly) rather
    * than vanishing — the caller's candidate list is the contract. */
  def editVerify(
      docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, aCol: String = "da", bCol: String = "db"): DataFrame = {
    CorpusOps.requireIntegralId(pairs, aCol)
    CorpusOps.requireIntegralId(pairs, bCol)
    Dedup.editVerifyFrom(
      canon(docs, idCol, textCol),
      pairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b")),
      joinType = "left")
  }

  /** Exact-substring verification over a caller-supplied pair frame — the
    * ExactSubstr evidence tier next to [[editVerify]]: positional 8-gram
    * alignment, longest consecutive shared-gram run (a run of r grams is
    * a verbatim shared span of r+7 tokens) and the verdict at the engine
    * threshold. O(matches) per pair, priced strictly against the caller's
    * candidate list. Pairs with no shared gram — including ids absent
    * from `docs` — stay visible with zeros. */
  def substrVerify(
      docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, aCol: String = "da", bCol: String = "db"): DataFrame = {
    CorpusOps.requireIntegralId(pairs, aCol)
    CorpusOps.requireIntegralId(pairs, bCol)
    Dedup.substrVerifyFrom(
      canon(docs, idCol, textCol),
      pairs.select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b")))
  }

  // ---- persisted index lifecycle -------------------------------------------

  /** The persisted near-dup index: the three artifacts a production
    * pipeline materializes ONCE per corpus snapshot and every downstream
    * verification / clustering / maintenance stage reads from storage
    * instead of recomputing — at 100 TB the tokenize→shingle→MinHash
    * pipeline is the dominant cost of every dedup query, and paying it per
    * query is the difference between an index and a recomputation.
    *
    *  - `postings`   (doc_id, n0, s): hashed-shingle postings list,
    *    bucketed on `s` (the self-join / containment-join key)
    *  - `capped`     (doc_id, n, s): the DF-capped postings index (the
    *    exact-verification join side), bucketed on `s`
    *  - `prefix`     (doc_id, s): the DF-rarity-ordered PPJoin prefix
    *    index at the engine τ — the provably-complete candidate
    *    generator's stored half, bucketed on `s` (its self-join key), so
    *    a stored probe plans candidate generation with NO tokenize, NO
    *    corpus-DF pass and no exchange on either join side
    *  - `signatures` (doc_id, mh0..k-1, band0..b-1): MinHash + LSH bands,
    *    bucketed on `doc_id` (the per-doc attach key)
    *  - `bands`      (band_idx, bucket, doc_id): the exploded LSH band
    *    rows, bucketed on `bucket` — the probe side of INCREMENTAL
    *    ingestion ([[appendToIndex]]): a new batch finds its stored
    *    near-dup candidates by equi-joining its own band rows against
    *    this artifact, touching only the buckets the batch lands in —
    *    never re-exploding (or re-hashing) the stored corpus
    *  - `edges`      (da, db, n_shared_bands, n_eq, est_e4): scored LSH
    *    candidate pairs, bucketed on `da` (the verification-tier key)
    */
  final case class DedupIndex(
      postings: DataFrame, private val capped0: DataFrame,
      private val prefix0: DataFrame,
      signatures: DataFrame, bands: DataFrame, edges: DataFrame,
      staleStats: Boolean = false, indexDir: String = "") {
    /** Oriented `(a, b)` near-dup edges at the engine clustering threshold
      * — the frame the verification tiers ([[editVerify]],
      * [[substrVerify]]) and the cluster loop consume. */
    def nearDupEdges: DataFrame =
      edges.filter($"est_e4" >= Dedup.ClusterEdgeE4)
        .select($"da".as("a"), $"db".as("b"))

    /** The DF-capped postings index — a STORED-PROBE artifact. When the
      * index carries deferred statistics (a gate/ingest stream appended
      * with `restateStats = false`), this REFUSES rather than serve a
      * candidate set that silently misses duplicates: `capped`/`prefix`
      * reflect the last restate, not the current postings. Run
      * [[CorpusDedup.restateIndexStats]] (or [[CorpusDedup.compactIndex]],
      * which restates implicitly) first. The verdict/append/gate paths
      * never read these two artifacts and are unaffected. */
    def capped: DataFrame = requireFreshStats("capped", capped0)
    /** The rarity-ordered PPJoin prefix index — same deferred-statistics
      * refusal contract as [[capped]]. */
    def prefix: DataFrame = requireFreshStats("prefix", prefix0)
    /** The stored artifact AS WRITTEN, staleness notwithstanding — for
      * mutators that only need its schema (merge's raw right-side reads)
      * and for specs pinning the deferred generation's content. */
    private[graft] def cappedAsStored: DataFrame = capped0
    private[graft] def prefixAsStored: DataFrame = prefix0
    private def requireFreshStats(artifact: String, df: DataFrame): DataFrame = {
      if (staleStats) throw new IllegalStateException(
        s"index at $indexDir has DEFERRED statistics: '$artifact' reflects " +
          "the last restate, not the current postings (a streaming append " +
          "skipped the O(index) capped/prefix restate) — probing it would " +
          "silently miss duplicates; run restateIndexStats (or " +
          "compactIndex) to bring the statistics current first")
      df
    }
  }

  /** Bucket count for the stored artifacts — sized to the local harness
    * (= its shuffle parallelism); a production corpus picks buckets so a
    * bucket's postings fit an executor (e.g. 4096 at 100 TB). */
  val IndexBuckets = 32

  /** Catalog name for a stored artifact, derived from its path, so the
    * same directory always maps to the same session-catalog entry. */
  private[ops] def tableNameFor(path: String): String =
    "graft_idx_" + java.lang.Integer.toHexString(path.hashCode)

  /** Align write partitions with bucket ids before a bucketed write:
    * Spark's `HashPartitioning` partition-id expression is the same
    * `Murmur3 pmod buckets` the bucketed write uses for bucket ids, so
    * after this repartition every write task holds exactly one bucket and
    * emits exactly ONE file. Without it the write emits one file per
    * (input task × bucket) — measured 1,024 files per artifact on the
    * 32-task/32-bucket harness and 4× the write wall (2.0 s vs 0.5 s for
    * the same postings frame), a small-files tax every later scan, dir
    * copy, and compaction pays again (guide §6). The shuffle it adds
    * carries the artifact once and is exactly the exchange a production
    * bucketed write pays to keep file counts sane at any scale (buckets
    * are sized so one bucket fits an executor). Same trick as
    * [[rewriteArtifact]], which has used it for compaction all along. */
  private def bucketAligned(df: DataFrame, key: String, buckets: Int): DataFrame =
    df.repartition(buckets, col(key))

  private[graft] def writeBucketed(
      df: DataFrame, path: String, key: String, buckets: Int): Unit =
    bucketAligned(df, key, buckets).write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(tableNameFor(path))

  /** Run independent artifact writes as CONCURRENT Spark jobs and await
    * all. The index lifecycle is a DAG whose sinks (postings / capped /
    * prefix vs signatures / bands / edges) have no mutual dependency
    * once their shared input is materialized; running them sequentially
    * serializes 6+ shuffle+write jobs that a production pipeline (and a
    * multi-tenant cluster scheduler) would overlap — measured ~30 %
    * of index build wall on the local harness. Each task body is a
    * self-contained Spark action; failures propagate (first exception
    * rethrown after all tasks settle, so no write is abandoned
    * mid-flight with its siblings killed). */
  private def inParallel(tasks: (() => Unit)*): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(tasks.size)
    try {
      val futures = tasks.map(t =>
        pool.submit(new java.util.concurrent.Callable[Unit] { def call(): Unit = t() }))
      var firstFailure: Option[Throwable] = None
      futures.foreach { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            if (firstFailure.isEmpty) firstFailure = Some(e.getCause)
        }
      }
      firstFailure.foreach(throw _)
    } finally pool.shutdown()
  }

  /** Append a batch to a stored bucketed artifact: bucketed writes
    * compose — each append lands one more file per bucket id, and a
    * bucketed scan unions same-bucket files.
    *
    * The table is REGISTERED over the existing files first when this
    * session doesn't have it (fresh JVM, or a copied index dir):
    * `saveAsTable("append")` on an UNREGISTERED non-empty location does
    * NOT adopt the files — it creates the table and replaces the
    * location's content, silently deleting the stored artifact (found
    * when the shared-base-index copy lost its base edges; previously
    * latent for any fresh-process append to a pre-existing index). With
    * the DDL registration first, the append goes INTO the existing
    * table and its bucket spec. */
  private[ops] def appendBucketed(
      df: DataFrame, path: String, key: String, buckets: Int): Unit = {
    ensureBucketedTable(df.sparkSession, path, key, buckets)
    // bucket-aligned like [[writeBucketed]]: one file per touched bucket
    // per append instead of one per (task × bucket) — the measured append
    // fragmentation was ~870 band files for ONE batch before alignment
    bucketAligned(df, key, buckets).write.mode("append")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .option("path", path)
      .saveAsTable(tableNameFor(path))
  }

  /** Read one artifact back: through its session-catalog table when this
    * session built (or re-registered) it — the scan then carries the
    * bucket spec, so joins on the bucket key plan WITHOUT an exchange on
    * the stored side — else as plain parquet (the files are ordinary
    * parquet; bucketing is metadata, and a new session that wants it back
    * re-registers the DDL). */
  private[ops] def readArtifact(
      spark: SparkSession, indexDir: String, artifact: String): DataFrame = {
    val t = tableNameFor(s"$indexDir/$artifact")
    if (spark.catalog.tableExists(t)) spark.table(t)
    else rawArtifact(spark, indexDir, artifact)
  }

  /** Build and persist the dedup index for a corpus under `outDir`
    * (`postings/`, `signatures/`, `edges/`), returning the stored index
    * ready to read. Each artifact is written bucketed+sorted on its join
    * key via the session catalog; intermediates are materialized once and
    * released. One pass over the raw text total — signatures derive from
    * the postings frame, edges from the signature frame. */
  def buildIndex(
      docs: DataFrame, idCol: String, textCol: String,
      outDir: String, buckets: Int = IndexBuckets,
      maxBandBucket: Long = Dedup.MaxBandBucket,
      ppjoinTauE4: Long = Dedup.PpjoinTauE4): DedupIndex = {
    val spark = docs.sparkSession
    val lease = acquireLease(spark, outDir, "build")
    try {
    val postings = Dedup.postingsOf(canon(docs, idCol, textCol)).persist()
    Walls.timed("build.postings")(postings.count())
    // The DF cap and the rarity-ordered prefix both price a corpus-wide
    // DF pass — exactly the work an index moves to WRITE time so every
    // stored probe skips it.
    val capped = Dedup.cappedFromPostings(postings, Dedup.MaxShingleDf).persist()
    val sigs = Dedup.signaturesOf(postings).persist()
    // Artifact DAG: postings is the shared root (materialized above);
    // capped and signatures derive from it independently, and the six
    // artifact writes below only depend on their own chain. Concurrent
    // jobs overlap the shuffle/write machinery (one job's reduce with
    // another's scan) instead of serializing six cluster-wide barriers.
    val prefixDf = Dedup.ppjoinPrefix(capped, ppjoinTauE4)
    val bandsDf = Dedup.bandRowsOf(sigs)
    val edgesDf = Dedup.scoredPairsFromSigs(sigs, maxBandBucket)
    lease.checkStillHeld("write the built index artifacts")
    Walls.timed("build.writes1")(inParallel(
      () => { capped.count(); () },
      () => { sigs.count(); () },
      () => writeBucketed(postings, s"$outDir/postings", "s", buckets)))
    Walls.timed("build.writes2")(inParallel(
      () => writeBucketed(capped, s"$outDir/capped", "s", buckets),
      () => writeBucketed(prefixDf, s"$outDir/prefix", "s", buckets),
      () => writeBucketed(sigs, s"$outDir/signatures", "doc_id", buckets),
      () => writeBucketed(bandsDf, s"$outDir/bands", "bucket", buckets),
      () => writeBucketed(edgesDf, s"$outDir/edges", "da", buckets)))
    postings.unpersist(false)
    capped.unpersist(false)
    sigs.unpersist(false)
    Walls.timed("build.meta") {
    writeArtifactSchemas(spark, outDir,
      "postings" -> postings.schema, "capped" -> capped.schema,
      "prefix" -> prefixDf.schema, "signatures" -> sigs.schema,
      "bands" -> bandsDf.schema, "edges" -> edgesDf.schema)
    writeIndexMeta(spark, outDir, "buckets" -> buckets.toLong,
      "maxBandBucket" -> maxBandBucket, "ppjoinTauE4" -> ppjoinTauE4)
    recordEvent(spark, outDir, "build", "buckets" -> buckets)
    }
    } finally releaseLease(lease)
    fromIndex(spark, outDir)
  }

  /** INCREMENTAL ingestion against a stored index — the production path
    * at 100 TB, where re-tokenizing the corpus per batch is the cost a
    * persisted index exists to avoid. Appends a batch of NEW documents:
    *
    *  1. tokenize / shingle / MinHash the BATCH only (O(batch) raw-text
    *     work — the stored corpus is never re-read as text);
    *  2. candidate edges from the batch's band rows equi-joined against
    *     the stored `bands/` artifact (bucketed on `bucket`, so the
    *     stored side neither re-explodes nor exchanges) plus the
    *     batch×batch self-join — stored×stored pairs cannot change
    *     (their signatures didn't), so the appended edge rows are exactly
    *     the pairs touching ≥1 batch doc;
    *  3. append batch postings / signatures / band rows / new edges to
    *     the bucketed artifacts (bucket files compose — a bucketed scan
    *     unions same-bucket files);
    *  4. rebuild `capped/` + `prefix/` from the appended postings: the
    *     DF cap and the global-rarity prefix order are corpus-wide
    *     statistics a batch CAN shift, so they rebuild from the postings
    *     (integer aggregate + window — still no raw-text work).
    *
    * Refuses loudly when the batch re-uses a stored doc_id (silent edge
    * corruption) or when an appended band bucket would cross
    * `maxBandBucket`: the cap's star fallback is defined over the WHOLE
    * bucket, which an append cannot restate without rewriting stored
    * edges — the operator must rebuild (or raise the cap) for that
    * corpus, and the error says so. */
  def appendToIndex(
      newDocs: DataFrame, idCol: String, textCol: String,
      indexDir: String, buckets0: Int = -1,
      maxBandBucket0: Long = -1L,
      ppjoinTauE40: Long = -1L,
      restateStats: Boolean = true): DedupIndex = {
    val spark = newDocs.sparkSession
    // Omitted parameters resolve from the index's own _meta sidecar: an
    // append MUST use the build's bucket count, cap, and tau.
    val buckets = metaOr(spark, indexDir, buckets0.toLong,
      "buckets", IndexBuckets.toLong).toInt
    val maxBandBucket = metaOr(spark, indexDir, maxBandBucket0,
      "maxBandBucket", Dedup.MaxBandBucket)
    val ppjoinTauE4 = metaOr(spark, indexDir, ppjoinTauE40,
      "ppjoinTauE4", Dedup.PpjoinTauE4)
    val lease = acquireLease(spark, indexDir, "append")
    try {
    ensureArtifactSchemas(spark, indexDir, ArtifactKeys.map(_._1),
      dedupCanonicalSchemas(spark))
    val idx = fromIndex(spark, indexDir)
    val batch = canon(newDocs, idCol, textCol)
    val dup = batch.select($"doc_id")
      .join(idx.signatures.select($"doc_id"), Seq("doc_id"), "left_semi")
      .limit(1).count()
    require(dup == 0L,
      "appendToIndex: batch re-uses doc_id(s) already in the stored index " +
        s"at $indexDir — appends must be disjoint (new ids only)")
    val batchPostings = Dedup.postingsOf(batch).persist()
    val batchSigs = Dedup.signaturesOf(batchPostings).persist()
    // ONE materializing job for the three batch frames (round 17, the
    // gate-core fusion applied to the append): counting the signatures
    // computes the postings into their cache in passing, and the bands —
    // a narrow projection of the cached signatures — are first read by
    // batchScoredEdges' over-cap aggregate, which fills their cache.
    val nBatchDocs = batchSigs.count()
    val batchBands = Dedup.bandRowsOf(batchSigs).persist()
    val (newEdgesPlan, storedInTouched) =
      batchScoredEdges(idx, batchSigs, batchBands, maxBandBucket)
    // ORDER MATTERS: the newEdges plan READS the stored bands/signatures
    // artifacts — and appending to a table auto-recaches/refreshes every
    // plan over it, so executing it after (or concurrently with) the
    // batch-artifact appends would make it see the batch on BOTH sides
    // (self-pairs, double-counted bands; caught by DedupIndexSpec's
    // equality test). LINEAGE-CUT it against the pre-append stored state
    // first (localCheckpoint → a plan with no table references, immune
    // to the appends' recache).
    val newEdges = newEdgesPlan.localCheckpoint(true)
    lease.checkStillHeld("append the batch artifacts")
    // CRASH-ORDER CONTRACT: the duplicate-id refusal above keys on
    // `signatures`, and each appendBucketed is visible atomically (job
    // commit), so SIGNATURES COMMITS FIRST — a crash before it leaves
    // nothing visible (clean redelivery), a crash after it makes the
    // redelivery refuse loudly; no crash can reach the silent state
    // "edges/postings/bands appended but signatures absent", which a
    // redelivery would double-append. The stale flag is set BEFORE any
    // write for the same reason: a crash between the appends and the
    // restate (or the deferred-path marker) must never leave post-append
    // capped/prefix served as fresh. The remaining three appends are
    // mutually independent and run as one concurrent group.
    markStatsStale(spark, indexDir)
    appendBucketed(batchSigs, s"$indexDir/signatures", "doc_id", buckets)
    inParallel(
      () => appendBucketed(newEdges, s"$indexDir/edges", "da", buckets),
      () => appendBucketed(batchPostings, s"$indexDir/postings", "s", buckets),
      () => appendBucketed(batchBands, s"$indexDir/bands", "bucket", buckets))
    // Corpus-wide statistics rebuild from the APPENDED postings (cheap
    // integer pass; no tokenize — but O(index), the ONE append term that
    // grows with the stored corpus rather than the batch). Streaming
    // callers (gateStream/ingestStream) DEFER it: a crawl-mouth gate
    // paying an O(index) restate per micro-batch degrades linearly with
    // index size, while nothing on the verdict/append path reads
    // capped/prefix — they are probe-time statistics. A deferred append
    // marks `statsStale` in `_meta`; [[restateIndexStats]] (or the next
    // [[compactIndex]], which restates implicitly) brings them current
    // in one pass per maintenance cycle.
    if (restateStats)
      restateStatsLocked(spark, indexDir, buckets, ppjoinTauE4)
    // else: the pessimistic pre-append markStatsStale stays set — the
    // deferred-statistics contract (restate/compact clears it)
    Seq(batchPostings, batchSigs, batchBands, storedInTouched)
      .foreach(_.unpersist(false))
    recordEvent(spark, indexDir, "append", "n_docs" -> nBatchDocs)
    } finally releaseLease(lease)
    fromIndex(spark, indexDir)
  }

  /** PARTITION-WISE BUILD + MERGE — the missing third face of the index
    * lifecycle next to [[buildIndex]] (from scratch) and [[appendToIndex]]
    * (one small batch into a big index): combine two indexes built
    * INDEPENDENTLY over disjoint corpora into one index over their union,
    * written to a fresh `outDir`, touching NO raw text. At 100 TB this is
    * how the index gets built at all: each ingest partition builds its
    * shard-local index in parallel (embarrassingly parallel — no
    * cross-partition traffic), then a tree of merges combines them, each
    * merge priced on the STORED artifacts:
    *
    *  - postings / signatures / bands of the union are artifact unions
    *    (bucketed writes; no re-tokenize, no re-hash);
    *  - the only pairs the two builds could not see are pairs WITH ONE
    *    DOC ON EACH SIDE — exactly the band-bucket equi-join of the
    *    right's stored band rows against the left's bucketed `bands/`
    *    artifact, i.e. [[batchScoredEdges]] with the right index's stored
    *    frames standing in for "the batch" (right-internal pairs are
    *    regenerated through the same shared path rather than copied, so
    *    one code path prices every merged pair and the append/gate/merge
    *    candidate semantics cannot drift apart);
    *  - `capped/` + `prefix/` rebuild from the union postings (the DF cap
    *    and the global-rarity prefix order are corpus-wide statistics —
    *    an integer aggregate + window, still no raw-text work).
    *
    * The result is bit-identical to `buildIndex(left ∪ right)` whenever
    * the merge admits (oracle-pinned by `q_dedup_index_merge`). Refuses
    * loudly when the corpora share a doc_id (merge is defined over
    * disjoint shards) or when a merged band bucket would cross
    * `maxBandBucket` — the hot-bucket star fallback is defined over the
    * WHOLE bucket, which a merge cannot restate from two halves; rebuild
    * for the combined corpus or raise the cap, and the error says so. */
  def mergeIndexes(
      spark: SparkSession, leftDir: String, rightDir: String, outDir: String,
      buckets0: Int = -1,
      maxBandBucket0: Long = -1L,
      ppjoinTauE40: Long = -1L): DedupIndex = {
    // Omitted parameters resolve from the SENIOR side's _meta sidecar
    // (the senior's layout and semantics are adopted, like its prefix
    // order); the merged output records them as its own.
    val buckets = metaOr(spark, leftDir, buckets0.toLong,
      "buckets", IndexBuckets.toLong).toInt
    val maxBandBucket = metaOr(spark, leftDir, maxBandBucket0,
      "maxBandBucket", Dedup.MaxBandBucket)
    val ppjoinTauE4 = metaOr(spark, leftDir, ppjoinTauE40,
      "ppjoinTauE4", Dedup.PpjoinTauE4)
    // Fence the OUTPUT dir only: the merge READS its two inputs (their
    // own mutators hold their own leases) and owns every write to outDir.
    val lease = acquireLease(spark, outDir, "merge")
    try {
    val left = fromIndex(spark, leftDir)
    // The RIGHT side reads RAW parquet, deliberately bypassing its
    // bucketed catalog tables: a UNION of two same-bucket-spec catalog
    // scans claims the bucket hash partitioning while physically holding
    // the two shards' buckets as separate, UNALIGNED partitions — every
    // downstream aggregation/join that trusts the claim elides its
    // exchange and computes per-shard-partition results (observed as a
    // corrupted prefix artifact: duplicated rows + per-shard DF ranks;
    // pinned by DedupIndexSpec's merge bit-identity test). A raw scan
    // carries no partitioning claim, so the unions plan their exchanges.
    // The LEFT side keeps its catalog tables: SINGLE-scan bucketed
    // probes (the band-bucket candidate join) are genuinely aligned and
    // are exactly where the bucket spec earns its exchange elision.
    // (schemas from the left index, not inference: a small shard can have
    // an EMPTY artifact — zero near-dup pairs → no edge files — and raw
    // inference throws where the catalog read would serve the schema)
    def raw(artifact: String, like: DataFrame) =
      spark.read.schema(like.schema).parquet(s"$rightDir/$artifact")
    val right = DedupIndex(
      postings = raw("postings", left.postings),
      capped0 = raw("capped", left.cappedAsStored),
      prefix0 = raw("prefix", left.prefixAsStored),
      signatures = raw("signatures", left.signatures),
      bands = raw("bands", left.bands),
      edges = raw("edges", left.edges))
    val dup = left.signatures.select($"doc_id")
      .join(right.signatures.select($"doc_id"), Seq("doc_id"), "left_semi")
      .limit(1).count()
    require(dup == 0L,
      s"mergeIndexes: the indexes at $leftDir and $rightDir share " +
        "doc_id(s) — merge is defined over disjoint corpus shards " +
        "(an overlap would silently double-count the shared docs' " +
        "postings and bands)")
    val rightSigs = right.signatures.persist()
    rightSigs.count()
    // first reader (batchScoredEdges' over-cap aggregate) fills the cache
    val rightBands = right.bands.persist()
    val (crossEdges, storedInTouched) =
      batchScoredEdges(left, rightSigs, rightBands, maxBandBucket)
    // Union artifacts + the merged edge set. The edges write executes the
    // crossEdges plan, which reads the LEFT artifacts — all reads here,
    // nothing mutates either input index, so unlike appendToIndex there
    // is no write-order hazard.
    // concurrent first readers (the postings write + the capped build)
    // race-fill the union cache per partition — block-level locking makes
    // that safe, and both inputs are already materialized artifacts
    val unionPostings = left.postings.unionByName(right.postings).persist()
    val capped = Dedup.cappedFromPostings(unionPostings, Dedup.MaxShingleDf)
      .persist()
    lease.checkStillHeld("write the merged index artifacts")
    inParallel(
      () => { capped.count(); () },
      () => writeBucketed(unionPostings, s"$outDir/postings", "s", buckets),
      () => writeBucketed(
        left.signatures.unionByName(rightSigs),
        s"$outDir/signatures", "doc_id", buckets),
      () => writeBucketed(
        left.bands.unionByName(rightBands), s"$outDir/bands", "bucket", buckets),
      () => writeBucketed(
        left.edges.unionByName(crossEdges), s"$outDir/edges", "da", buckets))
    inParallel(
      () => writeBucketed(capped, s"$outDir/capped", "s", buckets),
      () => writeBucketed(
        Dedup.ppjoinPrefix(capped, ppjoinTauE4), s"$outDir/prefix", "s", buckets))
    Seq(rightSigs, rightBands, storedInTouched, unionPostings, capped)
      .foreach(_.unpersist(false))
    writeArtifactSchemas(spark, outDir,
      "postings" -> left.postings.schema,
      "capped" -> left.cappedAsStored.schema,
      "prefix" -> left.prefixAsStored.schema,
      "signatures" -> left.signatures.schema,
      "bands" -> left.bands.schema, "edges" -> left.edges.schema)
    writeIndexMeta(spark, outDir, "buckets" -> buckets.toLong,
      "maxBandBucket" -> maxBandBucket, "ppjoinTauE4" -> ppjoinTauE4)
    recordEvent(spark, outDir, "merge", "left" -> leftDir, "right" -> rightDir)
    } finally releaseLease(lease)
    fromIndex(spark, outDir)
  }

  /** FORGET — the delete face of the index lifecycle (the index-side twin
    * of the `q_dq_forget` data-side erasure): remove a set of documents
    * from a stored index IN PLACE, so that the index afterward equals a
    * from-scratch build over the corpus minus the removed docs
    * (oracle-pinned by `q_dedup_index_forget`; the spec additionally pins
    * the append→forget round trip back to the base index). Per-doc
    * artifacts (postings / signatures / bands) drop the removed docs'
    * rows by anti-join; `edges` drops every pair touching a removed doc
    * on EITHER endpoint; the corpus-wide statistics (`capped/`,
    * `prefix/`) restate from the remaining postings — an integer pass,
    * no raw text (removal SHIFTS document frequencies, so the DF cap and
    * the global-rarity prefix order must be restated, same as append).
    * Rewrites promote by directory rename and DELETE the old
    * generation's files — erasure removes bytes, not just rows from
    * query results.
    *
    * Idempotent by design: ids absent from the index anti-join to
    * nothing, so a redelivered forget request is a no-op — the right
    * contract for an erasure queue. Refuses loudly when a TOUCHED band
    * bucket is over `maxBandBucket`: its stored edges are the
    * hot-bucket star fallback, which is defined over the whole bucket
    * (and whose representative may itself be the removed doc) — the
    * remaining pairs cannot be restated from halves; rebuild for the
    * remaining corpus or raise the cap. */
  def removeFromIndex(
      spark: SparkSession, indexDir: String, removeIds: DataFrame,
      buckets0: Int = -1,
      maxBandBucket0: Long = -1L,
      ppjoinTauE40: Long = -1L): DedupIndex = {
    // Omitted parameters resolve from the index's own _meta sidecar —
    // load-bearing for the erasure QUEUE, which never sees the build
    // call: checking a larger cap than the build's would erase from a
    // star-fallback bucket (corrupting the remaining members' edges),
    // a smaller one would wedge a valid erasure forever, and a
    // different bucket count would silently re-bucket every artifact.
    val buckets = metaOr(spark, indexDir, buckets0.toLong,
      "buckets", IndexBuckets.toLong).toInt
    val maxBandBucket = metaOr(spark, indexDir, maxBandBucket0,
      "maxBandBucket", Dedup.MaxBandBucket)
    val ppjoinTauE4 = metaOr(spark, indexDir, ppjoinTauE40,
      "ppjoinTauE4", Dedup.PpjoinTauE4)
    val idCol = removeIds.columns.head
    CorpusOps.requireIntegralId(removeIds, idCol)
    val lease = acquireLease(spark, indexDir, "forget")
    try {
    healIndex(spark, indexDir)
    ensureArtifactSchemas(spark, indexDir, ArtifactKeys.map(_._1),
      dedupCanonicalSchemas(spark))
    val idx = fromIndex(spark, indexDir)
    val ids = removeIds.select(col(idCol).cast("long").as("doc_id"))
      .distinct().persist()
    try {
    val nIds = ids.count()
    val touched = idx.bands.join(broadcast(ids), Seq("doc_id"), "left_semi")
      .select($"band_idx", $"bucket").distinct()
    val overCap = idx.bands.join(touched, Seq("band_idx", "bucket"), "left_semi")
      .groupBy($"band_idx", $"bucket").agg(count(lit(1)).as("bsz"))
      .filter($"bsz" > maxBandBucket).limit(1).count()
    require(overCap == 0L,
      s"removeFromIndex: a removed document sits in a band bucket over " +
        s"maxBandBucket=$maxBandBucket; the hot-bucket star fallback is " +
        "defined over the whole bucket and cannot be restated after a " +
        "removal — rebuild the index for the remaining corpus " +
        "(buildIndex) or raise the cap")
    def dropDocs(df: DataFrame): DataFrame =
      df.join(broadcast(ids), Seq("doc_id"), "left_anti")
    lease.checkStillHeld("rewrite the erasure's artifacts")
    // The four per-doc rewrites are mutually independent (each reads only
    // its own artifact + the bounded id set) and run as concurrent jobs.
    inParallel(
      () => rewriteArtifact(spark, s"$indexDir/postings", "s", buckets)(dropDocs),
      () => rewriteArtifact(
        spark, s"$indexDir/signatures", "doc_id", buckets)(dropDocs),
      () => rewriteArtifact(spark, s"$indexDir/bands", "bucket", buckets)(dropDocs),
      () => rewriteArtifact(spark, s"$indexDir/edges", "da", buckets)(df =>
        df.join(broadcast(ids.select($"doc_id".as("da"))), Seq("da"), "left_anti")
          .join(broadcast(ids.select($"doc_id".as("db"))), Seq("db"), "left_anti")))
    // Corpus-wide statistics restate from the REMAINING postings.
    val remaining = readArtifact(spark, indexDir, "postings").persist()
    val capped2 = Dedup.cappedFromPostings(remaining, Dedup.MaxShingleDf)
      .persist()
    try {
      capped2.count() // fills the remaining-postings cache in passing
      inParallel(
        () => writeBucketed(capped2, s"$indexDir/capped", "s", buckets),
        () => writeBucketed(
          Dedup.ppjoinPrefix(capped2, ppjoinTauE4), s"$indexDir/prefix", "s",
          buckets))
    } finally Seq(remaining, capped2).foreach(_.unpersist(false))
    // The erasure's restate is a full refresh from the remaining
    // postings, so it also clears any deferred-append staleness.
    clearStatsStale(spark, indexDir)
    recordEvent(spark, indexDir, "forget", "n_ids" -> nIds)
    // The refusal and any rewrite failure land in this finally too —
    // a redelivered-and-refused erasure batch must not accumulate a
    // fresh cached id frame per retry in a long-running queue.
    } finally ids.unpersist(false)
    } finally releaseLease(lease)
    fromIndex(spark, indexDir)
  }

  /** Candidate edges touching a NEW batch, scored against the stored
    * index WITHOUT mutating it: batch bands × stored bands through the
    * touched buckets (the stored side arrives through the bucketed
    * `bands/` artifact — no corpus re-explode, no exchange) plus the
    * batch×batch self-join, oriented da < db with ≤1 row per (pair,
    * band), grouped and scored through the ONE shared tail
    * ([[Dedup.scoreCandidates]]) so neither incremental path can drift
    * from the batch generator's formula. Refuses cap-crossing buckets:
    * the hot-bucket star fallback is defined over the WHOLE bucket and
    * cannot be restated against stored state. Returns the scored frame
    * plus the persisted intermediate for the caller to unpersist after
    * executing its plans. */
  private def batchScoredEdges(
      idx: DedupIndex, batchSigs: DataFrame, batchBands: DataFrame,
      maxBandBucket: Long): (DataFrame, DataFrame) = {
    val touched = batchBands.select($"band_idx", $"bucket").distinct()
    val storedInTouched = idx.bands
      .join(touched, Seq("band_idx", "bucket"), "left_semi").persist()
    // no separate materializing count: the overCap aggregate below is the
    // first action over the persisted frame and populates the cache (one
    // fewer Spark job on every gate micro-batch / append / merge)
    val overCap = storedInTouched
      .select($"band_idx", $"bucket", $"doc_id")
      .unionByName(batchBands.select($"band_idx", $"bucket", $"doc_id"))
      .groupBy($"band_idx", $"bucket").agg(count(lit(1)).as("bsz"))
      .filter($"bsz" > maxBandBucket).limit(1).count()
    require(overCap == 0L,
      s"this batch pushes a band bucket past " +
        s"maxBandBucket=$maxBandBucket; the hot-bucket star fallback is " +
        "defined over the whole bucket and cannot be restated " +
        "incrementally — rebuild the index for the combined corpus " +
        "(buildIndex) or raise the cap")
    val bs = batchBands.select($"band_idx", $"bucket", $"doc_id".as("n"))
      .join(storedInTouched.select($"band_idx", $"bucket", $"doc_id".as("o")),
        Seq("band_idx", "bucket"))
      .select(least($"n", $"o").as("da"), greatest($"n", $"o").as("db"))
    val bb = batchBands.select($"band_idx", $"bucket", $"doc_id".as("da"))
      .join(batchBands.select($"band_idx", $"bucket", $"doc_id".as("db")),
        Seq("band_idx", "bucket"))
      .filter($"da" < $"db")
      .select($"da", $"db")
    val scored = Dedup.scoreCandidates(
      bs.unionByName(bb)
        .groupBy($"da", $"db").agg(count(lit(1)).as("n_shared_bands")),
      idx.signatures.unionByName(batchSigs))
    (scored, storedInTouched)
  }

  /** DEDUP GATE, batch form: score a batch of candidate documents against
    * the stored index WITHOUT mutating anything, and verdict each doc —
    * the "should this crawl page enter the corpus?" decision of a
    * training-data ingest. A batch doc is a DUPLICATE when it matches a
    * STORED doc at `tauE4` (any id), or a SMALLER-id doc of the same
    * batch (the min-id batch representative of a new template survives;
    * its batch-mates are dups of it). Output, one row per batch doc:
    * `(doc_id, n_matches, first_match, best_est_e4, is_novel)` —
    * `first_match` the smallest qualifying match id (the survivor the
    * dup defers to), nulls on novel rows.
    *
    * Scale: O(batch) raw-text work; candidates are band-bucket joins
    * against the bucketed stored artifact (never corpus re-tokenize,
    * never cartesian); the verdict aggregate is per batch doc. */
  def scoreBatchAgainstIndex(
      newDocs: DataFrame, idCol: String, textCol: String,
      indexDir: String, tauE4: Long = Dedup.ClusterEdgeE4,
      maxBandBucket0: Long = -1L): DataFrame = {
    // tau is a SCORING threshold the caller owns; the band-bucket cap is
    // a build parameter — resolve it from the index's _meta like the
    // mutators do, so a gate over a custom-cap index applies the same
    // star-fallback boundary the stored edges were generated under.
    val maxBandBucket = metaOr(newDocs.sparkSession, indexDir,
      maxBandBucket0, "maxBandBucket", Dedup.MaxBandBucket)
    val spark = newDocs.sparkSession
    val idx = fromIndex(spark, indexDir)
    val batch = canon(newDocs, idCol, textCol)
    val core = scoreBatchCore(idx, batch, maxBandBucket, tauE4)
    core.persisted.foreach(_.unpersist(false))
    core.verdicts
  }

  /** The intermediates of one gate scoring pass, so the streaming gate
    * can append the novel subset WITHOUT a second tokenize/MinHash pass
    * over the batch ([[gateScoreAndAppend]]). `verdicts` is
    * lineage-cut; the batch frames stay persisted until the caller
    * releases `persisted`. `scored` is a plan over the persisted frames
    * (+ the stored signature scan) — the same candidate rows
    * [[appendToIndex]]'s generator would emit for this batch. */
  private final case class GateScore(
      verdicts: DataFrame, scored: DataFrame,
      batchPostings: DataFrame, batchSigs: DataFrame, batchBands: DataFrame,
      persisted: Seq[DataFrame])

  /** Default for the gate-substage wall callback — the mouth lane passes
    * a collector so the per-batch cost decomposes in the artifact (guide
    * §1.5: label where the time goes). Under `SPARK_GRAFT_TIMINGS=1` the
    * default prints each substage to stderr, so ad-hoc attribution runs
    * see the same decomposition without a collector. */
  private[graft] val NoSubstage: (String, Double) => Unit =
    if (Walls.on) (s, sec) =>
      System.err.println(f"[graft-wall] gate.$s $sec%.3f s")
    else (_, _) => ()

  private def scoreBatchCore(
      idx: DedupIndex, batch: DataFrame,
      maxBandBucket: Long, tauE4: Long,
      onSubstage: (String, Double) => Unit = NoSubstage): GateScore = {
    def sub[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      onSubstage(name, (System.nanoTime() - t0) / 1e9)
      r
    }
    val batchPostings = Dedup.postingsOf(batch).persist()
    val batchSigs = Dedup.signaturesOf(batchPostings).persist()
    val batchBands = Dedup.bandRowsOf(batchSigs).persist()
    // one materializing job, not two: bands are a narrow projection of
    // the cached signatures, and the stored-probe aggregate below is
    // their first reader — it populates the bands cache in passing
    sub("batch_index")(batchSigs.count())
    val (scored0, storedInTouched) = sub("stored_probe")(
      batchScoredEdges(idx, batchSigs, batchBands, maxBandBucket))
    // persist the scored candidates: the gate reads them TWICE per batch
    // (threshold hits for the verdicts, then the novel-only edge append) —
    // unpersisted, the second reader re-ran the whole band-join + scoring
    // pipeline (measured ~0.5 s/batch of pure recompute in the mouth lane)
    val scored = scored0.persist()
    // hits is NOT separately materialized (round 17): its only reader is
    // the verdict aggregate below — one localCheckpoint job computes the
    // persisted scored frame once (filling its cache for the novel-edge
    // append) and scans the filter twice from cache; the old persist +
    // count paid a whole extra job per micro-batch for that.
    val hits = scored.filter($"est_e4" >= tauE4)
      .select($"da", $"db", $"est_e4")
    // Per-doc verdicts: symmetrize pairs to (d, other); a match counts
    // when the other side is stored (any id — the corpus is canonical)
    // or a smaller-id batch mate.
    val sym = hits.select($"da".as("d"), $"db".as("o"), $"est_e4")
      .unionByName(hits.select($"db".as("d"), $"da".as("o"), $"est_e4"))
    // ids from the canon batch, not the signature frame: a doc too short
    // to shingle still gets its (trivially novel) verdict row
    val batchIds = batch.select($"doc_id")
    val inBatch = batchIds.select($"doc_id".as("o"))
      .withColumn("o_in_batch", lit(true))
    val m = sym.join(batchIds.select($"doc_id".as("d")), Seq("d"))
      .join(inBatch, Seq("o"), "left")
      .filter(coalesce($"o_in_batch", lit(false)) === false || $"o" < $"d")
    val verdicts = batchIds
      .join(m.groupBy($"d").agg(
        count(lit(1)).as("n_matches"),
        min($"o").as("first_match"),
        max($"est_e4").as("best_est_e4")),
        $"doc_id" === $"d", "left")
      .select($"doc_id",
        coalesce($"n_matches", lit(0L)).as("n_matches"),
        $"first_match", $"best_est_e4",
        $"n_matches".isNull.as("is_novel"))
    // LINEAGE CUT, not persist: the verdict plan embeds the full
    // shingle→minhash→band scoring expression tree on BOTH sides, and a
    // live plan of that size poisons the whole session — every later
    // query execution re-canonicalizes the giant subtrees during cache
    // lookup (measured: gateStream's appendToIndex ran 4× slower, 33 s vs
    // 8 s per micro-batch, with the persisted verdict frame in session
    // state) and each call pins one cached frame until someone frees it.
    // localCheckpoint materializes the batch-sized verdict rows on the
    // executors and returns a trivial LogicalRDD plan; its blocks are
    // released by the ContextCleaner once the frame is unreachable.
    // Cluster caveat: checkpointed blocks don't recompute on executor
    // loss — callers are one-shot/micro-batch (retry = redeliver).
    val out = sub("verdict_cut")(verdicts.localCheckpoint(true))
    GateScore(out, scored, batchPostings, batchSigs, batchBands,
      Seq(batchPostings, batchSigs, batchBands, storedInTouched, scored))
  }

  /** One gate micro-batch, FUSED: verdict the batch and append its novel
    * subset in a SINGLE tokenize/MinHash/banding pass. Semantically
    * identical to `scoreBatchAgainstIndex` + `appendToIndex(novel docs,
    * restateStats = false)` — same candidate generator, same scoring
    * tail, same crash-recovery refusal — but the append reuses the
    * scoring pass's persisted batch frames (the old path re-tokenized the
    * novel docs and re-ran the band-bucket probe) and runs all FOUR
    * artifact appends as one concurrent group: the appended edges are
    * the scoring pass's candidate rows with both endpoints in
    * stored ∪ novel, lineage-cut first so no append re-reads stored
    * state through a live plan (an append auto-refreshes table plans —
    * the write-order hazard appendToIndex documents). Holds the mutation
    * lease only around the append. Returns the lineage-cut verdicts. */
  private[graft] def gateScoreAndAppend(
      newDocs: DataFrame, idCol: String, textCol: String,
      indexDir: String, tauE4: Long = Dedup.ClusterEdgeE4,
      onSubstage: (String, Double) => Unit = NoSubstage): DataFrame = {
    def sub[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      onSubstage(name, (System.nanoTime() - t0) / 1e9)
      r
    }
    val spark = newDocs.sparkSession
    val buckets = metaOr(spark, indexDir, -1L,
      "buckets", IndexBuckets.toLong).toInt
    val maxBandBucket = metaOr(spark, indexDir, -1L,
      "maxBandBucket", Dedup.MaxBandBucket)
    val idx = sub("open_index")(fromIndex(spark, indexDir))
    val batch = canon(newDocs, idCol, textCol)
    val core = scoreBatchCore(idx, batch, maxBandBucket, tauE4, onSubstage)
    try {
      val novelIds = core.verdicts.filter($"is_novel").select($"doc_id")
      val nNovel = novelIds.count() // verdicts are lineage-cut: one cheap job
      if (nNovel > 0L) {
        val lease = acquireLease(spark, indexDir, "append")
        try {
          ensureArtifactSchemas(spark, indexDir, ArtifactKeys.map(_._1),
            dedupCanonicalSchemas(spark))
          // Crash-recovery contract (same as appendToIndex's refusal): a
          // batch replayed after a crash BETWEEN the append and the
          // commit record must trip loudly, never double-ingest.
          val dup = sub("dup_check")(novelIds
            .join(idx.signatures.select($"doc_id"), Seq("doc_id"), "left_semi")
            .limit(1).count())
          require(dup == 0L,
            "gate append: a novel-verdicted doc_id is already in the " +
              s"stored index at $indexDir — this batch was partially " +
              "ingested by a crashed predecessor; heal/inspect before " +
              "redelivering")
          val nIds = broadcast(novelIds)
          def novelOnly(df: DataFrame): DataFrame =
            df.join(nIds, Seq("doc_id"), "left_semi")
          // Batch docs that did NOT pass the gate never enter the index,
          // so candidate rows touching them on either endpoint are
          // dropped; what remains is exactly the novel-only generator's
          // output (per-pair scores don't depend on the dropped docs).
          val dupIds = core.verdicts.filter(!$"is_novel").select($"doc_id")
          val newEdges = sub("edges_cut")(core.scored
            .join(broadcast(dupIds.select($"doc_id".as("da"))),
              Seq("da"), "left_anti")
            .join(broadcast(dupIds.select($"doc_id".as("db"))),
              Seq("db"), "left_anti")
            .localCheckpoint(true))
          lease.checkStillHeld("append the gate batch's novel artifacts")
          // Same crash-order contract as appendToIndex: stale flag before
          // any write, SIGNATURES (the redelivery-refusal key) commits
          // first, then the remaining three as one concurrent group —
          // every crash-reachable partial state is either clean or loud
          // on redelivery, never silently double-appendable. Statistics
          // restate stays DEFERRED (O(batch) per micro-batch;
          // restateIndexStats/compactIndex catch up).
          markStatsStale(spark, indexDir)
          sub("append_sigs")(appendBucketed(novelOnly(core.batchSigs),
            s"$indexDir/signatures", "doc_id", buckets))
          sub("append_rest")(inParallel(
            () => appendBucketed(newEdges, s"$indexDir/edges", "da", buckets),
            () => appendBucketed(novelOnly(core.batchPostings),
              s"$indexDir/postings", "s", buckets),
            () => appendBucketed(novelOnly(core.batchBands),
              s"$indexDir/bands", "bucket", buckets)))
          recordEvent(spark, indexDir, "append", "n_docs" -> nNovel)
        } finally releaseLease(lease)
      }
      core.verdicts
    } finally core.persisted.foreach(_.unpersist(false))
  }

  /** CONTINUOUS DEDUP GATE — the streaming face of
    * [[scoreBatchAgainstIndex]] + [[appendToIndex]], the operator a
    * training-data pipeline runs at the crawl mouth: each micro-batch is
    * verdicted against the stored index, ONLY the novel docs are
    * appended (so the index stays the canonical corpus and the gate
    * LEARNS — a later batch duplicating an earlier batch's novel doc is
    * flagged), and every verdict row (stamped with its batch id) is
    * appended to `verdictDir` for downstream filtering/audit. Idempotent
    * per batch id via the gate's OWN per-checkpoint watermark
    * ([[commitMarker]] — batch ids are a per-checkpoint sequence, so the
    * gate must not share a high-water mark with an ingest stream or an
    * earlier gate checkpoint): redelivered batch ids skip; a crash between the
    * index append and the commit record trips the duplicate-id refusal
    * loudly on redelivery instead of silently double-ingesting. Single
    * writer per index dir. */
  def gateStream(
      docs: DataFrame, idCol: String, textCol: String, indexDir: String,
      verdictDir: String, checkpointDir: String,
      tauE4: Long = Dedup.ClusterEdgeE4,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val marker = commitMarker("gate", checkpointDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: java.lang.Long) =>
          val spark = b.sparkSession
          if (id > lastIngestedBatch(spark, indexDir, marker)) {
            if (!b.isEmpty) {
              // FUSED score+append: one tokenize/MinHash pass verdicts
              // the batch AND appends the novel subset (statistics
              // restate deferred — the O(index) capped/prefix rebuild
              // per micro-batch would make gate cost grow with INDEX
              // size; restateIndexStats/compactIndex catch up per
              // maintenance cycle).
              val verdicts =
                gateScoreAndAppend(b, idCol, textCol, indexDir, tauE4)
              // Dynamic partition overwrite on batch_id: the verdict write
              // happens BEFORE the commit marker, so a redelivered batch
              // (all-duplicate batches take no loud refusal path) REPLACES
              // its own partition instead of appending duplicate audit
              // rows with the same batch_id.
              verdicts.withColumn("batch_id", lit(id.longValue()))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id").parquet(verdictDir)
            }
            recordIngestedBatch(spark, indexDir, id, marker)
          }
          ()
      }
      .start()
  }

  /** BUILD-PARAMETER sidecar (`<indexDir>/_meta`) — the parameters every
    * later mutation MUST reuse: the bucket count is the physical layout
    * (a mismatched rewrite silently re-buckets the artifacts under other
    * sessions' registered specs), the band-bucket cap defines the
    * star-fallback semantics (checking a different cap than the build's
    * either corrupts a star bucket's edges or wedges a valid erasure),
    * and tau fixes the stored prefix length. Written once at build/merge;
    * mutators resolve omitted parameters FROM HERE, so a maintenance job
    * or erasure queue cannot silently mutate with mismatched parameters.
    * Plain `key=value` lines, atomic tmp+rename. */
  private[graft] def writeIndexMeta(
      spark: SparkSession, indexDir: String, values: (String, Long)*): Unit = {
    val (fs, p) = hadoopFs(spark, s"$indexDir/_meta")
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/_meta.tmp")
    val out = fs.create(tmp, true)
    try out.write(values.map { case (k, v) => s"$k=$v" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    fs.delete(p, false)
    require(fs.rename(tmp, p), s"writeIndexMeta: cannot commit $p")
  }

  private[graft] def indexMeta(
      spark: SparkSession, indexDir: String): Map[String, Long] = {
    val (fs, p) = hadoopFs(spark, s"$indexDir/_meta")
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      text.linesIterator.filter(_.contains('='))
        .map { l => val Array(k, v) = l.split("=", 2); k -> v.trim.toLong }
        .toMap
    }
  }

  /** Resolve a mutation parameter: an explicit (non-negative) argument
    * wins; otherwise the index's own `_meta` value; otherwise the
    * engine default (pre-meta indexes). */
  private def metaOr(spark: SparkSession, indexDir: String,
                     explicit: Long, key: String, default: Long): Long =
    if (explicit >= 0L) explicit
    else indexMeta(spark, indexDir).getOrElse(key, default)

  /** True unless a deferred-statistics append left `capped/` + `prefix/`
    * behind the postings (see [[appendToIndex]]'s `restateStats` and
    * [[restateIndexStats]]). The verdict path (bands/signatures) never
    * reads them; the stored-probe paths (PPJoin prefix, exact-overlap
    * capped) should check here before trusting a stored artifact. */
  def statsFresh(spark: SparkSession, indexDir: String): Boolean =
    indexMeta(spark, indexDir).getOrElse("statsStale", 0L) == 0L

  private def markStatsStale(spark: SparkSession, indexDir: String): Unit = {
    val m = indexMeta(spark, indexDir)
    if (m.getOrElse("statsStale", 0L) != 1L)
      writeIndexMeta(spark, indexDir,
        (m + ("statsStale" -> 1L)).toSeq.sortBy(_._1): _*)
  }

  private def clearStatsStale(spark: SparkSession, indexDir: String): Unit = {
    val m = indexMeta(spark, indexDir)
    if (m.contains("statsStale"))
      writeIndexMeta(spark, indexDir,
        (m - "statsStale").toSeq.sortBy(_._1): _*)
  }

  /** One-warning-per-dir-per-STALE-EPISODE set for stale-stats index
    * reads: a dir enters when its staleness is first observed (the
    * warning fires exactly then) and leaves when it is observed fresh
    * again, so the NEXT deferred-append episode warns anew instead of
    * being swallowed by a once-per-JVM memo. */
  private val staleWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The corpus-wide statistics restate `capped/` + `prefix/` derive from
    * the CURRENT postings — a pure function of `postings/` (the DF cap
    * and the global-rarity prefix order), so restating after any number
    * of deferred appends lands bit-identical to a from-scratch build
    * over the same corpus (spec-pinned). Caller holds the lease. */
  private def restateStatsLocked(
      spark: SparkSession, indexDir: String,
      buckets: Int, ppjoinTauE4: Long): Unit = {
    val allPostings = readArtifact(spark, indexDir, "postings").persist()
    val capped2 = Dedup.cappedFromPostings(allPostings, Dedup.MaxShingleDf)
      .persist()
    capped2.count() // fills the postings cache in passing (first reader)
    inParallel(
      () => writeBucketed(capped2, s"$indexDir/capped", "s", buckets),
      () => writeBucketed(
        Dedup.ppjoinPrefix(capped2, ppjoinTauE4), s"$indexDir/prefix", "s",
        buckets))
    Seq(allPostings, capped2).foreach(_.unpersist(false))
    clearStatsStale(spark, indexDir)
  }

  /** Bring a deferred-statistics index current: restate `capped/` +
    * `prefix/` from the stored postings and clear the stale flag. The
    * maintenance move after a gate/ingest stream drain — one O(index)
    * integer pass, priced once per maintenance cycle instead of once
    * per micro-batch. [[compactIndex]] performs the same restate
    * implicitly when it meets a stale index, so a compaction schedule
    * alone keeps streamed indexes fully current. */
  def restateIndexStats(spark: SparkSession, indexDir: String): DedupIndex = {
    val buckets = metaOr(spark, indexDir, -1L,
      "buckets", IndexBuckets.toLong).toInt
    val ppjoinTauE4 = metaOr(spark, indexDir, -1L,
      "ppjoinTauE4", Dedup.PpjoinTauE4)
    withLeaseFenced(spark, indexDir, "restate") { lease =>
      ensureArtifactSchemas(spark, indexDir, ArtifactKeys.map(_._1),
        dedupCanonicalSchemas(spark))
      lease.checkStillHeld("restate the corpus statistics")
      restateStatsLocked(spark, indexDir, buckets, ppjoinTauE4)
      recordEvent(spark, indexDir, "restate")
    }
    fromIndex(spark, indexDir)
  }

  /** The bucket-count resolution for the IVF family ([[VectorSearch]]),
    * whose only layout parameter is the list bucket count. */
  private[graft] def ivfBuckets(
      spark: SparkSession, indexDir: String, explicit: Int): Int =
    metaOr(spark, indexDir, explicit.toLong,
      "buckets", IndexBuckets.toLong).toInt

  /** The dir's OWN persisted layout bucket count (`_meta` `buckets`,
    * [[IndexBuckets]] for pre-meta dirs) — what every fragmentation /
    * compaction verdict must bound against. Comparing against the
    * constant instead silently fails (buckets > default) or silently
    * passes (buckets < default) any index built with a non-default
    * layout; the triggers in [[maintainIndex]] / [[VectorSearch.maintainIvfIndex]]
    * already resolve through `_meta`, and verdicts must agree with them. */
  private[graft] def bucketsOf(spark: SparkSession, indexDir: String): Int =
    ivfBuckets(spark, indexDir, -1)

  /** Default mutation-lease TTL (overridable via the
    * `graft.index.lease.ttlMs` system property, mainly for specs): a
    * lease older than this is presumed abandoned by a crashed mutator
    * and is TAKEN OVER with a loud log — long enough that no healthy
    * compaction/append outlives it, short enough that a crashed erasure
    * queue's redelivery self-serves within one maintenance cycle. */
  private def leaseTtlMs: Long =
    sys.props.get("graft.index.lease.ttlMs").map(_.toLong)
      .getOrElse(15L * 60L * 1000L)

  /** Heartbeat cadence: a live holder renews the lock mtime every ttl/3,
    * so a healthy-but-slow mutation (a compactIndex over a 100× corpus
    * outliving the 15-min ttl) is never presumed crashed and usurped. */
  private def leaseHeartbeatMs: Long = math.max(50L, leaseTtlMs / 3L)

  /** Shared daemon scheduler for lease heartbeats — one thread serves
    * every held lease in the JVM (renewal is a stat + setTimes). */
  private lazy val leaseHeartbeats =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor { r =>
      val t = new Thread(r, "graft-index-lease-heartbeat")
      t.setDaemon(true)
      t
    }

  /** Filesystems whose `create(path, overwrite=false)` is ATOMIC
    * create-if-absent — the primitive the `_lock` lease protocol rests
    * on. HDFS and local/posix FS guarantee it (one NameNode op / O_EXCL);
    * raw object stores do NOT (S3A's create is a multi-part PUT with no
    * compare-and-set — two writers can both "win"). On a non-atomic
    * scheme the lease degrades to best-effort mutual exclusion:
    * [[acquireLease]] warns loudly once per scheme, and a deployment on
    * raw S3 should front the index dir with a consistent layer (HDFS,
    * S3Guard-era semantics, or a coordination service) for concurrent
    * maintenance. Pure function of the scheme so the capability probe is
    * unit-testable without mounting the store. */
  private[graft] def leaseCreateIsAtomic(scheme: String): Boolean =
    scheme == null || Set(
      "file", "local", "hdfs", "viewfs", "webhdfs", "swebhdfs", "ofs",
      "o3fs", "abfs", "abfss").contains(scheme.toLowerCase)

  /** One loud capability warning per non-atomic scheme per JVM.
    * (`private[graft]` so the lease specs can assert WHICH schemes
    * degraded instead of scraping stderr.) */
  private[graft] val nonAtomicSchemeWarned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Hadoop conf key PREFIX (scheme-scoped:
    * `graft.lease.create.must.<scheme>`): comma-separated `key=value`
    * MANDATORY options applied to the lease lock's create through the
    * public `FSDataOutputStreamBuilder.must()` contract — the opt-in
    * that turns create-if-absent into a SERVER-SIDE conditional write on
    * stores that support one. S3-compatible stores now implement
    * conditional PUT (`If-None-Match: *`), and connectors expose it as a
    * create-time option; setting that option's key here gives raw-S3
    * users a REAL single-writer fence instead of the best-effort
    * warning. Scoped by scheme because the option NAME is
    * connector-specific — and so a conditional option configured for one
    * store never leaks into lease acquires on another.
    *
    * `must` is Hadoop's capability mechanism: an option a store cannot
    * honor REJECTS the build (the connector throws at `build()`), so a
    * misconfigured key fails LOUDLY at acquire time — it never silently
    * pretends to fence. The Hadoop create-no-overwrite contract requires
    * a failed existence precondition to surface as a
    * `FileAlreadyExistsException` (an `IOException`), which routes into
    * the same stale-lease/holder-refusal path as the atomic schemes'. */
  private[graft] val LeaseCreateMustPrefix = "graft.lease.create.must."

  private[graft] def leaseCreateMusts(
      conf: org.apache.hadoop.conf.Configuration,
      scheme: String): Seq[(String, String)] =
    Option(scheme).flatMap(s => Option(conf.get(LeaseCreateMustPrefix + s)))
      .toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        val i = kv.indexOf('=')
        require(i > 0,
          s"$LeaseCreateMustPrefix$scheme entries must be key=value, " +
            s"got '$kv'")
        (kv.substring(0, i).trim, kv.substring(i + 1).trim)
      }

  /** A held mutation lease on an index dir — see [[acquireLease]].
    * `owner` is the fencing token written into the lock file; `lost`
    * flips when the heartbeat observes another owner in the lock (this
    * holder overran the ttl and was usurped) — [[releaseLease]] then
    * leaves the usurper's lock alone. */
  private[graft] final case class IndexLease(
      fs: org.apache.hadoop.fs.FileSystem,
      path: org.apache.hadoop.fs.Path, owner: String,
      heartbeat: Option[java.util.concurrent.ScheduledFuture[_]] = None,
      lost: java.util.concurrent.atomic.AtomicBoolean =
        new java.util.concurrent.atomic.AtomicBoolean(false)) {
    /** Write fence: mutators call this between their compute phase and
      * their first artifact write/promotion. A holder whose heartbeat
      * observed usurpation (ttl overrun — the heartbeat thread stalled,
      * or the renewal kept failing) must not start writing into a dir
      * another mutator now owns; the computed work is abandoned and the
      * idempotent-redelivery contract replays it. One atomic read — free
      * on the happy path. */
    def checkStillHeld(what: String): Unit =
      if (lost.get()) throw new IllegalStateException(
        s"index lease at $path was lost mid-operation (ttl overrun; a " +
          s"new holder owns the dir) — refusing to $what; redeliver " +
          "after the new holder releases")
  }

  /** SINGLE-WRITER FENCE (`<indexDir>/_lock`) — the enforcement behind
    * the "single mutator per index dir" contract every in-place mutator
    * documents. Two rename-promotions interleaving (a scheduled
    * compaction racing a streaming ingest on the same dir) can drop a
    * whole artifact generation; with the fence, every mutator acquires
    * the lock by ATOMIC CREATE (create with overwrite=false — atomic on
    * HDFS and local FS; best-effort on stores without atomic create)
    * before touching any artifact and releases it in `finally`. A second
    * mutator REFUSES LOUDLY, naming the current holder and its
    * operation — the erasure queue / maintenance scheduler then retries
    * after the holder finishes. A lease older than [[leaseTtlMs]] is
    * presumed crashed and taken over with a warning (the crash-recovery
    * path: healIndex + idempotent redelivery repair whatever the dead
    * holder left half-done). Streaming mutators hold the lease PER
    * BATCH (acquired inside appendToIndex / removeFromIndex), so a
    * maintenance compaction interleaves BETWEEN batches, never inside
    * one.
    *
    * Liveness and fencing: a held lease HEARTBEATS (mtime renewal every
    * ttl/3 — [[startHeartbeat]]), so only a genuinely dead holder ever
    * expires; a takeover RE-VERIFIES its own token after the re-create
    * (two usurpers racing the same stale lock — exactly one wins); and
    * release is OWNER-COMPARED (a usurped holder never deletes the new
    * holder's lock). All of it rests on atomic create-if-absent — see
    * [[leaseCreateIsAtomic]] for the store capability contract and the
    * loud degradation warning on raw object stores. */
  /** The lock file's current owner token, `None` when the lock is absent
    * (or vanishes between the existence check and the read). */
  private def readLockOwner(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path): Option[String] =
    try {
      val in = fs.open(p)
      Some(try new String(in.readAllBytes(), "UTF-8") finally in.close())
    } catch {
      case _: java.io.FileNotFoundException => None
    }

  /** One lease's heartbeat state machine — the rules a held lease beats
    * by, factored out of the scheduler so the loss rules are
    * unit-testable without injecting faults into a live FileSystem.
    * Each beat verifies the lock still carries OUR owner token and
    * renews its mtime, so a live-but-slow holder (a 100×-corpus
    * compaction outliving the ttl) is never presumed crashed, and a
    * holder that WAS usurped finds out (flips `lost`, stops renewing)
    * instead of later deleting the usurper's lock.
    *
    * A lock observed to hold a FOREIGN owner is an instant loss; a lock
    * observed MISSING is tolerated for one beat before declaring loss —
    * [[claimStaleLock]]'s verify-and-restore makes the lock path vanish
    * for a moment when a mis-aimed takeover puts a live lock back, and
    * one beat of grace keeps that self-correction from killing the
    * rightful holder's lease. A lock missing on two consecutive beats
    * was genuinely deleted.
    *
    * An I/O failure skips one beat — but only while the LAST SUCCESSFUL
    * renewal is younger than the ttl. Past that, holdership can no
    * longer be proven (a usurper may legitimately have claimed the
    * un-renewed lock during the outage), so persistent renew failure
    * flips `lost` just like an observed usurpation — otherwise a holder
    * partitioned from the store for a full ttl would sail through the
    * write fence the moment the partition heals, into a dir a usurper
    * now owns. */
  private[graft] final class HeartbeatLoop(
      owner: String, ttlMs: Long, where: String,
      lost: java.util.concurrent.atomic.AtomicBoolean) {
    private val misses = new java.util.concurrent.atomic.AtomicInteger(0)
    // Seeded at CONSTRUCTION (≈ lock acquisition), not at the first beat:
    // if the scheduler delays the first beat past the ttl AND it then hits
    // a transient I/O failure, the lease flips lost even though the lock
    // was freshly acquired and uncontested. That is the conservative
    // reading on purpose — holdership is only ever claimed for intervals
    // the heartbeat has positively observed; a ttl-scale GC/scheduler
    // pause before the first beat aborts (safe) rather than presumes.
    private val lastRenewed = new java.util.concurrent.atomic.AtomicLong(
      System.currentTimeMillis())
    /** One beat: read the lock, renew when it is still ours.
      * @return false when the lease is LOST (stop beating). */
    def beat(readOwner: () => Option[String], renew: () => Unit): Boolean =
      try {
        readOwner() match {
          case Some(cur) if cur == owner =>
            misses.set(0)
            renew()
            lastRenewed.set(System.currentTimeMillis())
            true
          case None if misses.incrementAndGet() < 2 =>
            true // one beat of grace — see the class scaladoc
          case other =>
            lost.set(true)
            System.err.println(
              s"[graft] index lease at $where LOST mid-operation: the lock " +
                s"now holds ${other.fold("nothing")(o => s"'$o'")} — this " +
                "holder overran the ttl and was usurped; its release will " +
                "leave the new holder's lock alone")
            false
        }
      } catch {
        case _: java.io.IOException
            if System.currentTimeMillis() - lastRenewed.get() <= ttlMs =>
          true // transient: retry next beat — renewal still younger than ttl
        case _: java.io.IOException =>
          lost.set(true)
          System.err.println(
            s"[graft] index lease at $where LOST mid-operation: every " +
              "renewal for a full ttl failed, so the un-renewed lock may " +
              "have been legitimately usurped — the write fence now refuses")
          false
      }
  }

  /** Schedule a [[HeartbeatLoop]] for a held lease: one beat every
    * ttl/3 against the live lock file; a lost beat throws to cancel the
    * fixed-rate schedule. The loss rules live on the loop class. */
  private def startHeartbeat(
      fs: org.apache.hadoop.fs.FileSystem, p: org.apache.hadoop.fs.Path,
      owner: String, lost: java.util.concurrent.atomic.AtomicBoolean)
      : java.util.concurrent.ScheduledFuture[_] = {
    val loop = new HeartbeatLoop(owner, leaseTtlMs, p.toString, lost)
    leaseHeartbeats.scheduleAtFixedRate(
      () => if (!loop.beat(
          () => readLockOwner(fs, p),
          () => fs.setTimes(p, System.currentTimeMillis(), -1))) {
        // a thrown exception cancels the fixed-rate schedule
        throw new IllegalStateException("lease lost — heartbeat stops")
      },
      leaseHeartbeatMs, leaseHeartbeatMs,
      java.util.concurrent.TimeUnit.MILLISECONDS)
  }

  /** Claim the right to take over a stale lock — the step between
    * "observed a holder past its ttl" and "delete + re-create". A bare
    * delete is the race the round-11 fence still carried: two usurpers
    * that both observed the SAME stale holder both delete-and-create,
    * and the second delete removes the first usurper's FRESH lock (the
    * post-create re-read narrows but cannot close the window). The claim
    * is an atomic RENAME of the lock to a caller-unique path: exactly one
    * of any number of racing usurpers moves the file, so exactly one ever
    * deletes anything.
    *
    * The rename is atomic but not conditional, so the winner VERIFIES the
    * claimed file still carries the stale owner text it observed. A
    * mismatch means the stale lock was already replaced by a NEW holder's
    * fresh lock between this usurper's read and its rename (takeover
    * completed in the gap) — the fresh lock is put straight back and the
    * claim fails. The displaced holder's heartbeat tolerates the one-beat
    * restore window ([[startHeartbeat]]).
    *
    * Scope note: on stores where RENAME itself is copy-then-delete (raw
    * S3), the claim narrows but cannot fully close the two-usurper window
    * — there the conditional-create fence ([[LeaseCreateMustPrefix]]) makes
    * the ACQUIRE atomic, and stale-lock takeover remains best-effort;
    * operators on such stores should prefer letting the ttl'd holder's
    * own heartbeat/fence resolve over racing takeovers.
    *
    * @return true = this caller owns the takeover (lock path is now
    *         absent; proceed to the atomic create); false = lost the
    *         claim race or the lock was no longer the observed stale one. */
  private[graft] def claimStaleLock(
      fs: org.apache.hadoop.fs.FileSystem, p: org.apache.hadoop.fs.Path,
      observedOwner: String): Boolean = {
    val claim = new org.apache.hadoop.fs.Path(
      p.getParent, s"_lock.claim.${java.util.UUID.randomUUID()}")
    val moved = try fs.rename(p, claim)
    catch { case _: java.io.IOException => false }
    if (!moved) false // another usurper claimed it first — back off
    // a transient verify-read failure restores and backs off — the safe
    // default; leaving the lock path absent with an orphaned claim file
    // would let the NEXT acquirer skip the takeover protocol entirely
    else if (try readLockOwner(fs, claim).contains(observedOwner)
    catch { case _: java.io.IOException => false }) {
      fs.delete(claim, false); true
    } else {
      // Claimed a DIFFERENT lock than the stale one observed: a takeover
      // already completed and this is the new holder's fresh lock —
      // restore it and back off. (rename may THROW rather than return
      // false on a store hiccup — same outcome, don't let it escape with
      // the lock path absent and the claim orphaned.)
      if (!(try fs.rename(claim, p)
      catch { case _: java.io.IOException => false })) {
        // a third acquirer created the lock path inside the restore
        // window; the displaced holder's heartbeat will flip `lost` and
        // its write fence refuses — log the incident loudly
        System.err.println(
          s"[graft] claimStaleLock at $p: could not restore a fresh lock " +
            "displaced by a mis-aimed takeover (a third acquirer raced " +
            "the restore window); the displaced holder's heartbeat and " +
            "write fence bound the damage")
        fs.delete(claim, false)
      }
      false
    }
  }

  private[graft] def acquireLease(
      spark: SparkSession, indexDir: String, op: String): IndexLease = {
    val (fs, p) = hadoopFs(spark, s"$indexDir/_lock")
    val scheme =
      try fs.getScheme catch { case _: UnsupportedOperationException => null }
    // conditional-create opt-in: with mandatory create options configured
    // the store itself enforces create-if-absent (If-None-Match-style),
    // so a non-atomic scheme is FENCED, not degraded — the warning is
    // retained only for schemes with neither capability
    val musts = leaseCreateMusts(fs.getConf, scheme)
    if (!leaseCreateIsAtomic(scheme) && musts.isEmpty &&
        nonAtomicSchemeWarned.add(scheme))
      System.err.println(
        s"[graft] index lease at $indexDir sits on scheme '$scheme', whose " +
          "create-if-absent is NOT atomic — the single-writer fence " +
          "degrades to best-effort there; front the index dir with an " +
          "atomic-create store (HDFS/local/ABFS), or set " +
          s"$LeaseCreateMustPrefix$scheme to the connector's " +
          "conditional-create option (S3 conditional PUT) for a real " +
          "fence, when maintenance and ingest can genuinely race")
    def createLock(): org.apache.hadoop.fs.FSDataOutputStream =
      if (musts.isEmpty) fs.create(p, false) // atomic create-if-absent
      else {
        // server-side conditional create: `must` options the store cannot
        // honor make build() throw (NOT an IOException) — a misconfigured
        // fence fails loudly here rather than degrade silently
        val b = fs.createFile(p).overwrite(false)
        musts.foreach { case (k, v) => b.must(k, v) }
        b.build()
      }
    val owner = s"op=$op pid=${ProcessHandle.current().pid()} " +
      s"id=${java.util.UUID.randomUUID()} ts=${System.currentTimeMillis()}"
    var tookOver = false
    var attempt = 0
    while (attempt < 2) {
      attempt += 1
      try {
        fs.mkdirs(p.getParent)
        val out = createLock()
        try out.write(owner.getBytes("UTF-8")) finally out.close()
        // FENCED takeover: two mutators that both read the same stale
        // holder can both delete-and-create — the second delete removes
        // the first's FRESH lock. After a takeover create, re-read and
        // verify our token survived before claiming the lease.
        if (tookOver) readLockOwner(fs, p) match {
          case Some(cur) if cur == owner => // our takeover held
          case other => throw new IllegalStateException(
            s"index at $indexDir: lost the stale-lease takeover race to " +
              s"${other.fold("a concurrent usurper")(o => s"'$o'")} — " +
              s"refusing op=$op (retry after the winner releases)")
        }
        val lost = new java.util.concurrent.atomic.AtomicBoolean(false)
        return IndexLease(fs, p, owner,
          heartbeat = Some(startHeartbeat(fs, p, owner, lost)), lost = lost)
      } catch {
        case _: java.io.IOException =>
          // Lock exists (or a transient FS error): stale-lease check.
          val holder =
            try {
              val st = fs.getFileStatus(p)
              readLockOwner(fs, p).map(txt => (txt, st.getModificationTime))
            } catch { case _: java.io.IOException => None }
          holder match {
            case Some((txt, mtime))
                if System.currentTimeMillis() - mtime > leaseTtlMs =>
              // CLAIMED takeover: the atomic rename in claimStaleLock
              // guarantees at most one of any number of racing usurpers
              // proceeds to delete + re-create; a failed claim loops once
              // more and sees either the winner's fresh lock (refuse) or
              // the brief absent window (race the atomic create).
              if (claimStaleLock(fs, p, txt)) {
                System.err.println(
                  s"[graft] index lease TAKEOVER at $indexDir for op=$op: " +
                    s"holder '$txt' exceeded ttl=${leaseTtlMs}ms with no " +
                    "heartbeat renewal — presumed crashed; healIndex + " +
                    "idempotent redelivery repair its half-done work")
                tookOver = true
              }
            // claimed → loop once more for the atomic re-create
            case Some((txt, _)) =>
              throw new IllegalStateException(
                s"index at $indexDir is being mutated by another writer " +
                  s"('$txt') — refusing op=$op; one mutator per index dir " +
                  "at a time (retry after the holder releases, or remove " +
                  s"$indexDir/_lock if the holder is known dead)")
            case None =>
              // raced: the holder released between create and read — retry
          }
      }
    }
    throw new IllegalStateException(
      s"could not acquire the mutation lease at $indexDir/_lock for " +
        s"op=$op after a takeover attempt — another writer keeps the lock")
  }

  /** Release an acquired lease. FENCED: deletes the lock only when it
    * still carries THIS lease's owner token — a holder that overran the
    * ttl and was usurped (`lost`, or an owner mismatch read here) must
    * not delete the new holder's lock on exit, which would admit a third
    * writer mid-mutation. */
  private[graft] def releaseLease(lease: IndexLease): Unit = {
    lease.heartbeat.foreach(_.cancel(false))
    try {
      if (lease.lost.get())
        System.err.println(
          s"[graft] index lease ${lease.path} was usurped mid-operation " +
            "(ttl overrun); leaving the current holder's lock in place")
      else readLockOwner(lease.fs, lease.path) match {
        case Some(cur) if cur == lease.owner =>
          lease.fs.delete(lease.path, false); ()
        case Some(cur) =>
          System.err.println(
            s"[graft] index lease ${lease.path} now holds '$cur' (this " +
              "holder was usurped after a ttl overrun); leaving the " +
              "current holder's lock in place")
        case None => // already gone — nothing to release
      }
    } catch {
      case e: java.io.IOException =>
        System.err.println(
          s"[graft] could not release index lease ${lease.path} " +
            s"(${e.getMessage}); the next mutator takes over after ttl")
    }
  }

  /** Run `body` holding the index dir's mutation lease. */
  private[graft] def withLease[T](
      spark: SparkSession, indexDir: String, op: String)(body: => T): T =
    withLeaseFenced(spark, indexDir, op)(_ => body)

  /** [[withLease]], handing `body` the lease so it can place
    * [[IndexLease.checkStillHeld]] write fences between its compute and
    * write phases. */
  private[graft] def withLeaseFenced[T](
      spark: SparkSession, indexDir: String, op: String)
      (body: IndexLease => T): T = {
    val lease = acquireLease(spark, indexDir, op)
    try body(lease) finally releaseLease(lease)
  }

  /** Per-artifact SCHEMA sidecar (`<indexDir>/_schemas`) — the reason
    * every raw read of a stored artifact can survive a ZERO-data-file
    * directory. An artifact legitimately holds no files: a corpus with
    * no near-dup pairs writes an empty `edges/`, an erasure can empty
    * any artifact, and [[rewriteArtifact]]'s promotion window can crash
    * into one. Schema INFERENCE throws on such a dir ("Unable to infer
    * schema"), which would wedge [[removeFromIndex]] /
    * [[erasureCertificate]] / fresh-session [[appendBucketed]] — and a
    * wedged erasure breaks the crash-anywhere-repaired-by-redelivery
    * contract of [[forgetStream]]. The sidecar records each artifact's
    * schema at build/merge time (one `artifact<TAB>schema-json` line
    * each, nullability normalized to parquet-read form, atomic
    * tmp+rename like `_meta`); every raw artifact read resolves through
    * it and serves an EMPTY frame of the recorded schema when the files
    * are gone. Pre-sidecar indexes upgrade lazily: mutators call
    * [[ensureArtifactSchemas]], which derives the sidecar from whatever
    * artifacts are still readable. */
  private[graft] def writeArtifactSchemas(
      spark: SparkSession, indexDir: String,
      schemas: (String, org.apache.spark.sql.types.StructType)*): Unit = {
    val merged = artifactSchemas(spark, indexDir) ++
      schemas.map { case (a, s) =>
        // parquet reads surface every field nullable; record that form so
        // the sidecar schema is indistinguishable from inference
        a -> org.apache.spark.sql.types.StructType(
          s.fields.map(_.copy(nullable = true)))
      }
    val (fs, p) = hadoopFs(spark, s"$indexDir/_schemas")
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/_schemas.tmp")
    val out = fs.create(tmp, true)
    try out.write(merged.toSeq.sortBy(_._1)
      .map { case (a, s) => s"$a\t${s.json}" }
      .mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    // Overwrite-atomic commit where the store supports it (POSIX rename
    // replaces the destination — no absent-sidecar window for concurrent
    // readers); only when that rename refuses (HDFS semantics: rename
    // fails onto an existing destination) fall back to delete+rename,
    // whose tiny window [[artifactSchemas]]' one-shot retry covers.
    if (!fs.rename(tmp, p)) {
      fs.delete(p, false)
      require(fs.rename(tmp, p), s"writeArtifactSchemas: cannot commit $p")
    }
  }

  private[graft] def artifactSchemas(
      spark: SparkSession, indexDir: String)
      : Map[String, org.apache.spark.sql.types.StructType] = {
    val (fs, p) = hadoopFs(spark, s"$indexDir/_schemas")
    // One-shot retry across [[writeArtifactSchemas]]' fallback commit
    // window (delete+rename on stores without overwrite-rename): a reader
    // that hits the instant between the delete and the rename must not
    // degrade to schema inference — which THROWS on an emptied artifact,
    // the exact wedge the sidecar exists to prevent.
    def readOnce(): Option[String] =
      if (!fs.exists(p)) None
      else try {
        val in = fs.open(p)
        Some(try new String(in.readAllBytes(), "UTF-8") finally in.close())
      } catch { case _: java.io.FileNotFoundException => None }
    val text = readOnce().orElse {
      // SLEEP-retry ONLY when a fallback commit is visibly in flight —
      // its `_schemas.tmp` still present between the delete and the
      // rename. When tmp is ALSO absent, the commit may have completed
      // in the gap between the first read and the tmp probe (rename
      // landed, tmp gone), so take one more immediate read — sleep-free,
      // and a dir that simply has no sidecar yet (fresh build,
      // pre-sidecar index) still answers without paying the race
      // window's 100 ms.
      val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/_schemas.tmp")
      val committing =
        try fs.exists(tmp) catch { case _: java.io.IOException => false }
      if (committing) { Thread.sleep(100L); readOnce() } else readOnce()
    }
    text.fold(Map.empty[String, org.apache.spark.sql.types.StructType]) {
      _.linesIterator.filter(_.contains('\t')).map { l =>
        val Array(a, j) = l.split("\t", 2)
        a -> org.apache.spark.sql.types.DataType.fromJson(j)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
      }.toMap
    }
  }

  /** Read a stored artifact as RAW parquet (no catalog, no bucket-spec
    * claim), resolving its schema from the `_schemas` sidecar so a
    * zero-data-file (or altogether missing) artifact directory serves an
    * EMPTY frame instead of throwing schema inference. Pre-sidecar
    * indexes fall back to inference — their legacy behavior. */
  private[graft] def rawArtifact(
      spark: SparkSession, indexDir: String, artifact: String): DataFrame = {
    val path = s"$indexDir/$artifact"
    artifactSchemas(spark, indexDir).get(artifact) match {
      case Some(sch) =>
        val (fs, p) = hadoopFs(spark, path)
        if (fs.exists(p)) spark.read.schema(sch).parquet(path)
        else spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](), sch)
      case None => spark.read.parquet(path)
    }
  }

  /** Lazy sidecar upgrade for pre-sidecar indexes: derive `_schemas`
    * entries from the artifacts that still have readable files, falling
    * back to the family's CANONICAL schemas (plan-only evaluation of the
    * same builder expressions — see [[dedupCanonicalSchemas]]) for
    * artifacts whose files are already gone. Called by every in-place
    * mutator before it rewrites anything, so the FIRST mutation of a
    * legacy index records the schemas any LATER mutation (which may face
    * an emptied artifact) will need. */
  private[graft] def ensureArtifactSchemas(
      spark: SparkSession, indexDir: String, artifacts: Seq[String],
      fallback: Map[String, org.apache.spark.sql.types.StructType] = Map.empty)
      : Unit = {
    val have = artifactSchemas(spark, indexDir).keySet
    val derivable = artifacts.filterNot(have).flatMap { a =>
      if (dataFileCount(spark, s"$indexDir/$a") > 0)
        Some(a -> spark.read.parquet(s"$indexDir/$a").schema)
      else fallback.get(a).map(a -> _)
    }
    if (derivable.nonEmpty)
      writeArtifactSchemas(spark, indexDir, derivable: _*)
  }

  @volatile private var canonicalSchemaCache
      : Map[String, org.apache.spark.sql.types.StructType] = null

  /** The dedup family's artifact schemas derived from the BUILDER
    * EXPRESSIONS themselves (schema-only evaluation over an empty docs
    * frame — no job runs): the authority of last resort when a legacy
    * index's artifact has no sidecar entry and no files to infer from.
    * Derived, not hand-written, so it cannot drift from
    * [[buildIndex]]'s actual output columns. */
  private[graft] def dedupCanonicalSchemas(
      spark: SparkSession): Map[String, org.apache.spark.sql.types.StructType] = {
    val cached = canonicalSchemaCache
    if (cached != null) cached
    else {
      import org.apache.spark.sql.types._
      val empty = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("doc_id", LongType),
          StructField("text", StringType))))
      val docs = canon(empty, "doc_id", "text")
      val postings = Dedup.postingsOf(docs)
      val capped = Dedup.cappedFromPostings(postings, Dedup.MaxShingleDf)
      val sigs = Dedup.signaturesOf(postings)
      val m = Map(
        "postings" -> postings.schema, "capped" -> capped.schema,
        "prefix" -> Dedup.ppjoinPrefix(capped, Dedup.PpjoinTauE4).schema,
        "signatures" -> sigs.schema,
        "bands" -> Dedup.bandRowsOf(sigs).schema,
        "edges" -> Dedup.scoredPairsFromSigs(sigs).schema)
      canonicalSchemaCache = m
      m
    }
  }

  /** Append-only lifecycle LEDGER under `<indexDir>/_history` — the
    * audit trail a production index needs (and the compliance evidence an
    * erasure queue must produce: "this index was mutated by these events
    * in this order"). One small JSON file per event, sequence = count of
    * existing entries (well-defined under the documented single-mutator-
    * per-index contract), written atomically via tmp+rename. The ledger
    * records event names, counts, and wall-clock ONLY — never document
    * content and never the erased ids themselves: a ledger that retained
    * what erasure removed would defeat the erasure. The `_history` dir's
    * underscore prefix keeps it invisible to any recursive data scan
    * (Hadoop's hidden-file filter), like the `_ingest_commit` marker. */
  private[graft] def recordEvent(
      spark: SparkSession, indexDir: String, event: String,
      detail: (String, Any)*): Unit = {
    val (fs, h) = hadoopFs(spark, s"$indexDir/_history")
    fs.mkdirs(h)
    val seq = fs.listStatus(h).count(_.getPath.getName.endsWith(".json"))
    // Full JSON string escaping — the ledger records operator-supplied
    // paths/details verbatim (a backslash or control char must not
    // corrupt the audit file, and a quote must not be silently rewritten).
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val fields = Seq(
      "seq" -> seq.toString, "ts_ms" -> System.currentTimeMillis().toString,
      "event" -> s""""${esc(event)}"""") ++
      detail.map { case (k, v) =>
        k -> (v match {
          case n: Long => n.toString
          case n: Int => n.toString
          case s => s""""${esc(s.toString)}""""
        })
      }
    val json = fields.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    val name = f"$seq%06d-$event.json"
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/_history/.$name.tmp")
    val out = fs.create(tmp, true)
    try out.write(json.getBytes("UTF-8")) finally out.close()
    require(fs.rename(tmp, new org.apache.hadoop.fs.Path(s"$indexDir/_history/$name")),
      s"recordEvent: cannot commit ledger entry $name at $indexDir")
  }

  /** Read the lifecycle ledger as a DataFrame ordered by `seq` — one row
    * per mutation event with whatever counts the operator recorded.
    * Returns an empty frame (correct schema) for a pre-ledger index. */
  def history(spark: SparkSession, indexDir: String): DataFrame = {
    val (fs, h) = hadoopFs(spark, s"$indexDir/_history")
    val base = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("seq",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts_ms",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event",
        org.apache.spark.sql.types.StringType)))
    // Guard the crashed-mid-first-record state too (`_history` exists
    // but holds only a hidden .tmp): schema inference over zero visible
    // files would throw where the contract promises an empty frame.
    val committed = fs.exists(h) &&
      fs.listStatus(h).exists(_.getPath.getName.endsWith(".json"))
    if (!committed) spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](), base)
    else spark.read.json(s"$indexDir/_history").orderBy(col("seq"))
  }

  /** CERTIFICATE OF ERASURE — the bounded probe that proves, from the
    * BYTES ON DISK, that a set of ids has no residue anywhere in a stored
    * index: one row per artifact with the residual row count for the
    * given ids (edges checked on BOTH endpoints), `erased_ok` TRUE only
    * when every artifact reads zero. Reads RAW parquet deliberately — the
    * claim is about files, not about any session's cached view — and
    * costs one broadcast-semi-join scan per artifact, independent of how
    * the erasure was performed (batch [[removeFromIndex]] or the
    * [[forgetStream]] queue). This is the artifact a right-to-be-
    * forgotten audit asks for: run it AFTER the queue drains, file it
    * next to the [[history]] ledger entry. */
  def erasureCertificate(
      spark: SparkSession, indexDir: String, removeIds: DataFrame): DataFrame = {
    val idCol = removeIds.columns.head
    CorpusOps.requireIntegralId(removeIds, idCol)
    val ids = removeIds.select(col(idCol).cast("long").as("doc_id")).distinct()
    // rawArtifact, not inference: an erasure that emptied an artifact
    // (or a pairless corpus's empty edges/) must certify CLEAN, not throw
    def residual(artifact: String, cnt: DataFrame => Long): (String, Long) =
      artifact -> cnt(rawArtifact(spark, indexDir, artifact))
    // ALL FIVE per-doc artifacts — capped and prefix hold the same class
    // of (doc_id, shingle) residue postings does, and a removeFromIndex
    // killed between the per-doc rewrites and the stats restate leaves
    // residue EXACTLY there; a certificate that skipped them could
    // attest clean while 2 of 6 artifacts still hold the documents.
    val perDoc = Seq("postings", "capped", "prefix", "signatures", "bands")
      .map { a =>
        residual(a, _.join(broadcast(ids), Seq("doc_id"), "left_semi").count())
      }
    // Edges match on EITHER endpoint; the distinct collapses the edge
    // whose both endpoints are erased, so residual_rows counts actual
    // leaked ROWS on disk, reconcilable by an auditor.
    val edges = residual("edges", df =>
      df.join(broadcast(ids.select($"doc_id".as("da"))), Seq("da"), "left_semi")
        .unionByName(df.join(
          broadcast(ids.select($"doc_id".as("db"))), Seq("db"), "left_semi")
          .select(df.columns.map(col).toIndexedSeq: _*))
        .distinct()
        .count())
    val rows = perDoc :+ edges
    val ok = rows.forall(_._2 == 0L)
    import spark.implicits.newProductEncoder
    spark.createDataset(rows.map { case (a, n) => (a, n, ok) })
      .toDF("artifact", "residual_rows", "erased_ok")
  }

  /** The six stored artifacts and the join key each is bucketed on —
    * the canonical layout [[buildIndex]] writes, [[appendToIndex]] grows,
    * and [[compactIndex]] rewrites. */
  private[graft] val ArtifactKeys: Seq[(String, String)] = Seq(
    "postings" -> "s", "capped" -> "s", "prefix" -> "s",
    "signatures" -> "doc_id", "bands" -> "bucket", "edges" -> "da")

  private def hadoopFs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Number of DATA files currently under a stored artifact directory
    * (metadata like `_SUCCESS` excluded) — the small-files metric
    * compaction exists to drive down. */
  private[graft] def dataFileCount(spark: SparkSession, dir: String): Long = {
    val (fs, p) = hadoopFs(spark, dir)
    if (!fs.exists(p)) 0L
    else fs.listStatus(p).count { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }.toLong
  }

  /** Total data-file count across all six artifacts of a stored index. */
  private[graft] def indexFileCount(spark: SparkSession, indexDir: String): Long =
    ArtifactKeys.map { case (a, _) => dataFileCount(spark, s"$indexDir/$a") }.sum

  /** Re-register the catalog entry for a stored bucketed artifact in a
    * session that didn't write it (the files are ordinary parquet; the
    * bucket spec is catalog metadata) so probes regain the exchange-free
    * bucketed-scan plan. */
  private def ensureBucketedTable(
      spark: SparkSession, path: String, key: String, buckets: Int): Unit = {
    val t = tableNameFor(path)
    if (!spark.catalog.tableExists(t)) {
      // Sidecar-first: registration must work over a zero-data-file
      // artifact (e.g. an empty edges/ from a pairless corpus) that a
      // fresh session is about to append into — inference would throw.
      val hp = new org.apache.hadoop.fs.Path(path)
      val schema = artifactSchemas(spark, hp.getParent.toString)
        .get(hp.getName)
        .getOrElse(spark.read.parquet(path).schema).toDDL
      spark.sql(
        s"""CREATE TABLE $t ($schema) USING parquet
            CLUSTERED BY ($key) SORTED BY ($key) INTO $buckets BUCKETS
            LOCATION '$path'""")
    }
  }

  /** Compact one stored bucketed artifact to ONE file per non-empty
    * bucket. Every [[appendBucketed]] lands one more file per touched
    * bucket, so after N appends a bucket scan unions O(N) small files —
    * the classic lakehouse small-files decay, and at a production append
    * cadence the dominant read-amplification cost. The rewrite
    * repartitions on the bucket key with the bucket count: Spark's
    * `HashPartitioning` partition-id expression is the same
    * `Murmur3 pmod buckets` the bucketed write uses for bucket ids, so
    * every write task holds exactly one bucket and emits exactly one
    * file. Promotion is by directory rename (metadata-only; never a
    * second data copy), with the previous generation staged aside until
    * the new one is in place. */
  private[graft] def compactArtifact(
      spark: SparkSession, path: String, key: String, buckets: Int): Unit =
    rewriteArtifact(spark, path, key, buckets)(identity)

  /** Rewrite a stored bucketed artifact IN PLACE through `f` (identity =
    * compaction; an anti-join = deletion), staging the new generation
    * next to the live artifact and promoting by directory rename — the
    * old generation's files are DELETED on promotion (load-bearing for
    * the forget lifecycle: deletion must remove bytes, not mask rows). */
  /** Heal the one non-atomic promotion window: a crash between
    * rename(live → .old) and rename(.compacting → live) leaves NO live
    * artifact — the previous generation sits intact at `.old`. Restore
    * it by renaming back (the half-promoted `.compacting` is superseded
    * and left for [[vacuumIndex]]). Called before every rewrite and by
    * vacuum, so redelivery of an interrupted erasure batch finds a
    * readable artifact and repairs by re-running its anti-joins. */
  private[graft] def healArtifact(spark: SparkSession, path: String): Boolean = {
    val (fs, live) = hadoopFs(spark, path)
    val old = new org.apache.hadoop.fs.Path(path + ".old")
    if (!fs.exists(live) && fs.exists(old)) {
      require(fs.rename(old, live),
        s"healArtifact: cannot restore $path from its .old generation")
      true
    } else false
  }

  /** Heal every artifact of a stored index ([[healArtifact]]) — run by
    * the in-place mutators before reading, so a redelivered batch that
    * follows a mid-promotion crash finds readable artifacts. */
  private[graft] def healIndex(spark: SparkSession, indexDir: String): Unit =
    ArtifactKeys.foreach { case (a, _) =>
      healArtifact(spark, s"$indexDir/$a"); ()
    }

  private[graft] def rewriteArtifact(
      spark: SparkSession, path: String, key: String, buckets: Int)(
      f: DataFrame => DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    healArtifact(spark, path)
    val tmp = path + ".compacting"
    // Read the RAW files, not the catalog table: the bucketed-table scan
    // advertises HashPartitioning(key, buckets), so the planner elides
    // the repartition as redundant — while ALSO planning the scan
    // unbucketed (file splits), leaving the write input partitioned by
    // file layout and producing one file per (task, bucket) instead of
    // one per bucket. A plain parquet scan has unknown partitioning, so
    // the repartition survives and aligns partition ids with bucket ids.
    // Resolved through the _schemas sidecar ([[rawArtifact]]): an
    // artifact an earlier erasure emptied must rewrite (to nothing), not
    // throw inference — redelivered forget batches repair crashes by
    // re-running these rewrites.
    val livePath = new Path(path)
    val live = rawArtifact(
      spark, livePath.getParent.toString, livePath.getName)
    // Pin the rewrite to the artifact's existing column order: an
    // anti-join `f` on the id column would otherwise move the join key
    // to the front (Spark's USING-column placement), silently changing
    // the physical layout a fresh-session RAW parquet reader sees —
    // post-forget files must look exactly like post-build files.
    val cols = live.columns.map(col).toIndexedSeq
    writeBucketed(
      f(live).select(cols: _*).repartition(buckets, col(key)),
      tmp, key, buckets)
    val (fs, hp) = hadoopFs(spark, path)
    val old = new Path(path + ".old")
    fs.delete(old, true)
    // A missing live dir is legal under the sidecar contract (rawArtifact
    // served the empty frame above) — promote the staged generation
    // directly, nothing to stage aside.
    if (fs.exists(hp))
      require(fs.rename(hp, old),
        s"compactArtifact: cannot stage $path aside for promotion")
    require(fs.rename(new Path(tmp), hp),
      s"compactArtifact: cannot promote $tmp over $path " +
        "(previous generation preserved at .old)")
    fs.delete(old, true)
    // Catalog hygiene: the staging write registered a table over the tmp
    // location (whose files just moved) — drop it; the artifact's own
    // table must shed its cached file listing, or be (re)registered with
    // the bucket spec when this session never wrote the artifact.
    spark.sql(s"DROP TABLE IF EXISTS ${tableNameFor(tmp)}")
    if (spark.catalog.tableExists(tableNameFor(path)))
      spark.catalog.refreshTable(tableNameFor(path))
    else ensureBucketedTable(spark, path, key, buckets)
  }

  /** Last micro-batch id applied to the stored index by [[ingestStream]]
    * (marker `_ingest_commit`) or [[forgetStream]] (marker
    * `_forget_commit`), or -1 — the idempotence watermark for
    * foreachBatch redeliveries. The two streams keep SEPARATE watermarks:
    * their batch-id sequences come from different checkpoints, so one
    * shared high-water mark would let an erasure batch id mask a pending
    * ingest (or vice versa). */
  private[graft] def lastIngestedBatch(
      spark: SparkSession, indexDir: String,
      marker: String = "_ingest_commit"): Long = {
    val (fs, p) = hadoopFs(spark, s"$indexDir/$marker")
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      finally in.close()
    }
  }

  /** Marker-file name for a streaming mutator's commit watermark, keyed
    * by BOTH the mutation kind and the driving query's checkpoint
    * location. Batch ids are per-CHECKPOINT sequences (a fresh
    * checkpoint restarts at 0), so a single shared marker would let one
    * query's high-water mark silently swallow every batch of a NEW
    * query pointed at the same index — ingest masking gate, or a
    * re-checkpointed ingest masking itself. Keying by (kind,
    * checkpoint) scopes the at-most-once contract to exactly the
    * sequence that owns the ids. The checkpoint path is hashed AS
    * SPELLED — resuming a query must name its checkpoint the same way,
    * which the checkpoint contract already requires. */
  private[graft] def commitMarker(kind: String, checkpointDir: String): String =
    "_" + kind + "_commit_" + java.security.MessageDigest
      .getInstance("MD5").digest(checkpointDir.getBytes("UTF-8"))
      .take(4).map(b => f"$b%02x").mkString

  private[ops] def recordIngestedBatch(
      spark: SparkSession, indexDir: String, id: Long,
      marker: String = "_ingest_commit"): Unit = {
    val (fs, p) = hadoopFs(spark, s"$indexDir/$marker")
    val tmp = new org.apache.hadoop.fs.Path(s"$indexDir/$marker.tmp")
    val out = fs.create(tmp, true)
    try out.write(id.toString.getBytes("UTF-8")) finally out.close()
    fs.delete(p, false)
    require(fs.rename(tmp, p),
      s"cannot commit batch marker $id at $p")
  }

  /** Apply one micro-batch to the stored index AT MOST ONCE per batch id.
    * `foreachBatch` redelivers the in-flight batch after a restart (its
    * sink commit is outside the checkpoint transaction), so the batch id
    * is checked against the index's own `_ingest_commit` watermark —
    * written only AFTER the append completes — and already-applied
    * batches skip. Returns whether the batch was applied. A crash
    * MID-append (between artifact appends) is not replay-repairable by
    * design: the redelivery then trips [[appendToIndex]]'s duplicate-id
    * refusal loudly instead of silently double-counting edges — the
    * index must be rebuilt (or restored from the pre-batch state). */
  private[graft] def appendBatchIdempotent(
      batch: DataFrame, idCol: String, textCol: String,
      indexDir: String, batchId: Long,
      marker: String = "_ingest_commit",
      restateStats: Boolean = true): Boolean = {
    val spark = batch.sparkSession
    if (batchId <= lastIngestedBatch(spark, indexDir, marker)) false
    else {
      if (!batch.isEmpty) {
        appendToIndex(batch, idCol, textCol, indexDir,
          restateStats = restateStats); ()
      }
      recordIngestedBatch(spark, indexDir, batchId, marker)
      true
    }
  }

  /** CONTINUOUS ingestion — the streaming face of [[appendToIndex]], the
    * shape a production corpus actually grows in: a stream of new
    * documents appends to the stored index per micro-batch (O(batch)
    * raw-text work each, candidates against the bucketed `bands/`
    * artifact), with per-batch idempotence via the index's own commit
    * watermark ([[appendBatchIdempotent]]). Per-batch work is O(batch):
    * the corpus-wide capped/prefix statistics restate is DEFERRED
    * (`restateStats = false` — the one append term that grows with the
    * stored index, not the batch) and marked in `_meta`. Single writer
    * per index dir; compact on a maintenance schedule ([[compactIndex]])
    * as batches accumulate files — the compaction also restates the
    * deferred statistics, so the schedule alone keeps the index current. Pair with `Trigger.AvailableNow()` for bounded
    * catch-up runs or a processing-time trigger for always-on tailing.
    * The appends run in the stream's cloned session — a session that
    * read the index earlier calls [[refreshIndex]] once before reading
    * the grown index (Spark's REFRESH TABLE contract). */
  def ingestStream(
      docs: DataFrame, idCol: String, textCol: String, indexDir: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val marker = commitMarker("ingest", checkpointDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: java.lang.Long) =>
          // restateStats = false: see gateStream — the per-batch restate
          // is the one append term that is O(index), not O(batch).
          appendBatchIdempotent(b, idCol, textCol, indexDir, id, marker,
            restateStats = false)
          ()
      }
      .start()
  }

  /** Apply one ERASURE micro-batch to the stored index at most once per
    * batch id — the forget twin of [[appendBatchIdempotent]], on its own
    * `_forget_commit` watermark. The recovery story is STRONGER than
    * append's: [[removeFromIndex]] is idempotent per artifact (absent ids
    * anti-join to nothing) and heals the one non-atomic promotion window
    * on entry ([[healIndex]]: a crash between the two promotion renames
    * leaves the previous generation intact at `.old`, restored by
    * rename), so a crash ANYWHERE mid-erasure is repaired by the
    * redelivery re-running the remaining anti-joins — no refusal path,
    * no rebuild. Returns whether the batch was applied (vs skipped as
    * already-committed). */
  private[graft] def forgetBatchIdempotent(
      ids: DataFrame, indexDir: String, batchId: Long,
      marker: String = "_forget_commit"): Boolean = {
    val spark = ids.sparkSession
    if (batchId <= lastIngestedBatch(spark, indexDir, marker)) false
    else {
      if (!ids.isEmpty) { removeFromIndex(spark, indexDir, ids); () }
      recordIngestedBatch(spark, indexDir, batchId, marker)
      true
    }
  }

  /** CONTINUOUS ERASURE — the streaming face of [[removeFromIndex]], the
    * shape a right-to-be-forgotten queue actually runs in: a stream of
    * doc-id erasure requests (one id column) is applied to the stored
    * index per micro-batch, idempotent twice over — per batch id via the
    * index's own `_forget_commit` watermark (cheap skip on foreachBatch
    * redelivery: a replayed erasure batch would otherwise pay a full
    * artifact rewrite), and per id by the anti-join semantics (a crash
    * mid-erasure is repaired by redelivery, not refused). One mutator
    * per index dir at a time — an ingest stream and a forget stream on
    * the same index must not run concurrently (both rewrite shared
    * artifacts); run erasure on the maintenance schedule next to
    * [[compactIndex]]. Readers in other sessions refresh via
    * [[refreshIndex]] after the queue drains. */
  def forgetStream(
      ids: DataFrame, indexDir: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val marker = commitMarker("forget", checkpointDir)
    ids.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: java.lang.Long) =>
          forgetBatchIdempotent(b, indexDir, id, marker)
          ()
      }
      .start()
  }

  /** Drop the calling session's cached relations for a stored index.
    * Spark caches a table's file listing per session, so a session that
    * read (or built) the index BEFORE another session appended to it —
    * the [[ingestStream]] foreachBatch clone is exactly such a writer —
    * keeps serving the stale pre-append listing. Same contract as
    * Spark's own `REFRESH TABLE` for externally-updated tables: readers
    * refresh once after an out-of-session update, not per query. */
  def refreshIndex(spark: SparkSession, indexDir: String): Unit =
    ArtifactKeys.foreach { case (a, _) =>
      val t = tableNameFor(s"$indexDir/$a")
      if (spark.catalog.tableExists(t)) spark.catalog.refreshTable(t)
    }

  /** Remove staging leftovers of an interrupted [[compactIndex]] /
    * [[rewriteArtifact]]: a crash between the staging write and
    * promotion leaves a sibling `<artifact>.compacting` (and,
    * mid-promotion, `<artifact>.old`) next to the live artifact. Heals
    * FIRST ([[healArtifact]]): when the crash landed in the one window
    * with no live artifact (between the two promotion renames), the
    * `.old` generation is the only remaining copy and is RESTORED, not
    * deleted — only then are superseded staging dirs reclaimed. Safe to
    * run any time; returns the number of staging dirs removed. */
  def vacuumIndex(spark: SparkSession, indexDir: String): Int =
    // Leased: vacuum deletes staging dirs, and racing a LIVE rewrite's
    // staging would destroy the generation it is about to promote.
    withLease(spark, indexDir, "vacuum") {
      ArtifactKeys.map { case (a, _) =>
        healArtifact(spark, s"$indexDir/$a")
        Seq(".compacting", ".old").count { sfx =>
          val (fs, p) = hadoopFs(spark, s"$indexDir/$a$sfx")
          fs.exists(p) && fs.delete(p, true)
        }
      }.sum
    }

  /** Compact a stored dedup index in place: every artifact rewritten to
    * one file per non-empty bucket (bit-identical rows — compaction is a
    * layout operation), bounding scan fan-in regardless of how many
    * [[appendToIndex]] batches the index has absorbed. The production
    * cadence: append per batch, compact on a schedule — exactly the
    * maintenance split a 100-TB lakehouse table runs. The six artifact
    * rewrites are mutually independent and run as concurrent jobs. */
  def compactIndex(
      spark: SparkSession, indexDir: String,
      buckets0: Int = -1): DedupIndex = {
    val buckets = metaOr(spark, indexDir, buckets0.toLong,
      "buckets", IndexBuckets.toLong).toInt
    val before = indexFileCount(spark, indexDir)
    withLeaseFenced(spark, indexDir, "compact") { lease =>
      ensureArtifactSchemas(spark, indexDir, ArtifactKeys.map(_._1),
        dedupCanonicalSchemas(spark))
      lease.checkStillHeld("compact the index artifacts")
      // A deferred-statistics index (gate/ingest streams skip the
      // O(index) capped/prefix restate per micro-batch) is brought
      // current HERE: the restate writes both artifacts fresh at one
      // file per bucket, so they need no second compaction pass — the
      // maintenance compaction schedule alone keeps streamed indexes
      // fully current.
      val stale = !statsFresh(spark, indexDir)
      if (stale) restateStatsLocked(spark, indexDir, buckets,
        metaOr(spark, indexDir, -1L, "ppjoinTauE4", Dedup.PpjoinTauE4))
      // The restate REPLACES capped/prefix, usually at one file per
      // bucket (bucket-aligned input partitions) — but a fresh session
      // reads the postings as raw parquet, the restate then shuffles to
      // spark.sql.shuffle.partitions, and the bucketed write emits one
      // file per (task, bucket). Skip the second pass only when the
      // restate's actual layout is already at/below the bucket count;
      // otherwise a compaction would RECORD artifacts as compacted while
      // leaving them fragmented.
      val toCompact =
        if (stale) ArtifactKeys.filter { case (a, _) =>
          (a != "capped" && a != "prefix") ||
            dataFileCount(spark, s"$indexDir/$a") > buckets
        }
        else ArtifactKeys
      inParallel(toCompact.map { case (a, k) =>
        () => compactArtifact(spark, s"$indexDir/$a", k, buckets)
      }: _*)
      recordEvent(spark, indexDir, "compact",
        "files_before" -> before,
        "files_after" -> indexFileCount(spark, indexDir))
    }
    fromIndex(spark, indexDir)
  }

  /** ONE-CALL INDEX MAINTENANCE — the scheduled move that keeps a
    * streamed/appended index healthy, executing the documented
    * maintenance triggers (PLANS.md "documented cutovers") in dependency
    * order, each gated on its own MEASURED metric:
    *
    *  1. `vacuum` — heal interrupted promotions and reclaim superseded
    *     staging dirs ([[vacuumIndex]]; always safe — triggered when
    *     anything was reclaimed);
    *  2. `restate` — bring DEFERRED statistics current
    *     ([[restateIndexStats]]) when a gate/ingest stream left
    *     `statsStale` set (the O(index) pass a streaming append defers,
    *     priced here once per maintenance cycle);
    *  3. `compact` — rewrite every artifact to one file per non-empty
    *     bucket ([[compactIndex]]) when the WORST artifact's data-file
    *     count exceeds `fragSlack` × the bucket count. Appends land one
    *     file per touched bucket per batch, and the restate itself can
    *     fragment capped/prefix in a fresh session — so fragmentation is
    *     measured AFTER the restate, and the post-call invariant is
    *     unconditional: worst ≤ max(fragSlack × buckets, buckets).
    *
    * Idempotent: an immediate second call reports every trigger clear
    * and mutates nothing. Each triggered action takes its OWN lease —
    * maintenance interleaves BETWEEN ingest micro-batches, never inside
    * one (the per-batch lease contract), so this runs on a schedule
    * next to a live gate/ingest stream. At 100 TB this is the whole
    * operational story in one idempotent call: cron it per index dir
    * and the measured triggers price the O(index) work only when it is
    * actually owed.
    *
    * @return the report, one row per action:
    *         (action, triggered, before, after) — staging dirs reclaimed
    *         (→0), stale flag 0/1 (→0), worst per-artifact data-file
    *         count (→ ≤ buckets when compaction ran). */
  def maintainIndex(
      spark: SparkSession, indexDir: String,
      fragSlack: Double = 2.0): DataFrame = {
    require(fragSlack >= 1.0,
      s"maintainIndex: fragSlack must be >= 1 (got $fragSlack) — a slack " +
        "below the bucket count would re-compact an already-compact index " +
        "every cycle")
    val buckets = metaOr(spark, indexDir, -1L, "buckets", IndexBuckets.toLong)
    val reclaimed = vacuumIndex(spark, indexDir).toLong
    val wasStale = !statsFresh(spark, indexDir)
    if (wasStale) { restateIndexStats(spark, indexDir); () }
    val staleAfter = !statsFresh(spark, indexDir)
    def worstFiles(): Long = ArtifactKeys
      .map { case (a, _) => dataFileCount(spark, s"$indexDir/$a") }.max
    val fragBefore = worstFiles()
    val fragmented = fragBefore > (fragSlack * buckets).toLong
    if (fragmented) { compactIndex(spark, indexDir); () }
    val fragAfter = if (fragmented) worstFiles() else fragBefore
    recordEvent(spark, indexDir, "maintain",
      "vacuumed" -> reclaimed,
      "restated" -> (if (wasStale) 1L else 0L),
      "compacted" -> (if (fragmented) 1L else 0L),
      "worst_files" -> fragAfter)
    import spark.implicits.newProductEncoder
    spark.createDataset(Seq(
      ("compact", fragmented, fragBefore, fragAfter),
      ("restate", wasStale,
        if (wasStale) 1L else 0L, if (staleAfter) 1L else 0L),
      ("vacuum", reclaimed > 0L, reclaimed, 0L)))
      .toDF("action", "triggered", "before", "after")
      .orderBy($"action")
  }

  /** Open a stored index built by [[buildIndex]]. Same-session reads come
    * back through the catalog with their bucket specs; cross-session reads
    * fall back to plain parquet scans of the same files. Freshness of the
    * corpus statistics is checked PER OPEN (one `_meta` read — cheap; the
    * per-micro-batch gate path reads `_meta` for its build parameters
    * anyway): when the index carries deferred statistics (`statsStale` —
    * a gate/ingest stream appended without the O(index) restate), the
    * returned index's `capped`/`prefix` accessors REFUSE loudly instead
    * of serving a stale generation that silently misses duplicates. The
    * verdict/append/gate paths never read those two artifacts and are
    * unaffected; run [[restateIndexStats]] / [[compactIndex]] to bring a
    * streamed index current. Warned once per dir per STALE EPISODE (the
    * memo re-arms when the index is observed fresh again). */
  def fromIndex(spark: SparkSession, indexDir: String): DedupIndex = {
    val stale = !statsFresh(spark, indexDir)
    if (!stale) staleWarned.remove(indexDir)
    else if (staleWarned.add(indexDir))
      System.err.println(
        s"[graft] index at $indexDir has DEFERRED statistics " +
          "(capped/prefix reflect the last restate, not the current " +
          "postings — deferred by a streaming append); verdict/append " +
          "paths are unaffected, and the capped/prefix accessors refuse " +
          "until restateIndexStats (or compactIndex) runs")
    DedupIndex(
      postings = readArtifact(spark, indexDir, "postings"),
      capped0 = readArtifact(spark, indexDir, "capped"),
      prefix0 = readArtifact(spark, indexDir, "prefix"),
      signatures = readArtifact(spark, indexDir, "signatures"),
      bands = readArtifact(spark, indexDir, "bands"),
      edges = readArtifact(spark, indexDir, "edges"),
      staleStats = stale, indexDir = indexDir)
  }

  /** THE deliverable: the deduplicated corpus. Runs the full pipeline
    * (shingle → MinHash/LSH → connected components → representative
    * selection), drops every non-representative near-duplicate, and
    * returns the surviving rows with ALL the caller's columns plus
    * `cluster_id` (the caller's id for untouched rows), `n_merged` (how
    * many input rows this survivor represents), and `is_representative`
    * (whether it headed a near-dup cluster). Throws rather than emit from
    * a non-converged label partition (silent data loss). The input must
    * not already contain those three column names or `doc_id`. */
  def deduplicate(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cc = clustered(docs, idCol, textCol)
    val renamed = docs.withColumnRenamed(idCol, "doc_id")
      .withColumn("doc_id", col("doc_id").cast("long"))
    Dedup.survivorsOf(renamed, cc).withColumnRenamed("doc_id", idCol)
  }
}

private[ops] object CorpusOps {

  /** The public operators key on an integral id (joins, `<` orderings,
    * min-representative selection). A silent `cast("long")` of a string id
    * would null every key and return a garbage all-kept/no-pairs answer —
    * fail loudly at plan time instead. */
  def requireIntegralId(df: DataFrame, idCol: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"id column '$idCol' must be an integral type (byte/short/int/long), " +
        s"got ${dt.catalogString}; map your ids to longs first " +
        "(e.g. monotonically_increasing_id or a hash)")
  }
}

/** Frame-parametric similarity search over any embedding column. */
object VectorSearch {

  private def canon(vecs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    CorpusOps.requireIntegralId(vecs, idCol)
    vecs.select(col(idCol).cast("long").as("vec_id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
  }

  /** Exact cosine top-k neighbors of each query vector against the corpus:
    * broadcast(queries) ⋈ corpus with per-partition top-k aggregation — k
    * results per query move, the corpus never shuffles. Output: (qid,
    * rank, nb, cos_e4) with integer-e4 scores and deterministic (score,
    * id) tie-breaks. */
  def cosineTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame =
    Similarity.topKFrom(
      canon(corpus, idCol, vecCol), canon(queries, idCol, vecCol), k)

  /** A persisted IVF index: `centroids/` (cid, c) — the trained coarse
    * quantizer, bounded rows — and `vectors/` (cid, vec_id, v, nrm) — the
    * corpus assigned to centroid lists, written BUCKETED on `cid` so a
    * same-session probe join plans without an exchange on the index side.
    * The build-once/read-many lifecycle of a production ANN index: at
    * 100 TB the assign pass runs at write time only; every query ships
    * k×nprobe probe rows against stored join-ready lists. */
  final case class IvfIndex(centroids: DataFrame, vectors: DataFrame) {
    /** The trained quantizer, collected — bounded by construction
      * (IvfClusters rows of Dim doubles). */
    private[graft] def centroidArray: Array[Array[Double]] =
      centroids.orderBy(col("cid")).collect()
        .map(_.getSeq[Double](1).toArray)
  }

  /** Train the coarse quantizer on a bounded hash-ordered sample (the
    * driver never holds the corpus), assign every vector to its nearest
    * centroid, and persist both artifacts under `outDir`. */
  def buildIvfIndex(
      vecs: DataFrame, idCol: String, vecCol: String,
      outDir: String, buckets: Int = CorpusDedup.IndexBuckets): IvfIndex = {
    val spark = vecs.sparkSession
    val lease = CorpusDedup.acquireLease(spark, outDir, "build")
    try {
    val base = canon(vecs, idCol, vecCol).persist()
    base.count()
    val cents = Similarity.trainCentroids(Similarity.trainSample(base))
    val sqlc = spark
    import sqlc.implicits._
    val centroidsDf = cents.toIndexedSeq.zipWithIndex
      .map { case (c, i) => (i, c.toIndexedSeq) }
      .toDF("cid", "c")
    val vectorsDf = Similarity.assignedOf(base, cents)
      .select(col("cid"), col("vec_id"), col("v"), col("nrm"))
    lease.checkStillHeld("write the built IVF artifacts")
    centroidsDf.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/centroids")
    CorpusDedup.writeBucketed(vectorsDf, s"$outDir/vectors", "cid", buckets)
    base.unpersist(false)
    CorpusDedup.writeArtifactSchemas(spark, outDir,
      "centroids" -> centroidsDf.schema, "vectors" -> vectorsDf.schema)
    CorpusDedup.writeIndexMeta(spark, outDir, "buckets" -> buckets.toLong)
    CorpusDedup.recordEvent(spark, outDir, "build", "buckets" -> buckets)
    } finally CorpusDedup.releaseLease(lease)
    fromIvfIndex(spark, outDir)
  }

  /** INCREMENTAL ANN ingestion — the vector twin of
    * [[CorpusDedup.appendToIndex]]: assign a batch of NEW vectors against
    * the STORED coarse quantizer and append them to the cid-bucketed
    * per-centroid lists. The assign pass costs O(batch); the quantizer
    * never retrains — the production cadence for a growing ANN index
    * (grow by assignment, retrain only on measured drift, which is a
    * rebuild). The stored `centroids/` are driver-collected BEFORE the
    * append, so the batch assignment cannot race its own write. Refuses
    * vec_id re-use loudly (a duplicate id would silently double-serve
    * from two lists). */
  def appendToIvfIndex(
      newVecs: DataFrame, idCol: String, vecCol: String,
      indexDir: String, buckets0: Int = -1): IvfIndex = {
    val buckets = CorpusDedup.ivfBuckets(newVecs.sparkSession, indexDir, buckets0)
    val spark = newVecs.sparkSession
    val lease = CorpusDedup.acquireLease(spark, indexDir, "append")
    try {
    CorpusDedup.ensureArtifactSchemas(
      spark, indexDir, Seq("centroids", "vectors"), ivfCanonicalSchemas(spark))
    val idx = fromIvfIndex(spark, indexDir)
    val batch = canon(newVecs, idCol, vecCol)
    val dup = batch.select($"vec_id")
      .join(idx.vectors.select($"vec_id"), Seq("vec_id"), "left_semi")
      .limit(1).count()
    require(dup == 0L,
      "appendToIvfIndex: batch re-uses vec_id(s) already in the stored " +
        s"index at $indexDir — appends must be disjoint (new ids only)")
    val cents = idx.centroidArray
    lease.checkStillHeld("append the batch's vector lists")
    CorpusDedup.appendBucketed(
      Similarity.assignedOf(batch, cents)
        .select(col("cid"), col("vec_id"), col("v"), col("nrm")),
      s"$indexDir/vectors", "cid", buckets)
    CorpusDedup.recordEvent(spark, indexDir, "append")
    } finally CorpusDedup.releaseLease(lease)
    fromIvfIndex(spark, indexDir)
  }

  /** PARTITION-WISE ANN MERGE — the vector twin of
    * [[CorpusDedup.mergeIndexes]]: combine two IVF indexes built
    * independently over disjoint vector shards into one index at a fresh
    * `outDir`, touching no raw embeddings. The LEFT (senior) quantizer is
    * adopted — the same "same quantizer, grown lists" semantics as
    * [[appendToIvfIndex]] (retraining is a rebuild, triggered on measured
    * drift, not on every merge): the right shard's STORED vectors are
    * re-assigned against the left centroids (O(|right|) dot products —
    * the vectors are already parsed/normed doubles in the stored lists)
    * and the merged `vectors/` artifact is the bucketed union. The result
    * is bit-identical to appending the right shard's raw vectors to the
    * left index, which is what `q_sim_ivf_merge` pins via the one-pass
    * whole-corpus assignment compare. Refuses a shared vec_id loudly (a
    * duplicate would silently double-serve from two lists). */
  def mergeIvfIndexes(
      spark: SparkSession, leftDir: String, rightDir: String, outDir: String,
      buckets0: Int = -1): IvfIndex = {
    val buckets = CorpusDedup.ivfBuckets(spark, leftDir, buckets0)
    val lease = CorpusDedup.acquireLease(spark, outDir, "merge")
    try {
    val left = fromIvfIndex(spark, leftDir)
    // Raw-parquet read of the junior side — same rationale as
    // [[CorpusDedup.mergeIndexes]]: a union of two same-bucket-spec
    // catalog scans claims an alignment the concatenated partitions
    // don't have, and downstream exchange elision then computes
    // per-shard results. (Here the re-assignment replaces `cid`, which
    // already voids the claim, but the merge must not depend on that.)
    val right = IvfIndex(
      centroids = spark.read.schema(left.centroids.schema)
        .parquet(s"$rightDir/centroids"),
      vectors = spark.read.schema(left.vectors.schema)
        .parquet(s"$rightDir/vectors"))
    val dup = left.vectors.select($"vec_id")
      .join(right.vectors.select($"vec_id"), Seq("vec_id"), "left_semi")
      .limit(1).count()
    require(dup == 0L,
      s"mergeIvfIndexes: the indexes at $leftDir and $rightDir share " +
        "vec_id(s) — merge is defined over disjoint vector shards")
    val cents = left.centroidArray
    lease.checkStillHeld("write the merged IVF artifacts")
    left.centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/centroids")
    CorpusDedup.writeBucketed(
      left.vectors.select(col("cid"), col("vec_id"), col("v"), col("nrm"))
        .unionByName(
          Similarity.assignedOf(
            right.vectors.select(col("vec_id"), col("v")), cents)
            .select(col("cid"), col("vec_id"), col("v"), col("nrm"))),
      s"$outDir/vectors", "cid", buckets)
    CorpusDedup.writeArtifactSchemas(spark, outDir,
      "centroids" -> left.centroids.schema,
      "vectors" -> left.vectors.schema)
    CorpusDedup.writeIndexMeta(spark, outDir, "buckets" -> buckets.toLong)
    CorpusDedup.recordEvent(
      spark, outDir, "merge", "left" -> leftDir, "right" -> rightDir)
    } finally CorpusDedup.releaseLease(lease)
    fromIvfIndex(spark, outDir)
  }

  /** FORGET, vector twin ([[CorpusDedup.removeFromIndex]]): remove a set
    * of vectors from a stored IVF index in place — an anti-join rewrite
    * of the cid-bucketed lists with rename promotion (old generation's
    * files DELETED — erasure removes bytes). The quantizer is untouched:
    * centroids are a trained model, not per-vector state, so the index
    * afterward equals assigning the remaining corpus against the same
    * quantizer in one pass (oracle-pinned by `q_sim_ivf_forget`).
    * Idempotent — absent ids anti-join to nothing. */
  def removeFromIvfIndex(
      spark: SparkSession, indexDir: String, removeIds: DataFrame,
      buckets0: Int = -1): IvfIndex = {
    val buckets = CorpusDedup.ivfBuckets(spark, indexDir, buckets0)
    val idCol = removeIds.columns.head
    CorpusOps.requireIntegralId(removeIds, idCol)
    val ids = removeIds.select(col(idCol).cast("long").as("vec_id")).distinct()
    CorpusDedup.withLeaseFenced(spark, indexDir, "forget") { lease =>
      CorpusDedup.ensureArtifactSchemas(
        spark, indexDir, Seq("centroids", "vectors"), ivfCanonicalSchemas(spark))
      lease.checkStillHeld("rewrite the erasure's vector lists")
      CorpusDedup.rewriteArtifact(spark, s"$indexDir/vectors", "cid", buckets)(
        _.join(broadcast(ids), Seq("vec_id"), "left_anti"))
      CorpusDedup.recordEvent(spark, indexDir, "forget")
    }
    fromIvfIndex(spark, indexDir)
  }

  /** Compact a stored IVF index in place: the cid-bucketed `vectors/`
    * lists are rewritten to one file per non-empty bucket (bit-identical
    * rows — see [[CorpusDedup.compactArtifact]]). Each
    * [[appendToIvfIndex]] batch lands one more file per touched bucket;
    * compaction on a maintenance schedule bounds probe-scan fan-in
    * regardless of append count. The driver-bounded `centroids/` (one
    * coalesced file by construction, never appended) needs no rewrite. */
  def compactIvfIndex(
      spark: SparkSession, indexDir: String,
      buckets0: Int = -1): IvfIndex = {
    val buckets = CorpusDedup.ivfBuckets(spark, indexDir, buckets0)
    val before = CorpusDedup.dataFileCount(spark, s"$indexDir/vectors")
    CorpusDedup.withLeaseFenced(spark, indexDir, "compact") { lease =>
      CorpusDedup.ensureArtifactSchemas(
        spark, indexDir, Seq("centroids", "vectors"), ivfCanonicalSchemas(spark))
      lease.checkStillHeld("compact the vector lists")
      CorpusDedup.compactArtifact(spark, s"$indexDir/vectors", "cid", buckets)
      CorpusDedup.recordEvent(spark, indexDir, "compact",
        "files_before" -> before,
        "files_after" -> CorpusDedup.dataFileCount(spark, s"$indexDir/vectors"))
    }
    fromIvfIndex(spark, indexDir)
  }

  /** RETRAIN — the deliberate rebuild behind [[maintainIvfIndex]]'s
    * report-only `retrain` recommendation, closing the measured-drift
    * loop (measure: [[ivfStats]]; recommend: [[maintainIvfIndex]];
    * act: here): train a FRESH coarse quantizer on the STORED corpus
    * (the same deterministic bounded sample [[buildIvfIndex]] uses) and
    * re-assign every stored vector, promoting both artifacts under the
    * mutation lease via rename promotion. The result equals
    * [[buildIvfIndex]] over the stored vector set row-for-row
    * (spec-pinned): cids change by design, vec_ids are conserved, and
    * the fresh quantizer re-partitions the grown corpus, resetting the
    * skew/SSE drift signals.
    *
    * Crash contract: each promotion is whole-generation (old moved
    * aside, staged renamed in); a crash BETWEEN the two promotions
    * leaves lists assigned against a quantizer the `centroids/`
    * artifact doesn't hold yet — [[ivfStats]]'s `n_misassigned` goes
    * loud, and re-running the retrain repairs (it reads only vec_id/v,
    * which both generations carry identically).
    *
    * O(corpus) by nature — every vector is re-assigned; schedule it on
    * the measured trigger, never per batch. */
  def retrainIvfIndex(
      spark: SparkSession, indexDir: String, buckets0: Int = -1): IvfIndex =
    retrainIvfIndexWith(spark, indexDir, buckets0, None)

  /** [[retrainIvfIndex]] with an optional PRECOMPUTED candidate quantizer
    * — the act-policy path ([[maintainIvfIndex]]) trains and recall-gates
    * the candidate BEFORE taking the lease, then promotes exactly that
    * quantizer; `None` trains inside the lease (the standalone entry).
    * The train is deterministic over the stored corpus, so both paths
    * produce the same centroids for the same stored set. */
  private[graft] def retrainIvfIndexWith(
      spark: SparkSession, indexDir: String, buckets0: Int,
      cents0: Option[Array[Array[Double]]],
      requireVectorSet: Option[VectorSetMark] = None): IvfIndex = {
    val buckets = CorpusDedup.ivfBuckets(spark, indexDir, buckets0)
    CorpusDedup.withLeaseFenced(spark, indexDir, "retrain") { lease =>
      CorpusDedup.ensureArtifactSchemas(
        spark, indexDir, Seq("centroids", "vectors"), ivfCanonicalSchemas(spark))
      val stored = CorpusDedup.rawArtifact(spark, indexDir, "vectors")
        .select(col("vec_id"), col("v"))
      // Stale-gate fence (round 14; content-keyed round 15): a caller
      // that GATED this retrain on measurements taken lease-free (the
      // recall A/B) passes the vector-set MARK it measured against —
      // count plus an order-independent id-content hash — so an
      // equal-count mutation in the gate→lease window (an erase followed
      // by an append, or a concurrent retrain's churn that preserves
      // count) is caught, not just a net size change. If the stored set
      // changed in EITHER dimension, the gate's verdict no longer
      // describes the index being promoted — refuse INSIDE the lease
      // rather than promote centroids the gate never evaluated.
      requireVectorSet.foreach { expected =>
        val live = vectorSetMark(stored)
        if (live != expected)
          throw new java.util.ConcurrentModificationException(
            s"retrainIvfIndexWith at $indexDir: stored vector set changed " +
              s"between the recall A/B and the leased promotion " +
              s"(${expected.n} vectors / id-hash ${expected.idHash} at gate " +
              s"time, ${live.n} / ${live.idHash} now) — aborting the act; " +
              "re-run maintenance to re-measure")
      }
      val cents = cents0.getOrElse(
        Similarity.trainCentroids(Similarity.trainSample(stored)))
      val sqlc = spark
      import sqlc.implicits._
      val centroidsDf = cents.toIndexedSeq.zipWithIndex
        .map { case (c, i) => (i, c.toIndexedSeq) }
        .toDF("cid", "c")
      lease.checkStillHeld("promote the retrained artifacts")
      // vectors first: a crash after this promotion but before the
      // centroids' leaves n_misassigned nonzero — loud on the dashboard
      CorpusDedup.rewriteArtifact(spark, s"$indexDir/vectors", "cid", buckets)(
        live => Similarity
          .assignedOf(live.select(col("vec_id"), col("v")), cents)
          .select(col("cid"), col("vec_id"), col("v"), col("nrm")))
      CorpusDedup.rewriteArtifact(spark, s"$indexDir/centroids", "cid", 1)(
        _ => centroidsDf)
      CorpusDedup.recordEvent(spark, indexDir, "retrain",
        "n_centroids" -> cents.length.toLong)
    }
    fromIvfIndex(spark, indexDir)
  }

  /** ONE-CALL IVF MAINTENANCE — the vector twin of
    * [[CorpusDedup.maintainIndex]] and the executable form of the
    * documented "retrain only on measured drift" trigger (PLANS.md):
    *
    *  1. `compact` — rewrite the cid-bucketed lists to one file per
    *     non-empty bucket ([[compactIvfIndex]]) when their data-file
    *     count exceeds `fragSlack` × the bucket count (each append lands
    *     one file per touched list);
    *  2. `retrain` — REPORT-ONLY: recommended when the measured
    *     [[ivfStats]] drift trips — list skew past `skewCeil`× the
    *     average (`max_list · n_lists > skewCeil · n_vectors`), or
    *     within-centroid SSE at/above the trivial 1-mean quantizer's
    *     (the quantizer has stopped partitioning the grown corpus). A
    *     retrain is a REBUILD ([[buildIvfIndex]]) that re-assigns every
    *     stored vector — it changes cids, so it stays a deliberate,
    *     scheduled operation; this call measures and recommends, never
    *     rebuilds behind the caller's back.
    *
    * Idempotent on a healthy index: compaction leaves the lists at or
    * below the bucket count and a fresh quantizer keeps both drift
    * signals clear, so the immediate second call reports no triggers.
    *
    * @return the report, one row per action:
    *         (action, triggered, before, after) — for `compact` the
    *         `vectors/` data-file counts; for `retrain` the skew
    *         landmark pair (max_list × n_lists vs skewCeil × n_vectors:
    *         triggered when before > after or the SSE gap is gone). */
  def maintainIvfIndex(
      spark: SparkSession, indexDir: String,
      fragSlack: Double = 2.0, skewCeil: Long = 4L,
      actOnRetrain: Boolean = false,
      recallProbes: Int = 32, recallK: Int = 10,
      nprobe: Int = Similarity.IvfProbes): DataFrame = {
    require(fragSlack >= 1.0,
      s"maintainIvfIndex: fragSlack must be >= 1 (got $fragSlack)")
    val buckets = CorpusDedup.ivfBuckets(spark, indexDir, -1).toLong
    val before = CorpusDedup.dataFileCount(spark, s"$indexDir/vectors")
    val fragmented = before > (fragSlack * buckets).toLong
    if (fragmented) { compactIvfIndex(spark, indexDir); () }
    val after =
      if (fragmented) CorpusDedup.dataFileCount(spark, s"$indexDir/vectors")
      else before
    val st = ivfStats(spark, indexDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val skewLhs = st.getOrElse("max_list", 0L) * st.getOrElse("n_lists", 0L)
    val skewRhs = skewCeil * st.getOrElse("n_vectors", 1L)
    val gainGone = st.contains("within_sse_e6") &&
      st("within_sse_e6") >= st.getOrElse("global_sse_e6", Long.MaxValue)
    val retrain = skewLhs > skewRhs || gainGone
    CorpusDedup.recordEvent(spark, indexDir, "maintain",
      "compacted" -> (if (fragmented) 1L else 0L),
      "retrain_recommended" -> (if (retrain) 1L else 0L),
      "skew_lhs" -> skewLhs, "skew_rhs" -> skewRhs)
    // OPT-IN ACT POLICY (`actOnRetrain`, recommendation-only remains the
    // default): when the measured drift trigger fires, train the
    // candidate quantizer and execute the retrain — GATED by a recall
    // A/B on a bounded deterministic probe sample (a retrain that would
    // LOWER measured probe recall vs the exact top-k is refused loudly;
    // the recommendation stands, the index is untouched). The A/B runs
    // lease-free (pure reads); the act itself takes the lease inside
    // [[retrainIvfIndexWith]] with exactly the gated quantizer.
    val actRows =
      if (!(retrain && actOnRetrain)) Seq.empty[(String, Boolean, Long, Long)]
      else {
        val (acted, recallBefore, recallAfter) =
          retrainIfNotWorse(spark, indexDir, recallProbes, recallK, nprobe)
        Seq(("retrain_act", acted, recallBefore, recallAfter))
      }
    import spark.implicits.newProductEncoder
    spark.createDataset(Seq(
      ("compact", fragmented, before, after),
      ("retrain", retrain, skewLhs, skewRhs)) ++ actRows)
      .toDF("action", "triggered", "before", "after")
      .orderBy($"action")
  }

  /** The act policy's recall-gated retrain: measure probe recall of the
    * CURRENT index and of the freshly trained CANDIDATE quantizer against
    * the same exact top-k (bounded probe sample, deterministic), and
    * promote the candidate only when it does not lower recall.
    * @return (acted, recall_before_pct, recall_after_pct). */
  /** √n-scaled quantizer size for a grown index: probed work per query is
    * nprobe × n/k rows, so a FIXED k makes the ANN gate linear in the
    * stored corpus (measured: the mouth lane's ann_gate 28.7 → 338 s over
    * the 10×→100× decade at k=16, SCALE.md §5); k ≈ √n keeps it at
    * nprobe × √n. Floored at the historical [[Similarity.IvfClusters]]
    * (small corpora keep their exact quantizer and plans) and capped so
    * the per-query centroid scan and the driver-side trainer stay
    * bounded. */
  private[graft] def scaledK(n: Long): Int =
    math.max(Similarity.IvfClusters.toLong,
      math.min(4096L, math.ceil(math.sqrt(n.toDouble)).toLong)).toInt

  /** Monotone-free content watermark of a stored vector SET: row count
    * plus the order-independent xor of per-id hashes. One cheap aggregate
    * over the (vec_id) column — no sort, no shuffle beyond the final
    * combine — and any id-set mutation flips it, including the
    * equal-count erase-then-append the bare count cannot see. (Vector
    * VALUES are immutable per id in this store — every mutation is an
    * id-set mutation — so hashing ids suffices.) */
  private[graft] final case class VectorSetMark(n: Long, idHash: Long)

  private[graft] def vectorSetMark(stored: DataFrame): VectorSetMark = {
    val r = stored
      .agg(count(lit(1)).as("n"),
        expr("bit_xor(xxhash64(vec_id))").as("h"))
      .collect()(0)
    VectorSetMark(r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** RECALL-GATED SCALED RETRAIN — the operational fix for the measured
    * ann_gate decade growth: [[retrainIfNotWorse]] with the candidate
    * quantizer trained at [[scaledK]](stored count) instead of the stored
    * k. Same recall A/B gate, same leased promotion, same stale-gate
    * fence, same `retrain_ab` audit row.
    * @return (acted, recall_before_pct, recall_after_pct). */
  def retrainIvfIndexScaled(
      spark: SparkSession, indexDir: String,
      recallProbes: Int = 32, recallK: Int = 10,
      nprobe: Int = Similarity.IvfProbes,
      gateTauE4: Option[Long] = None,
      coScaleNprobe: Boolean = false): (Boolean, Long, Long) =
    retrainIfNotWorse(spark, indexDir, recallProbes, recallK, nprobe,
      scaleQuantizer = true, gateTauE4 = gateTauE4,
      coScaleNprobe = coScaleNprobe)

  /** The probe width a caller should use against an index whose quantizer
    * was adopted under `coScaleNprobe = true`: deterministic from the
    * before/after centroid counts (both on the index's `_history` ledger
    * and its `centroids/` artifact), so the accepted nprobe′ needs no new
    * return channel — recompute it from what the index already records. */
  def coScaledNprobeFor(nprobe: Int, kBefore: Long, kAfter: Long): Int =
    Similarity.coScaledNprobe(nprobe, kBefore.toInt, kAfter.toInt)

  /** @param gateTauE4 None = generic top-`recallK` recall A/B (the
    *   maintenance default — STRICT: growing k at a fixed nprobe shrinks
    *   probed coverage, so on weakly-clustered corpora a scaled candidate
    *   rightly fails this gate). Some(τ) = THRESHOLD-MATCH recall, the
    *   novelty gate's operational semantic: among probe queries whose
    *   EXACT best stored neighbor clears τ, the fraction whose probed
    *   top-1 clears τ too (probe cosines are true cosines, so false
    *   positives are impossible — only misses count). Near-dup pairs at a
    *   6.8 σ threshold share their nearest centroid at ANY quantizer
    *   size, so this is the gate under which a √n-scaled retrain is both
    *   safe and measurable; callers whose workload is generic top-k
    *   ranking must keep the strict gate. */
  private[graft] def retrainIfNotWorse(
      spark: SparkSession, indexDir: String,
      recallProbes: Int, recallK: Int, nprobe: Int,
      candCents0: Option[Array[Array[Double]]] = None,
      beforeAct: () => Unit = () => (),
      scaleQuantizer: Boolean = false,
      gateTauE4: Option[Long] = None,
      coScaleNprobe: Boolean = false): (Boolean, Long, Long) = {
    val idx = fromIvfIndex(spark, indexDir)
    val stored = idx.vectors.select($"vec_id", $"v")
    // Vector-set watermark at gate time: the A/B below runs lease-free
    // (pure reads), so the promotion inside [[retrainIvfIndexWith]]
    // re-checks this mark (count + id-content hash) under the lease and
    // aborts if a concurrent mutation landed in between — otherwise the
    // promoted centroids would reassign vectors the gate never evaluated
    // and the audited recall_after row would misstate the
    // actually-promoted index.
    val markAtGate = vectorSetMark(stored)
    val nVecsAtGate = markAtGate.n
    val queries = stored.orderBy($"vec_id").limit(recallProbes)
    // threshold mode measures top-1 verdicts, generic mode top-recallK
    val kEff = if (gateTauE4.isDefined) 1 else recallK
    val exact = Similarity.topKFrom(stored, queries, kEff)
      .select($"qid", $"nb", $"cos_e4").persist()
    val nExact = exact.count()
    def recallPct(probe: DataFrame): Long = gateTauE4 match {
      case None =>
        if (nExact == 0L) 100L
        else exact.join(probe.select($"qid", $"nb"), Seq("qid", "nb"),
          "left_semi").count() * 100L / nExact
      case Some(tau) =>
        val exist = exact.filter($"cos_e4" >= tau).select($"qid")
        val n = exist.count()
        if (n == 0L) 100L
        else exist.join(
          probe.filter($"cos_e4" >= tau).select($"qid"),
          Seq("qid"), "left_semi").count() * 100L / n
    }
    val recallBefore = recallPct(Similarity.probeAssigned(
      idx.vectors, queries, idx.centroidArray, nprobe, kEff))
    val cand = candCents0.getOrElse {
      if (scaleQuantizer) {
        val k = scaledK(nVecsAtGate)
        Similarity.trainCentroidsK(Similarity.trainSampleK(stored, k), k)
      } else Similarity.trainCentroids(Similarity.trainSample(stored))
    }
    // Co-scaled candidate probe width (round 15): growing k at a FIXED
    // nprobe shrinks probed coverage from nprobe/k to nprobe/k', which
    // is why the strict top-k gate rightly refuses a √n candidate.
    // nprobe' = ⌈nprobe·√(k'/k)⌉ splits the difference: per-query probed
    // rows go nprobe·n/k → nprobe·n/√(k·k') — a √(k'/k) reduction, NOT
    // the k'/k a fixed-nprobe adoption would claim — while coverage
    // shrinks only by √(k'/k) instead of k'/k, which the strict gate can
    // accept on clustered corpora. The gate stays the arbiter: the
    // candidate is MEASURED at nprobe' and still refused if recall drops.
    val nprobeCand =
      if (coScaleNprobe)
        Similarity.coScaledNprobe(nprobe, idx.centroidArray.length, cand.length)
      else nprobe
    val recallAfter = recallPct(Similarity.probeAssigned(
      Similarity.assignedOf(stored, cand), queries, cand, nprobeCand, kEff))
    exact.unpersist(false)
    val gatePassed = recallAfter >= recallBefore
    beforeAct() // test seam: the window between the A/B and the leased act
    var staleAbort = false
    val acted =
      if (!gatePassed) {
        System.err.println(
          s"[graft] maintainIvfIndex at $indexDir: retrain trigger fired but " +
            s"the candidate quantizer MEASURED lower recall ($recallAfter% < " +
            s"$recallBefore% on $recallProbes probes / top-$recallK) — " +
            "refusing to act; the recommendation stands and the index is " +
            "untouched")
        false
      } else
        try {
          retrainIvfIndexWith(spark, indexDir, -1, Some(cand),
            requireVectorSet = Some(markAtGate))
          true
        } catch {
          case e: java.util.ConcurrentModificationException =>
            staleAbort = true
            System.err.println(s"[graft] ${e.getMessage}")
            false
        }
    // nprobe fields only on co-scaled runs: the default ledger rows (and
    // the q_sim_ivf_retrain_ab oracle face that hashes them) stay
    // byte-identical to the round-14 shape.
    val nprobeDetail: Seq[(String, Any)] =
      if (coScaleNprobe)
        Seq("nprobe_before" -> nprobe.toLong, "nprobe_after" -> nprobeCand.toLong)
      else Seq.empty
    CorpusDedup.recordEvent(spark, indexDir, "retrain_ab",
      (Seq[(String, Any)](
        "recall_before_pct" -> recallBefore,
        "recall_after_pct" -> recallAfter,
        "acted" -> (if (acted) 1L else 0L),
        "stale_abort" -> (if (staleAbort) 1L else 0L)) ++ nprobeDetail): _*)
    (acted, recallBefore, recallAfter)
  }

  /** Apply one micro-batch to the stored IVF index AT MOST ONCE per
    * batch id — same watermark contract as
    * [[CorpusDedup.appendBatchIdempotent]]: skip already-applied ids on
    * foreachBatch redelivery; a mid-append crash trips the duplicate-id
    * refusal loudly. Returns whether the batch was applied. */
  private[graft] def appendBatchIdempotent(
      batch: DataFrame, idCol: String, vecCol: String,
      indexDir: String, batchId: Long,
      marker: String = "_ingest_commit"): Boolean = {
    val spark = batch.sparkSession
    if (batchId <= CorpusDedup.lastIngestedBatch(spark, indexDir, marker)) false
    else {
      if (!batch.isEmpty) { appendToIvfIndex(batch, idCol, vecCol, indexDir); () }
      CorpusDedup.recordIngestedBatch(spark, indexDir, batchId, marker)
      true
    }
  }

  /** CONTINUOUS ANN ingestion — the streaming face of
    * [[appendToIvfIndex]], the vector twin of
    * [[CorpusDedup.ingestStream]]: each micro-batch assigns against the
    * STORED quantizer (O(batch), no retrain) and appends to the
    * cid-bucketed lists, idempotent per batch id via the index's
    * `_ingest_commit` watermark. Single writer per index dir; compact on
    * a maintenance schedule ([[compactIvfIndex]]); sessions that read
    * the index before the stream grew it refresh via
    * `spark.catalog.refreshTable` (see [[CorpusDedup.refreshIndex]]). */
  def ingestStream(
      vecs: DataFrame, idCol: String, vecCol: String, indexDir: String,
      checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val marker = CorpusDedup.commitMarker("ingest", checkpointDir)
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: java.lang.Long) =>
          appendBatchIdempotent(b, idCol, vecCol, indexDir, id, marker)
          ()
      }
      .start()
  }

  /** CERTIFICATE OF ERASURE, vector twin
    * ([[CorpusDedup.erasureCertificate]]): the residual row count for the
    * given vec_ids in the RAW `vectors/` files (the quantizer holds no
    * per-vector state, so the lists are the only place residue could
    * live), `erased_ok` TRUE only at zero. */
  def erasureCertificate(
      spark: SparkSession, indexDir: String, removeIds: DataFrame): DataFrame = {
    val idCol = removeIds.columns.head
    CorpusOps.requireIntegralId(removeIds, idCol)
    val ids = removeIds.select(col(idCol).cast("long").as("vec_id")).distinct()
    val n = CorpusDedup.rawArtifact(spark, indexDir, "vectors")
      .join(broadcast(ids), Seq("vec_id"), "left_semi").count()
    import spark.implicits.newProductEncoder
    spark.createDataset(Seq(("vectors", n, n == 0L)))
      .toDF("artifact", "residual_rows", "erased_ok")
  }

  /** Erasure twin of [[appendBatchIdempotent]] on the IVF index's own
    * `_forget_commit` watermark — see
    * [[CorpusDedup.forgetBatchIdempotent]] for the recovery contract
    * (redelivery repairs a mid-erasure crash; anti-joins are idempotent). */
  private[graft] def forgetBatchIdempotent(
      ids: DataFrame, indexDir: String, batchId: Long,
      marker: String = "_forget_commit"): Boolean = {
    val spark = ids.sparkSession
    if (batchId <= CorpusDedup.lastIngestedBatch(spark, indexDir, marker)) false
    else {
      if (!ids.isEmpty) { removeFromIvfIndex(spark, indexDir, ids); () }
      CorpusDedup.recordIngestedBatch(spark, indexDir, batchId, marker)
      true
    }
  }

  /** CONTINUOUS ANN ERASURE — the streaming face of
    * [[removeFromIvfIndex]], vector twin of [[CorpusDedup.forgetStream]]:
    * a stream of vec-id erasure requests rewrites the cid-bucketed lists
    * per micro-batch (quantizer untouched), idempotent per batch id via
    * the index's `_forget_commit` watermark and per id by anti-join
    * semantics. One mutator per index dir at a time. */
  def forgetStream(
      ids: DataFrame, indexDir: String, checkpointDir: String,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val marker = CorpusDedup.commitMarker("forget", checkpointDir)
    ids.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: java.lang.Long) =>
          forgetBatchIdempotent(b, indexDir, id, marker)
          ()
      }
      .start()
  }

  /** IVF HEALTH DASHBOARD over a STORED index — the measurement behind
    * the documented "retrain only on measured drift" rebuild trigger: a
    * grow-by-assignment index degrades in exactly two observable ways,
    * and this frame reports both from the stored `vectors/` lists (one
    * bucketed pass — never the raw corpus):
    *
    *  - '''list skew''': per-centroid cardinalities (`n_lists`,
    *    `max_list`, `min_list`, `skew_e4` = max/avg in e4 fixed point).
    *    A mega-list means the quantizer no longer partitions the data —
    *    probes against it re-scan a corpus fraction, the exact decay IVF
    *    exists to prevent.
    *  - '''quantization error''': per-vector squared distance to the
    *    ASSIGNED centroid (`mean_qerr_e6` / `max_qerr_e6`, integer-
    *    floored per row so the sums are summation-order-independent) and
    *    the within-vs-global SSE pair (`within_sse_e6`,
    *    `global_sse_e6`): a healthy quantizer beats the trivial 1-mean
    *    quantizer (within < global); drift toward parity is the retrain
    *    trigger.
    *  - '''assignment integrity''' (`n_misassigned`): stored cid vs a
    *    re-assignment of the stored vectors against the stored quantizer
    *    — nonzero means the lists no longer match the quantizer (a
    *    corrupted append), which silently costs recall.
    *
    * Plan shape: centroid join is broadcast (quantizer is bounded); the
    * global mean arrives as a Dim-row aggregate collected to a literal
    * (bounded driver traffic); everything else is one hash aggregate
    * over the lists. Output: (metric, value) rows, ordered. */
  def ivfStats(spark: SparkSession, indexDir: String): DataFrame = {
    val idx = fromIvfIndex(spark, indexDir)
    val cents = idx.centroidArray
    val stored = idx.vectors.select($"cid".as("stored_cid"), $"vec_id", $"v")
    def sqdistC(a: Column, b: Column): Column =
      org.apache.spark.sql.GraftBridge.column(
        graft.plans.SquaredDistance(
          org.apache.spark.sql.GraftBridge.expression(a),
          org.apache.spark.sql.GraftBridge.expression(b)))
    // Dim-row per-position sums -> the global mean as a literal array
    val dimRows = stored.select(posexplode($"v"))
      .groupBy($"pos").agg(sum($"col").as("s"), count(lit(1)).as("n"))
      .orderBy($"pos").collect()
    val nVec = if (dimRows.isEmpty) 0L else dimRows.head.getLong(2)
    if (nVec == 0L) {
      import spark.implicits.newProductEncoder
      return spark.createDataset(Seq(("n_vectors", 0L)))
        .toDF("metric", "value")
    }
    val meanLit = array(dimRows.map(r =>
      lit(r.getDouble(1) / r.getLong(2))).toIndexedSeq: _*)
    val perRow0 = stored
      .join(broadcast(idx.centroids.select($"cid".as("stored_cid"), $"c")),
        Seq("stored_cid"))
    // reassignment dispatch on quantizer size (see
    // [[Similarity.LiteralCentroidMax]]): small k inlines the quantizer
    // as the historical literal expression; a √n-scaled quantizer joins
    // the (vec_id, cid) reassignment frame instead
    val perRow = (
      if (cents.length <= Similarity.LiteralCentroidMax)
        perRow0.withColumn("recid",
          element_at(Similarity.coarseSortedCol(cents), 1).getField("cid"))
      else
        perRow0.join(
          Similarity.nearestCidFrame(stored.select($"vec_id", $"v"), cents)
            .withColumnRenamed("cid", "recid"),
          Seq("vec_id")))
      .withColumn("qerr_e6", floor(sqdistC($"v", $"c") * 1e6).cast("long"))
      .withColumn("gerr_e6", floor(sqdistC($"v", meanLit) * 1e6).cast("long"))
    val a = perRow.agg(
      count(lit(1)).as("n"),
      sum(when($"recid" =!= $"stored_cid", 1L).otherwise(0L)).as("n_mis"),
      sum($"qerr_e6").as("within"),
      max($"qerr_e6").as("maxq"),
      sum($"gerr_e6").as("global")).collect()(0)
    val l = stored.groupBy($"stored_cid").agg(count(lit(1)).as("ln"))
      .agg(count(lit(1)).as("n_lists"),
        max($"ln").as("maxl"), min($"ln").as("minl")).collect()(0)
    val (nLists, maxL, minL) = (l.getLong(0), l.getLong(1), l.getLong(2))
    val rows = Seq(
      "n_vectors" -> a.getLong(0),
      "n_lists" -> nLists,
      "max_list" -> maxL,
      "min_list" -> minL,
      "skew_e4" -> maxL * nLists * 10000L / a.getLong(0),
      "n_misassigned" -> a.getLong(1),
      "mean_qerr_e6" -> a.getLong(2) / a.getLong(0),
      "max_qerr_e6" -> a.getLong(3),
      "within_sse_e6" -> a.getLong(2),
      "global_sse_e6" -> a.getLong(4))
    import spark.implicits.newProductEncoder
    spark.createDataset(rows).toDF("metric", "value")
  }

  @volatile private var ivfSchemaCache
      : Map[String, org.apache.spark.sql.types.StructType] = null

  /** IVF canonical artifact schemas, derived plan-only from the same
    * expressions the build writes (the vector twin of
    * [[CorpusDedup.dedupCanonicalSchemas]]) — the legacy-index fallback
    * when neither sidecar nor files can supply a schema. */
  private[graft] def ivfCanonicalSchemas(
      spark: SparkSession): Map[String, org.apache.spark.sql.types.StructType] = {
    val cached = ivfSchemaCache
    if (cached != null) cached
    else {
      import org.apache.spark.sql.types._
      val empty = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("vec_id", LongType),
          StructField("embedding", ArrayType(DoubleType)))))
      val vectors = Similarity
        .assignedOf(canon(empty, "vec_id", "embedding"),
          Array(new Array[Double](Similarity.Dim)))
        .select(col("cid"), col("vec_id"), col("v"), col("nrm"))
      val centroids = spark.range(0).select(
        col("id").cast("int").as("cid"),
        array().cast("array<double>").as("c"))
      val m = Map("centroids" -> centroids.schema,
        "vectors" -> vectors.schema)
      ivfSchemaCache = m
      m
    }
  }

  /** Open a stored IVF index: same-session reads come back through the
    * catalog with the `cid` bucket spec; cross-session reads fall back to
    * plain parquet scans of the same files. */
  def fromIvfIndex(spark: SparkSession, indexDir: String): IvfIndex =
    IvfIndex(
      centroids = CorpusDedup.readArtifact(spark, indexDir, "centroids"),
      vectors = CorpusDedup.readArtifact(spark, indexDir, "vectors"))

  /** The IVF twin of [[CorpusDedup.refreshIndex]]: invalidate this
    * session's cached table relations for the index artifacts after an
    * EXTERNAL mutation (a gate/ingest stream's foreachBatch runs in a
    * cloned session, so the reader session's file listings go stale —
    * Spark's REFRESH TABLE contract). */
  def refreshIvfIndex(spark: SparkSession, indexDir: String): Unit =
    Seq("centroids", "vectors").foreach { a =>
      val t = CorpusDedup.tableNameFor(s"$indexDir/$a")
      if (spark.catalog.tableExists(t)) spark.catalog.refreshTable(t)
    }

  /** Approximate top-k against a STORED index: queries explode their
    * nprobe nearest centroid ids (from the persisted quantizer) and
    * equi-join the bucketed per-centroid lists. */
  def probeStored(
      index: IvfIndex, queries: DataFrame, idCol: String, vecCol: String,
      k: Int = Similarity.TopK, nprobe: Int = Similarity.IvfProbes): DataFrame =
    Similarity.probeAssigned(index.vectors, canon(queries, idCol, vecCol),
      index.centroidArray, nprobe, k)

  /** ANN NOVELTY GATE, batch form — the vector twin of
    * [[CorpusDedup.scoreBatchAgainstIndex]]: verdict each incoming vector
    * against the stored IVF index WITHOUT mutating it. A vector is a
    * DUPLICATE when its probed best stored neighbor reaches `tauE4`
    * cosine (any id — the corpus is canonical), or a SMALLER-id batch
    * mate does (min-id survivor: a twice-submitted embedding admits one
    * copy). The stored side is the nprobe-bounded probe — ANN by
    * contract: a neighbor in an unprobed cell can be missed, which is the
    * recall/throughput dial the IVF family documents (the oracle-gated
    * `q_sim_gate` bounds the decision-agreement rate against exact).
    * Output one row per batch vector:
    * `(vec_id, n_matches, first_match, best_cos_e4, is_novel)` — nulls
    * on novel rows, exactly the dedup gate's contract.
    *
    * Scale: the stored probe is cid equi-joins O(batch × probed lists);
    * the batch self-compare is bounded by the micro-batch size (admission
    * control bounds it in the streaming face).
    *
    * BEHAVIOR NOTE (round 12+): with the default
    * `refuseIngested = true`, a batch containing an ALREADY-INDEXED
    * vec_id throws — the streaming gates' crash-redelivery contract (a
    * present id means a crashed predecessor appended this batch without
    * recording its marker, and silently re-scoring against the mutated
    * index would flip verdicts). A caller legitimately RE-SCORING
    * vectors that are known to be in the index (an audit or recall
    * probe, not a gate) passes `refuseIngested = false` to keep the
    * pre-round-12 read-only semantics — note the smaller-id mate rule
    * then sees the stored copies as ordinary stored matches. */
  def scoreBatchAgainstIvf(
      newVecs: DataFrame, idCol: String, vecCol: String, indexDir: String,
      tauE4: Long = Similarity.NearDupE4,
      nprobe: Int = Similarity.IvfProbes,
      refuseIngested: Boolean = true): DataFrame = {
    val spark = newVecs.sparkSession
    val idx = fromIvfIndex(spark, indexDir)
    // no separate materializing count (round 17): the partial-ingestion
    // refusal below (or, with refuseIngested=false, the probe itself) is
    // the first reader and fills the cache — one fewer job per micro-batch
    val batch = canon(newVecs, idCol, vecCol).persist()
    // PARTIAL-INGESTION REFUSAL (the dedup gate's crash contract, priced
    // O(batch)): a batch vec_id already present in the stored lists means
    // a crashed predecessor APPENDED this batch but never recorded its
    // commit marker. Re-scoring against the mutated index would silently
    // flip verdicts — the crashed append's copies of the batch's OTHER
    // vectors count as stored matches with no smaller-id mate rule (the
    // probe's own self-exclusion cannot see cross-mate copies) — so
    // refuse loudly and route to heal/inspect, exactly like
    // [[CorpusDedup.gateScoreAndAppend]]'s signature-keyed refusal. The
    // membership check probes ONLY each batch vector's own
    // nearest-centroid list (a stored copy is assigned by the same
    // deterministic quantizer), a (cid, vec_id) equi-join against the
    // bucketed lists — never a full index scan.
    if (refuseIngested) {
      val nearest = Similarity.nearestCidFrame(
        batch.select($"vec_id", $"v"), idx.centroidArray)
      val ingested = nearest
        .join(idx.vectors.select($"cid", $"vec_id"), Seq("cid", "vec_id"),
          "left_semi")
        .limit(1).count()
      require(ingested == 0L,
        s"ANN gate: a batch vec_id is already in the stored index at " +
          s"$indexDir — this batch was partially ingested by a crashed " +
          "predecessor; heal/inspect before redelivering")
    }
    // stored matches: top-1 probe per batch vector, thresholded
    val stored = Similarity.probeAssigned(
      idx.vectors, batch, idx.centroidArray, nprobe, 1)
      .filter($"cos_e4" >= tauE4)
      .select($"qid", $"nb".as("o"), $"cos_e4")
    // batch mates: pairwise over the bounded batch, smaller ids only
    val b1 = batch.select($"vec_id".as("qid"), $"v".as("qv"),
      Similarity.norm($"v").as("qn"))
    val b2 = batch.select($"vec_id".as("o"), $"v".as("nv"),
      Similarity.norm($"v").as("nn"))
    val mates = b1.join(b2, $"o" < $"qid")
      .withColumn("cos_e4",
        floor(Similarity.dot($"qv", $"nv") / ($"qn" * $"nn") * 10000L)
          .cast("long"))
      .filter($"cos_e4" >= tauE4)
      .select($"qid", $"o", $"cos_e4")
    val verdicts = batch.select($"vec_id")
      .join(stored.unionByName(mates)
        .groupBy($"qid").agg(
          count(lit(1)).as("n_matches"),
          min($"o").as("first_match"),
          max($"cos_e4").as("best_cos_e4")),
        $"vec_id" === $"qid", "left")
      .select($"vec_id",
        coalesce($"n_matches", lit(0L)).as("n_matches"),
        $"first_match", $"best_cos_e4",
        $"n_matches".isNull.as("is_novel"))
    // Lineage cut for the same reason as the dedup twin (see
    // [[CorpusDedup.scoreBatchAgainstIndex]]): the probe plan embeds the
    // per-list ADC/dot expression trees; a live persisted frame slows
    // every subsequent execution in the session and leaks one cache
    // entry per call. Batch-sized rows; ContextCleaner frees the blocks.
    val out = verdicts.localCheckpoint(true)
    batch.unpersist(false)
    out
  }

  /** CONTINUOUS ANN NOVELTY GATE — the vector twin of
    * [[CorpusDedup.gateStream]]: each micro-batch of embeddings is
    * verdicted against the stored IVF index ([[scoreBatchAgainstIvf]]),
    * ONLY the novel vectors are appended (assignment against the stored
    * quantizer — so the gate LEARNS: a later batch re-submitting an
    * earlier batch's novel embedding is flagged against it), and every
    * verdict row (batch-id-stamped) appends to `verdictDir`. Idempotent
    * per batch id via the index's `_ingest_commit` watermark; a crash
    * between the index append and the commit record trips the
    * duplicate-id refusal loudly on redelivery. Single writer per index
    * dir. */
  def gateStream(
      vecs: DataFrame, idCol: String, vecCol: String, indexDir: String,
      verdictDir: String, checkpointDir: String,
      tauE4: Long = Similarity.NearDupE4,
      nprobe: Int = Similarity.IvfProbes,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val marker = CorpusDedup.commitMarker("gate", checkpointDir)
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: java.lang.Long) =>
          val spark = b.sparkSession
          if (id > CorpusDedup.lastIngestedBatch(spark, indexDir, marker)) {
            if (!b.isEmpty) {
              val verdicts =
                scoreBatchAgainstIvf(b, idCol, vecCol, indexDir, tauE4, nprobe)
              val novel = b.join(
                verdicts.filter($"is_novel")
                  .select($"vec_id".as(idCol + "__novel")),
                b(idCol).cast("long") === col(idCol + "__novel"), "left_semi")
              if (!novel.isEmpty) { appendToIvfIndex(novel, idCol, vecCol, indexDir); () }
              // Dynamic partition overwrite: redelivery replaces its own
              // batch_id partition, never duplicates audit rows (see the
              // dedup gateStream note).
              verdicts.withColumn("batch_id", lit(id.longValue()))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("batch_id").parquet(verdictDir)
            }
            CorpusDedup.recordIngestedBatch(spark, indexDir, id, marker)
          }
          ()
      }
      .start()
  }

  /** SemDeDup verdict over a caller-clustered embedding frame: for every
    * vector, whether it survives semantic dedup (cosine ≥ thresholdE4
    * against a LOWER-id member of the same cluster ⇒ dropped). Pairs are
    * compared only within a cluster — an equi-join on `clusterCol`, never
    * all-pairs; the caller controls cluster granularity (the SemDeDup
    * scale knob: the paper grows k with the corpus so cluster populations
    * stay bounded — pass an IVF/k-means assignment, an LSH bucket, or any
    * partition of the embedding space). Delegates to the same
    * [[graft.queries.Similarity.semanticVerdictFrom]] core the
    * oracle-gated `q_dedup_semantic` registry query runs, so this surface
    * is transitively hash-checked. Output: (vec_id, cid, is_kept). */
  def semanticVerdict(
      vecs: DataFrame, idCol: String, vecCol: String, clusterCol: String,
      thresholdE4: Long = Similarity.NearDupE4): DataFrame = {
    CorpusOps.requireIntegralId(vecs, idCol)
    CorpusOps.requireIntegralId(vecs, clusterCol)
    Similarity.semanticVerdictFrom(
      vecs.select(col(idCol).cast("long").as("vec_id"),
        transform(col(vecCol), x => x.cast("double")).as("v"),
        col(clusterCol).cast("long").as("cid")),
      thresholdE4)
  }
}

/** Frame-parametric table-maintenance audits (the lakehouse-ops family the
  * registry's `q_dq_snapshot_diff` / `q_dq_forget` bind to the fixtures).
  * Same conventions as the siblings: integral ids enforced loudly, outputs
  * are order-independent integer rollups comparable across replicas. */
object TableMaintenance {

  /** Snapshot delta rollup over two (id, content-fingerprint) projections:
    * classifies every id as unchanged / changed / added / removed and
    * returns per-status counts plus an order-independent XOR of a portable
    * id hash — two sites compare corpus deltas by shipping ≤4 rows.
    * Plan: one FULL OUTER equi-join on the id both snapshots are keyed
    * by + one ≤4-group aggregate; nothing broadcast, nothing collected. */
  def snapshotDiff(
      curr: DataFrame, prev: DataFrame,
      idCol: String, fpCol: String): DataFrame = {
    CorpusOps.requireIntegralId(curr, idCol)
    CorpusOps.requireIntegralId(prev, idCol)
    val c = curr.select(col(idCol).cast("long").as("id"),
                        col(fpCol).cast("long").as("fp_c"))
    val p = prev.select(col(idCol).cast("long").as("id"),
                        col(fpCol).cast("long").as("fp_p"))
    c.join(p, Seq("id"), "full_outer")
      .select(TextHash.h60($"id".cast("string")).as("idh"),
        when($"fp_c".isNull, "removed")
          .when($"fp_p".isNull, "added")
          .when($"fp_c" === $"fp_p", "unchanged")
          .otherwise("changed").as("status"))
      .groupBy($"status")
      .agg(count(lit(1)).as("n_docs"),
           expr("bit_xor(idh)").as("ids_xor"))
  }

  /** Deletion-propagation manifest of one table, doom decided by a caller
    * predicate over the table's columns (the registry's hash-derived list
    * uses this form): (tbl, n_total, n_deleted, n_surviving,
    * surviving_xor) — the audit row proving the purge and what remains.
    * One pass, map-side partial aggregation, no join. */
  def deletionManifest(
      table: String, df: DataFrame, idCol: String, doomed: Column): DataFrame = {
    CorpusOps.requireIntegralId(df, idCol)
    manifestOf(table, df.select(
      doomed.as("doomed"),
      TextHash.h60(concat_ws("|", lit(table), col(idCol))).as("rh")))
  }

  /** Deletion-propagation manifest with the production contract: a
    * deletion-requests id frame. Membership is an equi-join on the id the
    * table is keyed by (LEFT join + null test — the request list is
    * corpus-proportional, so it is NOT broadcast by hint; AQE may choose
    * to while it fits). */
  def deletionManifest(
      table: String, df: DataFrame, idCol: String,
      deleteIds: DataFrame, deleteIdCol: String): DataFrame = {
    CorpusOps.requireIntegralId(df, idCol)
    CorpusOps.requireIntegralId(deleteIds, deleteIdCol)
    val ids = deleteIds.select(col(deleteIdCol).cast("long").as("id"))
      .distinct().withColumn("doom_mark", lit(true))
    val flagged = df.select(col(idCol).cast("long").as("id"),
        TextHash.h60(concat_ws("|", lit(table), col(idCol))).as("rh"))
      .join(ids, Seq("id"), "left")
      .select($"doom_mark".isNotNull.as("doomed"), $"rh")
    manifestOf(table, flagged)
  }

  private def manifestOf(table: String, flagged: DataFrame): DataFrame =
    flagged.agg(
        count(lit(1)).as("n_total"),
        sum(when($"doomed", 1L).otherwise(0L)).as("n_deleted"),
        sum(when($"doomed", 0L).otherwise(1L)).as("n_surviving"),
        expr("bit_xor(CASE WHEN doomed THEN 0 ELSE rh END)")
          .as("surviving_xor"))
      .select(lit(table).as("tbl"), $"n_total", $"n_deleted",
              $"n_surviving", $"surviving_xor")
}

/** THE COMPOSED CRAWL MOUTH — one streaming entry point that plays every
  * admission gate per micro-batch, across BOTH index families:
  *
  *  1. quality + language (stateless text verdicts — the same rules as
  *     the oracle-gated batch face `q_pipeline_admit`);
  *  2. the dedup gate: quality+language passers verdicted against the
  *     stored dedup index + smaller-id batch mates, novel subset
  *     appended in the same fused pass
  *     ([[CorpusDedup.gateScoreAndAppend]]);
  *  3. the ANN novelty gate: dedup-novel passers with an embedding
  *     verdicted against the stored IVF index
  *     ([[VectorSearch.scoreBatchAgainstIvf]]), novel subset appended —
  *     docs without an embedding skip the stage and admit on the text
  *     gates alone;
  *  4. one admission-manifest row per doc (every stage verdict visible,
  *     later stages NULL when an earlier stage rejected), partitioned
  *     by batch_id.
  *
  * EXACTLY-ONCE ACROSS TWO INDEXES: each index mutation is guarded by
  * its OWN commit marker (`admit-dedup` / `admit-ivf`, keyed by this
  * stream's checkpoint), and each stage's verdicts are PERSISTED to
  * `verdictDir/{dedup,sem}` BEFORE its marker records. A crash between
  * the two stages redelivers the batch: stage 1 is skipped (marker) and
  * its verdicts are READ BACK from disk — never recomputed, which would
  * re-score against the already-mutated index and flip every verdict —
  * while stage 2 runs for the first time. The manifest write is
  * idempotent (dynamic partition overwrite on batch_id) and always
  * derives from the persisted stage verdicts, so any replay converges
  * to the same rows. A crash INSIDE a stage's append inherits that
  * index family's own crash-order contract (signatures-first /
  * vectors-first, loud refusal on partial ingestion).
  *
  * Scale shape per batch: stage 1 is O(batch) raw-text work against
  * band-bucket equi-joins; stage 2 is an nprobe-bounded probe; nothing
  * rescans or reshuffles either corpus. */
object CrawlMouth {
  import CorpusDedup.{commitMarker, lastIngestedBatch, recordIngestedBatch}
  import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}

  private val DedupVerdictSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("n_matches", LongType),
    StructField("first_match", LongType), StructField("best_est_e4", LongType),
    StructField("is_novel", BooleanType)))
  private val SemVerdictSchema = StructType(Seq(
    StructField("vec_id", LongType), StructField("n_matches", LongType),
    StructField("first_match", LongType), StructField("best_cos_e4", LongType),
    StructField("is_novel", BooleanType)))

  /** Replay read of a stage's persisted verdicts. Explicit schema (with
    * the batch_id partition column appended), because the committed
    * stage may legitimately have written ZERO rows (an all-rejected or
    * embedding-less batch) — inference over an empty/absent dir would
    * throw on exactly the replay that must succeed. */
  private def readBack(
      spark: SparkSession, path: String, batchId: Long,
      schema: StructType): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p))
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema.add(StructField("batch_id", LongType)))
      .parquet(path)
      .filter(col("batch_id") === batchId).drop("batch_id")
  }

  /** Stage-0 projection: per-doc text verdicts + the carried embedding.
    * Mirrors `q_pipeline_admit`'s quality/language stage exactly (the
    * oracle-gated definition of the rules). */
  private def textFlags(
      batch: DataFrame, idCol: String, textCol: String,
      vecCol: String, extractMarkup: Boolean): DataFrame = {
    // OPTIONAL stage -1: a crawl feed delivers MARKUP, not clean text —
    // run the boilerplate-removal chain (the oracle-gated
    // `q_txt_extract` definition) before any text gate, still one
    // per-row projection. Off by default: callers with pre-extracted
    // text skip the regex chain entirely.
    val textC =
      if (extractMarkup)
        graft.queries.TextAnalysis.extractedOf(col(textCol))
      else col(textCol)
    batch.select(col(idCol).cast("long").as("doc_id"),
        textC.as("text"), col(vecCol).as("v0"))
      .select($"doc_id", $"text", $"v0",
        size(TextHash.tokens($"text")).cast("long").as("n_toks"),
        floor((length($"text") -
            length(regexp_replace($"text", "[.,!?;:]", "")))
          .cast("long") * 10000L / length($"text")).cast("long")
          .as("punct_e4"),
        graft.queries.TextAnalysis.langPred(
          TextHash.tokens($"text")).as("lang_pred"))
      .withColumn("quality_ok", $"n_toks" >= 20L && $"punct_e4" < 500L)
      .withColumn("lang_ok", $"lang_pred" =!= "und")
  }

  /** One admission micro-batch — the foreachBatch body, exposed for the
    * crash-redelivery spec. `failAfterStage` (test-only) aborts after
    * the numbered stage committed, simulating a crash between the two
    * index commits (1) or between the ANN commit and the manifest (2). */
  private[graft] def admitBatch(
      batch: DataFrame, idCol: String, textCol: String, vecCol: String,
      dedupIndexDir: String, ivfIndexDir: String,
      verdictDir: String, checkpointDir: String, batchId: Long,
      tauE4: Long, semTauE4: Long, nprobe: Int,
      extractMarkup: Boolean = false,
      failAfterStage: Int = Int.MaxValue,
      onStageWall: (Long, String, Double) => Unit = (_, _, _) => ()): Unit = {
    val spark = batch.sparkSession
    // Per-stage wall attribution (round 14): the mouth lane's per-batch
    // p50 grew 12.8 → 57.1 s over the 10×→100× decade with nothing in
    // the artifact saying WHICH stage pays — the passer counts made the
    // workload auditable; these timings do the same for cost. foreachBatch
    // bodies run on the driver, so the callback needs no synchronization
    // beyond what the caller's collector provides.
    def timed[T](stage: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      onStageWall(batchId, stage, (System.nanoTime() - t0) / 1e9)
      r
    }
    val mDedup = commitMarker("admit-dedup", checkpointDir)
    val mIvf = commitMarker("admit-ivf", checkpointDir)
    val flagged = timed("extract") {
      val f = textFlags(batch, idCol, textCol, vecCol, extractMarkup).persist()
      f.count()
      f
    }
    try {
      // stage 1: dedup gate over quality+language passers
      val dedupV = timed("dedup_gate") {
        if (batchId > lastIngestedBatch(spark, dedupIndexDir, mDedup)) {
          val passers = flagged.filter($"quality_ok" && $"lang_ok")
            .select($"doc_id", $"text")
          val v = CorpusDedup.gateScoreAndAppend(
            passers, "doc_id", "text", dedupIndexDir, tauE4,
            // substage attribution rides the same collector, dot-scoped
            // so the lane can emit a per-substage table (round-16:
            // attribute the flat per-batch constant before cutting it)
            onSubstage = (s, sec) =>
              onStageWall(batchId, s"dedup_gate.$s", sec))
          v.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(s"$verdictDir/dedup")
          recordIngestedBatch(spark, dedupIndexDir, batchId, mDedup)
          v
        } else readBack(spark, s"$verdictDir/dedup", batchId,
          DedupVerdictSchema)
      }
      require(failAfterStage > 1,
        s"admitBatch: injected crash after stage 1 (batch $batchId)")
      // stage 2: ANN novelty gate over dedup-novel passers with embeddings
      val semV = timed("ann_gate") {
        if (batchId > lastIngestedBatch(spark, ivfIndexDir, mIvf)) {
          val qs = flagged
            .join(dedupV.filter($"is_novel").select($"doc_id"), Seq("doc_id"))
            .filter($"v0".isNotNull)
            .select($"doc_id", $"v0")
          val v = VectorSearch.scoreBatchAgainstIvf(
            qs, "doc_id", "v0", ivfIndexDir, semTauE4, nprobe)
          val novel = qs.join(
            v.filter($"is_novel").select($"vec_id".as("nid")),
            qs("doc_id") === col("nid"), "left_semi")
          if (!novel.isEmpty) {
            VectorSearch.appendToIvfIndex(novel, "doc_id", "v0", ivfIndexDir)
            ()
          }
          v.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id").parquet(s"$verdictDir/sem")
          recordIngestedBatch(spark, ivfIndexDir, batchId, mIvf)
          v
        } else readBack(spark, s"$verdictDir/sem", batchId,
          SemVerdictSchema)
      }
      require(failAfterStage > 2,
        s"admitBatch: injected crash after stage 2 (batch $batchId)")
      // stage 3: the manifest — idempotent rewrite from persisted verdicts
      timed("manifest") { flagged
        .join(dedupV.select($"doc_id", (!$"is_novel").as("is_dup"),
          $"best_est_e4"), Seq("doc_id"), "left")
        .join(semV.select($"vec_id".as("doc_id"),
          $"best_cos_e4".as("sem_best_e4"), $"is_novel".as("sem_novel")),
          Seq("doc_id"), "left")
        .withColumn("has_emb", $"v0".isNotNull)
        .select($"doc_id", $"n_toks", $"punct_e4", $"quality_ok",
          $"lang_pred", $"lang_ok", $"is_dup", $"best_est_e4", $"has_emb",
          $"sem_best_e4", $"sem_novel",
          coalesce($"quality_ok" && $"lang_ok" && !$"is_dup" &&
            (!$"has_emb" || $"sem_novel"), lit(false)).as("admitted"))
        .withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(s"$verdictDir/manifest")
      }
      // test-only injection point for the THIRD progress domain: the
      // foreachBatch body completed (manifest written, both markers
      // recorded) but the STREAM's own offset commit never happens — the
      // source redelivers the whole batch, and every stage must converge
      // through its marker + read-back path.
      require(failAfterStage > 3,
        s"admitBatch: injected crash after stage 3 (batch $batchId)")
    } finally flagged.unpersist(false)
  }

  /** Start the composed admission stream. `docs` must carry `idCol`
    * (integral), `textCol`, and `vecCol` (`array` of numeric, nullable —
    * NULL skips the semantic stage for that doc). */
  def admissionStream(
      docs: DataFrame, idCol: String, textCol: String, vecCol: String,
      dedupIndexDir: String, ivfIndexDir: String,
      verdictDir: String, checkpointDir: String,
      tauE4: Long = Dedup.ClusterEdgeE4,
      semTauE4: Long = Similarity.NearDupE4,
      nprobe: Int = Similarity.IvfProbes,
      extractMarkup: Boolean = false,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      failAfterStage: Long => Int = _ => Int.MaxValue,
      onStageWall: (Long, String, Double) => Unit = (_, _, _) => ())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: java.lang.Long) =>
          if (!b.isEmpty) {
            admitBatch(b, idCol, textCol, vecCol, dedupIndexDir,
              ivfIndexDir, verdictDir, checkpointDir, id.longValue(),
              tauE4, semTauE4, nprobe, extractMarkup,
              failAfterStage = failAfterStage(id.longValue()),
              onStageWall = onStageWall)
          } else {
            val spark = b.sparkSession
            val mDedup = commitMarker("admit-dedup", checkpointDir)
            val mIvf = commitMarker("admit-ivf", checkpointDir)
            if (id > lastIngestedBatch(spark, dedupIndexDir, mDedup))
              recordIngestedBatch(spark, dedupIndexDir, id, mDedup)
            if (id > lastIngestedBatch(spark, ivfIndexDir, mIvf))
              recordIngestedBatch(spark, ivfIndexDir, id, mIvf)
          }
          ()
      }
      .start()
}
