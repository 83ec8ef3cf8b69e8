package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextHash
import graft.syntax._

/** Deduplication operator suite over `documents` — exact, n-gram Jaccard,
  * MinHash+LSH, SimHash. All signatures/buckets are built from the
  * engine-portable hashes in [[TextHash]], so every query (including the
  * LSH candidate generation) hash-matches its DuckDB oracle exactly.
  *
  * Scale design (the 100 TB story):
  *  - exact dedup is a hash-aggregate on a 128-bit fingerprint — partial
  *    aggregation collapses copies map-side; shuffle carries one row per
  *    distinct document.
  *  - near-dup candidate generation NEVER does an O(n²) cross join: pairs
  *    come from equi-joins on shingle / band-bucket keys, which shuffle on
  *    the key and scale with the number of *colliding* pairs. A pathological
  *    hot shingle (stop-phrase) would skew that join; production variants
  *    cap shingle document-frequency before the join (same plan shape).
  *  - MinHash signatures are per-row array math (codegen'd, shuffle-free);
  *    LSH banding trades recall for candidate count with k=8, b=4, r=2. */
object Dedup {

  /** Shingle width of every lexical index here — referenced by sibling
    * oracles ([[Similarity]]'s hybrid fusion) so a tune cannot drift them. */
  private[queries] val Shingle = 3
  private val JaccThresholdE4 = 2000L

  /** Max documents a shingle may appear in before it is dropped from the
    * Jaccard join (the stop-phrase / hot-key guard — see [[jaccardPairs]]). */
  val MaxShingleDf = 100L

  /** LSH band-bucket size cap (see [[scoredPairsFromSigs]]): buckets with
    * more members than this are boilerplate-degenerate and switch from
    * quadratic all-pairs candidate generation to a linear STAR around the
    * bucket's min-id representative — on BOTH engines. Far above every
    * real fixture's bucket maximum (≤ 15), so it only bites adversarial
    * skew; overridable per call on the [[graft.ops.CorpusDedup]] facade. */
  val MaxBandBucket = 64L

  private def shinglesOf(docs: DataFrame): DataFrame = {
    // The tokenize+shingle+md5 projection is the dominant cost of every
    // shingle query, so it must run on all cores. A single-row-group parquet
    // fixture (or any narrow upstream) plans ONE task; only then is a
    // round-robin exchange of the raw docs worth paying. A real multi-file
    // corpus already scans wide — an unconditional repartition there would
    // re-shuffle the heaviest column in the table (the raw text) for every
    // shingle-derived query family, so the exchange is conditional on the
    // source actually under-splitting relative to the cluster.
    val spread =
      if (docs.rdd.getNumPartitions <
            docs.sparkSession.sparkContext.defaultParallelism)
        docs.repartition()
      else docs
    spread
      .withColumn("w", TextHash.tokens($"text"))
      .select($"doc_id", TextHash.shinglesFromTokens($"w", Shingle).as("sh"))
  }

  private[graft] def postingsOf(docs: DataFrame): DataFrame =
    shinglesOf(docs)
      .select($"doc_id", size($"sh").as("n0"), explode($"sh").as("s0"))
      .select($"doc_id", $"n0", TextHash.h32($"s0").as("s"))

  /** Session memo of the shared index frames (postings / capped / MinHash
    * signatures), each an EAGER `localCheckpoint` — a LogicalRDD leaf, not
    * a persisted view of the full tokenize/shingle/minhash tree. The
    * round-16 loop work measured why the distinction matters on the
    * driver: a PERSISTED frame's logical plan still carries the whole
    * builder pipeline into every consumer's analysis, canonicalization and
    * cache lookup, and the dedup self-joins embed that tree TWICE (or,
    * for the signature-scoring tail, three times) — `q_dedup_ppjoin`'s
    * formatted plan was 24,439 lines and `q_dedup_calibration`'s 12,867
    * before the cut. With a checkpoint leaf the downstream plans are
    * O(query), independent of how the index was produced — exactly a
    * production pipeline reading the materialized artifact back from
    * storage (a multi-node deployment would use reliable
    * `checkpoint(dir)`; the blocks here are freed by the ContextCleaner
    * once a memo eviction drops the last reference). Values identical by
    * construction — a checkpoint replays the computed rows. */
  private val sharedFrameMemo = new graft.SessionMemo[DataFrame]()
  private def sharedCheckpoint(spark: SparkSession, key: String)(
      build: => DataFrame): DataFrame =
    sharedFrameMemo.getOrElseUpdate(spark, key)(build.localCheckpoint(true))

  /** The hashed-shingle postings list (doc_id, n0 = per-doc shingle count,
    * s = 32-bit shingle hash) — the ONE index every shingle-based dedup
    * query derives from: the tokenize+shingle+md5 pipeline (the dominant
    * cost) is paid once per session, exactly like a production job that
    * materializes the index to storage and reads it from every downstream
    * dedup stage. A lineage-cut memo (see [[sharedFrameMemo]]). */
  private def hashedPostings(spark: SparkSession, dir: String): DataFrame =
    sharedCheckpoint(spark, dir + ":postings")(
      postingsOf(Tables.documents(spark, dir)))

  /** The session-shared hashed-shingle postings index, exposed to sibling
    * query families that derive from the same dictionary (the train/eval
    * contamination check in [[TextAnalysis]]). */
  private[queries] def postingsFor(spark: SparkSession, dir: String): DataFrame =
    hashedPostings(spark, dir)

  /** Materialize the (small) final `result` into the cache, then free the
    * per-query intermediate indexes: repeated invocations in one session
    * (bench loops, spec suites) must not accumulate superseded cached
    * blocks. `Dataset.unpersist` is non-cascading, so the already-built
    * result blocks survive their inputs' eviction. The session-shared
    * postings index ([[hashedPostings]]) deliberately stays cached — it is
    * the one intermediate every shingle query re-reads. */
  private[queries] def freeing(result: DataFrame, intermediates: DataFrame*): DataFrame = {
    val out = result.persist()
    out.count()
    intermediates.foreach(_.unpersist(false))
    out
  }

  /** Exact dedup: md5 fingerprint of normalized text; one representative
    * (min doc_id) per content group. */
  def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(TextHash.normText($"text")).as("fp"))
      .agg(min($"doc_id").as("rep_doc_id"),
           count(lit(1)).as("n_copies"),
           max($"n_chars").as("max_chars"))

  /** Document-frequency-capped hashed-shingle index over a documents frame
    * (`doc_id, text`): one row per surviving (doc, shingle), with the
    * post-cap per-doc shingle count `n`. Shingles appearing in more than
    * `maxDf` documents are dropped BEFORE any join: a shingle present in d
    * docs contributes d·(d−1)/2 candidate pairs on its own AND lands all of
    * them in a single join task (key skew) — at corpus scale a stop-phrase
    * turns the equi-join quadratic. Dropping it is also semantically safe:
    * a shingle shared by a large fraction of the corpus carries no
    * near-duplicate signal. Per-doc sizes are recomputed after the cap so
    * |A∪B| stays consistent with the surviving shingle sets. */
  private[queries] def cappedShingleIndex(docs: DataFrame, maxDf: Long): DataFrame = {
    val postings = postingsOf(docs)
    // If this exact plan is already cached — the caller passed the canonical
    // documents table, whose postings are the session-shared
    // [[hashedPostings]] index — borrow the cache and do NOT unpersist:
    // evicting it would silently rebuild the index for every sibling shingle
    // query. Only a caller-specific frame gets the persist/unpersist bracket.
    val shared = org.apache.spark.sql.GraftBridge.isCached(postings)
    if (!shared) { postings.persist(); postings.count() }
    val res = freeing(cappedFromPostings(postings, maxDf))
    if (!shared) postings.unpersist(false)
    res
  }

  private[graft] def cappedFromPostings(postings: DataFrame, maxDf: Long): DataFrame = {
    // The HOT set (DF > cap) is tiny by construction — stop-phrases only —
    // so the cap is a broadcast anti-join against the complement, never a
    // sort or a join against the full shingle dictionary. This holds at any
    // corpus size: the number of shingles above a fixed DF cap is bounded
    // by corpus_rows / cap. Likewise the per-doc size correction touches
    // only (doc × hot-shingle) rows, so the post-cap size n is two
    // broadcast map-side joins — the full index is never re-aggregated.
    val hot = postings.groupBy($"s").agg(count(lit(1)).as("df"))
      .filter($"df" > maxDf).select($"s")
    val dropped = postings.join(broadcast(hot), Seq("s"))
      .groupBy($"doc_id").agg(count(lit(1)).as("nd"))
    postings.join(broadcast(hot), Seq("s"), "left_anti")
      .join(broadcast(dropped), Seq("doc_id"), "left")
      .select($"doc_id", ($"n0" - coalesce($"nd", lit(0L))).as("n"), $"s")
  }

  /** N-gram Jaccard near-dup pairs via shingle equi-join (no cross join):
    * explode distinct shingles, cap document frequency, self-join on
    * shingle, count overlap, |A∪B| = |A|+|B|−|A∩B|. */
  private[graft] def jaccardPairs(docs: DataFrame, maxDf: Long): DataFrame = {
    val postings = postingsOf(docs)
    // Same shared-cache guard as [[cappedShingleIndex]].
    val shared = org.apache.spark.sql.GraftBridge.isCached(postings)
    if (!shared) { postings.persist(); postings.count() }
    val res = jaccardFromPostings(postings, maxDf) // materializes (freeing)
    if (!shared) postings.unpersist(false)
    res
  }

  /** The session-shared DF-capped index over the canonical documents table
    * — the second materialized artifact (after [[hashedPostings]]) a
    * production dedup pipeline writes to storage: the Jaccard self-join and
    * the incremental batch-vs-corpus join both read it, so the cap work
    * (hot-set aggregate + two broadcast joins) runs once per session, not
    * once per consuming query. Identical plans everywhere, so Spark's
    * cache manager serves a single in-memory copy; like [[hashedPostings]]
    * it deliberately survives [[freeing]]. */
  private def cappedIndex(spark: SparkSession, dir: String): DataFrame =
    sharedCheckpoint(spark, dir + ":capped")(
      cappedFromPostings(hashedPostings(spark, dir), MaxShingleDf))

  /** The session-shared DF-capped shingle index, exposed to sibling query
    * families that score lexical overlap against it (the hybrid RRF fusion
    * in [[Similarity]]). */
  private[queries] def cappedIndexFor(spark: SparkSession, dir: String): DataFrame =
    cappedIndex(spark, dir)

  /** Jaccard pairs over a materialized capped index (`doc_id, n, s`): the
    * index feeds both sides of the self-join on the 32-bit shingle hash —
    * joining on the hash instead of the shingle string shrinks the shuffle
    * and the sort keys; the oracle hashes identically, so any (vanishingly
    * unlikely) collision affects both engines the same way. */
  /** Measured working-set cost per emitted pair row through the
    * self-join + pair-key aggregate stage of the CAPPED-index scorers
    * (Jaccard/containment): the x100 curve point spilled 43.8 GB over a
    * Σc² ≈ 279M expansion under the fixed session width — ~160 B/pair
    * across the join sort buffers and the partial-aggregate hash table.
    * The model reproduces BOTH curve measurements: at 10× (Σc² 27.9M,
    * ~140 MB/task at width 32) the lane measured ZERO spill; at 100×
    * (×10 that working set) it thrashed. */
  private[graft] val CappedPairRowBytes = 160L

  /** Same constant for the PPJoin prefix-index path, whose pair rows are
    * heavier per unit Σc² (the candidate `distinct()` hash table and the
    * verification join share the stage): 45 GB x100 spill over a prefix
    * Σc² ≈ 99.5M → ~450 B/pair. At 10× (Σc² 9.95M, again ~140 MB/task at
    * width 32) the r12 lane measured zero spill — both families sit at
    * the same measured in-memory boundary. */
  private[graft] val PpjoinPairRowBytes = 450L

  /** Estimated per-task execution-memory budget: executor heap
    * (`spark.executor.memory` when set — a real cluster — else this
    * JVM's max heap, which IS the executor in local mode) ×
    * `spark.memory.fraction`, split across the task slots that share it.
    * Local[32] at the default 8 GB heap: ~161 MB/task — matching the
    * measured spill boundary above. */
  private[graft] def perTaskExecBytes(spark: SparkSession): Long = {
    val heap = spark.conf.getOption("spark.executor.memory")
      .map(org.apache.spark.network.util.JavaUtils.byteStringAsBytes)
      .getOrElse(Runtime.getRuntime.maxMemory)
    val frac = spark.conf.getOption("spark.memory.fraction")
      .map(_.toDouble).getOrElse(0.6)
    val slots = spark.conf.getOption("spark.executor.cores")
      .flatMap(c => scala.util.Try(c.toInt).toOption)
      .getOrElse(spark.sparkContext.defaultParallelism).max(1)
    ((heap * frac) / slots).toLong
  }

  /** Expansion-proportional shuffle width for the pair self-joins,
    * ENGAGED on estimated memory pressure rather than raw expansion
    * (round-14 fix for the 10× width tax): 0 = the session width holds
    * the pair working set in execution memory, keep the original
    * reused-exchange plan — its exchanges are shared between the two
    * aliased join sides, and explicit repartitions would break the reuse
    * and add stages for protection the task memory does not need
    * (measured 2.98× dual-scale growth on q_dedup_jaccard when the old
    * expansion-count trigger engaged at the zero-spill 10× point).
    * When the estimated per-task working set at the session width
    * exceeds the execution budget, size the joins at ~250k pair rows
    * per task (the x100-proven width), capped at 4096 tasks so a
    * pathological corpus can't ask for an absurd task count. The cap
    * only bounds the EXPANSION-derived width — a session already
    * configured at ≥4096 partitions keeps its own width (return 0, no
    * repartition): shrinking such a session down to 4096 tasks would
    * grow per-task working-set bytes exactly when the budget check just
    * said they already exceed the per-task budget (round-16 ADVICE
    * fix). Width never changes values, so result hashes are unchanged
    * by construction. */
  private[graft] def pairJoinWidth(
      spark: SparkSession, expansion: Long, bytesPerPair: Long): Int = {
    val conf = spark.sessionState.conf.numShufflePartitions
    if (expansion * bytesPerPair / conf.max(1) <= perTaskExecBytes(spark)) 0
    else if (conf >= 4096) 0
    else math.min(4096L,
      math.max(conf + 1L, expansion / 250000L + 1L)).toInt
  }

  /** Σc² over the shingle column — the pair-join expansion the width
    * sizing reads. One aggregate over an (already cached) index frame. */
  private[graft] def pairExpansionOf(df: DataFrame): Long =
    df.groupBy($"s").agg(count(lit(1)).as("c"))
      .agg(sum($"c" * $"c").as("e")).collect()(0).getLong(0)

  /** Session memo of the sizing aggregates, keyed `dir:index-kind`: the
    * Σc² job is cheap (one aggregate over the session-shared cached
    * index) but was running once per QUERY CONSTRUCTION — plan-only
    * consumers (ScalePlanBudgetSpec, the probe's plan mode) paid a Spark
    * job per jaccard/containment/ppjoin plan built. Values are plain
    * longs (nothing persisted), so the no-op evict default applies. */
  private val expansionMemo = new graft.SessionMemo[Long]()

  private def cappedExpansion(spark: SparkSession, dir: String): Long =
    expansionMemo.getOrElseUpdate(spark, dir + ":capped")(
      pairExpansionOf(cappedIndex(spark, dir)))

  /** Shared-shingle pair counts over a capped index (`doc_id, n, s`):
    * (da, db, common, na, nb) from the self-equi-join on the shingle hash —
    * the skeleton both the Jaccard and containment scorers attach their
    * score expression to. `expansion` is the caller-provided Σc² of `ex`
    * (memoized for the session-shared index, computed directly for test
    * frames), feeding the memory-keyed width above. */
  private def pairCountsOnCapped(ex: DataFrame, expansion: Long): DataFrame = {
    val spark = ex.sparkSession
    val parts = pairJoinWidth(spark, expansion, CappedPairRowBytes)
    val wide = if (parts > 0) ex.repartition(parts, $"s") else ex
    val a = wide.select($"doc_id".as("da"), $"n".as("na"), $"s")
    val b = wide.select($"doc_id".as("db"), $"n".as("nb"), $"s")
    val joined = a.join(b, Seq("s")).filter($"da" < $"db")
    val pre = if (parts > 0) joined.repartition(parts, $"da", $"db") else joined
    pre.groupBy($"da", $"db")
      .agg(count(lit(1)).as("common"), max($"na").as("na"), max($"nb").as("nb"))
  }

  private def jaccardOnCapped(ex: DataFrame, expansion: Long): DataFrame = {
    pairCountsOnCapped(ex, expansion)
      .withColumn("jacc_e4",
        floor($"common" * 10000L / ($"na" + $"nb" - $"common")).cast("long"))
      .filter($"jacc_e4" >= JaccThresholdE4)
      .select($"da", $"db", $"common", $"jacc_e4")
      .orderBy($"da", $"db")
  }

  /** Test-helper path over a caller-supplied postings frame: owns a local
    * persist/unpersist bracket for the capped index it builds — UNLESS that
    * plan is already the session-shared [[cappedIndex]] (canonical postings
    * + [[MaxShingleDf]]), which it must borrow, not evict. */
  private def jaccardFromPostings(postings: DataFrame, maxDf: Long): DataFrame = {
    val ex = cappedFromPostings(postings, maxDf)
    val shared = org.apache.spark.sql.GraftBridge.isCached(ex)
    if (!shared) {
      ex.persist()
      ex.count() // materialize the index before the self-join so both sides
                 // read the cache instead of racing to fill it
    }
    val res = freeing(jaccardOnCapped(ex, pairExpansionOf(ex)))
    if (!shared) ex.unpersist(false)
    res
  }

  def qDedupJaccard(spark: SparkSession, dir: String): DataFrame =
    freeing(jaccardOnCapped(cappedIndex(spark, dir),
      cappedExpansion(spark, dir)))

  /** Containment threshold for [[qDedupContainment]] (15% of the smaller
    * document's shingles): intentionally below the Jaccard threshold's
    * reach — the pairs this query exists for score LOW on Jaccard. */
  private val ContainmentE4 = 1500L

  /** Asymmetric containment near-dup pairs — the doc-inside-doc detector
    * Jaccard structurally misses: containment = |A∩B| / min(|A|,|B|)
    * scores a short document fully quoted inside a long one at 100%
    * while Jaccard divides by the UNION and dilutes it to noise (a 50×
    * length ratio caps Jaccard at ~2%). This is the dedup rule for
    * boilerplate inclusions, quoted articles, and template wrappers.
    *
    * Plan: identical shape to [[qDedupJaccard]] — the same session-shared
    * DF-capped shingle index feeds both sides of the equi-join on the
    * 32-bit shingle hash; only the score expression differs, so the scale
    * story (hot-set cap before the join, no all-pairs) carries over
    * unchanged. Emits both scores so downstream policy can distinguish
    * "same document" (high Jaccard) from "one contains the other". */
  def qDedupContainment(spark: SparkSession, dir: String): DataFrame = {
    freeing(pairCountsOnCapped(cappedIndex(spark, dir),
        cappedExpansion(spark, dir))
      .withColumn("cont_e4",
        floor($"common" * 10000L / least($"na", $"nb")).cast("long"))
      .filter($"cont_e4" >= ContainmentE4)
      .withColumn("jacc_e4",
        floor($"common" * 10000L / ($"na" + $"nb" - $"common")).cast("long"))
      .select($"da", $"db", $"common", $"na", $"nb", $"cont_e4", $"jacc_e4")
      .orderBy($"da", $"db"))
  }

  /** MinHash signatures + LSH band buckets per document.
    *
    * Plan shape: explode shingles → hash each ONCE → 8 min-aggregations.
    * Partial aggregation collapses the exploded rows map-side, and the md5
    * cost is paid once per shingle instead of once per (shingle × hash
    * function) as the array-lambda formulation would. */
  /** MinHash signatures + band buckets from a hashed postings frame
    * (`doc_id, s`) — the frame-parametric core shared by the registry path
    * and [[graft.ops.CorpusDedup]]. */
  private[graft] def signaturesOf(hashed: DataFrame): DataFrame = {
    val minExprs = (0 until TextHash.MinhashK).map { i =>
      val (a, b) = TextHash.MinhashParams(i)
      min(($"s" * a + b) % TextHash.HashPrime).as(s"mh$i")
    }
    val withSig = hashed.groupBy($"doc_id").agg(minExprs.head, minExprs.tail: _*)
    val sigCols = (0 until TextHash.MinhashK).map(i => col(s"mh$i"))
    val bands = (0 until TextHash.MinhashK / TextHash.BandRows)
      .map(bi => TextHash.bandBucket(sigCols, bi).as(s"band$bi"))
    withSig.select(Seq($"doc_id") ++ sigCols ++ bands: _*)
  }

  /** The session-shared MinHash signature index — lineage-cut like
    * [[hashedPostings]]: the band self-join reads it once and the
    * signature-scoring tail re-joins it twice, so a full-tree plan was
    * embedded three times per candidate query. */
  private def sigIndex(spark: SparkSession, dir: String): DataFrame =
    sharedCheckpoint(spark, dir + ":sigs")(
      signaturesOf(hashedPostings(spark, dir)))

  def qDedupMinhash(spark: SparkSession, dir: String): DataFrame =
    sigIndex(spark, dir) // the session-shared index

  /** Per-band LSH bucket-size distribution — the monitoring counterpart of
    * the [[MaxBandBucket]] cap: bucket count, doc mass, the largest bucket,
    * and the hot-bucket count/mass the cap star-collapses (candidates from
    * those buckets are representative edges, not all-pairs — the rows an
    * operator audits when a survivors run reports hot buckets). On a healthy
    * corpus `n_hot_buckets`/`capped_docs` are 0 and `max_bucket` tracks the
    * largest genuine duplicate cluster; boilerplate contamination shows up
    * here FIRST (max_bucket exploding toward the corpus size) — the skew
    * dashboard an operator reads before trusting a dedup run at scale.
    *
    * Plan: band explode → (band, bucket) hash aggregate → ≤bands-row
    * aggregate. Group keys contain the bucket, so the heavy aggregate is
    * skew-free at any corpus size. */
  def qDedupBucketStats(spark: SparkSession, dir: String): DataFrame = {
    val sigs = qDedupMinhash(spark, dir)
    val nBands = TextHash.MinhashK / TextHash.BandRows
    val ex = sigs.select($"doc_id",
        posexplode(array((0 until nBands).map(i => col(s"band$i")): _*)))
      .select($"pos".cast("long").as("band_idx"), $"col".as("bucket"))
    ex.groupBy($"band_idx", $"bucket").agg(count(lit(1)).as("bsz"))
      .groupBy($"band_idx")
      .agg(count(lit(1)).as("n_buckets"),
        sum($"bsz").as("n_docs"),
        max($"bsz").as("max_bucket"),
        sum(when($"bsz" > MaxBandBucket, 1L).otherwise(0L)).as("n_hot_buckets"),
        sum(when($"bsz" > MaxBandBucket, $"bsz").otherwise(0L)).as("capped_docs"))
      .orderBy($"band_idx")
  }

  /** LSH candidate pairs: documents sharing any band bucket, with the
    * minhash-estimated similarity (fraction of equal signature slots).
    * This is the scalable near-dup path: candidates come from b equi-joins
    * on 2-row band keys instead of any pairwise comparison.
    *
    * Shuffle discipline: the self-join carries ONLY (band_idx, bucket,
    * doc_id) — 3 narrow columns per side, not the 8 signature columns
    * (which would double-ride the widest shuffle in the query). Signatures
    * are attached by two slim equi-joins against the per-doc signature
    * table only for pairs that survive candidate grouping. And because a
    * document has exactly one bucket per band, (da, db, band_idx) rows are
    * already distinct, so `count(*)` equals `countDistinct(band_idx)`
    * without the expand the distinct aggregate would force. */
  /** LAZY scored LSH candidate pairs (da, db, n_shared_bands, n_eq, est_e4)
    * plus the persisted signature table they derive from — shared by the
    * pair-listing query and the clustering query so each consumer
    * materializes only what it needs (the clustering path used to pay a
    * full extra action for the ordered pair listing it discards). */
  /** Scored LSH candidate pairs from a (preferably materialized) signature
    * frame — the frame-parametric core: the signature table feeds the band
    * explode AND both pair-side joins, so callers persist it first. */
  /** Exploded LSH band rows (doc_id, band_idx, bucket) of a signature
    * frame — one row per (doc, band). Shared by the pair generator, the
    * bucket dashboard, and the persisted `bands/` index artifact. */
  private[graft] def bandRowsOf(sigs: DataFrame): DataFrame = {
    val nBands = TextHash.MinhashK / TextHash.BandRows
    sigs.select($"doc_id",
        posexplode(array((0 until nBands).map(i => col(s"band$i")): _*)))
      .select($"doc_id", $"pos".as("band_idx"), $"col".as("bucket"))
  }

  private[graft] def scoredPairsFromSigs(
      sigs: DataFrame, maxBandBucket: Long = MaxBandBucket): DataFrame = {
    val explodedRaw = bandRowsOf(sigs)
    // Band-bucket size cap — the LSH twin of the shingle DF cap
    // ([[MaxShingleDf]]): boilerplate shared across a large doc fraction
    // drags many documents onto the same minhash minima, producing mega
    // band-buckets, and the bucket self-join below is QUADRATIC in bucket
    // size. Buckets above [[MaxBandBucket]] switch from all-pairs to a
    // STAR around the bucket's min-doc_id representative: bsz−1 candidate
    // rows per hot bucket instead of C(bsz,2) — per-bucket work stays
    // linear and total candidates O(n·cap + n·bands) — while every member
    // of a genuine mega template family remains reachable from the
    // representative, so downstream clustering/survivors still collapse
    // the family (transitively) instead of silently retaining every copy.
    // Dissimilar docs thrown together by boilerplate minima still die at
    // the est_e4 score gate, exactly as cold-bucket candidates do. Fixture
    // bucket maxima are 3 (sf0.01) / 10 (sf0.1) / 15 (10× lane), so the
    // cap is inert on real corpora and bites exactly on adversarial skew
    // (AdversarialCorpusSpec). The hot set is bounded by construction
    // (≤ bands·n/cap groups, and only boilerplate-degenerate ones), so
    // both the anti-join's and the star join's build side stay small; the
    // join keys match the bucket join's own shuffle key, and the two hot
    // references share one exchange via reuse.
    val hot = explodedRaw.groupBy($"band_idx", $"bucket")
      .agg(count(lit(1)).as("bsz"), min($"doc_id").as("rep"))
      .filter($"bsz" > maxBandBucket)
      .select($"band_idx", $"bucket", $"rep")
    val exploded = explodedRaw.join(
      hot.select($"band_idx", $"bucket"), Seq("band_idx", "bucket"), "left_anti")
    val a = exploded.select($"band_idx", $"bucket", $"doc_id".as("da"))
    val b = exploded.select($"band_idx", $"bucket", $"doc_id".as("db"))
    val coldRows = a.join(b, Seq("band_idx", "bucket")).filter($"da" < $"db")
      .select($"da", $"db")
    // rep = min(doc_id) of the bucket, so rep < member keeps the oriented
    // da < db invariant; one bucket per doc per band and hot/cold being
    // mutually exclusive per bucket keep ≤ 1 candidate row per (pair, band),
    // so count(*) below still equals the shared-band count.
    val starRows = explodedRaw.join(hot, Seq("band_idx", "bucket"))
      .filter($"doc_id" =!= $"rep")
      .select($"rep".as("da"), $"doc_id".as("db"))
    val pairs = coldRows.unionByName(starRows)
      .groupBy($"da", $"db")
      .agg(count(lit(1)).as("n_shared_bands"))
    scoreCandidates(pairs, sigs)
  }

  /** THE signature-scoring tail: attach both sides' MinHash signatures to
    * an oriented candidate frame `(da, db, n_shared_bands)` and emit
    * (da, db, n_shared_bands, n_eq, est_e4). ONE definition shared by the
    * batch generator ([[scoredPairsFromSigs]]) and the incremental append
    * ([[graft.ops.CorpusDedup.appendToIndex]]) — the two paths are
    * oracle-pinned bit-identical (`q_dedup_index_append`), so the score
    * expression must have exactly one home. */
  private[graft] def scoreCandidates(pairs: DataFrame, sigs: DataFrame): DataFrame = {
    val sa = sigs.select(
      (Seq($"doc_id".as("da")) ++
        (0 until TextHash.MinhashK).map(i => col(s"mh$i").as(s"a$i"))): _*)
    val sb = sigs.select(
      (Seq($"doc_id".as("db")) ++
        (0 until TextHash.MinhashK).map(i => col(s"mh$i").as(s"b$i"))): _*)
    val est = (0 until TextHash.MinhashK)
      .map(i => when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
      .reduce(_ + _)
    pairs.join(sa, Seq("da")).join(sb, Seq("db"))
      .withColumn("n_eq", est)
      .withColumn("est_e4", floor($"n_eq" * 10000L / TextHash.MinhashK).cast("long"))
      .select($"da", $"db", $"n_shared_bands", $"n_eq", $"est_e4")
  }

  private def lshScoredPairs(spark: SparkSession, dir: String): DataFrame =
    scoredPairsFromSigs(sigIndex(spark, dir))

  def qDedupLshPairs(spark: SparkSession, dir: String): DataFrame =
    freeing(lshScoredPairs(spark, dir).orderBy($"da", $"db"))

  /** The oriented (low→high doc_id) near-dup edge set above
    * [[ClusterEdgeE4]], persisted and materialized, signature table
    * released — the ONE definition of "the near-dup graph" shared by the
    * clustering, triangle, clustering-coefficient and survivors paths (a
    * threshold or scoring change cannot make them disagree). Session-
    * memoized like [[cappedIndex]]: five per-session consumers read the
    * graph, so the LSH pipeline (minhash aggregation, band self-join,
    * signature re-joins) runs once per session, not once per consumer —
    * the edge list is the third artifact a production dedup pipeline
    * materializes to storage. Deliberately survives [[freeing]]; same
    * immutable-input session contract as every cached index here. LRU
    * session keys ([[graft.SessionMemo]]) with an unpersist-on-evict hook:
    * the shared-state CacheManager pins cached blocks across session
    * churn, so eviction must release them explicitly. */
  private val edgeCache = new graft.SessionMemo[DataFrame]()

  private def lshEdges(spark: SparkSession, dir: String): DataFrame =
    edgeCache.getOrElseUpdate(spark, dir) {
      // Eager localCheckpoint, not persist (same rationale as
      // [[sharedFrameMemo]]): the LSH pipeline runs ONCE per session and
      // every consumer — the clustering loop especially, which re-plans
      // against the edge frame every round — sees a LogicalRDD leaf.
      // clearCache() cannot evict checkpoint blocks, so the old persisted
      // re-register guard has nothing left to guard.
      lshScoredPairs(spark, dir)
        .filter($"est_e4" >= ClusterEdgeE4)
        .select($"da".as("a"), $"db".as("b"))
        .localCheckpoint(true)
    }

  /** Sources treated as the incoming batch by [[qDedupIncremental]] (the
    * fixture's 20 uniform sources make any fixed pick a ~10% slice). */
  private[graft] val NewSources = Seq("src18", "src19")

  /** Incremental near-dedup: score an incoming batch against the already-
    * ingested corpus and keep only genuinely new documents — the recurring
    * "dedup this crawl against everything we already have" step of a
    * training-data pipeline. NOT a self-join: the shingle equi-join is
    * new-batch × seen-corpus, so its cost scales with the batch, not the
    * corpus² (the corpus side is the persisted postings index a production
    * job reads from storage). Output: every new doc with its match count,
    * best Jaccard, the smallest matching seen doc_id, and the keep bit. */
  def qDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val srcOf = docs.select($"doc_id", $"source")
    // The DF cap runs over the FULL corpus (seen ∪ new): a stop-phrase is a
    // stop-phrase regardless of which batch it arrives in, and capping both
    // sides identically keeps |A∪B| consistent across the split. Reads the
    // session-shared capped index (see [[cappedIndex]]).
    val ex = cappedIndex(spark, dir)
      .join(srcOf, Seq("doc_id"))
      .withColumn("is_new", $"source".isin(NewSources: _*))
      .persist()
    ex.count()
    val nw = ex.filter($"is_new").select($"doc_id".as("dn"), $"n".as("nn"), $"s")
    val sn = ex.filter(!$"is_new").select($"doc_id".as("ds"), $"n".as("ns"), $"s")
    val best = nw.join(sn, Seq("s"))
      .groupBy($"dn", $"ds")
      .agg(count(lit(1)).as("common"), max($"nn").as("nn"), max($"ns").as("ns"))
      .withColumn("jacc_e4",
        floor($"common" * 10000L / ($"nn" + $"ns" - $"common")).cast("long"))
      .filter($"jacc_e4" >= JaccThresholdE4)
      .groupBy($"dn")
      .agg(max($"jacc_e4").as("best_jacc_e4"),
           min($"ds").as("first_match"),
           count(lit(1)).as("n_matches"))
    val res = docs.filter($"source".isin(NewSources: _*))
      .select($"doc_id", $"source")
      .join(best, $"doc_id" === $"dn", "left")
      .select($"doc_id", $"source", $"first_match",
        coalesce($"best_jacc_e4", lit(-1L)).as("best_jacc_e4"),
        coalesce($"n_matches", lit(0L)).as("n_matches"),
        $"first_match".isNull.as("kept"))
    freeing(res, ex)
  }

  /** Minimum minhash agreement (of [[TextHash.MinhashK]] slots, in e4) for
    * an LSH candidate pair to become a cluster edge. */
  val ClusterEdgeE4 = 5000L
  private val MaxClusterIters = 20

  /** Near-dup clusters: connected components over the LSH candidate-pair
    * graph — the step that turns pairwise near-dup evidence into dedup
    * groups (keep one representative per cluster). Distributed min-label
    * propagation on DataFrames: every node's label becomes the minimum of
    * its own and its neighbors' labels, iterated to fixpoint. Each round is
    * one equi-join + one aggregate (both partition on node id); rounds
    * needed = graph diameter, which for near-dup clusters is tiny. This is
    * the standard large-scale connected-components loop (the driver only
    * orchestrates; per-round data never leaves the cluster — one scalar
    * convergence count comes back). */
  /** The CC loop's outcome: the labels frame plus whether the fixpoint was
    * actually reached within [[MaxClusterIters]] rounds. */
  private[graft] final case class ClusterLabels(labels: DataFrame, converged: Boolean)

  /** Session-scoped memo of the converged (doc_id, cluster_id) labels per
    * data directory. The iterative CC result cannot ride the plan-identity
    * cache the way [[hashedPostings]] does — every run's `localCheckpoint`
    * is a fresh leaf relation — so consumers share it explicitly: a
    * production pipeline materializes the cluster assignment once and every
    * downstream stage (the listing, the survivors deliverable, audits)
    * reads that table instead of re-running label propagation.
    *
    * Same contract as every cached index in this module (and as Spark's own
    * table cache): the session assumes the files under `dir` are immutable
    * for its lifetime — rewriting a directory mid-session serves stale
    * results from ANY of the caches, not just this one. Computation is
    * single-flighted under a lock so concurrent first calls cannot race two
    * loops and leak the loser's checkpoint blocks. */
  // default no-op evict hook on purpose: labels are localCheckpoint-backed
  // (RDD blocks, reclaimed by the ContextCleaner once unreachable), not
  // CacheManager entries — nothing to unpersist explicitly on eviction
  private val clusterLabelCache = new graft.SessionMemo[ClusterLabels]

  def qDedupClusters(spark: SparkSession, dir: String): DataFrame =
    clusterLabelsOf(spark, dir).labels.orderBy($"doc_id")

  private def clusterLabelsOf(spark: SparkSession, dir: String): ClusterLabels =
    clusterLabelCache.getOrElseUpdate(spark, dir)(runClusterLoop(spark, dir))

  private def runClusterLoop(spark: SparkSession, dir: String): ClusterLabels =
    propagateLabels(lshEdges(spark, dir))

  /** Min-label propagation over an oriented pair frame `(a, b)` — the
    * frame-parametric connected-components core shared by the registry path
    * and [[graft.ops.CorpusDedup]]. The caller keeps `pairs` materialized;
    * this loop persists only its own symmetrized copy. */
  private[graft] def propagateLabels(pairs: DataFrame): ClusterLabels = {
    // Lineage-cut, not persisted (round 16): the symmetrized edge frame is
    // referenced twice per round, and a PERSISTED frame's logical plan
    // still carries the caller's whole candidate-generator tree into every
    // round's analysis + cache lookup — the checkpoint leaf keeps
    // per-round planning O(round plan), like the label checkpoints below.
    val edges = pairs
      .union(pairs.select($"b".as("a"), $"a".as("b")))
      .localCheckpoint(true)
    // localCheckpoint (eager) after every round: an iterative loop's plan
    // otherwise GROWS each round (this loop references `labels` twice per
    // round → exponential lineage), and persist/unpersist cycling is a trap
    // — unpersist cascades to dependent cache entries, silently evicting
    // the new round's cache and forcing a full-lineage recompute. The
    // checkpoint materializes once and CUTS the plan, so every round reads
    // a shallow stored relation. (A multi-node production job would use
    // reliable checkpoint(dir) — same shape.)
    var labels = edges.select($"a".as("node")).distinct()
      .withColumn("label", $"node")
      .localCheckpoint(true)
    var iters = 0
    var converged = false
    while (!converged && iters < MaxClusterIters) {
      val neighborMin = edges.join(labels, $"b" === $"node")
        .groupBy($"a").agg(min($"label").as("nmin"))
      val prop = labels.join(neighborMin, $"node" === $"a", "left")
        .select($"node", $"label",
          least($"label", coalesce($"nmin", $"label")).as("mid"))
      // Path compression (pointer jumping): follow the new label one hop to
      // ITS label. Plain neighbor-min needs O(diameter) rounds — a chain of
      // near-dups converges one hop per round; with compression the label
      // distance halves each round, so convergence is O(log diameter).
      val ptr = labels.select($"node".as("pn"), $"label".as("pl"))
      val next = prop.join(ptr, $"mid" === $"pn", "left")
        .select($"node", $"label",
          least($"mid", coalesce($"pl", $"mid")).as("next_label"))
        .localCheckpoint(true)
      converged = next.filter($"next_label" < $"label").isEmpty
      labels = next.select($"node", $"next_label".as("label"))
      iters += 1
    }
    if (!converged)
      System.err.println(
        s"[graft] qDedupClusters: stopped at $MaxClusterIters rounds before " +
          "convergence; labels are an upper-bound partition (pairs in the " +
          "same cluster may still carry different labels)")
    // `labels` is a materialized localCheckpoint; the symmetrized edge
    // frame is checkpoint-backed too, so the ContextCleaner reclaims it
    // (and every superseded per-round checkpoint) once unreferenced. The
    // oriented `pairs` frame is the session-shared [[lshEdges]] cache —
    // kept.
    ClusterLabels(
      labels.select($"node".as("doc_id"), $"label".as("cluster_id")),
      converged)
  }

  /** The end-to-end dedup deliverable — the cleaned corpus a training-data
    * pipeline actually consumes (the reference's own contract is "return the
    * surviving records", `app/server/index.js:60-63`): run the connected-
    * components clustering ([[qDedupClusters]]), keep ONE representative per
    * near-dup cluster (the min-doc_id member — which is exactly the cluster
    * label, so representatives need no extra aggregation), and anti-join
    * every other cluster member out of `documents`. Output: each surviving
    * document with its cluster id (its own id when untouched), how many
    * corpus docs it now represents, and whether it headed a near-dup group.
    *
    * Scale shape: downstream of the CC loop this is one aggregate over the
    * graph nodes (cluster sizes), one LEFT ANTI equi-join on doc_id (drops
    * non-representatives), and one LEFT equi-join (attaches cluster info).
    * All three shuffle on doc_id/cluster_id; nothing assumes the near-dup
    * graph fits in a broadcast (at web-crawl scale it does not). */
  /** The survivors deliverable over any docs frame carrying a `doc_id`
    * column (all other columns pass through; must not already contain
    * `cluster_id`/`n_merged`/`is_representative`) — the frame-parametric
    * core shared by the registry path and [[graft.ops.CorpusDedup]].
    *
    * The clusters LISTING degrades honestly under a non-converged stop
    * (labels are an upper-bound partition, warned on stderr). The
    * SURVIVORS deliverable cannot: a node y with label(y) < y is dropped
    * as a non-representative while docs still labeled y ALSO drop —
    * documents would vanish from the "cleaned corpus" with no surviving
    * representative. Emitting that is silent data loss, so refuse. */
  /** The ONE refusal gate for consumers that cannot tolerate an
    * upper-bound label partition (two same-cluster docs still carrying
    * different labels): the survivors corpus would silently lose
    * documents, the rate report would misattribute drops, and the split
    * assignment could leak a cluster across splits. */
  private def requireConverged(cc: ClusterLabels, consumer: String): Unit =
    if (!cc.converged)
      throw new IllegalStateException(
        s"$consumer: label propagation did not converge within " +
          s"$MaxClusterIters rounds; refusing to consume an upper-bound " +
          "label partition (raise MaxClusterIters)")

  private[graft] def survivorsOf(docs: DataFrame, cc: ClusterLabels): DataFrame = {
    requireConverged(cc, "survivors")
    val clusters = cc.labels
    val nonReps = clusters.filter($"doc_id" =!= $"cluster_id").select($"doc_id")
    val sizes = clusters.groupBy($"cluster_id").agg(count(lit(1)).as("n_merged"))
    val reps = clusters.filter($"doc_id" === $"cluster_id")
      .join(sizes, Seq("cluster_id"))
      .select($"doc_id", $"cluster_id", $"n_merged")
    val keep = docs.columns.map(col).toSeq
    docs
      .join(nonReps, Seq("doc_id"), "left_anti")
      .join(reps, Seq("doc_id"), "left")
      .select(keep ++ Seq(
        coalesce($"cluster_id", $"doc_id").as("cluster_id"),
        coalesce($"n_merged", lit(1L)).as("n_merged"),
        $"cluster_id".isNotNull.as("is_representative")): _*)
  }

  def qDedupSurvivors(spark: SparkSession, dir: String): DataFrame =
    // Backed by the CC loop's eager localCheckpoint (session-memoized), so
    // the survivors joins read shallow scans, not reruns of propagation.
    survivorsOf(
      Tables.documents(spark, dir).select($"doc_id", $"source"),
      clusterLabelsOf(spark, dir))

  /** Triangle census over the LSH near-dup graph — the structural step
    * between pairwise evidence (edges) and clusters: a high triangle count
    * inside a candidate neighborhood means mutually-similar groups (safe to
    * collapse), while triangle-free stars suggest hub false-positives. The
    * classic distributed formulation: orient every edge low→high id (kills
    * duplicate wedges AND bounds wedge fan-out by max out-degree), join
    * edges on the middle vertex to enumerate wedges, then semi-join the
    * closing edge. Two equi-joins, no cartesian; cost scales with the
    * wedge count, the same budget any production triangle count pays. */
  /** Oriented (a<b<c) triangle rows over an oriented edge frame — the ONE
    * wedge-join + closing-edge derivation both the census and the per-node
    * coefficients consume (an orientation or threshold change cannot make
    * them disagree). */
  private[graft] def orientedTriangles(edges: DataFrame): DataFrame = {
    val wedges = edges.toDF("a", "b")
      .join(edges.toDF("b", "c"), Seq("b"))
      .select($"a", $"b", $"c")
    wedges.join(edges.toDF("a", "c"), Seq("a", "c"), "left_semi")
  }

  def qDedupTriangles(spark: SparkSession, dir: String): DataFrame = {
    val edges = lshEdges(spark, dir)
    val nEdges = edges.count()
    val res = orientedTriangles(edges)
      .agg(count(lit(1)).as("n_triangles"))
      .withColumn("n_edges", lit(nEdges))
      .select($"n_edges", $"n_triangles")
    freeing(res)
  }

  /** Per-node local clustering coefficients over the LSH near-dup graph —
    * the node-level refinement of [[qDedupTriangles]]'s global census: for
    * every document in the graph, its degree, the triangles through it,
    * and 2t/(d(d−1)) in e4. High coefficient ⇒ the doc sits in a mutually-
    * similar clique (safe to collapse); degree-heavy + coefficient-poor ⇒
    * an LSH hub false-positive whose cluster deserves scrutiny — exactly
    * the audit a dedup pipeline runs before trusting [[qDedupSurvivors]].
    *
    * Scale: triangles come from the shared [[orientedTriangles]] wedge join
    * (fan-out bounded by out-degree); per-node credit is a 3× explode of
    * the triangle rows + hash aggregate. Degrees aggregate the ORIENTED
    * (a<b, one row per undirected edge) frame — unioning its two endpoint
    * columns yields each endpoint exactly once per undirected edge, which
    * is the degree; a symmetrized edge set here would double every degree.
    * Integer arithmetic throughout, so the coefficient hash-matches
    * exactly. */
  def qDedupClusteringCoeff(spark: SparkSession, dir: String): DataFrame = {
    val edges = lshEdges(spark, dir)
    val perNode = orientedTriangles(edges)
      .select(explode(array($"a", $"b", $"c")).as("doc_id"))
      .groupBy($"doc_id").agg(count(lit(1)).as("nt"))
    val deg = edges.select($"a".as("doc_id"))
      .union(edges.select($"b".as("doc_id")))
      .groupBy($"doc_id").agg(count(lit(1)).as("degree"))
    val res = deg.join(perNode, Seq("doc_id"), "left")
      .withColumn("n_triangles", coalesce($"nt", lit(0L)))
      .withColumn("coeff_e4",
        when($"degree" >= 2,
          expr("(n_triangles * 20000) div (degree * (degree - 1))"))
          .otherwise(0L))
      .select($"doc_id", $"degree", $"n_triangles", $"coeff_e4")
      .orderBy($"doc_id")
    freeing(res)
  }

  /** Synchronous PageRank rounds run by [[qGraphPagerank]]. A FIXED count,
    * not a convergence test: near-dup components are near-cliques (tiny
    * diameter), so 10 rounds is far past visible movement at the e12
    * scale, and a fixed count keeps the DuckDB oracle expressible as a
    * non-recursive unrolled CTE chain (recursive CTEs cannot aggregate
    * over their own recursive reference). */
  private[graft] val PagerankIters = 10

  /** Fixed-point scale for PageRank mass (1e12): total rank mass is
    * [[PagerankScale]], so per-node values stay integral — floor division
    * in both engines makes every round bit-deterministic and summation-
    * order-independent (a double formulation would diverge between Spark
    * and DuckDB in the last ulps and break the hash gate). */
  private[graft] val PagerankScale = 1000000000000L

  /** PageRank over an oriented near-dup pair frame `(a, b)` — the
    * frame-parametric core behind [[qGraphPagerank]]. Damping 0.85,
    * uniform init, [[PagerankIters]] synchronous rounds in integer
    * fixed-point: pr'(v) = base + (85 · Σ_{u∼v} (pr(u) div deg(u))) div 100
    * with base = (15 · scale) div (100 · N). The graph is undirected and
    * every node has degree ≥ 1 (nodes exist only via edges), so there is
    * no dangling-mass term and every node receives a contribution row.
    *
    * Scale shape: per round, one equi-join of the rank frame against the
    * symmetrized edge list (shuffles on node id) + one hash aggregate with
    * map-side partial sums — the classic distributed PageRank step. Eager
    * `localCheckpoint` after every round cuts the growing lineage exactly
    * like [[propagateLabels]] (a production multi-node job would use
    * reliable checkpoint(dir)). Only the node count N reaches the driver. */
  private[graft] def pagerankFrom(pairs: DataFrame): DataFrame = {
    // The loop-invariant frames are LINEAGE-CUT (eager localCheckpoint),
    // not merely persisted: a persisted frame's LOGICAL plan still embeds
    // the caller's whole pipeline (here the LSH candidate generator), and
    // every round's new DataFrame re-analyzes and re-canonicalizes that
    // tree during planning and cache lookup — measured ~0.9 s of
    // driver-side work per round against ~0.05 s of actual job execution
    // at sf0.1 (10 rounds paid ~9 s of replanning for ~1 s of compute).
    // A checkpoint is a trivial LogicalRDD leaf, so per-round planning is
    // O(round plan), independent of how the edge list was produced —
    // exactly the [[propagateLabels]] per-round discipline applied to the
    // invariants too. (A multi-node production job would use reliable
    // checkpoint(dir) — same shape.)
    val edges = pairs
      .union(pairs.select($"b".as("a"), $"a".as("b")))
      .localCheckpoint(true)
    val deg = edges.groupBy($"a".as("node"))
      .agg(count(lit(1)).as("degree"))
      .localCheckpoint(true)
    val n = deg.count() // bounded driver scalar: the graph's node count
    val base = 15L * PagerankScale / (100L * n)
    // Out-edges with the source's out-degree attached ONCE — each power
    // iteration then pays a single equi-join + aggregate instead of two
    // joins (the degree re-join repeated PagerankIters times was pure
    // overhead: degree never changes).
    val edgesD = edges.join(deg, $"a" === $"node")
      .select($"a", $"b", $"degree").localCheckpoint(true)
    var pr = deg.select($"node", lit(PagerankScale / n).as("pr"))
      .localCheckpoint(true)
    for (_ <- 1 to PagerankIters) {
      val contrib = pr.join(edgesD, $"node" === $"a")
        .select($"b".as("node"), expr("pr div degree").as("c"))
        .groupBy($"node").agg(sum($"c").as("s"))
      pr = contrib
        .select($"node", (lit(base) + expr("(85 * s) div 100")).as("pr"))
        .localCheckpoint(true)
    }
    val res = pr.join(deg, Seq("node"))
      .select($"node".as("doc_id"), $"degree", $"pr")
    // the invariants are checkpoint-backed (RDD blocks, reclaimed by the
    // ContextCleaner once unreachable) — nothing to unpersist
    freeing(res)
  }

  /** PageRank over the LSH near-dup graph — the centrality audit on the
    * dedup graph: a node with outsized rank is a hub whose edges connect
    * otherwise-unrelated documents (an LSH false-positive magnet or
    * boilerplate attractor), exactly the cluster to inspect before
    * trusting [[qDedupSurvivors]]' collapse. Output: (doc_id, degree, pr)
    * with pr in [[PagerankScale]] fixed-point. */
  def qGraphPagerank(spark: SparkSession, dir: String): DataFrame =
    pagerankFrom(lshEdges(spark, dir))

  /** Peeling rounds per k and the coreness cap for [[qGraphKcore]]. A
    * FIXED round count (not a convergence loop) keeps the DuckDB oracle
    * expressible as an unrolled CTE chain; the Spark side verifies
    * stability afterward — one further round must remove nothing — and
    * REFUSES otherwise, so fixed-count ≡ fully-peeled whenever the query
    * returns at all. Near-dup graphs are near-cliques (peeling converges
    * in 1–2 rounds); 6 covers any realistic chain tail. */
  private[graft] val KcorePeelRounds = 6
  private[graft] val KcoreMax = 3

  /** k-core decomposition (coreness capped at [[KcoreMax]]) over a
    * symmetric-edge near-dup graph — the density audit that separates
    * GENUINE duplicate communities from accidental matches: a node of
    * coreness ≥ 3 sits in a subgraph where every member has ≥ 3 same-
    * subgraph neighbors (template families, mirrored boilerplate — the
    * mass worth aggressive collapse), while coreness 1 is a peripheral
    * pairwise match (review before dropping). Complements the triangle /
    * clustering-coefficient audits: coreness is a GLOBAL density measure
    * that survives hub dilution, where a hub's own coefficient goes to 0.
    *
    * Scale shape per peel round: two left-semi equi-joins of the edge
    * list against the surviving node set + one hash aggregate, all keyed
    * on node id — the same exchange profile as a CC round; eager
    * `localCheckpoint` cuts lineage per round, and only per-round counts
    * (bounded scalars) reach the driver. The k=3 peel starts from the
    * 2-core survivors (k-cores nest), so later peels run on the already-
    * shrunk graph. */
  private[graft] def kcoreFrom(pairs: DataFrame): DataFrame = {
    // Loop invariants lineage-cut like [[pagerankFrom]]'s: every peel
    // round re-plans against these two frames, and a checkpoint leaf
    // keeps that planning O(round plan) instead of O(candidate-generator
    // plan) per round.
    val und = pairs.union(pairs.select($"b".as("a"), $"a".as("b")))
      .localCheckpoint(true)
    val deg = und.groupBy($"a".as("node")).agg(count(lit(1)).as("degree"))
      .localCheckpoint(true)
    def round(cur: DataFrame, k: Int): DataFrame = und
      .join(cur.select($"node".as("a")), Seq("a"), "left_semi")
      .join(cur.select($"node".as("b")), Seq("b"), "left_semi")
      .groupBy($"a").agg(count(lit(1)).as("d"))
      .filter($"d" >= k)
      .select($"a".as("node"))
    def peel(start: DataFrame, k: Int): DataFrame = {
      // Early exit on stability: each round's output is a SUBSET of its
      // input (deg-≥-k within the surviving subgraph), so equal counts ⇔
      // equal sets, and once stable every remaining fixed round — here and
      // in the unrolled oracle — is a provable no-op. The fixed
      // KcorePeelRounds cap stays the oracle-equivalence contract; the
      // loop just stops paying for rounds that cannot change anything.
      var cur = start.localCheckpoint(true)
      var n = cur.count()
      var stable = false
      var i = 0
      while (!stable && i < KcorePeelRounds) {
        val nxt = round(cur, k).localCheckpoint(true)
        val m = nxt.count()
        stable = m == n
        cur = nxt; n = m; i += 1
      }
      // Refusing beats silently emitting an unfinished peel (which would
      // OVERSTATE coreness — the one error direction this audit must not
      // have).
      if (!stable && round(cur, k).count() != n)
        throw new IllegalStateException(
          s"k-core: peeling did not stabilize within $KcorePeelRounds " +
            s"rounds for k=$k (raise KcorePeelRounds)")
      cur
    }
    val cores = (2 to KcoreMax).scanLeft(deg.select($"node")) {
      case (prev, k) => peel(prev, k)
    }.tail
    val res = cores.zipWithIndex
      .foldLeft(deg) { case (acc, (core, i)) =>
        acc.join(core.withColumn(s"in${i + 2}", lit(1L)), Seq("node"), "left")
      }
      .select($"node".as("doc_id"), $"degree",
        (2 to KcoreMax).map(k => coalesce(col(s"in$k"), lit(0L)))
          .foldLeft(lit(1L))(_ + _).as("coreness"))
    freeing(res) // invariants are checkpoint-backed; ContextCleaner frees
  }

  /** k-core decomposition of the LSH near-dup graph. Output: (doc_id,
    * degree, coreness) per graph node, coreness in [1, [[KcoreMax]]]. */
  def qGraphKcore(spark: SparkSession, dir: String): DataFrame =
    kcoreFrom(lshEdges(spark, dir))

  /** Jaccard threshold for the prefix-filtering join (e4). Deliberately
    * HIGHER than [[JaccThresholdE4]]: prefix length is n·(1−τ)+1, so the
    * technique's candidate pruning only bites at high thresholds — which
    * is exactly where a production pipeline deploys it. */
  private[graft] val PpjoinTauE4 = 5000L

  /** THE scale-safe exact-verification shape every candidate-verify tier
    * must use (factored from qDedupPpjoin/qDedupCalibration so the next
    * tier can't drift from it): given the capped postings index
    * `ex(doc_id, n, s)` and an oriented candidate frame `cand(da, db)`
    * with da < db, slim the index to docs on ANY candidate edge first
    * (one semi-join — AQE broadcasts the candidate-doc set, which
    * near-dup density keeps small), count common shingles with ONE
    * self-join on the shingle hash among those docs, and keep exactly the
    * candidate pairs. Returns (da, db, common, na, nb, jacc_e4) for every
    * candidate pair with ≥1 common shingle; zero-overlap candidates are
    * absent (callers restore them with a LEFT join when the tier must
    * report its full input). The widest shuffle is candidate-doc-bounded —
    * the full index is never shuffled twice, and nothing is all-pairs. */
  private def exactOverlaps(
      ex: DataFrame, cand: DataFrame, parts: Int = 0): DataFrame = {
    val candDocs = cand.select($"da".as("doc_id"))
      .unionAll(cand.select($"db".as("doc_id"))).distinct()
    val exC0 = ex.join(candDocs, Seq("doc_id"), "left_semi")
    // Optional data-proportional width for the verification self-join:
    // with the session's fixed partition count, the per-task sort working
    // set of the postings-on-shingle join grows linearly with the corpus
    // and eventually spills (measured 45 GB memory spill at the 100×
    // curve point). Callers that know the materialized input size pass a
    // width; the common-shingle pair rows collapse map-side in the
    // partial aggregate, so only the join itself needs the extra width.
    val exC = if (parts > 0) exC0.repartition(parts, $"s") else exC0
    val joined = exC.select($"doc_id".as("da"), $"n".as("na"), $"s")
      .join(exC.select($"doc_id".as("db"), $"n".as("nb"), $"s"), Seq("s"))
      .filter($"da" < $"db")
    // The common-count aggregate is the other task-memory cliff: a pair
    // sharing k shingles lands in k DIFFERENT s-partitions, so the
    // map-side partial collapses almost nothing and the FINAL aggregate
    // at the session's fixed width holds ~all pair rows per task
    // (measured 18 GB spill at 100× with 32 partitions). Repartitioning
    // the join output by the pair key at the caller's width makes the
    // aggregate plan COMPLETE at that width — same rows over the wire
    // (the partial was a no-op), no narrow final stage.
    val pre = if (parts > 0) joined.repartition(parts, $"da", $"db") else joined
    pre.groupBy($"da", $"db")
      .agg(count(lit(1)).as("common"), max($"na").as("na"), max($"nb").as("nb"))
      .join(cand, Seq("da", "db"), "left_semi")
      .withColumn("jacc_e4",
        floor($"common" * 10000L / ($"na" + $"nb" - $"common")).cast("long"))
  }

  /** Prefix-filtering set-similarity join (the PPJoin family — Chaudhuri
    * et al. 2006 / Xiao et al. 2008, public papers; see PAPERS.md) — the
    * second provably-COMPLETE candidate generator next to LSH banding
    * (banding is probabilistic-recall; prefix filtering is exact): order
    * every document's shingles by a GLOBAL rarity order (corpus DF asc,
    * hash asc), index only each document's first n − ⌈τ·n⌉ + 1 shingles,
    * and join prefixes. The prefix lemma guarantees any pair with
    * J ≥ τ shares a prefix shingle — so the candidate set is a superset
    * of the answer (completeness spec-checked against the exact-jaccard
    * tier), while rare-first ordering keeps it small. Candidates verify
    * by exact Jaccard over the full postings; below-τ candidates stay
    * visible with a false verdict (the pruning-efficiency report).
    *
    * Plan: corpus DF aggregate → per-doc rank window (bounded by a doc's
    * shingles) → prefix self-equi-join on the shingle hash → per-candidate
    * exact verify (two equi-joins on the session-shared capped index).
    * The widest shuffle carries prefix rows — strictly fewer than the full
    * postings join [[qDedupJaccard]] pays. */
  /** The PPJoin prefix index over a capped postings index `ex(doc_id, n,
    * s)`: rank each document's shingles by GLOBAL rarity (corpus DF asc,
    * hash asc) and keep the first n − ⌈τ·n⌉ + 1 — the prefix lemma's
    * candidate-complete minimum. Rare-first ordering is the skew defense:
    * a corpus-dominant shingle ranks LAST in every document, so it enters
    * a prefix only for documents too short to exclude anything — and the
    * DF cap upstream has already dropped true stop-phrase shingles
    * entirely (spec: DedupSkewSpec). */
  private[graft] def ppjoinPrefix(ex: DataFrame, tauE4: Long): DataFrame = {
    val dfs = ex.groupBy($"s").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy($"doc_id").orderBy($"df", $"s")
    ex.join(dfs, Seq("s"))
      .withColumn("rk", row_number().over(wDoc))
      .filter($"rk" <= $"n" - expr(s"($tauE4 * n + 9999) div 10000") + 1L)
      .select($"doc_id", $"s")
  }

  def qDedupPpjoin(spark: SparkSession, dir: String): DataFrame = {
    val ex = cappedIndex(spark, dir)
    // Both sides of the candidate self-join read the prefix index — one
    // materialized copy beats running the DF join + rank window twice.
    // No separate materializing count (round 17): the expansion aggregate
    // (memo cold) or the candidate join's first side fills the persisted
    // prefix cache; per-partition block locking keeps the fill single.
    val prefix = ppjoinPrefix(ex, PpjoinTauE4).persist()
    // Expansion-proportional shuffle width for the two self-joins: the
    // per-task working set that outgrows the executor at 100× of the
    // fixture (measured 45 GB memory / 7 GB disk spill under the
    // session's fixed 32 partitions) is the PAIR EXPANSION — each
    // shingle of prefix-frequency c emits ~c² join rows into its task's
    // partial-aggregate hash table — not the input row count (20M prefix
    // rows at 100× would justify 32 tasks; their ~2G pair rows do not).
    // Engage + width via the shared memory-keyed [[pairJoinWidth]]
    // (round 14: the engage trigger reads estimated per-task working set
    // vs execution budget, not a raw expansion count — the 10× point's
    // working set fits the budget and keeps the reused-exchange plan).
    // Σc² is one cheap aggregate over the already-cached prefix frame,
    // memoized per (session, dir) so plan-only consumers pay it once.
    val expansion = expansionMemo.getOrElseUpdate(spark, dir + ":prefix")(
      pairExpansionOf(prefix))
    // 0 = the session width holds the working set: keep the original
    // reused-exchange plan (see pairJoinWidth).
    val parts = pairJoinWidth(spark, expansion, PpjoinPairRowBytes)
    val wide = if (parts > 0) prefix.repartition(parts, $"s") else prefix
    val cand0 = wide.toDF("da", "s")
      .join(wide.toDF("db", "s"), Seq("s"))
      .filter($"da" < $"db")
      .select($"da", $"db")
    val cand = (if (parts > 0) cand0.repartition(parts, $"da", $"db") else cand0)
      .distinct()
      .persist() // filled by the verification join's first read
    // Verification: the shared slim-first shape ([[exactOverlaps]]).
    val res = exactOverlaps(ex, cand, parts)
      .select($"da", $"db", $"common", $"jacc_e4",
        ($"jacc_e4" >= PpjoinTauE4).as("is_dup"))
    freeing(res, prefix, cand)
  }

  /** Token budget for [[qPipelineCurate]]'s final selection stage. */
  private val CurateBudget = 50000L

  /** THE composed curation pipeline — the three big stages of corpus
    * assembly chained in ONE plan, the way a production job runs them:
    * quality gate (≥20 tokens, punctuation density < 5%) → near-dup
    * collapse (among quality PASSERS of each CC cluster, the min-doc_id
    * representative survives — dedup after filtering, so a cluster whose
    * head fails quality still keeps its best passing member) →
    * quality-ranked token-budget selection over the representatives
    * (stopword-ratio score, banded two-pass prefix sum — the same
    * scale-honest decomposition [[graft.queries.TextAnalysis.qTxtBudget]]
    * proves against its global-running-sum oracle). Every document stays
    * visible with its per-stage verdicts — a curation manifest, not just
    * the survivors. Refuses a non-converged label partition like the
    * survivors deliverable.
    *
    * Plan: one narrow quality projection; LEFT join of the session-shared
    * CC labels; per-group min among passers; banded prefix sum over the
    * ≤101-band frame; one restoring LEFT join. No corpus rescan, no
    * global window. */
  def qPipelineCurate(spark: SparkSession, dir: String): DataFrame = {
    val cc = clusterLabelsOf(spark, dir)
    requireConverged(cc, "curate")
    val toks = TextHash.tokens($"text")
    val q = Tables.documents(spark, dir)
      .select($"doc_id",
        size(toks).cast("long").as("n_toks"),
        floor((length($"text") - length(regexp_replace($"text", "[.,!?;:]", "")))
          .cast("long") * 10000L / length($"text")).cast("long").as("punct_e4"),
        floor(size(filter(toks, t => t.isin(TextAnalysis.Stopwords: _*)))
          .cast("long") * 10000L / size(toks)).cast("long").as("score"))
      .withColumn("passes", $"n_toks" >= 20L && $"punct_e4" < 500L)
      .join(cc.labels, Seq("doc_id"), "left")
      .withColumn("group_id", coalesce($"cluster_id", $"doc_id"))
      .persist()
    q.count()
    val reps = q.filter($"passes")
      .groupBy($"group_id").agg(min($"doc_id").as("rep_id"))
    val marked = q.join(reps, Seq("group_id"), "left")
      .withColumn("is_rep", $"passes" && $"doc_id" === $"rep_id")
    val repsOnly = marked.filter($"is_rep")
      .withColumn("band", expr("score div 100"))
      .persist()
    repsOnly.count()
    val wBands = Window.orderBy($"band".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = repsOnly.groupBy($"band")
      .agg(sum($"n_toks").as("band_tokens"))
      .withColumn("band_offset",
        coalesce(sum($"band_tokens").over(wBands), lit(0L)))
      .select($"band", $"band_offset")
    val wInBand = Window.partitionBy($"band").orderBy($"score".desc, $"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = repsOnly.join(broadcast(offsets), Seq("band"))
      .withColumn("cum_tokens", $"band_offset" + sum($"n_toks").over(wInBand))
      .select($"doc_id", $"cum_tokens")
    val res = marked
      .join(cum, Seq("doc_id"), "left")
      .select($"doc_id", $"n_toks", $"score",
        $"passes".as("passes_quality"),
        $"is_rep".as("is_representative"),
        $"cum_tokens",
        coalesce($"cum_tokens" <= CurateBudget, lit(false)).as("kept"))
    freeing(res, q, repsOnly)
  }

  /** THE COMPOSED ADMISSION MOUTH — every gate a crawl batch passes on
    * its way into a training corpus, in ONE plan with per-stage verdicts
    * (what the streaming crawl mouth executes per micro-batch, here as
    * the oracle-checkable batch face over the [[NewSources]] batch):
    *
    *  1. quality — the same ≥20-token / punct-density<5% rules as
    *     [[qPipelineCurate]]'s gate;
    *  2. language — [[TextAnalysis.langPred]]'s marker vote; a doc with
    *     no recognized language (`und`) is rejected;
    *  3. near-dup — the dedup gate ([[graft.ops.CorpusDedup
    *     .scoreBatchAgainstIndex]]) verdicts the quality+language
    *     PASSERS against the stored base index + smaller-id passer
    *     batch-mates (dedup after filtering, like curate: a batch
    *     template whose head fails quality still admits its best
    *     passing member);
    *  4. semantic novelty — dedup-novel passers with an embedding get
    *     the exact best cosine over the stored corpus AND smaller-id
    *     batch mates (the same min-id survivor rule as stage 3 and the
    *     streaming mouth; the oracle-reproducible verifier — production
    *     probes the stored IVF, same contract as
    *     [[graft.queries.Similarity.qSimGate]]); a doc without an
    *     embedding skips the stage (`sem_novel` NULL, admitted on the
    *     text gates alone), and a doc with NO neighbor at all (first
    *     crawl into a fresh corpus) is maximally novel, never a
    *     NULL-rejection.
    *
    * One row per batch doc — an admission MANIFEST, not just survivors:
    * every stage's verdict stays visible, later stages NULL when an
    * earlier stage already rejected (they were never evaluated, and the
    * streaming mouth would never pay for them).
    *
    * Scale: stages 1–2 are narrow projections over the batch only;
    * stage 3 is the gate's band-bucket equi-joins (O(batch) raw-text
    * work); stage 4 is a broadcast(bounded batch) × stored-embeddings
    * scan, the same bounded nested loop as the ANN gate. The corpus is
    * never shuffled; only stage 3's stored-artifact probe reads it. */
  def qPipelineAdmit(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextHash.tokens($"text")
    val batch = Tables.documents(spark, dir)
      .filter($"source".isin(NewSources: _*))
      .select($"doc_id", $"text",
        size(toks).cast("long").as("n_toks"),
        floor((length($"text") -
            length(regexp_replace($"text", "[.,!?;:]", "")))
          .cast("long") * 10000L / length($"text")).cast("long")
          .as("punct_e4"),
        TextAnalysis.langPred(toks).as("lang_pred"))
      .withColumn("quality_ok", $"n_toks" >= 20L && $"punct_e4" < 500L)
      .withColumn("lang_ok", $"lang_pred" =!= "und")
      .persist()
    batch.count()
    val passers = batch.filter($"quality_ok" && $"lang_ok")
      .select($"doc_id", $"text")
    val dedupV = graft.ops.CorpusDedup.scoreBatchAgainstIndex(
        passers, "doc_id", "text", gateIndexFor(spark, dir))
      .select($"doc_id", (!$"is_novel").as("is_dup"), $"best_est_e4")
    val emb = Tables.embeddings(spark, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    // stored side: embeddings of docs NOT in the batch (non-passer batch
    // docs are not in the corpus either — they must not vouch for novelty)
    val stored = emb
      .join(batch.select($"doc_id".as("vec_id")), Seq("vec_id"), "left_anti")
      .select($"vec_id".as("nb"), $"v".as("nv"), Similarity.norm($"v").as("nn"))
    val semQ = dedupV.filter(!$"is_dup").select($"doc_id")
      .join(emb, $"doc_id" === $"vec_id")
      .select($"doc_id".as("qid"), $"v".as("qv"), Similarity.norm($"v").as("qn"))
    val storedBest = broadcast(semQ).join(stored)
      .withColumn("cos_e4",
        floor(Similarity.dot($"qv", $"nv") / ($"qn" * $"nn") * 10000L)
          .cast("long"))
      .groupBy($"qid").agg(max($"cos_e4").as("stored_best_e4"))
    // smaller-id batch mates — the SAME min-id survivor rule the dedup
    // stage and the streaming mouth apply (scoreBatchAgainstIvf's mates
    // path): a twice-submitted embedding admits exactly one copy
    val mateBest = semQ
      .join(semQ.select($"qid".as("o"), $"qv".as("nv"), $"qn".as("nn")),
        col("o") < $"qid")
      .withColumn("cos_e4",
        floor(Similarity.dot($"qv", $"nv") / ($"qn" * $"nn") * 10000L)
          .cast("long"))
      .groupBy($"qid").agg(max($"cos_e4").as("mate_best_e4"))
    // greatest() skips nulls on both engines; NULL overall (no stored
    // neighbor, no smaller-id mate — e.g. the FIRST crawl into a fresh
    // corpus) means maximally novel, never a rejection
    val semBest = semQ.select($"qid")
      .join(storedBest, Seq("qid"), "left")
      .join(mateBest, Seq("qid"), "left")
      .select($"qid",
        greatest($"stored_best_e4", $"mate_best_e4").as("sem_best_e4"))
    val res = batch
      .join(dedupV, Seq("doc_id"), "left")
      .join(emb.select($"vec_id".as("doc_id"), lit(true).as("has_emb0")),
        Seq("doc_id"), "left")
      .join(semBest.select($"qid".as("doc_id"), $"sem_best_e4"),
        Seq("doc_id"), "left")
      .withColumn("has_emb", coalesce($"has_emb0", lit(false)))
      .select($"doc_id", $"n_toks", $"punct_e4", $"quality_ok",
        $"lang_pred", $"lang_ok", $"is_dup", $"best_est_e4", $"has_emb",
        $"sem_best_e4",
        when($"is_dup" === false && $"has_emb",
          coalesce($"sem_best_e4" < Similarity.NearDupE4, lit(true)))
          .as("sem_novel"),
        coalesce($"quality_ok" && $"lang_ok" && !$"is_dup" &&
          (!$"has_emb" ||
            coalesce($"sem_best_e4" < Similarity.NearDupE4, lit(true))),
          lit(false)).as("admitted"))
      .orderBy($"doc_id")
    freeing(res, batch)
  }

  /** MinHash calibration audit — the estimator-quality report that decides
    * whether [[TextHash.MinhashK]] signatures are enough before anyone
    * trusts the LSH tiers: for EVERY banding candidate pair, the minhash
    * estimate next to the exact capped-index Jaccard and the signed error
    * (estimate − exact, in e4). The error distribution is the dial for k
    * (more hashes → tighter) and for the band/row split (recall); a pair
    * the banding nominated whose exact overlap is ZERO post-cap stays
    * visible with jacc 0 — that's the false-positive rate, not noise.
    *
    * Plan: the candidate frame comes from the session-shared LSH pipeline;
    * the exact side slims the postings index to candidate docs with one
    * semi-join, self-joins the slim index on the shingle hash (per-
    * candidate pricing, like the edit/substring tiers), and the
    * zero-overlap candidates are restored by a LEFT join. Nothing is
    * all-pairs and the full index is never shuffled twice. */
  def qDedupCalibration(spark: SparkSession, dir: String): DataFrame = {
    val scoredRaw = lshScoredPairs(spark, dir)
    // Two readers below (overlap input + the restoring LEFT join) — one
    // materialized copy beats running the band self-join twice.
    val scored = scoredRaw.persist() // filled by the overlap join's first read
    // Exact side: the shared slim-first verification shape
    // ([[exactOverlaps]], same as qDedupPpjoin); zero-overlap candidates
    // are restored by the LEFT join below — that's the false-positive
    // rate, which this audit must report, not hide.
    val overlaps =
      exactOverlaps(cappedIndex(spark, dir), scored.select($"da", $"db"))
    val res = scored
      .join(overlaps, Seq("da", "db"), "left")
      .select($"da", $"db", $"n_eq", $"est_e4",
        coalesce($"common", lit(0L)).as("common"),
        coalesce($"jacc_e4", lit(0L)).as("jacc_e4"),
        ($"est_e4" - coalesce($"jacc_e4", lit(0L))).as("err_e4"))
    freeing(res, scored)
  }

  /** Positional gram width and the shared-run verdict threshold (in
    * tokens) for [[qDedupSubstr]] — 20 tokens is the fixture-scaled analog
    * of the 50-token production threshold (Lee et al. 2021). */
  private[graft] val SubstrGram = 8
  private[graft] val SubstrRunTokens = 20L

  /** Exact-substring evidence over the LSH candidate edges — the
    * ExactSubstr tier of Lee et al. 2021, "Deduplicating Training Data
    * Makes Language Models Better" (public paper; see PAPERS.md), sitting
    * between the MinHash ESTIMATE that nominated the edge and the O(L²)
    * Levenshtein confirmation ([[qDedupEditdist]]): for each candidate
    * pair, align the two documents' POSITIONAL 8-token-gram fingerprints
    * and measure the longest run of consecutive shared grams — a run of r
    * grams is a verbatim shared span of r+7 tokens, the "copied passage"
    * signal that survives unrelated surrounding text (which dilutes
    * Jaccard) and costs O(matches·log) rather than O(L²).
    *
    * Run detection is the gaps-and-islands trick per match diagonal
    * (pa − pb): consecutive shared positions share (pa − row_number), so
    * one window + two hash aggregates find every maximal run. Every
    * window/group key contains the edge (a, b) — per-edge bounded work,
    * skew-free, priced strictly against the candidate list like the edit
    * tier (an edge with NO shared gram stays visible with zeros; a
    * verification tier must never under-report its input). */
  def qDedupSubstr(spark: SparkSession, dir: String): DataFrame =
    substrVerifyFrom(Tables.documents(spark, dir), lshEdges(spark, dir))

  /** Frame-parametric core of [[qDedupSubstr]] over any `(doc_id, text)`
    * docs frame and oriented `(a, b)` pair frame — shared by the registry
    * path and [[graft.ops.CorpusDedup.substrVerify]]. A pair citing an id
    * absent from `docs` contributes no gram matches and stays visible
    * with zeros (the verification-tier under-reporting discipline). */
  private[graft] def substrVerifyFrom(docs: DataFrame, edges: DataFrame): DataFrame = {
    val grams = docs
      .select($"doc_id", TextHash.tokens($"text").as("w"))
      .select($"doc_id", posexplode(transform(
        sequence(lit(0), greatest(size($"w") - SubstrGram, lit(0))),
        i => TextHash.h32(concat_ws(" ",
          (0 until SubstrGram).map(j => try_element_at($"w", i + j + 1)): _*)))))
      .select($"doc_id", ($"pos" + 1).cast("long").as("p"), $"col".as("g"))
    val w = Window.partitionBy($"a", $"b", $"d").orderBy($"pa")
    val runs = edges
      .join(grams.select($"doc_id".as("a"), $"p".as("pa"), $"g"), Seq("a"))
      .join(grams.select($"doc_id".as("b"), $"p".as("pb"), $"g"), Seq("b", "g"))
      .withColumn("d", $"pa" - $"pb")
      .withColumn("grp", $"pa" - row_number().over(w))
      .groupBy($"a", $"b", $"d", $"grp").agg(count(lit(1)).as("run"))
      .groupBy($"a", $"b")
      .agg(sum($"run").as("n_shared"),
           countDistinct($"d").as("n_diag"),
           max($"run").as("max_run"))
    edges.join(runs, Seq("a", "b"), "left")
      .select($"a", $"b",
        coalesce($"n_shared", lit(0L)).as("n_shared"),
        coalesce($"n_diag", lit(0L)).as("n_diag"),
        coalesce($"max_run", lit(0L)).as("max_run_grams"),
        coalesce($"max_run" + (SubstrGram - 1), lit(0L)).as("max_run_tokens"))
      .withColumn("is_substr_dup", $"max_run_tokens" >= SubstrRunTokens)
  }

  /** Leakage-free train/val/test split assignment — the dataset-assembly
    * step the contamination audit exists to protect: a document and its
    * near-duplicates must land in the SAME split (a near-dup of a training
    * document sitting in the eval split is leakage the n-gram audit would
    * only catch after the fact). Split is decided by a portable hash of
    * the near-dup GROUP id (the CC cluster label; singletons group as
    * themselves), 80/10/10 — so the assignment is reproducible and
    * structurally leak-free: split is a pure function of group_id.
    * Refuses a non-converged label partition — two same-cluster docs
    * still carrying different labels could straddle splits, which is
    * exactly the leak this operator exists to prevent.
    *
    * Scale: one LEFT join of documents against the CC labels (both on
    * doc_id) + a narrow hash projection. Rides the session-shared labels. */
  def qDedupSplit(spark: SparkSession, dir: String): DataFrame = {
    val cc = clusterLabelsOf(spark, dir)
    requireConverged(cc, "split")
    val res = Tables.documents(spark, dir).select($"doc_id", $"source")
      .join(cc.labels, Seq("doc_id"), "left")
      .withColumn("group_id", coalesce($"cluster_id", $"doc_id"))
      .withColumn("bucket",
        TextHash.h60(concat($"group_id".cast("string"), lit("-split"))) % 100L)
      .select($"doc_id", $"source", $"group_id",
        when($"bucket" < 80L, "train")
          .when($"bucket" < 90L, "val")
          .otherwise("test").as("split"))
    freeing(res)
  }

  /** Cross-source near-dup overlap matrix — which ingest sources duplicate
    * each other: every LSH edge labeled with its endpoints' sources
    * (unordered pair), counted per source pair. The audit that tells a
    * crawl pipeline which feeds to dedup against each other first (and
    * feeds the mixture-weighting step: a source whose mass is mostly
    * another source's near-dups contributes less unique signal than its
    * token count suggests). Diagonal rows (source_lo = source_hi) are
    * within-source duplication.
    *
    * Scale: two doc_id equi-joins against the session-shared edge list +
    * one hash aggregate on the ≤|sources|² pair domain — cost rides the
    * edge count, nothing touches the corpus. */
  def qDedupSourceMatrix(spark: SparkSession, dir: String): DataFrame = {
    val src = Tables.documents(spark, dir).select($"doc_id", $"source")
    val res = lshEdges(spark, dir)
      .join(src.select($"doc_id".as("a"), $"source".as("src_a")), Seq("a"))
      .join(src.select($"doc_id".as("b"), $"source".as("src_b")), Seq("b"))
      .select(least($"src_a", $"src_b").as("source_lo"),
              greatest($"src_a", $"src_b").as("source_hi"))
      .groupBy($"source_lo", $"source_hi")
      .agg(count(lit(1)).as("n_edges"))
    freeing(res)
  }

  /** Per-source dedup-rate report over the survivors deliverable — the
    * summary a curation pipeline prints after [[qDedupSurvivors]]: per
    * source, how many documents it contributed, how many survived the
    * near-dup collapse, how many were absorbed into another document's
    * cluster, and the drop rate in e4. One LEFT join of `documents`
    * against the (tiny) non-representative node set + one per-source hash
    * aggregate — nothing beyond the CC loop's own cost. */
  def qDedupRates(spark: SparkSession, dir: String): DataFrame = {
    val cc = clusterLabelsOf(spark, dir)
    requireConverged(cc, "dedup rates")
    val dropped = cc.labels.filter($"doc_id" =!= $"cluster_id")
      .select($"doc_id").withColumn("is_dropped", lit(true))
    val res = Tables.documents(spark, dir).select($"doc_id", $"source")
      .join(dropped, Seq("doc_id"), "left")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
           sum(when($"is_dropped", 1L).otherwise(0L)).as("n_dropped"))
      .select($"source", $"n_docs", ($"n_docs" - $"n_dropped").as("n_kept"),
        $"n_dropped",
        expr("(n_dropped * 10000) div n_docs").as("drop_e4"))
    freeing(res)
  }

  /** Normalized-edit-distance ceiling (of the longer text, in e4) for an
    * LSH candidate edge to be confirmed by [[qDedupEditdist]]. */
  val EditDupE4 = 2000L

  /** Character-level edit-distance verification of the LSH candidate
    * edges — the exact-similarity confirmation tier a fuzzy-dedup pipeline
    * runs AFTER candidate generation (MinHash estimates shingle-set
    * overlap; Levenshtein certifies the actual character-level edit span,
    * catching reordered-but-same-set false positives). Emits, per edge,
    * the raw distance, the normalized distance against the longer text
    * (e4), and the confirmation verdict at [[EditDupE4]].
    *
    * Scale: Levenshtein is O(|a|·|b|) PER PAIR — the textbook reason it can
    * never be the candidate generator (all-pairs would be O(n²·L²)) and is
    * priced here strictly per LSH edge: cost = |edges| · L², with the edge
    * list already bounded by the banding collision rate. The texts join
    * onto the edge list by doc_id (two equi-joins against the session-
    * shared graph), and a production run caps L by comparing normalized
    * prefixes (same plan, a `substring` on the join projection). */
  /** Edit-distance verification over any oriented pair frame `(a, b)`
    * against a `(doc_id, text)` docs frame — the frame-parametric core
    * shared by the registry path and [[graft.ops.CorpusDedup.editVerify]].
    * Two empty texts are identical (distance 0, confirmed), not a NULL
    * division. `joinType = "left"` (the facade) keeps pairs whose ids are
    * absent from `docs` as visible unverifiable rows (NULL metrics and
    * verdict) instead of silently dropping them — a verification tier
    * must never under-report its input. */
  private[graft] def editVerifyFrom(
      docs: DataFrame, pairs: DataFrame, joinType: String = "inner"): DataFrame =
    pairs
      .join(docs.select($"doc_id".as("a"), $"text".as("ta")), Seq("a"), joinType)
      .join(docs.select($"doc_id".as("b"), $"text".as("tb")), Seq("b"), joinType)
      .select($"a", $"b",
        levenshtein($"ta", $"tb").cast("long").as("lev"),
        greatest(length($"ta"), length($"tb")).cast("long").as("max_len"))
      .withColumn("dist_e4",
        when($"max_len" === 0L, 0L).otherwise(expr("(lev * 10000) div max_len")))
      .withColumn("is_dup", $"dist_e4" <= EditDupE4)

  def qDedupEditdist(spark: SparkSession, dir: String): DataFrame =
    freeing(editVerifyFrom(
      Tables.documents(spark, dir).select($"doc_id", $"text"),
      lshEdges(spark, dir)))

  /** Measurement hook for the scale lane ONLY ([[graft.tools.ScaleBench]]):
    * forget the per-JVM stored-index locations so a "fully cold" run
    * rebuilds them. The build-once/read-many memo is the correct
    * production behavior, but it breaks the lane's cost attribution
    * asymmetrically — the sf0.1 baseline's min-of-two runs skips the
    * build while the single 10× run pays it, inflating growth ratios
    * (observed 12.65× on q_dedup_index_append where the true
    * build-inclusive growth is ~3×). */
  private[graft] def resetStoredIndexMemos(): Unit = {
    appendIndexCache.synchronized(appendIndexCache.clear())
    compactIndexCache.synchronized(compactIndexCache.clear())
    mergeIndexCache.synchronized(mergeIndexCache.clear())
    forgetIndexCache.synchronized(forgetIndexCache.clear())
    restateIndexCache.synchronized(restateIndexCache.clear())
    maintainIndexCache.synchronized(maintainIndexCache.clear())
    // the shared base index the gate/append/probe families split the
    // build of: a warm base would make the lane's "cold" runs cost only
    // the copy, breaking the build-inclusive growth attribution
    baseIndexCache.synchronized(baseIndexCache.clear())
  }

  /** Whole-corpus stored index for the probe queries ([[qDedupIndexed]],
    * [[qDedupPpjoinIndexed]] and their bench forms): the SAME lineage the
    * ingestion queries build — base-corpus `buildIndex` + O(batch)
    * [[graft.ops.CorpusDedup.appendToIndex]] of the [[NewSources]] batch —
    * rather than a second, from-scratch whole-corpus build. The two are
    * bit-identical by construction ([[qDedupIndexAppend]]'s full-outer
    * all-columns pin against the from-scratch generator is the oracle-gated
    * proof), so the probes read the index a production pipeline would
    * actually have on disk, and the suite prices ONE corpus tokenize pass
    * for the whole stored-index family instead of two. Each probe's own
    * in-plan `stored_ok` recompute still verdicts this lineage
    * independently — a divergence fails BOTH the append pin and the probe
    * gates. */
  private def storedIndexFor(
      spark: SparkSession, dir: String): graft.ops.CorpusDedup.DedupIndex =
    appendedIndexFor(spark, dir)

  /** Stored-index lifecycle proof: the edit-distance verification tier
    * (same output contract as [[qDedupEditdist]]) runs over the PERSISTED
    * candidate edges (base-corpus [[graft.ops.CorpusDedup.buildIndex]] +
    * [[graft.ops.CorpusDedup.appendToIndex]] of the new batch — see
    * [[storedIndexFor]]) instead of the session-recomputed
    * LSH pipeline, plus an in-plan `stored_ok` verdict — a full-outer
    * compare of the stored edge set against the recomputed one, broadcast
    * back onto every row (1-row bounded aggregate; the DuckDB oracle
    * recomputes the edges from first principles and expects TRUE). A
    * stored/recomputed divergence — a stale or corrupted index — flips the
    * verdict and fails the hash gate.
    *
    * Scale: verification is priced per stored candidate edge exactly like
    * [[qDedupEditdist]]; the index build cost is paid once at write time,
    * which is the point of the lifecycle. */
  def qDedupIndexed(spark: SparkSession, dir: String): DataFrame = {
    val stored = storedIndexFor(spark, dir).nearDupEdges
    val live = lshEdges(spark, dir)
    val mism = stored.withColumn("st", lit(1))
      .join(live.withColumn("lv", lit(1)), Seq("a", "b"), "full")
      .agg(sum(when($"st".isNull || $"lv".isNull, 1L).otherwise(0L))
        .as("n_mismatch"))
    val ev = editVerifyFrom(
      Tables.documents(spark, dir).select($"doc_id", $"text"), stored)
    freeing(ev.crossJoin(broadcast(mism))
      .select($"a", $"b", $"lev", $"max_len", $"dist_e4", $"is_dup",
        ($"n_mismatch" === 0L).as("stored_ok")))
  }

  /** Stored-index lifecycle for the PPJoin tier: candidate generation
    * runs over the PERSISTED rarity-ordered prefix index and verification
    * over the PERSISTED DF-capped postings ([[graft.ops.CorpusDedup
    * .buildIndex]] writes both bucketed on the shingle hash `s`), so the
    * probe plan carries NO tokenize pass and NO corpus-DF aggregate — the
    * two corpus-wide costs the index moved to write time — and the prefix
    * self-join needs no exchange on either side (bucket-spec scans;
    * spec-asserted in DedupIndexSpec). Output contract = [[qDedupPpjoin]]
    * plus the in-plan `stored_ok` verdict: a full-outer compare of the
    * stored prefix index against the recomputed definition, broadcast
    * back onto every row (1-row bounded aggregate; the DuckDB oracle
    * recomputes from first principles and expects TRUE), so a stale or
    * corrupted prefix artifact flips the verdict and fails the hash gate.
    *
    * Scale: this is the 100-TB shape for the heaviest dedup query in the
    * measured 100× lane (`q_dedup_ppjoin`, 87 s / 5.7 GB shuffle at 100×,
    * most of it the prefix build) — the probe itself prices only
    * |prefix| join rows + per-candidate verification. */
  def qDedupPpjoinIndexed(spark: SparkSession, dir: String): DataFrame = {
    val stored = storedIndexFor(spark, dir)
    val pfx = stored.prefix
    val cand = pfx.select($"doc_id".as("da"), $"s")
      .join(pfx.select($"doc_id".as("db"), $"s"), Seq("s"))
      .filter($"da" < $"db")
      .select($"da", $"db").distinct()
      .persist() // filled by the verification join's first read
    val live = ppjoinPrefix(cappedIndex(spark, dir), PpjoinTauE4)
    val mism = pfx.withColumn("st", lit(1))
      .join(live.withColumn("lv", lit(1)), Seq("doc_id", "s"), "full")
      .agg(sum(when($"st".isNull || $"lv".isNull, 1L).otherwise(0L))
        .as("n_mismatch"))
    val res = exactOverlaps(stored.capped, cand)
      .crossJoin(broadcast(mism))
      .select($"da", $"db", $"common", $"jacc_e4",
        ($"jacc_e4" >= PpjoinTauE4).as("is_dup"),
        ($"n_mismatch" === 0L).as("stored_ok"))
    freeing(res, cand)
  }

  /** Memoized appended-index dir for [[qDedupIndexAppend]]: the stored
    * index is BUILT over the base corpus (sources outside [[NewSources]])
    * and the [[NewSources]] batch is then APPENDED incrementally
    * ([[graft.ops.CorpusDedup.appendToIndex]] — batch-only tokenize,
    * band-bucket probe against the stored `bands/` artifact). Keyed by
    * fixture dir per JVM like [[baseIndexCache]]. */
  private val appendIndexCache = scala.collection.mutable.Map.empty[String, String]
  private def appendedIndexFor(
      spark: SparkSession, dir: String): graft.ops.CorpusDedup.DedupIndex = {
    val out = appendIndexCache.synchronized {
      appendIndexCache.getOrElseUpdate(dir, {
        // File COPY of the shared base index (the memo the gate reads in
        // place must stay unmutated), then the O(batch) append — the copy
        // is IO, the build it replaces was a full shingle/MinHash/band
        // pass over the base corpus.
        val tmp = graft.ops.Walls.timed("q.append_copy")(
          graft.TempIndexDirs.copyOf(
            baseIndexFor(spark, dir), "graft-dedup-append"))
        graft.ops.Walls.timed("q.append")(graft.ops.CorpusDedup.appendToIndex(
          Tables.documents(spark, dir)
            .filter($"source".isin(NewSources: _*))
            .select($"doc_id", $"text"),
          "doc_id", "text", tmp))
        tmp
      })
    }
    graft.ops.CorpusDedup.fromIndex(spark, out)
  }

  /** 1-row mismatch count between two scored candidate-edge frames — the
    * ONE definition of "bit-identical edges" every stored-index verdict
    * (append / merge / forget / compact, registry and bench forms)
    * broadcasts into its output: full outer join on the pair key, where
    * absence from either side or a difference in any scored column
    * counts as a mismatch. */
  private def edgeMismatch(stored: DataFrame, ref: DataFrame,
                           outCol: String = "n_mismatch"): DataFrame = {
    val st = stored.select($"da", $"db", $"n_shared_bands".as("sb"),
      $"n_eq".as("se"), $"est_e4".as("sv"))
    val rf = ref.select($"da", $"db", $"n_shared_bands".as("rb"),
      $"n_eq".as("re"), $"est_e4".as("rv"))
    st.join(rf, Seq("da", "db"), "full")
      .agg(sum(when($"sb".isNull || $"rb".isNull ||
          $"sb" =!= $"rb" || $"se" =!= $"re" || $"sv" =!= $"rv", 1L)
        .otherwise(0L)).as(outCol))
  }

  /** INCREMENTAL index ingestion, oracle-gated end to end: the stored
    * index is built over the base corpus only, the [[NewSources]] batch is
    * appended through [[graft.ops.CorpusDedup.appendToIndex]] (tokenize /
    * MinHash the batch alone; candidates from the batch's band rows
    * against the stored bucketed `bands/` artifact — O(batch) raw-text
    * work, never a corpus recompute), and the output is the stored edge
    * table AFTER the append plus the in-plan `stored_ok` verdict: a
    * full-outer, all-columns compare against the from-scratch generator
    * over the whole corpus. The DuckDB oracle recomputes the full-corpus
    * candidate set from first principles and expects TRUE — so the
    * incremental path is pinned bit-identical to the batch path: a
    * missed cross-batch pair, a double-counted band, or a stale stored
    * row flips the verdict and fails the hash gate. */
  def qDedupIndexAppend(spark: SparkSession, dir: String): DataFrame = {
    val stored = appendedIndexFor(spark, dir).edges
    val liveScored = lshScoredPairs(spark, dir)
    val mism = edgeMismatch(stored, liveScored)
    val res = stored
      .crossJoin(broadcast(mism))
      .select($"da", $"db", $"n_shared_bands", $"n_eq", $"est_e4",
        ($"n_mismatch" === 0L).as("stored_ok"))
    freeing(res)
  }

  /** Memoized DEFERRED-APPEND + RESTATE dir for [[qDedupIndexRestate]]:
    * the base index is COPIED (the shared memo stays unmutated), the
    * [[NewSources]] batch is appended with `restateStats = false` — the
    * streaming faces' O(batch) mode, which leaves `capped/`/`prefix/` at
    * the pre-append generation and flags `statsStale` — and
    * [[graft.ops.CorpusDedup.restateIndexStats]] then brings the
    * statistics current, the maintenance move a gate/ingest deployment
    * schedules. The memo records whether the staleness flag was actually
    * observed between the two steps (the defer really happened). */
  private val restateIndexCache =
    scala.collection.mutable.Map.empty[String, (String, Boolean)]
  private def restatedIndexFor(
      spark: SparkSession, dir: String)
      : (graft.ops.CorpusDedup.DedupIndex, Boolean) = {
    val (out, deferred) = restateIndexCache.synchronized {
      restateIndexCache.getOrElseUpdate(dir, {
        val tmp = graft.TempIndexDirs.copyOf(
          baseIndexFor(spark, dir), "graft-dedup-restate")
        graft.ops.Walls.timed("q.restate_append")(
          graft.ops.CorpusDedup.appendToIndex(
            Tables.documents(spark, dir)
              .filter($"source".isin(NewSources: _*))
              .select($"doc_id", $"text"),
            "doc_id", "text", tmp, restateStats = false))
        val wasStale = !graft.ops.CorpusDedup.statsFresh(spark, tmp)
        graft.ops.Walls.timed("q.restate")(
          graft.ops.CorpusDedup.restateIndexStats(spark, tmp))
        (tmp, wasStale && graft.ops.CorpusDedup.statsFresh(spark, tmp))
      })
    }
    (graft.ops.CorpusDedup.fromIndex(spark, out), deferred)
  }

  /** DEFERRED-STATISTICS lifecycle, oracle-gated end to end: a
    * [[NewSources]] batch enters through the streaming faces' O(batch)
    * append (`restateStats = false` — no per-batch O(index) capped/prefix
    * rewrite), then [[graft.ops.CorpusDedup.restateIndexStats]] restates
    * the corpus statistics once, the maintenance move. Output: the stored
    * PREFIX artifact after the restate — the corpus-wide global-rarity
    * prefix order, which the DuckDB oracle recomputes from first
    * principles over the WHOLE corpus — plus two verdicts the oracle
    * expects TRUE: `was_deferred` (the staleness flag was really set
    * between append and restate, i.e. the O(batch) path was exercised,
    * not the full-restate path) and `restate_ok` (restate cleared the
    * flag). Because capped/prefix are pure functions of the postings, a
    * restate that missed rows, kept a stale generation, or applied the
    * wrong tau lands a different prefix set and fails the hash gate. */
  def qDedupIndexRestate(spark: SparkSession, dir: String): DataFrame = {
    val (stored, deferred) = restatedIndexFor(spark, dir)
    stored.prefix
      .select($"doc_id", $"s",
        lit(deferred).as("was_deferred"),
        lit(graft.ops.CorpusDedup.statsFresh(
          spark, restateIndexCache.synchronized(restateIndexCache(dir)._1)))
          .as("restate_ok"))
      .orderBy($"doc_id", $"s")
  }

  /** Memoized MAINTAINED-index dir for [[qDedupIndexMaintain]]: the base
    * index is COPIED, the [[NewSources]] batch lands through the
    * streaming faces' deferred-statistics append, and ONE
    * [[graft.ops.CorpusDedup.maintainIndex]] call plays the whole
    * maintenance schedule (vacuum → restate → compact, each gated on its
    * measured trigger); an immediate second call must report every
    * trigger clear. The memo records the four verdicts:
    * was-stale-before, fresh-after, worst-artifact fragmentation within
    * the policy bound, and second-call no-op. */
  private val maintainIndexCache =
    scala.collection.mutable.Map
      .empty[String, (String, Boolean, Boolean, Boolean, Boolean)]
  private def maintainedIndexFor(spark: SparkSession, dir: String)
      : (graft.ops.CorpusDedup.DedupIndex, Boolean, Boolean, Boolean, Boolean) = {
    val (out, wasStale, freshAfter, fragBounded, secondNoop) =
      maintainIndexCache.synchronized {
        maintainIndexCache.getOrElseUpdate(dir, {
          val tmp = graft.TempIndexDirs.copyOf(
            baseIndexFor(spark, dir), "graft-dedup-maintain")
          graft.ops.Walls.timed("q.maintain_append")(
            graft.ops.CorpusDedup.appendToIndex(
              Tables.documents(spark, dir)
                .filter($"source".isin(NewSources: _*))
                .select($"doc_id", $"text"),
              "doc_id", "text", tmp, restateStats = false))
          val stale = !graft.ops.CorpusDedup.statsFresh(spark, tmp)
          val r1 = graft.ops.Walls.timed("q.maintain1")(
            graft.ops.CorpusDedup.maintainIndex(spark, tmp).collect())
          val fresh = graft.ops.CorpusDedup.statsFresh(spark, tmp)
          // policy invariant, unconditional: the worst artifact sits at
          // or below fragSlack (2.0 default) × the bucket count — either
          // compaction ran (→ ≤ buckets) or it was never owed
          val bounded = r1.find(_.getString(0) == "compact")
            .exists(_.getLong(3) <=
              2L * graft.ops.CorpusDedup.bucketsOf(spark, tmp))
          val noop = graft.ops.Walls.timed("q.maintain2")(
            graft.ops.CorpusDedup.maintainIndex(spark, tmp)
              .collect().forall(!_.getBoolean(1)))
          (tmp, stale, fresh, bounded, noop)
        })
      }
    (graft.ops.CorpusDedup.fromIndex(spark, out),
      wasStale, freshAfter, fragBounded, secondNoop)
  }

  /** SCHEDULED MAINTENANCE, oracle-gated end to end: a [[NewSources]]
    * batch enters through the streaming faces' O(batch) deferred-
    * statistics append, then ONE [[graft.ops.CorpusDedup.maintainIndex]]
    * call — the operational entry point a 100-TB deployment crons per
    * index dir — plays the whole documented maintenance schedule
    * (vacuum, restate-if-stale, compact-if-fragmented), each action
    * gated on its own measured trigger. Output: the stored PREFIX
    * artifact after maintenance (the corpus-wide global-rarity prefix
    * order, which the DuckDB oracle recomputes from first principles
    * over the WHOLE corpus) plus four verdicts the oracle expects TRUE:
    * `was_deferred` (the O(batch) path was really exercised),
    * `fresh_after` (maintenance restated the statistics),
    * `frag_bounded` (no artifact exceeds the policy's fragmentation
    * bound afterwards), and `second_noop` (an immediate second call
    * reports every trigger clear — the idempotence that makes a
    * maintenance cron safe). A maintenance pass that skips the restate,
    * restates against the wrong corpus, or keeps re-compacting a
    * compact index flips a verdict or lands a different prefix set and
    * fails the hash gate. */
  def qDedupIndexMaintain(spark: SparkSession, dir: String): DataFrame = {
    val (stored, wasStale, freshAfter, fragBounded, secondNoop) =
      maintainedIndexFor(spark, dir)
    stored.prefix
      .select($"doc_id", $"s",
        lit(wasStale).as("was_deferred"),
        lit(freshAfter).as("fresh_after"),
        lit(fragBounded).as("frag_bounded"),
        lit(secondNoop).as("second_noop"))
      .orderBy($"doc_id", $"s")
  }

  /** BENCH-lane form of the incremental ingestion (substituted for
    * [[qDedupIndexAppend]] by `Bench` via `SparkEntry.benchQueries`; the
    * correctness gate keeps the full bit-identity pin): same index build +
    * O(batch) append + stored-edge emission, WITHOUT the in-plan
    * full-corpus recompute — that full-outer compare is the VERIFIER
    * (~30 s of every bench run measuring the oracle construct, not the
    * operator). Invariants here are the append's own, priced O(|edges|):
    * pair-key orientation (da < db), key uniqueness (the append-order
    * self-pair hazard would double keys), and positive shared-band
    * counts (a double-counted band region flips this). */
  def qDedupIndexAppendBench(spark: SparkSession, dir: String): DataFrame = {
    val stored = appendedIndexFor(spark, dir).edges
    val inv = stored.agg(
      sum(when($"da" >= $"db", 1L).otherwise(0L)).as("n_misordered"),
      (count(lit(1)) - countDistinct($"da", $"db")).as("n_dup_keys"),
      sum(when($"n_shared_bands" <= 0L, 1L).otherwise(0L)).as("n_bad_bands"))
    stored.crossJoin(broadcast(inv))
      .select($"da", $"db", $"n_shared_bands", $"n_eq", $"est_e4",
        ($"n_misordered" === 0L && $"n_dup_keys" === 0L &&
          $"n_bad_bands" === 0L).as("append_ok"))
  }

  /** Memoized MERGED-index dir for [[qDedupIndexMerge]]: the base corpus
    * and the [[NewSources]] batch are indexed INDEPENDENTLY (the base
    * build is the shared [[baseIndexCache]] memo, read in place — merge
    * mutates neither input; the right side is its own small
    * [[graft.ops.CorpusDedup.buildIndex]]) and then combined with
    * [[graft.ops.CorpusDedup.mergeIndexes]] into a fresh dir. Keyed by
    * fixture dir per JVM like [[baseIndexCache]]. */
  private val mergeIndexCache = scala.collection.mutable.Map.empty[String, String]
  private def mergedIndexFor(
      spark: SparkSession, dir: String): graft.ops.CorpusDedup.DedupIndex = {
    val out = mergeIndexCache.synchronized {
      mergeIndexCache.getOrElseUpdate(dir, {
        val leftDir = baseIndexFor(spark, dir)
        val rightDir = graft.TempIndexDirs.create("graft-dedup-right")
        graft.ops.Walls.timed("q.right_build")(graft.ops.CorpusDedup.buildIndex(
          Tables.documents(spark, dir)
            .filter($"source".isin(NewSources: _*))
            .select($"doc_id", $"text"),
          "doc_id", "text", rightDir))
        val tmp = graft.TempIndexDirs.create("graft-dedup-merged")
        graft.ops.Walls.timed("q.merge")(
          graft.ops.CorpusDedup.mergeIndexes(spark, leftDir, rightDir, tmp))
        tmp
      })
    }
    graft.ops.CorpusDedup.fromIndex(spark, out)
  }

  /** PARTITION-WISE index build + merge, oracle-gated end to end: the
    * base corpus and the [[NewSources]] shard are indexed independently
    * (embarrassingly parallel at 100 TB — no cross-shard traffic during
    * the builds) and [[graft.ops.CorpusDedup.mergeIndexes]] combines the
    * two stored indexes without touching raw text: artifact unions plus
    * the cross-shard candidate pairs from the stored band artifacts. The
    * output is the merged edge table plus the in-plan `merge_ok` verdict:
    * a full-outer, all-columns compare against the from-scratch generator
    * over the whole corpus. The DuckDB oracle recomputes the full-corpus
    * candidate set from first principles and expects TRUE — so the merge
    * path is pinned bit-identical to the single-build path: a missed
    * cross-shard pair, a double-counted band, or a dropped stored row
    * flips the verdict and fails the hash gate. */
  def qDedupIndexMerge(spark: SparkSession, dir: String): DataFrame = {
    val stored = mergedIndexFor(spark, dir).edges
    val liveScored = lshScoredPairs(spark, dir)
    val mism = edgeMismatch(stored, liveScored)
    val res = stored
      .crossJoin(broadcast(mism))
      .select($"da", $"db", $"n_shared_bands", $"n_eq", $"est_e4",
        ($"n_mismatch" === 0L).as("merge_ok"))
    freeing(res)
  }

  /** BENCH-lane form of the partition-wise merge (substituted for
    * [[qDedupIndexMerge]] by `Bench` via `SparkEntry.benchQueries`; the
    * correctness gate keeps the full bit-identity pin): same independent
    * builds + stored-artifact merge + merged-edge emission, WITHOUT the
    * in-plan full-corpus recompute (the verifier). Invariants priced
    * O(|edges|): pair-key orientation, key uniqueness, positive shared-
    * band counts. */
  def qDedupIndexMergeBench(spark: SparkSession, dir: String): DataFrame = {
    val stored = mergedIndexFor(spark, dir).edges
    val inv = stored.agg(
      sum(when($"da" >= $"db", 1L).otherwise(0L)).as("n_misordered"),
      (count(lit(1)) - countDistinct($"da", $"db")).as("n_dup_keys"),
      sum(when($"n_shared_bands" <= 0L, 1L).otherwise(0L)).as("n_bad_bands"))
    stored.crossJoin(broadcast(inv))
      .select($"da", $"db", $"n_shared_bands", $"n_eq", $"est_e4",
        ($"n_misordered" === 0L && $"n_dup_keys" === 0L &&
          $"n_bad_bands" === 0L).as("merge_ok"))
  }

  /** Memoized FORGOTTEN-index dir for [[qDedupIndexForget]]: the appended
    * index ([[appendedIndexFor]] — base corpus + [[NewSources]] batch) is
    * COPIED on disk (the shared memo stays unmutated) and the batch's
    * doc ids are then ERASED in place with
    * [[graft.ops.CorpusDedup.removeFromIndex]] — the append→forget round
    * trip. Keyed by fixture dir per JVM like the siblings. */
  private val forgetIndexCache = scala.collection.mutable.Map.empty[String, String]
  private def forgottenIndexFor(
      spark: SparkSession, dir: String): graft.ops.CorpusDedup.DedupIndex = {
    appendedIndexFor(spark, dir) // ensure the appended source index exists
    val out = forgetIndexCache.synchronized {
      forgetIndexCache.getOrElseUpdate(dir, {
        val src = appendIndexCache.synchronized(appendIndexCache(dir))
        val copy = graft.TempIndexDirs.copyOf(src, "graft-dedup-forget")
        graft.ops.Walls.timed("q.forget")(graft.ops.CorpusDedup.removeFromIndex(
          spark, copy,
          Tables.documents(spark, dir)
            .filter($"source".isin(NewSources: _*))
            .select($"doc_id")))
        copy
      })
    }
    graft.ops.CorpusDedup.fromIndex(spark, out)
  }

  /** FORGET (the delete face of the index lifecycle), oracle-gated: the
    * [[NewSources]] batch — previously APPENDED onto the base-corpus
    * index — is erased in place with
    * [[graft.ops.CorpusDedup.removeFromIndex]] (anti-join rewrites with
    * rename promotion that DELETES the old generation's bytes; DF cap
    * and prefix order restated from the remaining postings). The output
    * is the post-forget edge table plus the in-plan `forget_ok` verdict,
    * which requires BOTH: (a) the stored edges equal the from-scratch
    * generator over the corpus MINUS the erased sources (the DuckDB
    * oracle recomputes exactly that and expects TRUE), and (b) the
    * append→forget round trip landed bit-identical to the base index's
    * stored edges — a leaked pair, a dropped surviving edge, or a stale
    * statistic flips the verdict and fails the hash gate. */
  def qDedupIndexForget(spark: SparkSession, dir: String): DataFrame = {
    val stored = forgottenIndexFor(spark, dir).edges
    val keep = Tables.documents(spark, dir)
      .filter(!$"source".isin(NewSources: _*))
    val sigs = signaturesOf(postingsOf(keep)).persist()
    sigs.count()
    val live = scoredPairsFromSigs(sigs)
    val mismLive = edgeMismatch(stored, live, "n_mismatch_live")
    val base = graft.ops.CorpusDedup
      .fromIndex(spark, baseIndexFor(spark, dir)).edges
    val mismBase = edgeMismatch(stored, base, "n_mismatch_base")
    val res = stored
      .crossJoin(broadcast(mismLive))
      .crossJoin(broadcast(mismBase))
      .select($"da", $"db", $"n_shared_bands", $"n_eq", $"est_e4",
        ($"n_mismatch_live" === 0L && $"n_mismatch_base" === 0L)
          .as("forget_ok"))
    freeing(res, sigs)
  }

  /** BENCH-lane form of the forget (substituted by `Bench` via
    * `SparkEntry.benchQueries`; the correctness gate keeps the
    * filtered-corpus recompute): same copy + in-place erasure + stored
    * edge emission, with the verdict from the CHEAP half only — the
    * base-index bit-identity compare (two stored scans), not the
    * from-scratch tokenize pass (the verifier). */
  def qDedupIndexForgetBench(spark: SparkSession, dir: String): DataFrame = {
    val stored = forgottenIndexFor(spark, dir).edges
    val base = graft.ops.CorpusDedup
      .fromIndex(spark, baseIndexFor(spark, dir)).edges
    val mism = edgeMismatch(stored, base)
    stored.crossJoin(broadcast(mism))
      .select($"da", $"db", $"n_shared_bands", $"n_eq", $"est_e4",
        ($"n_mismatch" === 0L).as("forget_ok"))
  }

  /** CERTIFICATE OF ERASURE over the post-forget index, oracle-gated:
    * [[graft.ops.CorpusDedup.erasureCertificate]] probes the RAW stored
    * files of the forgotten memo index for residue of the erased batch —
    * one broadcast-semi-join scan per artifact, edges on both endpoints.
    * The oracle is the CONTRACT, not a recompute: four rows of
    * (artifact, 0, TRUE), because a compliant erasure leaves exactly
    * zero residual rows; the ENGINE side genuinely counts from bytes on
    * disk, so one leaked posting/signature/band/edge row flips
    * `residual_rows` (and `erased_ok`) and fails the hash gate. This is
    * the audit query a right-to-be-forgotten pipeline runs after its
    * erasure queue drains. */
  def qDedupForgetCert(spark: SparkSession, dir: String): DataFrame = {
    forgottenIndexFor(spark, dir)
    val idxDir = forgetIndexCache.synchronized(forgetIndexCache(dir))
    val ids = Tables.documents(spark, dir)
      .filter($"source".isin(NewSources: _*)).select($"doc_id")
    graft.ops.CorpusDedup.erasureCertificate(spark, idxDir, ids)
      .orderBy($"artifact")
  }

  /** The LIFECYCLE LEDGER of the forgotten memo index, oracle-gated: the
    * `_history` audit trail every mutator appends to, read back in
    * sequence order with the per-event counts (wall-clock excluded —
    * nondeterministic by nature). The index's history is
    * build → append → forget by construction, and the counts are
    * corpus-derivable (the appended batch and the erased id set are both
    * the [[NewSources]] docs), so DuckDB recomputes the expected ledger
    * from the documents table — a missing event, a double-applied
    * mutation, or a miscounted batch fails the hash gate. */
  def qDedupIndexHistory(spark: SparkSession, dir: String): DataFrame = {
    forgottenIndexFor(spark, dir)
    val idxDir = forgetIndexCache.synchronized(forgetIndexCache(dir))
    graft.ops.CorpusDedup.history(spark, idxDir)
      .select($"seq".cast("long").as("seq"), $"event",
        $"n_docs".cast("long").as("n_docs"),
        $"n_ids".cast("long").as("n_ids"))
      .orderBy($"seq")
  }

  /** STORED-INDEX HEALTH DASHBOARD, oracle-gated: every artifact's
    * cardinality plus the banding skew ceiling (max band-bucket size —
    * the number the `MaxBandBucket` cap is tuned against), read from the
    * STORED build+append lineage the production pipeline has on disk.
    * The oracle re-derives each count from the documents table through
    * the same shared CTE chains as the dedup oracles, so a stored
    * artifact that silently grew (double-applied append), shrank
    * (dropped bucket file), or skewed fails the hash gate. This is the
    * `ANALYZE TABLE`-style monitoring row a 100-TB index maintenance
    * schedule alerts on — all seven values come from bounded aggregates
    * over the bucketed artifacts, no raw text. */
  def qDedupIndexStats(spark: SparkSession, dir: String): DataFrame = {
    val idx = appendedIndexFor(spark, dir)
    val maxBucket = idx.bands.groupBy($"band_idx", $"bucket")
      .agg(count(lit(1)).as("c")).agg(max($"c")).collect()(0).getLong(0)
    val counts = Seq(
      "postings" -> idx.postings.count(),
      "capped" -> idx.capped.count(),
      "prefix" -> idx.prefix.count(),
      "signatures" -> idx.signatures.count(),
      "bands" -> idx.bands.count(),
      "edges" -> idx.edges.count(),
      "max_band_bucket" -> maxBucket)
    import spark.implicits.newProductEncoder
    spark.createDataset(counts).toDF("metric", "value").orderBy($"metric")
  }

  /** BENCH-lane form of [[qDedupIndexed]] (substituted by `Bench` via
    * `SparkEntry.benchQueries`; the correctness gate keeps the full
    * stored-vs-live pin): stored candidate edges → the per-edge
    * edit-distance verification tier — the PRODUCTION probe cost —
    * WITHOUT the in-plan live-LSH recompute of the whole corpus (that
    * full-outer compare is the VERIFIER: it re-prices tokenize + MinHash
    * + banding that the index moved to write time, which is exactly what
    * the lifecycle exists to avoid). Invariants priced O(|edges|):
    * pair-key orientation and uniqueness. */
  def qDedupIndexedBench(spark: SparkSession, dir: String): DataFrame = {
    val stored = storedIndexFor(spark, dir).nearDupEdges
    val inv = stored.agg(
      sum(when($"a" >= $"b", 1L).otherwise(0L)).as("n_misordered"),
      (count(lit(1)) - countDistinct($"a", $"b")).as("n_dup_keys"))
    val ev = editVerifyFrom(
      Tables.documents(spark, dir).select($"doc_id", $"text"), stored)
    freeing(ev.crossJoin(broadcast(inv))
      .select($"a", $"b", $"lev", $"max_len", $"dist_e4", $"is_dup",
        ($"n_misordered" === 0L && $"n_dup_keys" === 0L).as("index_ok")))
  }

  /** BENCH-lane form of [[qDedupPpjoinIndexed]] (same substitution
    * contract): candidate generation over the STORED rarity-ordered
    * prefix + exact verification over the STORED DF-capped postings —
    * the production probe, whose plan carries no tokenize pass and no
    * corpus-DF aggregate — WITHOUT the in-plan recompute of the prefix
    * definition from raw text (the verifier). */
  def qDedupPpjoinIndexedBench(spark: SparkSession, dir: String): DataFrame = {
    val stored = storedIndexFor(spark, dir)
    val pfx = stored.prefix
    val cand = pfx.select($"doc_id".as("da"), $"s")
      .join(pfx.select($"doc_id".as("db"), $"s"), Seq("s"))
      .filter($"da" < $"db")
      .select($"da", $"db").distinct()
      .persist() // filled by the verification join's first read
    val res = exactOverlaps(stored.capped, cand)
      .select($"da", $"db", $"common", $"jacc_e4",
        ($"jacc_e4" >= PpjoinTauE4).as("is_dup"))
    freeing(res, cand)
  }

  /** Memoized BASE-corpus index dir (sources outside [[NewSources]] —
    * the "already ingested" corpus): built ONCE per JVM per fixture and
    * shared by the gate ([[qDedupGate]] reads it in place) and the append
    * family ([[appendedIndexFor]] mutates a file COPY), so the bench pays
    * one base build, not one per consumer. */
  private val baseIndexCache = scala.collection.mutable.Map.empty[String, String]
  private def baseIndexFor(spark: SparkSession, dir: String): String =
    baseIndexCache.synchronized {
      baseIndexCache.getOrElseUpdate(dir, {
        val tmp = graft.TempIndexDirs.create("graft-dedup-base")
        graft.ops.Walls.timed("q.base_build")(graft.ops.CorpusDedup.buildIndex(
          Tables.documents(spark, dir)
            .filter(!$"source".isin(NewSources: _*))
            .select($"doc_id", $"text"),
          "doc_id", "text", tmp))
        tmp
      })
    }
  private def gateIndexFor(spark: SparkSession, dir: String): String =
    baseIndexFor(spark, dir)

  /** DEDUP GATE ([[graft.ops.CorpusDedup.scoreBatchAgainstIndex]]),
    * oracle-gated: verdict the incoming [[NewSources]] batch against the
    * stored base-corpus index WITHOUT mutating it — the "should this
    * crawl page enter the corpus?" decision at the mouth of a
    * training-data pipeline (the streaming face,
    * [[graft.ops.CorpusDedup.gateStream]], appends only the novel docs so
    * the gate LEARNS batch over batch; that behavior is spec-pinned in
    * `DedupGateSpec`, order-dependent so not oracle-expressible). A batch
    * doc is a DUPLICATE when it matches a stored doc at
    * [[ClusterEdgeE4]] (any id — the corpus is canonical) or a
    * smaller-id batch mate (the min-id representative of a new template
    * survives). The DuckDB oracle recomputes the verdicts from first
    * principles over the full corpus quartet.
    *
    * Scale: O(batch) raw-text work; candidates are band-bucket equi-joins
    * against the bucketed stored artifact; one per-doc aggregate. */
  def qDedupGate(spark: SparkSession, dir: String): DataFrame = {
    val idxDir = gateIndexFor(spark, dir)
    val batch = Tables.documents(spark, dir)
      .filter($"source".isin(NewSources: _*))
      .select($"doc_id", $"text")
    // scoreBatchAgainstIndex returns its verdicts LINEAGE-CUT
    // (localCheckpoint — a trivial LogicalRDD plan, no cache entry), so
    // cold-bench loops leak nothing and the ordering below is a plain
    // sort over materialized batch-sized rows.
    graft.ops.CorpusDedup
      .scoreBatchAgainstIndex(batch, "doc_id", "text", idxDir)
      .orderBy($"doc_id")
  }

  /** Memoized compacted-index dir for [[qDedupIndexCompact]]: the
    * appended index ([[appendedIndexFor]]) is COPIED on disk (so the memo
    * the probe/append queries share stays unmutated) and compacted in
    * place; the pre/post total data-file counts ride along for the
    * layout verdict. Keyed by fixture dir per JVM like the siblings. */
  private val compactIndexCache =
    scala.collection.mutable.Map.empty[String, (String, Long, Long)]
  private def compactedIndexFor(spark: SparkSession, dir: String)
      : (graft.ops.CorpusDedup.DedupIndex, Long, Long) = {
    appendedIndexFor(spark, dir) // ensure the appended source index exists
    val (out, before, after) = compactIndexCache.synchronized {
      compactIndexCache.getOrElseUpdate(dir, {
        val src = appendIndexCache.synchronized(appendIndexCache(dir))
        val copy = graft.TempIndexDirs.copyOf(src, "graft-dedup-compact")
        val b = graft.ops.CorpusDedup.indexFileCount(spark, copy)
        graft.ops.Walls.timed("q.compact")(
          graft.ops.CorpusDedup.compactIndex(spark, copy))
        val a = graft.ops.CorpusDedup.indexFileCount(spark, copy)
        (copy, b, a)
      })
    }
    (graft.ops.CorpusDedup.fromIndex(spark, out), before, after)
  }

  /** Index COMPACTION, oracle-gated: every [[graft.ops.CorpusDedup
    * .appendToIndex]] batch lands one more file per touched bucket, so
    * after N appends a bucket scan unions O(N) small files — the classic
    * lakehouse small-files decay. [[graft.ops.CorpusDedup.compactIndex]]
    * rewrites each artifact to one file per non-empty bucket and promotes
    * by directory rename (never a second data copy). The output is the
    * compacted edge table (the DuckDB oracle recomputes the full-corpus
    * candidate set from first principles) plus the in-plan `compact_ok`
    * verdict: bit-identity of the compacted edges against the
    * pre-compaction stored edges (full-outer, all columns), row
    * conservation across ALL six artifacts, and the driver-measured
    * file-count contract (strictly fewer data files, at most one per
    * bucket per artifact) — a lost row, a corrupted rewrite, or a
    * compaction that failed to actually compact all flip the verdict and
    * fail the hash gate. */
  def qDedupIndexCompact(spark: SparkSession, dir: String): DataFrame = {
    val (cIdx, before, after) = compactedIndexFor(spark, dir)
    val pre = appendedIndexFor(spark, dir)
    def frames(i: graft.ops.CorpusDedup.DedupIndex) = Seq(
      i.postings, i.capped, i.prefix, i.signatures, i.bands, i.edges)
    // Row conservation per artifact: compaction is a layout rewrite, so
    // each artifact must hold exactly as many rows after as before
    // (1-row aggregates per side, 6 bounded pairs).
    val conserved = frames(cIdx).zip(frames(pre)).map { case (c, p) =>
      c.agg(count(lit(1)).as("n_post"))
        .crossJoin(p.agg(count(lit(1)).as("n_pre")))
        .select(($"n_post" === $"n_pre").as("ok"))
    }.reduce(_ unionByName _)
      .agg(sum(when($"ok", 0L).otherwise(1L)).as("n_artifact_mismatch"))
    val mism = edgeMismatch(cIdx.edges, pre.edges)
    cIdx.edges
      .crossJoin(broadcast(mism))
      .crossJoin(broadcast(conserved))
      .select($"da", $"db", $"n_shared_bands", $"n_eq", $"est_e4",
        ($"n_mismatch" === 0L && $"n_artifact_mismatch" === 0L &&
          lit(after < before) &&
          lit(after <= 6L * graft.ops.CorpusDedup.bucketsOf(
            spark, cIdx.indexDir)))
          .as("compact_ok"))
  }

  /** 32-bit SimHash per document (token-frequency weighted) + top-byte
    * bucket: Hamming-proximate docs share high bits with high probability. */
  def qDedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", explode(TextHash.tokens($"text")).as("t"))
      .withColumn("h", TextHash.h32($"t"))
    val bitSums = (0 until 32).map(j =>
      sum(when((shiftright($"h", j) % 2) === 1, 1L).otherwise(-1L)).as(s"s$j"))
    val simhash = (0 until 32)
      .map(j => when(col(s"s$j") > 0, 1L << j).otherwise(0L))
      .reduce(_ + _)
    toks.groupBy($"doc_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .withColumn("simhash", simhash)
      .withColumn("bucket_hi8", shiftright($"simhash", 24))
      .select($"doc_id", $"simhash", $"bucket_hi8")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact"     -> qDedupExact _,
    "q_dedup_jaccard"   -> qDedupJaccard _,
    "q_dedup_containment" -> qDedupContainment _,
    "q_dedup_incremental" -> qDedupIncremental _,
    "q_dedup_minhash"   -> qDedupMinhash _,
    "q_dedup_lsh_pairs" -> qDedupLshPairs _,
    "q_dedup_clusters"  -> qDedupClusters _,
    "q_dedup_survivors" -> qDedupSurvivors _,
    "q_dedup_triangles" -> qDedupTriangles _,
    "q_dedup_clustcoeff" -> qDedupClusteringCoeff _,
    "q_graph_pagerank"  -> qGraphPagerank _,
    "q_graph_kcore"     -> qGraphKcore _,
    "q_dedup_substr"    -> qDedupSubstr _,
    "q_dedup_calibration" -> qDedupCalibration _,
    "q_pipeline_curate" -> qPipelineCurate _,
    "q_pipeline_admit"  -> qPipelineAdmit _,
    "q_dedup_ppjoin"    -> qDedupPpjoin _,
    "q_dedup_ppjoin_indexed" -> qDedupPpjoinIndexed _,
    "q_dedup_editdist"  -> qDedupEditdist _,
    "q_dedup_indexed"   -> qDedupIndexed _,
    "q_dedup_index_append" -> qDedupIndexAppend _,
    "q_dedup_index_restate" -> qDedupIndexRestate _,
    "q_dedup_index_maintain" -> qDedupIndexMaintain _,
    "q_dedup_index_merge" -> qDedupIndexMerge _,
    "q_dedup_index_forget" -> qDedupIndexForget _,
    "q_dedup_index_forget_cert" -> qDedupForgetCert _,
    "q_dedup_index_history" -> qDedupIndexHistory _,
    "q_dedup_index_stats" -> qDedupIndexStats _,
    "q_dedup_gate"      -> qDedupGate _,
    "q_dedup_index_compact" -> qDedupIndexCompact _,
    "q_dedup_src_matrix" -> qDedupSourceMatrix _,
    "q_dedup_rates"     -> qDedupRates _,
    "q_dedup_split"     -> qDedupSplit _,
    "q_dedup_simhash"   -> qDedupSimhash _,
    "q_dedup_bucket_stats" -> qDedupBucketStats _,
  )

  // ---- DuckDB oracles ------------------------------------------------------

  private val W = TextHash.sqlTokens("text")
  private val ShSql = TextHash.sqlShingles("w", Shingle)
  private val sigSqlExprs: Seq[String] =
    (0 until TextHash.MinhashK).map(i => TextHash.sqlMinhash("sh", i))

  val oracles: Map[String, String] = {
    val nBands = TextHash.MinhashK / TextHash.BandRows
    val sigSelect = sigSqlExprs.zipWithIndex
      .map { case (e, i) => s"$e AS mh$i" }.mkString(",\n            ")
    val mhCols = (0 until TextHash.MinhashK).map(i => s"mh$i")
    val bandSelect = (0 until nBands)
      .map(bi => s"${TextHash.sqlBandBucket(mhCols, bi)} AS band$bi")
      .mkString(",\n            ")
    // Parameterized over the source relation so the forget oracle can
    // recompute over `documents` minus the erased sources with the SAME
    // candidate-generation SQL (one definition; a drift is impossible).
    def sigCteBodyFrom(rel: String) =
      s"""t AS (SELECT doc_id, $W AS w FROM $rel),
          d AS (SELECT doc_id, $ShSql AS sh FROM t),
          sig AS (SELECT doc_id,
            $sigSelect
          FROM d),
          sigb AS (SELECT *,
            $bandSelect
          FROM sig)"""
    val sigCteBody = sigCteBodyFrom("documents")
    val sigCte = s"WITH $sigCteBody"
    val bandUnionSql = (0 until nBands)
      .map(i => s"SELECT doc_id, ${mhCols.mkString(", ")}, $i AS band_idx, band$i AS bucket FROM sigb")
      .mkString("\n              UNION ALL\n              ")
    // Band rows with the bucket-size cap applied — the SQL mirror of
    // [[scoredPairsFromSigs]]' hot-bucket handling: `bex` carries the
    // cold (≤ cap) band rows that self-join all-pairs, `bstar` the linear
    // star candidates (min-id representative → member) from hot buckets.
    // Every oracle that generates LSH candidates reads this quartet, so
    // the cap semantics stay engine-identical by construction.
    val bandExCtes =
      s"""bex0 AS (
              $bandUnionSql
            ),
            bhot AS (
              SELECT band_idx, bucket, min(doc_id) AS rep FROM bex0
              GROUP BY 1, 2 HAVING count(*) > $MaxBandBucket),
            bex AS (
              SELECT bex0.* FROM bex0
              WHERE NOT EXISTS (SELECT 1 FROM bhot
                WHERE bhot.band_idx = bex0.band_idx
                  AND bhot.bucket = bex0.bucket)),
            bstar AS (
              SELECT h.rep AS da, x.doc_id AS db
              FROM bex0 x JOIN bhot h
                ON h.band_idx = x.band_idx AND h.bucket = x.bucket
              WHERE x.doc_id <> h.rep)"""
    // Scored candidate pairs from the capped band rows — cold all-pairs
    // UNION ALL hot star rows (≤ 1 row per pair per band on either path),
    // grouped to (da, db, n_shared_bands) and scored against the signature
    // table — the SQL mirror of [[scoredPairsFromSigs]]' union + re-joins.
    val candNEq = (0 until TextHash.MinhashK)
      .map(i => s"CASE WHEN sa.mh$i = sb.mh$i THEN 1 ELSE 0 END")
      .mkString(" + ")
    def candCtes(mat: Boolean): String = {
      val m = if (mat) " MATERIALIZED" else ""
      s"""candb AS (
              SELECT a.doc_id AS da, b.doc_id AS db
              FROM bex a JOIN bex b
                ON a.band_idx = b.band_idx AND a.bucket = b.bucket
                AND a.doc_id < b.doc_id
              UNION ALL
              SELECT da, db FROM bstar),
            cand AS$m (
              SELECT c.da, c.db, count(*) AS n_shared_bands,
                max($candNEq) AS n_eq
              FROM candb c
              JOIN sig sa ON sa.doc_id = c.da
              JOIN sig sb ON sb.doc_id = c.db
              GROUP BY 1, 2)"""
    }
    // Shared WITH RECURSIVE prefix ending in `clusters(doc_id, cluster_id)`
    // — the transitive-closure connected components both the clusters
    // listing and the survivors deliverable derive from.
    val closurePrefix = {
      s"""WITH RECURSIVE $sigCteBody,
            $bandExCtes,
            ${candCtes(mat = false)},
            edges AS (
              SELECT da AS a, db AS b FROM cand
              WHERE n_eq * 10000 // ${TextHash.MinhashK} >= $ClusterEdgeE4
              UNION
              SELECT db AS a, da AS b FROM cand
              WHERE n_eq * 10000 // ${TextHash.MinhashK} >= $ClusterEdgeE4),
            reach(a, b) AS (
              SELECT a, b FROM edges
              UNION
              SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
            clusters AS (
              SELECT a AS doc_id, least(a, min(b)) AS cluster_id
              FROM reach GROUP BY a)"""
    }
    // Shared prefix ending in the oriented `edges(a,b)` (a<b) near-dup
    // graph — the one SQL definition of "an LSH edge", mirrored by
    // [[lshEdges]] on the Spark side; consumed by the triangle prefix and
    // the edit-distance verification oracle.
    val edgesPrefix = {
      s"""$sigCte,
            $bandExCtes,
            ${candCtes(mat = true)},
            edges AS (
              SELECT da AS a, db AS b FROM cand
              WHERE n_eq * 10000 // ${TextHash.MinhashK} >= $ClusterEdgeE4)"""
    }
    // Extends [[edgesPrefix]] with `wedges` and `tri(a,b,c)` — the one SQL
    // definition of the near-dup graph's triangles, mirrored by
    // [[orientedTriangles]] on the Spark side and consumed by the census
    // and the per-node coefficient oracles.
    val triPrefix =
      s"""$edgesPrefix,
            wedges AS (
              SELECT e1.a, e1.b, e2.b AS c
              FROM edges e1 JOIN edges e2 ON e1.b = e2.a),
            tri AS (
              SELECT w.a, w.b, w.c FROM wedges w
              JOIN edges e3 ON w.a = e3.a AND w.c = e3.b)"""
    // Shared PPJoin chain ending in the verified candidate frame
    // `v(da, db, common, na, nb)` — one body for the recomputed tier
    // (q_dedup_ppjoin) and the stored-index probe (q_dedup_ppjoin_indexed),
    // so the persisted lifecycle is oracle-pinned to the exact recomputed
    // semantics.
    // The hashed-shingle → DF-capped → PPJoin-prefix chain (reads `d` from
    // the caller's WITH) — shared by the ppjoin oracles and the stored-
    // index stats oracle, so the prefix-selection SQL has ONE definition.
    val cappedPfxCtes =
      s"""ex0 AS (SELECT doc_id, unnest(sh) AS s0 FROM d),
            exh AS (SELECT doc_id, ${TextHash.sqlH32("s0")} AS s FROM ex0),
            capped AS (
              SELECT doc_id, s FROM (
                SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM exh)
              WHERE df <= $MaxShingleDf),
            exn AS MATERIALIZED (
              SELECT doc_id, s, count(*) OVER (PARTITION BY doc_id) AS n
              FROM capped),
            dfs AS (SELECT s, count(*) AS df FROM exn GROUP BY 1),
            pfx AS MATERIALIZED (
              SELECT doc_id, s FROM (
                SELECT e.doc_id, e.s, e.n,
                  row_number() OVER (PARTITION BY e.doc_id
                                     ORDER BY f.df, e.s) AS rk
                FROM exn e JOIN dfs f ON e.s = f.s)
              WHERE rk <= n - ($PpjoinTauE4 * n + 9999) // 10000 + 1)"""
    val ppjoinBodySql =
      s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
            d AS (SELECT doc_id, $ShSql AS sh FROM t),
            $cappedPfxCtes,
            cand AS (
              SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
              FROM pfx a JOIN pfx b ON a.s = b.s AND a.doc_id < b.doc_id),
            v AS (
              SELECT c.da, c.db, count(*) AS common,
                     max(a.n) AS na, max(b.n) AS nb
              FROM cand c
              JOIN exn a ON a.doc_id = c.da
              JOIN exn b ON b.doc_id = c.db AND b.s = a.s
              GROUP BY 1, 2)"""
    Map(
      "q_dedup_exact" ->
        s"""SELECT md5(${TextHash.sqlNormText("text")}) AS fp,
            min(doc_id) AS rep_doc_id, count(*) AS n_copies,
            max(n_chars) AS max_chars
            FROM documents GROUP BY 1 ORDER BY rep_doc_id""",
      "q_dedup_jaccard" ->
        s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
            d AS (SELECT doc_id, $ShSql AS sh FROM t),
            ex0 AS (SELECT doc_id, unnest(sh) AS s0 FROM d),
            exh AS (SELECT doc_id, ${TextHash.sqlH32("s0")} AS s FROM ex0),
            capped AS (
              SELECT doc_id, s FROM (
                SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM exh)
              WHERE df <= $MaxShingleDf),
            ex AS (
              SELECT doc_id, s, count(*) OVER (PARTITION BY doc_id) AS n
              FROM capped),
            pairs AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common,
                     max(a.n) AS na, max(b.n) AS nb
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT da, db, common,
              CAST(common * 10000 // (na + nb - common) AS BIGINT) AS jacc_e4
            FROM pairs
            WHERE common * 10000 // (na + nb - common) >= $JaccThresholdE4
            ORDER BY da, db""",
      "q_dedup_containment" ->
        s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
            d AS (SELECT doc_id, $ShSql AS sh FROM t),
            ex0 AS (SELECT doc_id, unnest(sh) AS s0 FROM d),
            exh AS (SELECT doc_id, ${TextHash.sqlH32("s0")} AS s FROM ex0),
            capped AS (
              SELECT doc_id, s FROM (
                SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM exh)
              WHERE df <= $MaxShingleDf),
            ex AS (
              SELECT doc_id, s, count(*) OVER (PARTITION BY doc_id) AS n
              FROM capped),
            pairs AS (
              SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS common,
                     max(a.n) AS na, max(b.n) AS nb
              FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
            SELECT da, db, common, na, nb,
              CAST(common * 10000 // least(na, nb) AS BIGINT) AS cont_e4,
              CAST(common * 10000 // (na + nb - common) AS BIGINT) AS jacc_e4
            FROM pairs
            WHERE common * 10000 // least(na, nb) >= $ContainmentE4
            ORDER BY da, db""",
      "q_dedup_incremental" -> {
        val newList = NewSources.map(s => s"'$s'").mkString(", ")
        s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
            d AS (SELECT doc_id, $ShSql AS sh FROM t),
            ex0 AS (SELECT doc_id, unnest(sh) AS s0 FROM d),
            exh AS (SELECT doc_id, ${TextHash.sqlH32("s0")} AS s FROM ex0),
            capped AS (
              SELECT doc_id, s FROM (
                SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM exh)
              WHERE df <= $MaxShingleDf),
            ex AS (
              SELECT c.doc_id, c.s,
                count(*) OVER (PARTITION BY c.doc_id) AS n,
                (doc.source IN ($newList)) AS is_new
              FROM capped c JOIN documents doc ON c.doc_id = doc.doc_id),
            scored AS (
              SELECT a.doc_id AS dn, b.doc_id AS ds, count(*) AS common,
                     max(a.n) AS nn, max(b.n) AS ns
              FROM ex a JOIN ex b ON a.s = b.s
              WHERE a.is_new AND NOT b.is_new
              GROUP BY 1, 2),
            best AS (
              SELECT dn, max(jacc_e4) AS best_jacc_e4, min(ds) AS first_match,
                     count(*) AS n_matches
              FROM (SELECT dn, ds,
                      CAST(common * 10000 // (nn + ns - common) AS BIGINT) AS jacc_e4
                    FROM scored)
              WHERE jacc_e4 >= $JaccThresholdE4
              GROUP BY dn)
            SELECT doc.doc_id, doc.source, b.first_match,
              CAST(coalesce(b.best_jacc_e4, -1) AS BIGINT) AS best_jacc_e4,
              CAST(coalesce(b.n_matches, 0) AS BIGINT) AS n_matches,
              b.first_match IS NULL AS kept
            FROM documents doc LEFT JOIN best b ON doc.doc_id = b.dn
            WHERE doc.source IN ($newList)
            ORDER BY doc.doc_id"""
      },
      "q_dedup_minhash" ->
        s"""$sigCte
            SELECT doc_id, ${mhCols.mkString(", ")},
                   ${(0 until nBands).map(i => s"band$i").mkString(", ")}
            FROM sigb ORDER BY doc_id""",
      "q_dedup_bucket_stats" ->
        s"""$sigCte,
            bex0 AS (
              $bandUnionSql
            ),
            per AS (
              SELECT band_idx, bucket, count(*) AS bsz
              FROM bex0 GROUP BY 1, 2)
            SELECT CAST(band_idx AS BIGINT) AS band_idx,
              CAST(count(*) AS BIGINT) AS n_buckets,
              CAST(sum(bsz) AS BIGINT) AS n_docs,
              CAST(max(bsz) AS BIGINT) AS max_bucket,
              CAST(sum(CASE WHEN bsz > $MaxBandBucket THEN 1 ELSE 0 END) AS BIGINT)
                AS n_hot_buckets,
              CAST(sum(CASE WHEN bsz > $MaxBandBucket THEN bsz ELSE 0 END) AS BIGINT)
                AS capped_docs
            FROM per GROUP BY band_idx ORDER BY band_idx""",
      "q_dedup_lsh_pairs" -> {
        s"""$sigCte,
            $bandExCtes,
            ${candCtes(mat = true)}
            SELECT da, db, n_shared_bands, CAST(n_eq AS BIGINT) AS n_eq,
              CAST(n_eq * 10000 // ${TextHash.MinhashK} AS BIGINT) AS est_e4
            FROM cand ORDER BY da, db"""
      },
      // The incremental-append path must land exactly the from-scratch
      // candidate set over the whole corpus: same generator SQL as
      // q_dedup_lsh_pairs, plus the stored_ok verdict the engine stamps
      // in-plan after comparing stored-after-append vs recomputed.
      "q_dedup_index_append" -> {
        s"""$sigCte,
            $bandExCtes,
            ${candCtes(mat = true)}
            SELECT da, db, n_shared_bands, CAST(n_eq AS BIGINT) AS n_eq,
              CAST(n_eq * 10000 // ${TextHash.MinhashK} AS BIGINT) AS est_e4,
              TRUE AS stored_ok
            FROM cand ORDER BY da, db"""
      },
      // The partition-wise merge must land exactly the from-scratch
      // candidate set over the whole corpus: same generator SQL as
      // q_dedup_lsh_pairs, plus the merge_ok verdict the engine stamps
      // in-plan after comparing merged vs recomputed.
      "q_dedup_index_merge" -> {
        s"""$sigCte,
            $bandExCtes,
            ${candCtes(mat = true)}
            SELECT da, db, n_shared_bands, CAST(n_eq AS BIGINT) AS n_eq,
              CAST(n_eq * 10000 // ${TextHash.MinhashK} AS BIGINT) AS est_e4,
              TRUE AS merge_ok
            FROM cand ORDER BY da, db"""
      },
      // The forget path must land exactly the from-scratch candidate set
      // over the corpus MINUS the erased sources: the SAME generator SQL,
      // re-rooted on the filtered documents relation, plus the forget_ok
      // verdict the engine stamps in-plan (filtered-recompute compare AND
      // the append->forget round trip back to the base index).
      "q_dedup_index_forget" -> {
        val newList = NewSources.map(s => s"'$s'").mkString(", ")
        s"""WITH ${sigCteBodyFrom(
              s"(SELECT * FROM documents WHERE source NOT IN ($newList))")},
            $bandExCtes,
            ${candCtes(mat = true)}
            SELECT da, db, n_shared_bands, CAST(n_eq AS BIGINT) AS n_eq,
              CAST(n_eq * 10000 // ${TextHash.MinhashK} AS BIGINT) AS est_e4,
              TRUE AS forget_ok
            FROM cand ORDER BY da, db"""
      },
      // The certificate's oracle is the CONTRACT (zero residue per
      // artifact), not a recompute — the engine side counts from the raw
      // stored bytes, so any leak flips the hashed counts.
      "q_dedup_index_forget_cert" ->
        s"""SELECT artifact, CAST(0 AS BIGINT) AS residual_rows,
              TRUE AS erased_ok
            FROM (VALUES ('bands'), ('capped'), ('edges'), ('postings'),
              ('prefix'), ('signatures')) AS t(artifact)
            ORDER BY artifact""",
      // The ledger's expected history recomputed from the corpus: the
      // appended batch and the erased id set are both the NewSources
      // docs, so their counts come from the documents table.
      "q_dedup_index_history" -> {
        val newList = NewSources.map(s => s"'$s'").mkString(", ")
        s"""WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c
              FROM documents WHERE source IN ($newList))
            SELECT CAST(0 AS BIGINT) AS seq, 'build' AS event,
              CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS BIGINT) AS n_ids
              FROM n
            UNION ALL SELECT CAST(1 AS BIGINT), 'append', c,
              CAST(NULL AS BIGINT) FROM n
            UNION ALL SELECT CAST(2 AS BIGINT), 'forget',
              CAST(NULL AS BIGINT), c FROM n
            ORDER BY seq"""
      },
      // The stored-index health dashboard recomputed from first
      // principles: every artifact's cardinality (and the banding skew
      // ceiling) re-derived from the documents table through the SAME
      // shared CTE chains the dedup oracles use — so a stored artifact
      // that silently grew, shrank, or skewed fails the hash gate.
      "q_dedup_index_stats" ->
        s"""WITH $sigCteBody,
            $cappedPfxCtes,
            $bandExCtes,
            ${candCtes(mat = true)}
            SELECT metric, value FROM (
              SELECT 'postings' AS metric, CAST(count(*) AS BIGINT) AS value
                FROM exh
              UNION ALL SELECT 'capped', CAST(count(*) AS BIGINT) FROM capped
              UNION ALL SELECT 'prefix', CAST(count(*) AS BIGINT) FROM pfx
              UNION ALL SELECT 'signatures',
                CAST(count(DISTINCT doc_id) AS BIGINT) FROM exh
              UNION ALL SELECT 'bands',
                CAST($nBands * count(DISTINCT doc_id) AS BIGINT) FROM exh
              UNION ALL SELECT 'edges', CAST(count(*) AS BIGINT) FROM cand
              UNION ALL SELECT 'max_band_bucket', CAST(max(c) AS BIGINT)
                FROM (SELECT count(*) AS c FROM bex0 GROUP BY band_idx, bucket))
            ORDER BY metric""",
      // The dedup gate's verdicts from first principles: LSH candidates
      // over the full corpus quartet, hits at the near-dup threshold,
      // then per batch doc — a match counts when the other side is
      // stored (any id) or a smaller-id batch mate.
      "q_dedup_gate" -> {
        val newList = NewSources.map(s => s"'$s'").mkString(", ")
        s"""$sigCte,
            $bandExCtes,
            ${candCtes(mat = true)},
            batch AS (
              SELECT doc_id FROM documents WHERE source IN ($newList)),
            hits AS (
              SELECT da, db,
                CAST(n_eq * 10000 // ${TextHash.MinhashK} AS BIGINT) AS est_e4
              FROM cand
              WHERE n_eq * 10000 // ${TextHash.MinhashK} >= $ClusterEdgeE4),
            sym AS (
              SELECT da AS d, db AS o, est_e4 FROM hits
              UNION ALL
              SELECT db AS d, da AS o, est_e4 FROM hits),
            m AS (
              SELECT s.d, s.o, s.est_e4
              FROM sym s JOIN batch bd ON bd.doc_id = s.d
              WHERE s.o NOT IN (SELECT doc_id FROM batch) OR s.o < s.d),
            agg AS (
              SELECT d, CAST(count(*) AS BIGINT) AS n_matches,
                     min(o) AS first_match,
                     max(est_e4) AS best_est_e4
              FROM m GROUP BY d)
            SELECT b.doc_id,
              CAST(coalesce(agg.n_matches, 0) AS BIGINT) AS n_matches,
              agg.first_match, agg.best_est_e4,
              (agg.d IS NULL) AS is_novel
            FROM batch b LEFT JOIN agg ON agg.d = b.doc_id
            ORDER BY b.doc_id"""
      },
      // The composed admission mouth: quality + langid over the batch,
      // the dedup gate's candidate generation restricted to the
      // base-corpus ∪ PASSERS population (non-passer batch docs are in
      // neither the index nor the admitted corpus — they can neither be
      // duplicates' evidence nor vouch for novelty), and the exact
      // best-stored-neighbor cosine for dedup-novel passers with an
      // embedding. Stage verdicts NULL when an earlier stage rejected.
      "q_pipeline_admit" -> {
        val newList = NewSources.map(s => s"'$s'").mkString(", ")
        val scoreOf = TextAnalysis.LangMarkers.map { case (l, ws) =>
          l -> s"len(list_filter(w, t -> t IN (${ws.map("'" + _ + "'").mkString(",")})))"
        }
        val bestScore = s"greatest(${scoreOf.map(_._2).mkString(", ")})"
        val langCase = scoreOf.map { case (l, e) =>
          s"WHEN $bestScore > 0 AND $e = $bestScore THEN '$l'"
        }.mkString("CASE ", " ", " ELSE 'und' END")
        s"""WITH bq AS (
              SELECT doc_id, text, $W AS w
              FROM documents WHERE source IN ($newList)),
            bflag AS (
              SELECT doc_id,
                CAST(len(w) AS BIGINT) AS n_toks,
                (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                  * 10000 // length(text) AS punct_e4,
                (CAST(len(w) AS BIGINT) >= 20 AND
                 (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                   * 10000 // length(text) < 500) AS quality_ok,
                $langCase AS lang_pred,
                ($langCase <> 'und') AS lang_ok
              FROM bq),
            passers AS (
              SELECT doc_id FROM bflag WHERE quality_ok AND lang_ok),
            corpus AS (
              SELECT doc_id, text FROM documents
              WHERE source NOT IN ($newList)
                 OR doc_id IN (SELECT doc_id FROM passers)),
            ${sigCteBodyFrom("corpus")},
            $bandExCtes,
            ${candCtes(mat = true)},
            hits AS (
              SELECT da, db,
                CAST(n_eq * 10000 // ${TextHash.MinhashK} AS BIGINT) AS est_e4
              FROM cand
              WHERE n_eq * 10000 // ${TextHash.MinhashK} >= $ClusterEdgeE4),
            sym AS (
              SELECT da AS d, db AS o, est_e4 FROM hits
              UNION ALL
              SELECT db AS d, da AS o, est_e4 FROM hits),
            m AS (
              SELECT s.d, s.o, s.est_e4
              FROM sym s JOIN passers p ON p.doc_id = s.d
              WHERE s.o NOT IN (SELECT doc_id FROM bq) OR s.o < s.d),
            dagg AS (
              SELECT d, max(est_e4) AS best_est_e4 FROM m GROUP BY d),
            dv AS (
              SELECT p.doc_id, (dagg.d IS NOT NULL) AS is_dup,
                     dagg.best_est_e4
              FROM passers p LEFT JOIN dagg ON dagg.d = p.doc_id),
            e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            en AS (
              SELECT vec_id, v,
                sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
            storedv AS (
              SELECT * FROM en
              WHERE vec_id NOT IN (SELECT doc_id FROM bq)),
            semq AS (
              SELECT dv.doc_id FROM dv
              WHERE NOT dv.is_dup
                AND dv.doc_id IN (SELECT vec_id FROM embeddings)),
            storedbest AS (
              SELECT q.doc_id AS qid,
                max(CAST(floor(
                  list_sum(list_transform(list_zip(qe.v, n.v), z -> z[1] * z[2]))
                    / (qe.nrm * n.nrm) * 10000) AS BIGINT)) AS stored_best_e4
              FROM semq q
              JOIN en qe ON qe.vec_id = q.doc_id
              JOIN storedv n ON TRUE
              GROUP BY q.doc_id),
            matebest AS (
              SELECT a.doc_id AS qid,
                max(CAST(floor(
                  list_sum(list_transform(list_zip(ea.v, eb.v), z -> z[1] * z[2]))
                    / (ea.nrm * eb.nrm) * 10000) AS BIGINT)) AS mate_best_e4
              FROM semq a
              JOIN semq b ON b.doc_id < a.doc_id
              JOIN en ea ON ea.vec_id = a.doc_id
              JOIN en eb ON eb.vec_id = b.doc_id
              GROUP BY a.doc_id),
            sembest AS (
              SELECT q.doc_id AS qid,
                greatest(s.stored_best_e4, m.mate_best_e4) AS sem_best_e4
              FROM semq q
              LEFT JOIN storedbest s ON s.qid = q.doc_id
              LEFT JOIN matebest m ON m.qid = q.doc_id)
            SELECT b.doc_id, b.n_toks, b.punct_e4, b.quality_ok,
              b.lang_pred, b.lang_ok, dv.is_dup, dv.best_est_e4,
              (b.doc_id IN (SELECT vec_id FROM embeddings)) AS has_emb,
              sembest.sem_best_e4,
              CASE WHEN dv.is_dup = FALSE
                    AND b.doc_id IN (SELECT vec_id FROM embeddings)
                   THEN coalesce(
                     sembest.sem_best_e4 < ${Similarity.NearDupE4}, TRUE)
                   ELSE NULL END AS sem_novel,
              coalesce(b.quality_ok AND b.lang_ok AND NOT dv.is_dup
                AND (b.doc_id NOT IN (SELECT vec_id FROM embeddings)
                     OR coalesce(
                       sembest.sem_best_e4 < ${Similarity.NearDupE4}, TRUE)),
                FALSE) AS admitted
            FROM bflag b
            LEFT JOIN dv ON dv.doc_id = b.doc_id
            LEFT JOIN sembest ON sembest.qid = b.doc_id
            ORDER BY b.doc_id"""
      },
      // Compaction is a LAYOUT rewrite: the compacted index must serve
      // exactly the from-scratch candidate set (same generator SQL), and
      // the engine stamps the in-plan layout verdict (edge bit-identity,
      // per-artifact row conservation, file-count reduction), expected
      // TRUE.
      "q_dedup_index_compact" -> {
        s"""$sigCte,
            $bandExCtes,
            ${candCtes(mat = true)}
            SELECT da, db, n_shared_bands, CAST(n_eq AS BIGINT) AS n_eq,
              CAST(n_eq * 10000 // ${TextHash.MinhashK} AS BIGINT) AS est_e4,
              TRUE AS compact_ok
            FROM cand ORDER BY da, db"""
      },
      "q_dedup_split" ->
        s"""$closurePrefix
            SELECT d.doc_id, d.source,
              CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS group_id,
              CASE WHEN ${TextHash.sqlH60("coalesce(c.cluster_id, d.doc_id) || '-split'")} % 100 < 80
                   THEN 'train'
                   WHEN ${TextHash.sqlH60("coalesce(c.cluster_id, d.doc_id) || '-split'")} % 100 < 90
                   THEN 'val'
                   ELSE 'test' END AS split
            FROM documents d
            LEFT JOIN clusters c ON d.doc_id = c.doc_id
            ORDER BY d.doc_id""",
      "q_dedup_src_matrix" ->
        s"""$edgesPrefix,
            lab AS (
              SELECT least(da.source, db.source) AS source_lo,
                     greatest(da.source, db.source) AS source_hi
              FROM edges e
              JOIN documents da ON e.a = da.doc_id
              JOIN documents db ON e.b = db.doc_id)
            SELECT source_lo, source_hi, count(*) AS n_edges
            FROM lab GROUP BY 1, 2 ORDER BY 1, 2""",
      "q_dedup_rates" ->
        s"""$closurePrefix
            SELECT d.source, count(*) AS n_docs,
              CAST(count(*) - sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
              CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dropped,
              CAST(sum(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS drop_e4
            FROM documents d
            LEFT JOIN (SELECT doc_id FROM clusters
                       WHERE doc_id <> cluster_id) c
              ON d.doc_id = c.doc_id
            GROUP BY 1 ORDER BY 1""",
      "q_dedup_editdist" ->
        s"""$edgesPrefix,
            lv AS (
              SELECT e.a, e.b,
                CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev,
                CAST(greatest(length(da.text), length(db.text)) AS BIGINT)
                  AS max_len
              FROM edges e
              JOIN documents da ON e.a = da.doc_id
              JOIN documents db ON e.b = db.doc_id)
            SELECT a, b, lev, max_len,
              CAST(CASE WHEN max_len = 0 THEN 0
                   ELSE lev * 10000 // max_len END AS BIGINT) AS dist_e4,
              CASE WHEN max_len = 0 THEN 0
                   ELSE lev * 10000 // max_len END <= $EditDupE4 AS is_dup
            FROM lv ORDER BY a, b""",
      // Stored-index lifecycle: the oracle recomputes the same edge set
      // from first principles; the Spark side reads it from the persisted
      // artifacts and carries the stored-vs-recomputed verdict in-plan.
      "q_dedup_indexed" ->
        s"""$edgesPrefix,
            lv AS (
              SELECT e.a, e.b,
                CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev,
                CAST(greatest(length(da.text), length(db.text)) AS BIGINT)
                  AS max_len
              FROM edges e
              JOIN documents da ON e.a = da.doc_id
              JOIN documents db ON e.b = db.doc_id)
            SELECT a, b, lev, max_len,
              CAST(CASE WHEN max_len = 0 THEN 0
                   ELSE lev * 10000 // max_len END AS BIGINT) AS dist_e4,
              CASE WHEN max_len = 0 THEN 0
                   ELSE lev * 10000 // max_len END <= $EditDupE4 AS is_dup,
              TRUE AS stored_ok
            FROM lv ORDER BY a, b""",
      "q_dedup_triangles" ->
        s"""$triPrefix
            SELECT (SELECT count(*) FROM edges) AS n_edges,
                   count(*) AS n_triangles
            FROM tri""",
      "q_dedup_clustcoeff" ->
        s"""$triPrefix,
            pernode AS (
              SELECT v AS doc_id, count(*) AS nt FROM (
                SELECT a AS v FROM tri
                UNION ALL SELECT b FROM tri
                UNION ALL SELECT c FROM tri)
              GROUP BY 1),
            deg AS (
              SELECT v AS doc_id, count(*) AS degree FROM (
                SELECT a AS v FROM edges UNION ALL SELECT b FROM edges)
              GROUP BY 1)
            SELECT deg.doc_id, degree,
              CAST(coalesce(nt, 0) AS BIGINT) AS n_triangles,
              CAST(CASE WHEN degree >= 2
                THEN (coalesce(nt, 0) * 20000) // (degree * (degree - 1))
                ELSE 0 END AS BIGINT) AS coeff_e4
            FROM deg LEFT JOIN pernode ON deg.doc_id = pernode.doc_id
            ORDER BY deg.doc_id""",
      "q_dedup_clusters" ->
        // Connected components via transitive closure (recursive CTE):
        // cluster id = min(node, min reachable node). Mirrors the Spark
        // side's min-label-propagation fixpoint exactly.
        s"""$closurePrefix
            SELECT doc_id, cluster_id FROM clusters ORDER BY doc_id""",
      "q_pipeline_curate" -> {
        val stop = TextAnalysis.Stopwords.map(x => s"'$x'").mkString(",")
        // The selection stage's oracle is the plain GLOBAL running sum
        // over the representatives — hash-matching it re-proves the Spark
        // side's banded prefix decomposition on the composed pipeline.
        s"""$closurePrefix,
            q AS (
              SELECT doc_id,
                CAST(len($W) AS BIGINT) AS n_toks,
                (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                  * 10000 // length(text) AS punct_e4,
                CAST(len(list_filter($W, t -> t IN ($stop)))
                  * 10000 // len($W) AS BIGINT) AS score
              FROM documents),
            g AS (
              SELECT q.*, q.n_toks >= 20 AND q.punct_e4 < 500 AS passes,
                coalesce(c.cluster_id, q.doc_id) AS group_id
              FROM q LEFT JOIN clusters c ON q.doc_id = c.doc_id),
            reps AS (
              SELECT group_id, min(doc_id) AS rep_id
              FROM g WHERE passes GROUP BY 1),
            mk AS (
              SELECT g.*,
                coalesce(g.passes AND g.doc_id = r.rep_id, false) AS is_rep
              FROM g LEFT JOIN reps r ON g.group_id = r.group_id),
            cum AS (
              SELECT doc_id,
                CAST(sum(n_toks) OVER (
                  ORDER BY score DESC, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_tokens
              FROM mk WHERE is_rep)
            SELECT mk.doc_id, mk.n_toks, mk.score,
              mk.passes AS passes_quality,
              mk.is_rep AS is_representative,
              cum.cum_tokens,
              coalesce(cum.cum_tokens <= $CurateBudget, false) AS kept
            FROM mk LEFT JOIN cum ON mk.doc_id = cum.doc_id
            ORDER BY mk.doc_id"""
      },
      "q_dedup_survivors" ->
        // The cleaned corpus: every document except non-representative
        // cluster members (anti-join via NOT EXISTS), with the surviving
        // representative carrying its cluster id and absorbed-doc count.
        s"""$closurePrefix,
            sizes AS (
              SELECT cluster_id, count(*) AS n_merged FROM clusters GROUP BY 1)
            SELECT d.doc_id, d.source,
              CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
              CAST(coalesce(s.n_merged, 1) AS BIGINT) AS n_merged,
              c.doc_id IS NOT NULL AS is_representative
            FROM documents d
            LEFT JOIN clusters c
              ON d.doc_id = c.doc_id AND c.doc_id = c.cluster_id
            LEFT JOIN sizes s ON c.cluster_id = s.cluster_id
            WHERE NOT EXISTS (
              SELECT 1 FROM clusters n
              WHERE n.doc_id = d.doc_id AND n.doc_id <> n.cluster_id)
            ORDER BY d.doc_id""",
      "q_graph_pagerank" -> {
        // Fixed-point PageRank, iterations UNROLLED as a chained CTE list
        // (pr0..prN) — a recursive CTE cannot aggregate over its own
        // recursive reference, and the fixed round count makes unrolling
        // exact. Mirrors [[pagerankFrom]]'s integer arithmetic verbatim.
        val rounds = (1 to PagerankIters).map { i =>
          s"""pr$i AS (
              SELECT d.node, d.degree,
                (15 * $PagerankScale) // (100 * (SELECT n FROM nc))
                  + (85 * s.c) // 100 AS pr
              FROM deg d JOIN (
                SELECT e.b AS node,
                  CAST(sum(p.pr // p.degree) AS BIGINT) AS c
                FROM pr${i - 1} p JOIN edges e ON e.a = p.node
                GROUP BY e.b) s ON d.node = s.node)"""
        }.mkString(",\n            ")
        s"""$sigCte,
            $bandExCtes,
            ${candCtes(mat = true)},
            und AS (
              SELECT da, db FROM cand
              WHERE n_eq * 10000 // ${TextHash.MinhashK} >= $ClusterEdgeE4),
            edges AS (
              SELECT da AS a, db AS b FROM und
              UNION ALL
              SELECT db AS a, da AS b FROM und),
            deg AS (
              SELECT a AS node, count(*) AS degree FROM edges GROUP BY 1),
            nc AS (SELECT count(*) AS n FROM deg),
            pr0 AS (
              SELECT node, degree,
                $PagerankScale // (SELECT n FROM nc) AS pr
              FROM deg),
            $rounds
            SELECT node AS doc_id, CAST(degree AS BIGINT) AS degree,
              CAST(pr AS BIGINT) AS pr
            FROM pr$PagerankIters ORDER BY doc_id"""
      },
      "q_graph_kcore" -> {
        // Fixed-round k-core peeling unrolled as a CTE chain per k (the
        // Spark side proves stability within the same round count or
        // throws, so the fixed unroll is exact). Each round keeps nodes
        // with ≥ k neighbors inside the surviving subgraph; the k=3 peel
        // starts from the 2-core survivors, mirroring [[kcoreFrom]].
        // AS MATERIALIZED throughout: every round references its
        // predecessor twice, so an inlining planner would otherwise
        // duplicate the whole chain below it — 2^rounds copies of the
        // base scan (observed as a file-handle explosion).
        def peelRounds(k: Int, start: String) =
          (1 to KcorePeelRounds).map { i =>
            val prev = if (i == 1) start else s"c${k}_${i - 1}"
            s"""c${k}_$i AS MATERIALIZED (
                SELECT u.a AS node FROM und u
                JOIN $prev x ON u.a = x.node
                JOIN $prev y ON u.b = y.node
                GROUP BY u.a HAVING count(*) >= $k)"""
          }.mkString(",\n            ")
        val coreJoins = (2 to KcoreMax).map { k =>
          s"LEFT JOIN c${k}_$KcorePeelRounds k$k ON d.node = k$k.node"
        }.mkString("\n            ")
        val corenessExpr = (2 to KcoreMax)
          .map(k => s"CASE WHEN k$k.node IS NOT NULL THEN 1 ELSE 0 END")
          .mkString(" + ")
        s"""$edgesPrefix,
            und AS MATERIALIZED (
              SELECT a, b FROM edges
              UNION ALL
              SELECT b AS a, a AS b FROM edges),
            deg AS MATERIALIZED (
              SELECT a AS node, count(*) AS degree FROM und GROUP BY 1),
            c2_0 AS (SELECT node FROM deg),
            ${peelRounds(2, "c2_0")},
            ${peelRounds(3, s"c2_$KcorePeelRounds")}
            SELECT d.node AS doc_id, CAST(d.degree AS BIGINT) AS degree,
              CAST(1 + $corenessExpr AS BIGINT) AS coreness
            FROM deg d
            $coreJoins
            ORDER BY doc_id"""
      },
      "q_dedup_ppjoin" ->
        s"""$ppjoinBodySql
            SELECT da, db, common,
              CAST(common * 10000 // (na + nb - common) AS BIGINT) AS jacc_e4,
              common * 10000 // (na + nb - common) >= $PpjoinTauE4 AS is_dup
            FROM v ORDER BY da, db""",
      // The stored-index probe recomputed from first principles (one
      // shared body with q_dedup_ppjoin — the stored lifecycle may not
      // drift from the recomputed tier) + the stored_ok verdict the
      // engine stamps in-plan, expected TRUE.
      "q_dedup_ppjoin_indexed" ->
        s"""$ppjoinBodySql
            SELECT da, db, common,
              CAST(common * 10000 // (na + nb - common) AS BIGINT) AS jacc_e4,
              common * 10000 // (na + nb - common) >= $PpjoinTauE4 AS is_dup,
              TRUE AS stored_ok
            FROM v ORDER BY da, db""",
      // The deferred-statistics lifecycle: the stored prefix after
      // O(batch)-append + restate must equal the from-first-principles
      // global-rarity prefix over the WHOLE corpus; both lifecycle
      // verdicts expected TRUE.
      "q_dedup_index_restate" ->
        s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
            d AS (SELECT doc_id, $ShSql AS sh FROM t),
            $cappedPfxCtes
            SELECT doc_id, s, TRUE AS was_deferred, TRUE AS restate_ok
            FROM pfx ORDER BY doc_id, s""",
      "q_dedup_index_maintain" ->
        s"""WITH t AS (SELECT doc_id, $W AS w FROM documents),
            d AS (SELECT doc_id, $ShSql AS sh FROM t),
            $cappedPfxCtes
            SELECT doc_id, s, TRUE AS was_deferred, TRUE AS fresh_after,
                   TRUE AS frag_bounded, TRUE AS second_noop
            FROM pfx ORDER BY doc_id, s""",
      "q_dedup_calibration" -> {
        val est = s"c.n_eq * 10000 // ${TextHash.MinhashK}"
        val jac = "common * 10000 // (na + nb - common)"
        s"""$sigCte,
            $bandExCtes,
            ${candCtes(mat = true)},
            ex0 AS (SELECT doc_id, unnest(sh) AS s0 FROM d),
            exh AS (SELECT doc_id, ${TextHash.sqlH32("s0")} AS s FROM ex0),
            capped AS (
              SELECT doc_id, s FROM (
                SELECT doc_id, s, count(*) OVER (PARTITION BY s) AS df FROM exh)
              WHERE df <= $MaxShingleDf),
            exn AS MATERIALIZED (
              SELECT doc_id, s, count(*) OVER (PARTITION BY doc_id) AS n
              FROM capped),
            ov AS (
              SELECT c.da, c.db, count(*) AS common,
                     max(a.n) AS na, max(b.n) AS nb
              FROM cand c
              JOIN exn a ON a.doc_id = c.da
              JOIN exn b ON b.doc_id = c.db AND b.s = a.s
              GROUP BY 1, 2)
            SELECT c.da, c.db, CAST(c.n_eq AS BIGINT) AS n_eq,
              CAST($est AS BIGINT) AS est_e4,
              CAST(coalesce(common, 0) AS BIGINT) AS common,
              CAST(coalesce($jac, 0) AS BIGINT) AS jacc_e4,
              CAST($est - coalesce($jac, 0) AS BIGINT) AS err_e4
            FROM cand c LEFT JOIN ov ON c.da = ov.da AND c.db = ov.db
            ORDER BY c.da, c.db"""
      },
      "q_dedup_substr" -> {
        val gramSql = TextHash.sqlH32(
          s"concat_ws(' ', ${(0 until SubstrGram).map(j => s"w[p+$j]").mkString(", ")})")
        s"""$edgesPrefix,
            tw AS (SELECT doc_id, $W AS w FROM documents),
            gr AS (SELECT doc_id, w,
                     unnest(generate_series(1, greatest(len(w) - ${SubstrGram - 1}, 1))) AS p
                   FROM tw),
            g AS MATERIALIZED (SELECT doc_id, CAST(p AS BIGINT) AS p, $gramSql AS gh FROM gr),
            m AS (SELECT e.a, e.b, ga.p AS pa, gb.p AS pb
                  FROM edges e
                  JOIN g ga ON ga.doc_id = e.a
                  JOIN g gb ON gb.doc_id = e.b AND gb.gh = ga.gh),
            r AS (SELECT a, b, pa - pb AS d, pa,
                    pa - row_number() OVER (
                      PARTITION BY a, b, pa - pb ORDER BY pa) AS grp
                  FROM m),
            runs AS (SELECT a, b, d, grp, count(*) AS run
                     FROM r GROUP BY 1, 2, 3, 4),
            agg AS (SELECT a, b,
                      CAST(sum(run) AS BIGINT) AS n_shared,
                      CAST(count(DISTINCT d) AS BIGINT) AS n_diag,
                      CAST(max(run) AS BIGINT) AS max_run
                    FROM runs GROUP BY 1, 2)
            SELECT e.a, e.b,
              coalesce(n_shared, 0) AS n_shared,
              coalesce(n_diag, 0) AS n_diag,
              coalesce(max_run, 0) AS max_run_grams,
              coalesce(max_run + ${SubstrGram - 1}, 0) AS max_run_tokens,
              coalesce(max_run + ${SubstrGram - 1}, 0) >= $SubstrRunTokens
                AS is_substr_dup
            FROM edges e LEFT JOIN agg USING (a, b) ORDER BY a, b"""
      },
      "q_dedup_simhash" -> {
        val bitSums = (0 until 32)
          .map(j => s"sum(CASE WHEN (h >> $j) % 2 = 1 THEN 1 ELSE -1 END) AS s$j")
          .mkString(",\n              ")
        val simhash = (0 until 32)
          .map(j => s"CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END")
          .mkString(" + ")
        s"""WITH tok AS (
              SELECT doc_id, ${TextHash.sqlH32("t.t")} AS h
              FROM (SELECT doc_id, unnest($W) AS t FROM documents) t),
            bits AS (
              SELECT doc_id,
              $bitSums
              FROM tok GROUP BY doc_id),
            sh AS (SELECT doc_id, CAST($simhash AS BIGINT) AS simhash FROM bits)
            SELECT doc_id, simhash, simhash >> 24 AS bucket_hi8
            FROM sh ORDER BY doc_id"""
      },
    )
  }
}
