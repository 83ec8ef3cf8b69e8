package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{MisraGriesAggregator, TextHash, TopKAggregator}
import graft.syntax._

/** Advanced operator surface: as-of (point-in-time) join, pivot, grouping
  * sets, deterministic sampling, custom typed UDAF, exact percentiles, and
  * HLL++ approximate distinct (the one intentionally-approximate operator,
  * checked rows-only rather than hash-matched). */
object Advanced {

  /** As-of join within the event stream: for every `error` event, the most
    * recent preceding `purchase` by the same user.
    *
    * Scale shape: NOT a range join — union the two event roles, sort once
    * per user, and carry the last purchase forward with an ignore-nulls
    * last_value window. One shuffle on user_id, one sort, linear scan; this
    * is the canonical distributed point-in-time join. */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.filter($"event_type".isin("error", "purchase"))
      .withColumn("purchase_us",
        when($"event_type" === "purchase", unix_micros($"ts")))
      .withColumn("purchase_id",
        when($"event_type" === "purchase", $"event_id"))
      .withColumn("last_purchase_us", last($"purchase_us", ignoreNulls = true).over(w))
      .withColumn("last_purchase_id", last($"purchase_id", ignoreNulls = true).over(w))
      .filter($"event_type" === "error" && $"last_purchase_id".isNotNull)
      .select($"event_id", $"user_id", unix_micros($"ts").as("error_us"),
              $"last_purchase_id", $"last_purchase_us")
  }

  /** Tolerance for [[qAsofForward]]: a match further ahead than this is
    * no match (LOCF-with-staleness-bound semantics, mirrored). */
  private val AsofToleranceUs = 3600L * 1000000L

  /** FORWARD as-of join with a tolerance — the complement of
    * [[qAsofJoin]]'s backward LOCF: each error event picks the NEXT
    * purchase by the same user (the "time to remediation/next conversion"
    * direction), but only within 1 hour — a match further ahead reads as
    * no match (NULLs kept visible), which is the staleness bound every
    * production as-of join carries. Same single-window plan: an
    * unbounded-FOLLOWING ignore-nulls `first` over the user-ordered
    * stream — no range self-join, no per-event probe. */
  def qAsofForward(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .filter($"event_type".isin("error", "purchase"))
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"event_type")
      .withColumn("np_us", first(
        when($"event_type" === "purchase", $"us"), ignoreNulls = true).over(w))
      .withColumn("np_id", first(
        when($"event_type" === "purchase", $"event_id"), ignoreNulls = true).over(w))
      .filter($"event_type" === "error")
      .withColumn("in_tol", $"np_us".isNotNull && $"np_us" - $"us" <= AsofToleranceUs)
      .select($"event_id", $"user_id", $"us".as("error_us"),
        when($"in_tol", $"np_id").as("next_purchase_id"),
        when($"in_tol", $"np_us" - $"us").as("gap_us"))
  }

  /** NEAREST as-of join — the third member of the as-of family (backward
    * LOCF [[qAsofJoin]], forward [[qAsofForward]], and this: pick
    * whichever purchase is temporally closest to each error, signed gap
    * kept so the direction is visible; exact ties prefer the earlier
    * (backward) match — the convention pandas' merge_asof(direction=
    * 'nearest') uses). Still one sorted pass: BOTH candidate sides come
    * from the same (user, time)-ordered window — an ignore-nulls `last`
    * over the preceding frame and `first` over the following frame — so
    * the plan is a single sort + two window nodes, never a range
    * self-join or per-row probe. */
  def qAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    val wb = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val pUs = when($"event_type" === "purchase", $"us")
    val pId = when($"event_type" === "purchase", $"event_id")
    Tables.events(spark, dir)
      .filter($"event_type".isin("error", "purchase"))
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"event_type")
      .withColumn("pp_us", last(pUs, ignoreNulls = true).over(wb))
      .withColumn("pp_id", last(pId, ignoreNulls = true).over(wb))
      .withColumn("np_us", first(pUs, ignoreNulls = true).over(wf))
      .withColumn("np_id", first(pId, ignoreNulls = true).over(wf))
      .filter($"event_type" === "error" &&
              ($"pp_id".isNotNull || $"np_id".isNotNull))
      .withColumn("take_prev",
        $"pp_us".isNotNull &&
          ($"np_us".isNull || $"us" - $"pp_us" <= $"np_us" - $"us"))
      .select($"event_id", $"user_id", $"us".as("error_us"),
        when($"take_prev", $"pp_id").otherwise($"np_id")
          .as("nearest_purchase_id"),
        (when($"take_prev", $"pp_us").otherwise($"np_us") - $"us").as("gap_us"),
        when($"take_prev", lit(-1L)).otherwise(lit(1L)).as("direction"))
  }

  /** Pivot: order counts per priority × status (fixed value set → static
    * columns; Catalyst plans a single pass of conditional aggregates). */
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select($"o_orderpriority",
        coalesce($"F", lit(0L)).as("n_f"),
        coalesce($"O", lit(0L)).as("n_o"),
        coalesce($"P", lit(0L)).as("n_p"))
      .orderBy($"o_orderpriority")

  /** GROUPING SETS (beyond rollup/cube): two single-dimension sets plus the
    * grand total in one pass. */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir).createOrReplaceTempView("lineitem_gs")
    spark.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
                coalesce(l_linestatus, 'ALL') AS linestatus,
                CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
                CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
                sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem_gs
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY returnflag, linestatus, g_rf, g_ls""")
  }

  /** Deterministic 10% sample: hash-mod on the primary key instead of
    * Bernoulli RNG, so the sample is reproducible across engines and runs
    * (the only sampling that can be oracle-checked — and the right way to
    * sample consistently across pipeline stages at scale). */
  def qSampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .withColumn("hk",
        TextHash.h60(concat($"l_orderkey".cast("string"), lit("-"),
                            $"l_linenumber".cast("string"))))
      .filter($"hk" % 100 < 10)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag")

  /** Stratified deterministic sampling: per-stratum rates (downsample the
    * dominant event classes hard, keep the rare ones dense — the class
    * re-balancing step of a training-data pipeline) decided by a portable
    * hash of the row key, so the sample is reproducible across engines,
    * runs, and partitionings. Pure narrow projection + filter + partial
    * aggregation: no shuffle beyond the final per-stratum rollup. */
  def qSampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val rate = when($"event_type" === "purchase", 50L)
      .when($"event_type" === "signup", 25L)
      .when($"event_type" === "error", 10L)
      .otherwise(5L)
    val inSample = TextHash.h60($"event_id".cast("string")) % 100L < rate
    Tables.events(spark, dir)
      .withColumn("in_sample", inSample)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when($"in_sample", 1L).otherwise(0L)).as("n_sampled"),
        sum(when($"in_sample", round($"value" * 100).cast("long")).otherwise(0L))
          .as("value_c_sampled"))
      .orderBy($"event_type")
  }

  /** Mixture weights for [[qMixSources]]: up-weight the first five sources,
    * mid-weight the next five, keep the tail at 1. Σ over the fixture's 20
    * sources = 5·3 + 5·2 + 10·1 = 35. */
  private val MixHi = (0 to 4).map(i => s"src$i")
  private val MixMid = (5 to 9).map(i => s"src$i")
  private val MixWeightSum = 35L

  /** Deterministic corpus mixture rebalancing — the data-mixing step that
    * turns "whatever the crawl gave us" into the source distribution a
    * training run actually wants: each source gets a target row count
    * proportional to its mixture weight (budget = 60% of the corpus), and
    * membership is decided by a portable hash of the key against the
    * per-source keep rate — reproducible across engines, runs, and
    * partitionings, and consistent with every other hash-sampled stage.
    *
    * Scale shape: per-source counts are one partial+final hash aggregate;
    * the 1-row total rides a broadcast cross join; the ≤|sources|-row rate
    * table broadcasts back onto the corpus scan for the kept-count
    * aggregate. Two narrow aggregates + two broadcast joins — no corpus
    * shuffle at any scale. All arithmetic is integer (floor division), so
    * the emitted plan (targets, rates, kept counts) hash-matches. */
  def qMixSources(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val counts = docs.groupBy($"source").agg(count(lit(1)).as("n_s"))
    val tot = counts.agg(sum($"n_s").as("n_tot"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("weight",
        when($"source".isin(MixHi: _*), 3L)
          .when($"source".isin(MixMid: _*), 2L)
          .otherwise(1L))
      .withColumn("target_n",
        expr(s"((n_tot * 6) div 10) * weight div $MixWeightSum"))
      .withColumn("rate_bp", least(lit(10000L), expr("target_n * 10000 div n_s")))
    val kept = docs
      .join(broadcast(rates.select($"source", $"rate_bp")), Seq("source"))
      .filter(TextHash.h60($"doc_id".cast("string")) % 10000L < $"rate_bp")
      .groupBy($"source").agg(count(lit(1)).as("n_kept"))
    rates.join(kept, Seq("source"), "left")
      .select($"source", $"n_s", $"weight", $"target_n", $"rate_bp",
        coalesce($"n_kept", lit(0L)).as("n_kept"))
      .orderBy($"source")
  }

  /** Deterministic export sharding — the "shuffle the corpus into N
    * reproducible output shards" step before a training run: shard by a
    * portable hash of the key (uniform by construction, stable across
    * engines/partitionings) and order within each shard by (hash, key) so
    * every shard's file content is bit-reproducible. The per-shard
    * row_number is the only sort, and it sorts one shard per task — hash
    * sharding guarantees balance, so there is no skewed window partition. */
  def qExportShuffle(spark: SparkSession, dir: String): DataFrame = {
    val h = TextHash.h60($"doc_id".cast("string"))
    Tables.documents(spark, dir)
      .select($"doc_id", (h % 8L).as("shard"), h.as("hk"))
      .withColumn("rnk",
        row_number().over(Window.partitionBy($"shard").orderBy($"hk", $"doc_id"))
          .cast("long"))
      .select($"doc_id", $"shard", $"rnk")
  }

  /** Sorted-run export manifest — the write-side layout audit for "shard
    * by hash, sort within shard" exports ([[qExportShuffle]] proves the
    * row-level assignment; this is the per-RUN summary a downstream
    * reader/compactor consumes): per shard, the row count and the sort-key
    * span (min/max/width). A reader doing merge-joins over the export
    * plans off exactly these run boundaries. One hash aggregate on the
    * 8-value shard key — min/max/count are order-independent, so the
    * manifest is deterministic under any parallelism. */
  def qExportRuns(spark: SparkSession, dir: String): DataFrame = {
    val h = TextHash.h60($"doc_id".cast("string"))
    Tables.documents(spark, dir)
      .select((h % 8L).as("shard"), h.as("hk"))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_rows"),
           min($"hk").as("min_key"),
           max($"hk").as("max_key"))
      .withColumn("key_span", $"max_key" - $"min_key")
  }

  /** Order-independent per-table content checksums — the anti-entropy /
    * replication audit: one row per audited table with its row count and
    * the bit-XOR of a portable 60-bit row hash over the key columns.
    * XOR is commutative, associative and overflow-free, so the checksum
    * is identical under any partitioning/order — two clusters (or two
    * engines, as the oracle proves) can compare corpus state by shipping
    * three numbers instead of any data. */
  def qDqChecksum(spark: SparkSession, dir: String): DataFrame = {
    def row(table: String, df: DataFrame, keyExpr: Column): DataFrame =
      df.select(TextHash.h60(keyExpr).as("h"))
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("xor_check"))
        .select(lit(table).as("tbl"), $"n_rows", $"xor_check")
    row("documents", Tables.documents(spark, dir),
        concat_ws("|", $"doc_id", $"source"))
      .unionAll(row("events", Tables.events(spark, dir),
        concat_ws("|", $"event_id", $"user_id", $"event_type")))
      .unionAll(row("orders", Tables.orders(spark, dir),
        concat_ws("|", $"o_orderkey", $"o_custkey")))
  }

  /** Candidate-key discovery — the schema-inference audit a warehouse runs
    * before declaring constraints or choosing bucketing/partition keys:
    * for each proposed column combo, exact |distinct| vs |rows| and the
    * uniqueness ratio (integer e6), flagging true keys. Timestamps enter
    * the tuple as epoch micros (engine-neutral; string-formatting a
    * timestamp differs across engines).
    *
    * Scale: ONE column-pruned scan per audited table — all of a table's
    * key combos ride the same aggregate as side-by-side `count_distinct`
    * expressions (Catalyst plans the multi-distinct via one Expand, whose
    * fan-out is bounded by the combo count, here ≤4), then the single
    * result row unpivots to one row per combo with `stack`. At 100 TB the
    * fact table is read once instead of once per combo; the Expand's 4×
    * row inflation is map-side and pre-aggregated before the one-row
    * shuffle. */
  def qDqKeys(spark: SparkSession, dir: String): DataFrame = {
    val metrics: Seq[Column] = Seq(
      $"key_cols", $"n_rows", $"n_distinct",
      expr("n_distinct * 1000000 div n_rows").as("unique_e6"),
      ($"n_distinct" === $"n_rows").cast("long").as("is_key"))
    val ev = Tables.events(spark, dir)
      .agg(count(lit(1)).as("n_rows"),
           countDistinct($"event_id".cast("string")).as("d_eid"),
           countDistinct($"user_id".cast("string")).as("d_uid"),
           countDistinct(concat_ws("|", $"user_id", unix_micros($"ts")))
             .as("d_uts"),
           countDistinct(concat_ws("|", $"user_id", $"event_type"))
             .as("d_uty"))
      .select(expr(
        """stack(4,
             'events(event_id)',           d_eid,
             'events(user_id)',            d_uid,
             'events(user_id,ts)',         d_uts,
             'events(user_id,event_type)', d_uty)
           AS (key_cols, n_distinct)"""), $"n_rows")
    val os = Tables.orders(spark, dir)
      .agg(count(lit(1)).as("n_rows"),
           countDistinct($"o_orderkey".cast("string")).as("d_ok"),
           countDistinct($"o_custkey".cast("string")).as("d_ck"))
      .select(expr(
        """stack(2,
             'orders(o_orderkey)', d_ok,
             'orders(o_custkey)',  d_ck)
           AS (key_cols, n_distinct)"""), $"n_rows")
    ev.select(metrics: _*).unionAll(os.select(metrics: _*))
  }

  /** Small-file compaction planner — the table-maintenance pass every
    * 100 TB lakehouse runs: treat each document as a data file of
    * `n_chars` bytes inside its `source` partition, walk files in id
    * order, and assign each to an output bin of ~256 KB by the banded
    * running sum (bin = bytes-before ÷ target). Emits the per-bin
    * manifest (file count, bytes, id range) a rewrite job would execute.
    * Oversized files (> target) land alone in their own bin — exactly
    * the "don't split, don't merge" rule real compactors use.
    *
    * Scale: the only wide op is a running sum windowed BY PARTITION
    * (source) — each table partition plans independently, so the job
    * parallelizes across partitions and no global sort exists. The same
    * banded-prefix-sum decomposition as q_txt_budget applies if one
    * partition alone exceeds a task. */
  def qLayoutCompact(spark: SparkSession, dir: String): DataFrame = {
    val target = 262144L
    val bysrc = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select($"source", $"doc_id", $"n_chars")
      .withColumn("bytes_before", coalesce(sum($"n_chars").over(bysrc), lit(0L)))
      .withColumn("bin", expr(s"bytes_before div $target"))
      .groupBy($"source", $"bin")
      .agg(count(lit(1)).as("n_files"),
           sum($"n_chars").as("bytes"),
           min($"doc_id").as("first_doc"),
           max($"doc_id").as("last_doc"))
  }

  /** Snapshot-diff audit — the table-maintenance op behind incremental
    * corpus refreshes ("what changed between crawl N-1 and crawl N"):
    * FULL OUTER join of the two snapshots' (id, content-fingerprint)
    * projections, classifying every id as unchanged / changed / added /
    * removed, rolled up to per-status counts plus an order-independent
    * XOR fingerprint of the ids in each class (the anti-entropy flavor —
    * two sites can compare deltas by shipping 4 rows).
    *
    * The PRIOR snapshot is derived deterministically from the current
    * corpus (the fixture ships one snapshot — same convention as the
    * synthetic partsupp): ~10% of ids are absent from the prior
    * (= "added"), ~1/7 carry a perturbed prior fingerprint (= "changed"),
    * and ids shifted by 10⁹ exist only in the prior (= "removed"). The
    * SAME derivation is emitted in the oracle SQL, so the diff logic —
    * the part a real pipeline reuses against a stored prior snapshot —
    * is hash-gated.
    *
    * Scale: two narrow (id, fingerprint) projections, one equi-join on
    * id, one 4-group aggregate. The fingerprint is computed map-side;
    * nothing is broadcast (both snapshots are corpus-sized), and the
    * join key is the id both sides are naturally keyed by. */
  def qDqSnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val h = TextHash.h60($"doc_id".cast("string"))
    val fp = TextHash.h60($"text")
    val curr = docs.select($"doc_id", fp.as("fp"))
    val prevReal = docs
      .filter(h % 10L < 9L) // ids missing here are "added" in current
      .select($"doc_id",
        when(h % 7L === 0L, fp + 1L).otherwise(fp).as("fp"))
    val prevOnly = docs
      .filter(h % 13L === 0L) // prior-only ids: "removed" in current
      .select(($"doc_id" + 1000000000L).as("doc_id"), fp.as("fp"))
    graft.ops.TableMaintenance
      .snapshotDiff(curr, prevReal.unionAll(prevOnly), "doc_id", "fp")
      .orderBy($"status")
  }

  /** Deletion-propagation manifest — the "right to be forgotten" pass a
    * 100 TB lakehouse must run across every table that carries a doomed
    * key: given the deletion list (derived deterministically here — ~3%
    * of doc ids by portable hash; a real run reads a requests table),
    * emit per affected table the total / deleted / surviving row counts
    * and the surviving rows' order-independent XOR checksum — the audit
    * artifact proving the purge happened and WHAT remains, comparable
    * across replicas by shipping two rows.
    *
    * Scale: the deletion list is corpus-proportional (~3%), so membership
    * is an equi-join on the id both tables are keyed by (LEFT join +
    * conditional aggregation — one pass per table), NOT a broadcast; at
    * 1000 executors each table scans once and shuffles only its id
    * column. Embeddings share the documents id space (the RAG queries'
    * join contract), so the same list purges both. */
  def qDqForget(spark: SparkSession, dir: String): DataFrame = {
    def audit(table: String, df: DataFrame, idCol: String): DataFrame =
      graft.ops.TableMaintenance.deletionManifest(table, df, idCol,
        TextHash.h60(col(idCol).cast("string")) % 29L === 0L)
    audit("documents", Tables.documents(spark, dir), "doc_id")
      .unionAll(audit("embeddings", Tables.embeddings(spark, dir), "vec_id"))
  }

  /** Deterministic weighted (probability-proportional-to-size) sample:
    * priority = ⌊h32(doc_id)·10⁶ / weight⌋ with weight = n_chars, keep
    * the k = 100 lowest (priority, doc_id) — bigger documents get
    * proportionally smaller priorities, so the sample skews toward mass
    * while staying reproducible across engines, runs and partitionings
    * (the same determinism contract as the hash/stratified samplers; a
    * true Efraimidis–Spirakis exponential key needs pow(), whose last-ulp
    * behavior differs across libms and would break the hash gate).
    *
    * Scale: narrow projection + integer arithmetic + global top-k =
    * TakeOrderedAndProject (k rows per partition shuffle to one reducer);
    * no full sort, no full shuffle. */
  def qSampleWeighted(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("hk", TextHash.h32($"doc_id".cast("string")))
      .select($"doc_id", $"source", $"n_chars",
        expr("hk * 1000000 div n_chars").as("priority"))
      .orderBy($"priority", $"doc_id")
      .limit(100)

  /** Custom typed UDAF: exact top-3 order values per market segment via
    * [[TopKAggregator]] — partial aggregation keeps ≤k values per map task.
    * The array result is flattened to scalar (rank, price-in-cents) rows so
    * the output is hash-comparable column-by-column. */
  def qUdafTopk(spark: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new TopKAggregator(3))
    Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(topk($"o_totalprice").as("top3"))
      .select($"c_mktsegment", posexplode($"top3"))
      .select($"c_mktsegment",
        ($"pos" + 1).cast("long").as("rank"),
        round($"col" * 100).cast("long").as("price_c"))
      .orderBy($"c_mktsegment", $"rank")
  }

  /** Exact percentiles (Spark's `percentile`, continuous interpolation) over
    * integer cents so interpolation arithmetic is engine-identical. */
  def qPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("price_c", round($"o_totalprice" * 100).cast("long"))
      .groupBy($"o_orderstatus")
      .agg(
        // floor (not cast) before BIGINT: DuckDB's double→int cast rounds
        // while Spark's truncates; floor is identical in both.
        expr("CAST(floor(percentile(price_c, 0.5)) AS BIGINT)").as("p50_c"),
        expr("CAST(floor(percentile(price_c, 0.9)) AS BIGINT)").as("p90_c"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")

  /** Approximate percentiles (quantile sketch with a bounded accuracy
    * parameter) — the streaming/huge-group companion to the exact
    * [[qPercentile]]: the sketch is mergeable, so partial aggregation works
    * at any group size where exact percentile would need a full sort.
    *
    * Oracle-gated exact-vs-estimate form (same pattern as
    * `q_dedup_calibration`): the ONE aggregate computes the exact floor
    * percentiles AND the sketch estimates side by side, and emits the exact
    * values plus per-percentile verdicts. The DuckDB oracle recomputes the
    * exact side and expects the verdict literals TRUE — an out-of-bound
    * estimate flips a boolean and fails the hash, so the approximation
    * quality is driver-gated, not just spec-gated.
    *
    * The verdict bound is derived from the sketch's actual contract:
    * `approx_percentile(…, accuracy)` returns a real item whose RANK is
    * within ~N/accuracy of the target rank — plus one item of granularity
    * (measured on the fixtures: the summary can sit one order statistic
    * outside the nominal ε·N window at small N). The gate therefore checks
    * the estimate lies between the exact percentiles at p ± 0.01 — ten
    * nominal ε at accuracy=1000, which absorbs the ±1-item granularity for
    * any group of ≥ ~200 rows while still failing loudly on a genuinely
    * broken sketch. A value-space bound (±5% of the value) would couple
    * the gate to the price DISTRIBUTION — fine on this fixture, spuriously
    * red on a skewed one — while a rank-space bound holds on any data. */
  def qApproxPercentile(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .withColumn("price_c", round($"o_totalprice" * 100).cast("long"))
      .groupBy($"o_orderstatus")
      .agg(
        // ONE array-fraction percentile buffer (not six scalar aggs):
        // exact percentile sorts the group once per aggregate buffer, so
        // fusing the targets + rank-window bounds into a single call keeps
        // the cost identical to the plain two-fraction exact query.
        expr("percentile(price_c, array(0.5D, 0.9D, 0.49D, 0.51D, 0.89D, 0.91D))")
          .as("pct"),
        expr("approx_percentile(price_c, array(0.5D, 0.9D), 1000)").as("ap"),
        count(lit(1)).as("n"))
      .select($"o_orderstatus",
        floor(element_at($"pct", 1)).cast("long").as("p50_c"),
        floor(element_at($"pct", 2)).cast("long").as("p90_c"),
        $"n",
        (element_at($"ap", 1) >= floor(element_at($"pct", 3)) &&
         element_at($"ap", 1) <= ceil(element_at($"pct", 4))).as("p50_ok"),
        (element_at($"ap", 2) >= floor(element_at($"pct", 5)) &&
         element_at($"ap", 2) <= ceil(element_at($"pct", 6))).as("p90_ok"))

  /** HLL++ approximate count distinct, oracle-gated: exact
    * `count_distinct` and the 2.5%-rsd HLL++ estimate ride the same
    * aggregate; the output carries the exact count plus a
    * `within 10% of exact` (4σ) verdict the DuckDB oracle expects to be
    * TRUE. The estimate can never hash-match a non-HLL engine, but the
    * verdict can — and it fails loudly if the sketch drifts.
    *
    * Shape: mixing a distinct aggregate with plain ones in ONE pass
    * plans an Expand (every row duplicated per aggregate group) — the
    * round-9 10× lane measured that as its worst growth (5×, the lane's
    * only spill). Staged instead as a two-level aggregation: the first
    * level dedupes (flag, orderkey) WITH map-side partial combine (the
    * shuffle carries ~distinct rows, not raw×2), and the second level
    * counts the deduped keys exactly. The HLL estimate is insensitive to
    * duplicates by construction, so feeding it deduped keys leaves the
    * estimate — and the verdict the oracle checks — unchanged. */
  def qApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_orderkey")
      .agg(count(lit(1)).as("n_rows"))
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("exact_orders"),
           approx_count_distinct($"l_orderkey", 0.025).as("est"),
           sum($"n_rows").as("n"))
      .select($"l_returnflag", $"exact_orders", $"n",
        (abs($"est" - $"exact_orders") * 10L <= $"exact_orders")
          .as("within_bound"))

  /** HLL sketch ROLLUP by merge — the property that makes sketches matter
    * at 100 TB: per-source HLL sketches (datasketches HLL via
    * `hll_sketch_agg`, lgK = 12) union into the corpus-wide estimate
    * WITHOUT rescanning a single row — the same shape as merging
    * per-day/per-shard sketches into monthly/global cardinalities in a
    * metrics warehouse. The exact total rides the same plan (doc ids are
    * globally unique, so the per-source exact counts sum), and the output
    * is oracle-gated exact-vs-estimate: (exact_total, n_sources,
    * `merged estimate within 7% of exact` — the lgK = 12 ~1.6% rse at
    * >4σ). The DuckDB oracle recomputes the exact side and expects the
    * verdict TRUE, so a drifting union estimate fails the hash gate; the
    * spec additionally pins the union to a direct whole-corpus sketch
    * (datasketches unions into a dense target, so the two are close but
    * NOT bit-equal). */
  def qApproxHllUnion(spark: SparkSession, dir: String): DataFrame = {
    val perSource = Tables.documents(spark, dir)
      .groupBy($"source")
      .agg(expr("hll_sketch_agg(doc_id, 12)").as("sk"),
           countDistinct($"doc_id").as("exact"))
    perSource.agg(
      expr("CAST(hll_sketch_estimate(hll_union_agg(sk, true)) AS BIGINT)")
        .as("est_union"),
      sum($"exact").as("exact_total"),
      count(lit(1)).as("n_sources"))
      .select($"exact_total", $"n_sources",
        (abs($"est_union" - $"exact_total") * 100L <= $"exact_total" * 7L)
          .as("within_bound"))
  }

  /** Count-min-sketch heavy hitters — the streaming-friendly "which keys are
    * hot" sketch (fixed memory, mergeable, one pass): build ONE CMS over
    * all part keys (entry-wise-additive merge → deterministic for a fixed
    * seed regardless of partitioning), pick the exact top-10 parts, and
    * gate the sketch against exact counts. The sketch probe deserializes
    * ONE aggregated sketch (a few KB) on the driver — the bounded-aggregate
    * pattern; the stream length N rides the same aggregate row.
    * Oracle-gated exact-vs-estimate: the output is the exact top-10 counts
    * (SQL-expressible) plus the CMS contract verdict
    * `exact ≤ est ≤ exact + ε·N` per key (ε = 0.001), which the DuckDB
    * oracle expects to be TRUE — an under-count (impossible for a correct
    * CMS) or an over-ε collision burst fails the hash gate. */
  def qApproxHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val row = li
      .agg(expr("count_min_sketch(l_partkey, 0.001d, 0.99d, 42)").as("sk"),
           count(lit(1)).as("n"))
      .head()
    val sketch = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(row.getAs[Array[Byte]](0)))
    val epsN = row.getLong(1) / 1000L + 1L
    // Probe the sketch on the driver over the 10 post-limit keys (bounded
    // by construction) and emit a local relation — keeps the plan UDF-free
    // end to end; the distributed work (CMS build + exact top-10) is done
    // by the two aggregates above/below.
    val top = li.groupBy($"l_partkey").agg(count(lit(1)).as("exact_n"))
      .orderBy($"exact_n".desc, $"l_partkey")
      .limit(10)
      .collect()
    spark.createDataFrame(top.toSeq.map { r =>
      val k = r.getLong(0); val n = r.getLong(1)
      val e = sketch.estimateCount(k)
      (k, n, e >= n && e <= n + epsN)
    }).toDF("l_partkey", "exact_n", "within_bound")
  }

  /** Misra-Gries counter budget for [[qHeavyHittersMg]]. 29 counters over
    * the fixture's 31-token vocabulary, so the sketch genuinely decrements
    * and evicts (the summary cannot just mirror the dictionary). */
  val MgK = 29

  /** Misra-Gries two-pass heavy hitters over the corpus token stream — the
    * deterministic-guarantee companion to [[qApproxHeavyHitters]]'s CMS:
    *
    * Pass 1 (one aggregation, one bounded row to the driver): the
    * [[MisraGriesAggregator]] summary plus the exact stream length N ride
    * the same `agg`. MG guarantees the ≤k surviving keys are a SUPERSET of
    * every key with `freq > N/(k+1)` — regardless of row order or
    * partitioning — which is what makes the second pass sound.
    *
    * Pass 2 (the determinism step): re-count ONLY the candidate keys
    * exactly — the `isin` filter runs map-side BEFORE the aggregate, so the
    * shuffle carries ≤k keys at any corpus size — and keep those whose
    * exact count clears the threshold. Unlike the raw MG counters (which
    * are order-dependent, like any MG implementation's), this composition
    * is exact and deterministic, so it hash-matches a plain
    * GROUP BY/HAVING oracle while paying two narrow passes instead of a
    * full-dictionary aggregation. */
  def qHeavyHittersMg(spark: SparkSession, dir: String): DataFrame = {
    val mg = udaf(new MisraGriesAggregator(MgK))
    val toks = Tables.documents(spark, dir)
      .select(explode(TextHash.tokens($"text")).as("token"))
    val row = toks.agg(mg($"token").as("cand"), count(lit(1)).as("n")).head()
    val n = row.getLong(1)
    val candidates = row.getMap[String, Long](0).keys.toSeq.sorted
    toks.filter($"token".isin(candidates: _*))
      .groupBy($"token")
      .agg(count(lit(1)).as("exact_n"))
      .filter($"exact_n" * (MgK + 1) > n)
      .withColumn("n_total", lit(n))
      .orderBy($"token")
  }

  /** Z-order (Morton) data-layout audit — the multi-dimensional clustering
    * step (`OPTIMIZE ZORDER BY` in Delta/Iceberg terms) that makes per-file
    * min/max statistics tight on TWO filter dimensions at once. Each
    * dimension is min-max–quantized to 16 bits (the min/max come from ONE
    * scalar aggregate — the bounded-aggregate pattern, 4 longs to the
    * driver), the bits interleave through the codegen'd
    * [[graft.plans.ZOrder2]] expression, and the key space is cut into 64
    * equal z-ranges standing in for files. The output is the layout audit a
    * table optimizer reads: per z-file row count and the min/max/span of
    * BOTH dimensions — spans land near 1/8 of each dimension's domain
    * (64 files = 8×8 grid) where a single-column sort gives the trailing
    * dimension its full domain in every file.
    *
    * Scale: quantization and key derivation are shuffle-free codegen'd
    * maps; the audit aggregate groups on 64 keys with map-side partials. A
    * real writer would `repartitionByRange($"zkey")` and write — same key,
    * same plan shape, the Exchange replacing the groupBy. */
  /** Session-memoized lineitem (pk, sk) min/max bounds — ONE bounded scalar
    * aggregate (4 longs) shared by [[qLayoutZorder]] and [[qLayoutPrune]],
    * which previously each re-scanned lineitem for identical bounds when
    * both ran in a session. Same immutable-input session contract as the
    * cached indexes in [[Dedup]]. */
  private val zBoundsCache = new graft.SessionMemo[(Long, Long, Long, Long)]

  /** (pk, sk, file_id) of every lineitem row under the 64-file z-order
    * layout — shared by the layout audit and the pruning demo. */
  private def zorderFiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select($"l_partkey".cast("long").as("pk"),
              $"l_suppkey".cast("long").as("sk"))
    val (pkLo, pkHi, skLo, skHi) = zBoundsCache.getOrElseUpdate(spark, dir) {
      val Array(b) = li.agg(
        min($"pk").as("pk_lo"), max($"pk").as("pk_hi"),
        min($"sk").as("sk_lo"), max($"sk").as("sk_hi")).collect()
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    }
    def q16(name: String, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else expr(s"(($name - $lo) * 65535) div ${hi - lo}")
    val zkey = org.apache.spark.sql.GraftBridge.column(
      graft.plans.ZOrder2(
        org.apache.spark.sql.GraftBridge.expression(q16("pk", pkLo, pkHi)),
        org.apache.spark.sql.GraftBridge.expression(q16("sk", skLo, skHi))))
    li.withColumn("zkey", zkey)
      .withColumn("file_id", expr("zkey div 67108864")) // 2^32 / 64 files
  }

  def qLayoutZorder(spark: SparkSession, dir: String): DataFrame =
    zorderFiles(spark, dir)
      .groupBy($"file_id")
      .agg(count(lit(1)).as("n"),
           min($"pk").as("pk_min"), max($"pk").as("pk_max"),
           min($"sk").as("sk_min"), max($"sk").as("sk_max"))
      .select($"file_id", $"n", $"pk_min", $"pk_max", $"sk_min", $"sk_max",
              ($"pk_max" - $"pk_min").as("pk_span"),
              ($"sk_max" - $"sk_min").as("sk_span"))

  /** File-skipping payoff of the z-order layout — what a stats-pruning
    * reader (Delta/Iceberg manifest pruning, parquet row-group min/max)
    * actually decides for the 2-D box predicate
    * `pk ∈ [500, 750] ∧ sk ∈ [25, 40]`: per z-file, the row count, whether
    * the file's min/max envelope intersects the box (`scanned`), and how
    * many rows inside truly match. On the 8×8 z-grid the box touches a
    * handful of files — the rest are skipped WITHOUT reading a row, which
    * is the entire point of the layout; a 1-D pk-sort would leave every
    * file's sk range full-domain and the sk half of the predicate would
    * prune nothing.
    *
    * Scale: one pass over the layout frame, two tiny aggregates — the
    * pruning decision itself uses only the 64-row stats frame, exactly
    * like a manifest read. */
  def qLayoutPrune(spark: SparkSession, dir: String): DataFrame = {
    val (pkLoP, pkHiP, skLoP, skHiP) = (500L, 750L, 25L, 40L)
    val matches = $"pk".between(pkLoP, pkHiP) && $"sk".between(skLoP, skHiP)
    zorderFiles(spark, dir)
      .groupBy($"file_id")
      .agg(count(lit(1)).as("n"),
           min($"pk").as("pk_min"), max($"pk").as("pk_max"),
           min($"sk").as("sk_min"), max($"sk").as("sk_max"),
           sum(when(matches, 1L).otherwise(0L)).as("n_match"))
      .withColumn("scanned",
        !($"pk_max" < pkLoP || $"pk_min" > pkHiP ||
          $"sk_max" < skLoP || $"sk_min" > skHiP))
      .select($"file_id", $"n", $"scanned", $"n_match")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_layout_zorder"   -> qLayoutZorder _,
    "q_layout_prune"    -> qLayoutPrune _,
    "q_asof_join"       -> qAsofJoin _,
    "q_asof_forward"    -> qAsofForward _,
    "q_asof_nearest"    -> qAsofNearest _,
    "q_pivot"           -> qPivot _,
    "q_grouping_sets"   -> qGroupingSets _,
    "q_sample_hash"     -> qSampleHash _,
    "q_sample_stratified" -> qSampleStratified _,
    "q_mix_sources"     -> qMixSources _,
    "q_export_shuffle"  -> qExportShuffle _,
    "q_export_runs"     -> qExportRuns _,
    "q_dq_checksum"     -> qDqChecksum _,
    "q_dq_keys"         -> qDqKeys _,
    "q_dq_snapshot_diff" -> qDqSnapshotDiff _,
    "q_dq_forget"       -> qDqForget _,
    "q_layout_compact"  -> qLayoutCompact _,
    "q_sample_weighted" -> qSampleWeighted _,
    "q_udaf_topk"       -> qUdafTopk _,
    "q_percentile"      -> qPercentile _,
    "q_approx_distinct" -> qApproxDistinct _,
    "q_approx_hll_union" -> qApproxHllUnion _,
    "q_approx_percentile" -> qApproxPercentile _,
    "q_approx_heavyhitters" -> qApproxHeavyHitters _,
    "q_heavyhitters_mg" -> qHeavyHittersMg _,
  )

  val oracles: Map[String, String] = Map(
    // The four approx-sketch queries are oracle-gated via in-plan
    // exact-vs-estimate verdicts: DuckDB recomputes the exact columns and
    // expects the within-bound booleans to be TRUE, so an out-of-bound
    // estimate fails the hash even though the estimate itself is not
    // SQL-reproducible.
    "q_approx_distinct" ->
      """SELECT l_returnflag,
           count(DISTINCT l_orderkey) AS exact_orders,
           count(*) AS n, TRUE AS within_bound
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "q_approx_percentile" ->
      """SELECT o_orderstatus,
           CAST(floor(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5)) AS BIGINT) AS p50_c,
           CAST(floor(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.9)) AS BIGINT) AS p90_c,
           count(*) AS n, TRUE AS p50_ok, TRUE AS p90_ok
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q_approx_hll_union" ->
      """SELECT count(DISTINCT doc_id) AS exact_total,
           count(DISTINCT source) AS n_sources, TRUE AS within_bound
         FROM documents""",
    "q_approx_heavyhitters" ->
      """SELECT l_partkey, count(*) AS exact_n, TRUE AS within_bound
         FROM lineitem GROUP BY 1
         ORDER BY exact_n DESC, l_partkey LIMIT 10""",
    "q_dq_keys" ->
      """WITH audits AS (
           SELECT 'events(event_id)' AS key_cols, count(*) AS n_rows,
             count(DISTINCT CAST(event_id AS VARCHAR)) AS n_distinct
           FROM events
           UNION ALL
           SELECT 'events(user_id)', count(*),
             count(DISTINCT CAST(user_id AS VARCHAR)) FROM events
           UNION ALL
           SELECT 'events(user_id,ts)', count(*),
             count(DISTINCT concat_ws('|', user_id, epoch_us(ts))) FROM events
           UNION ALL
           SELECT 'events(user_id,event_type)', count(*),
             count(DISTINCT concat_ws('|', user_id, event_type)) FROM events
           UNION ALL
           SELECT 'orders(o_orderkey)', count(*),
             count(DISTINCT CAST(o_orderkey AS VARCHAR)) FROM orders
           UNION ALL
           SELECT 'orders(o_custkey)', count(*),
             count(DISTINCT CAST(o_custkey AS VARCHAR)) FROM orders)
         SELECT key_cols, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(n_distinct * 1000000 // n_rows AS BIGINT) AS unique_e6,
           CAST(CASE WHEN n_distinct = n_rows THEN 1 ELSE 0 END AS BIGINT)
             AS is_key
         FROM audits""",
    "q_dq_snapshot_diff" -> {
      val idh0 = TextHash.sqlH60("CAST(doc_id AS VARCHAR)")
      val fp = TextHash.sqlH60("text")
      s"""WITH h AS (SELECT doc_id, $idh0 AS idh0, $fp AS fp FROM documents),
          curr AS (SELECT doc_id, fp AS fp_c FROM h),
          prev AS (
            SELECT doc_id,
              CASE WHEN idh0 % 7 = 0 THEN fp + 1 ELSE fp END AS fp_p
            FROM h WHERE idh0 % 10 < 9
            UNION ALL
            SELECT doc_id + 1000000000, fp FROM h WHERE idh0 % 13 = 0),
          j AS (SELECT COALESCE(curr.doc_id, prev.doc_id) AS doc_id,
                  fp_c, fp_p
                FROM curr FULL OUTER JOIN prev ON curr.doc_id = prev.doc_id),
          c AS (SELECT
                  ${TextHash.sqlH60("CAST(doc_id AS VARCHAR)")} AS idh,
                  CASE WHEN fp_c IS NULL THEN 'removed'
                       WHEN fp_p IS NULL THEN 'added'
                       WHEN fp_c = fp_p THEN 'unchanged'
                       ELSE 'changed' END AS status
                FROM j)
          SELECT status, count(*) AS n_docs,
            CAST(bit_xor(idh) AS BIGINT) AS ids_xor
          FROM c GROUP BY 1 ORDER BY status"""
    },
    "q_dq_forget" -> {
      def side(tbl: String, id: String) =
        s"""SELECT '$tbl' AS tbl,
              ${TextHash.sqlH60(s"CAST($id AS VARCHAR)")} % 29 = 0 AS doomed,
              ${TextHash.sqlH60(s"concat_ws('|', '$tbl', $id)")} AS rh
            FROM $tbl"""
      s"""WITH a AS (${side("documents", "doc_id")}
            UNION ALL
            ${side("embeddings", "vec_id")})
          SELECT tbl, count(*) AS n_total,
            CAST(sum(CASE WHEN doomed THEN 1 ELSE 0 END) AS BIGINT)
              AS n_deleted,
            CAST(sum(CASE WHEN doomed THEN 0 ELSE 1 END) AS BIGINT)
              AS n_surviving,
            CAST(bit_xor(CASE WHEN doomed THEN 0 ELSE rh END) AS BIGINT)
              AS surviving_xor
          FROM a GROUP BY tbl"""
    },
    "q_layout_compact" ->
      """WITH f AS (
           SELECT source, doc_id, n_chars,
             COALESCE(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS bytes_before
           FROM documents)
         SELECT source, CAST(bytes_before // 262144 AS BIGINT) AS bin,
           count(*) AS n_files, CAST(sum(n_chars) AS BIGINT) AS bytes,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
         FROM f GROUP BY 1, 2 ORDER BY source, bin""",
    "q_sample_weighted" -> {
      val h = TextHash.sqlH32("CAST(doc_id AS VARCHAR)")
      s"""SELECT doc_id, source, n_chars,
            CAST($h * 1000000 // n_chars AS BIGINT) AS priority
          FROM documents
          ORDER BY priority, doc_id LIMIT 100"""
    },
    "q_layout_zorder" -> {
      import graft.plans.ZOrder
      s"""WITH b AS (SELECT min(l_partkey) AS pk_lo, max(l_partkey) AS pk_hi,
                       min(l_suppkey) AS sk_lo, max(l_suppkey) AS sk_hi
                     FROM lineitem),
          q AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                  CASE WHEN pk_hi = pk_lo THEN 0
                       ELSE ((l_partkey - pk_lo) * 65535) // (pk_hi - pk_lo)
                  END AS x,
                  CASE WHEN sk_hi = sk_lo THEN 0
                       ELSE ((l_suppkey - sk_lo) * 65535) // (sk_hi - sk_lo)
                  END AS y
                FROM lineitem, b),
          z AS (SELECT pk, sk,
                  ${ZOrder.sqlInterleave("x", "y")} AS zkey FROM q)
          SELECT zkey // 67108864 AS file_id, count(*) AS n,
            min(pk) AS pk_min, max(pk) AS pk_max,
            min(sk) AS sk_min, max(sk) AS sk_max,
            max(pk) - min(pk) AS pk_span, max(sk) - min(sk) AS sk_span
          FROM z GROUP BY 1 ORDER BY 1"""
    },
    "q_layout_prune" -> {
      import graft.plans.ZOrder
      s"""WITH b AS (SELECT min(l_partkey) AS pk_lo, max(l_partkey) AS pk_hi,
                       min(l_suppkey) AS sk_lo, max(l_suppkey) AS sk_hi
                     FROM lineitem),
          q AS (SELECT l_partkey AS pk, l_suppkey AS sk,
                  CASE WHEN pk_hi = pk_lo THEN 0
                       ELSE ((l_partkey - pk_lo) * 65535) // (pk_hi - pk_lo)
                  END AS x,
                  CASE WHEN sk_hi = sk_lo THEN 0
                       ELSE ((l_suppkey - sk_lo) * 65535) // (sk_hi - sk_lo)
                  END AS y
                FROM lineitem, b),
          z AS (SELECT pk, sk,
                  ${ZOrder.sqlInterleave("x", "y")} // 67108864 AS file_id
                FROM q),
          f AS (SELECT file_id, count(*) AS n,
                  min(pk) AS pk_min, max(pk) AS pk_max,
                  min(sk) AS sk_min, max(sk) AS sk_max,
                  CAST(sum(CASE WHEN pk BETWEEN 500 AND 750
                                 AND sk BETWEEN 25 AND 40
                                THEN 1 ELSE 0 END) AS BIGINT) AS n_match
                FROM z GROUP BY 1)
          SELECT file_id, n,
            NOT (pk_max < 500 OR pk_min > 750 OR
                 sk_max < 25 OR sk_min > 40) AS scanned,
            n_match
          FROM f ORDER BY file_id"""
    },
    "q_asof_nearest" ->
      """WITH ep AS (
           SELECT user_id, epoch_us(ts) AS us, event_id, event_type
           FROM events WHERE event_type IN ('error', 'purchase')),
         f AS (
           SELECT user_id, us, event_id, event_type,
             last_value(CASE WHEN event_type = 'purchase' THEN us END
               IGNORE NULLS) OVER wb AS pp_us,
             last_value(CASE WHEN event_type = 'purchase' THEN event_id END
               IGNORE NULLS) OVER wb AS pp_id,
             first_value(CASE WHEN event_type = 'purchase' THEN us END
               IGNORE NULLS) OVER wf AS np_us,
             first_value(CASE WHEN event_type = 'purchase' THEN event_id END
               IGNORE NULLS) OVER wf AS np_id
           FROM ep
           WINDOW
             wb AS (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
         g AS (
           SELECT *,
             (pp_us IS NOT NULL AND
              (np_us IS NULL OR us - pp_us <= np_us - us)) AS take_prev
           FROM f)
         SELECT event_id, user_id, us AS error_us,
           CASE WHEN take_prev THEN pp_id ELSE np_id END
             AS nearest_purchase_id,
           (CASE WHEN take_prev THEN pp_us ELSE np_us END) - us AS gap_us,
           CAST(CASE WHEN take_prev THEN -1 ELSE 1 END AS BIGINT)
             AS direction
         FROM g
         WHERE event_type = 'error'
           AND (pp_id IS NOT NULL OR np_id IS NOT NULL)
         ORDER BY user_id, event_id""",
    "q_asof_forward" ->
      s"""WITH ep AS (
           SELECT user_id, epoch_us(ts) AS us, event_id, event_type
           FROM events WHERE event_type IN ('error', 'purchase')),
         f AS (
           SELECT user_id, us, event_id, event_type,
             first_value(CASE WHEN event_type = 'purchase' THEN us END
               IGNORE NULLS) OVER w AS np_us,
             first_value(CASE WHEN event_type = 'purchase' THEN event_id END
               IGNORE NULLS) OVER w AS np_id
           FROM ep
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         SELECT event_id, user_id, us AS error_us,
           CASE WHEN np_us IS NOT NULL AND np_us - us <= ${3600L * 1000000L}
                THEN np_id END AS next_purchase_id,
           CASE WHEN np_us IS NOT NULL AND np_us - us <= ${3600L * 1000000L}
                THEN np_us - us END AS gap_us
         FROM f WHERE event_type = 'error'
         ORDER BY user_id, event_id""",
    "q_asof_join" ->
      """WITH ep AS (
           SELECT event_id, user_id, ts, event_type,
             CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END AS purchase_us,
             CASE WHEN event_type = 'purchase' THEN event_id END AS purchase_id
           FROM events WHERE event_type IN ('error', 'purchase')
         ), flagged AS (
           SELECT *,
             last_value(purchase_us IGNORE NULLS) OVER w AS last_purchase_us,
             last_value(purchase_id IGNORE NULLS) OVER w AS last_purchase_id
           FROM ep
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         )
         SELECT event_id, user_id, epoch_us(ts) AS error_us,
                last_purchase_id, last_purchase_us
         FROM flagged
         WHERE event_type = 'error' AND last_purchase_id IS NOT NULL
         ORDER BY event_id""",
    "q_pivot" ->
      """SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
         coalesce(l_linestatus, 'ALL') AS linestatus,
         CAST(grouping(l_returnflag) AS BIGINT) AS g_rf,
         CAST(grouping(l_linestatus) AS BIGINT) AS g_ls,
         sum(l_quantity) AS sum_qty, count(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         ORDER BY returnflag, linestatus, g_rf, g_ls""",
    "q_export_runs" -> {
      val hk = TextHash.sqlH60("CAST(doc_id AS VARCHAR)")
      s"""WITH h AS (SELECT $hk AS hk FROM documents)
          SELECT hk % 8 AS shard, count(*) AS n_rows,
            CAST(min(hk) AS BIGINT) AS min_key,
            CAST(max(hk) AS BIGINT) AS max_key,
            CAST(max(hk) - min(hk) AS BIGINT) AS key_span
          FROM h GROUP BY 1 ORDER BY shard""" },
    "q_dq_checksum" -> {
      def row(tbl: String, key: String) =
        s"""SELECT '$tbl' AS tbl, count(*) AS n_rows,
              CAST(bit_xor(${TextHash.sqlH60(key)}) AS BIGINT) AS xor_check
            FROM $tbl"""
      Seq(
        row("documents", "concat_ws('|', doc_id, source)"),
        row("events", "concat_ws('|', event_id, user_id, event_type)"),
        row("orders", "concat_ws('|', o_orderkey, o_custkey)"))
        .mkString("\nUNION ALL\n") },
    "q_export_shuffle" -> {
      val hk = TextHash.sqlH60("CAST(doc_id AS VARCHAR)")
      s"""WITH h AS (SELECT doc_id, $hk AS hk FROM documents)
          SELECT doc_id, hk % 8 AS shard,
            CAST(row_number() OVER (PARTITION BY hk % 8 ORDER BY hk, doc_id)
                 AS BIGINT) AS rnk
          FROM h ORDER BY shard, rnk"""
    },
    "q_sample_stratified" -> {
      val hk = TextHash.sqlH60("CAST(event_id AS VARCHAR)")
      s"""SELECT event_type, count(*) AS n_total,
            CAST(sum(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
            CAST(sum(CASE WHEN in_sample
                     THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
              AS value_c_sampled
          FROM (
            SELECT event_type, value,
              $hk % 100 < (CASE event_type WHEN 'purchase' THEN 50
                           WHEN 'signup' THEN 25 WHEN 'error' THEN 10
                           ELSE 5 END) AS in_sample
            FROM events)
          GROUP BY event_type ORDER BY event_type"""
    },
    "q_mix_sources" -> {
      val hk = TextHash.sqlH60("CAST(doc_id AS VARCHAR)")
      val hi = MixHi.map(s => s"'$s'").mkString(", ")
      val mid = MixMid.map(s => s"'$s'").mkString(", ")
      s"""WITH c AS (SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
          t AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_tot FROM c),
          w AS (SELECT source, n_s,
                  CASE WHEN source IN ($hi) THEN 3
                       WHEN source IN ($mid) THEN 2 ELSE 1 END AS weight
                FROM c),
          r AS (SELECT source, n_s, weight,
                  (((SELECT n_tot FROM t) * 6) // 10) * weight // $MixWeightSum
                    AS target_n
                FROM w),
          r2 AS (SELECT *, least(10000, target_n * 10000 // n_s) AS rate_bp
                 FROM r),
          k AS (SELECT d.source, count(*) AS n_kept
                FROM documents d JOIN r2 ON d.source = r2.source
                WHERE $hk % 10000 < rate_bp
                GROUP BY 1)
          SELECT r2.source, n_s, CAST(weight AS BIGINT) AS weight,
            CAST(target_n AS BIGINT) AS target_n,
            CAST(rate_bp AS BIGINT) AS rate_bp,
            CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept
          FROM r2 LEFT JOIN k ON r2.source = k.source
          ORDER BY r2.source"""
    },
    "q_sample_hash" -> {
      val hk = TextHash.sqlH60("concat(CAST(l_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR))")
      s"""SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty
          FROM lineitem WHERE $hk % 100 < 10
          GROUP BY l_returnflag ORDER BY l_returnflag"""
    },
    "q_udaf_topk" ->
      """WITH t AS (
           SELECT c_mktsegment,
             (list(o_totalprice ORDER BY o_totalprice DESC))[1:3] AS top3
           FROM orders JOIN customer ON o_custkey = c_custkey
           GROUP BY c_mktsegment)
         SELECT c_mktsegment,
           CAST(unnest(generate_series(1, len(top3))) AS BIGINT) AS rank,
           CAST(round(unnest(top3) * 100) AS BIGINT) AS price_c
         FROM t ORDER BY c_mktsegment, rank""",
    "q_heavyhitters_mg" -> {
      val w = TextHash.sqlTokens("text")
      s"""WITH tok AS (SELECT unnest($w) AS token FROM documents),
          tot AS (SELECT count(*) AS n FROM tok)
          SELECT token, count(*) AS exact_n, (SELECT n FROM tot) AS n_total
          FROM tok GROUP BY token
          HAVING count(*) * ${MgK + 1} > (SELECT n FROM tot)
          ORDER BY token"""
    },
    "q_percentile" ->
      """SELECT o_orderstatus,
         CAST(floor(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.5)) AS BIGINT) AS p50_c,
         CAST(floor(quantile_cont(CAST(round(o_totalprice * 100) AS BIGINT), 0.9)) AS BIGINT) AS p90_c,
         count(*) AS n
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
  )
}
