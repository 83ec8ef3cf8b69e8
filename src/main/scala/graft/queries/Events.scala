package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.syntax._

/** Event-stream analytics over the `events` table (`event_id, ts, user_id,
  * event_type, value, props`) — the batch view of the reference's record
  * stream (SURVEY.md §2.2 streaming rows). Every query here is the batch
  * expression of a streaming-capable plan: the same `window()` /
  * sessionization logic runs under Structured Streaming in
  * [[graft.streaming]]; the DuckDB oracle checks the batch semantics.
  *
  * Scale notes: all aggregations group on (bounded-cardinality key ×
  * time bucket), so partial aggregation collapses input map-side and the
  * shuffle carries only group rows. Sessionization shuffles once on
  * `user_id` and evaluates both window functions over the same sort — one
  * exchange, one sort, at any scale.
  */
object Events {

  /** Time-range + attribute conjunctive filter — the reference's `/records`
    * query shape (O5-O11) on the flat event schema; all predicates push to
    * the parquet scan. */
  def qEvFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(
        $"ts".between(lit("2024-01-05 00:00:00").cast("timestamp"),
                      lit("2024-01-20 00:00:00").cast("timestamp")) &&
        $"event_type".isin("purchase", "signup") &&
        $"value" > 50)
      .select($"event_id", $"user_id", $"event_type", $"value")

  /** JSON payload extraction (O4 analog): schemaless `props` probed with
    * get_json_object, the engine's passthrough path for unknown fields. */
  def qEvJson(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // bind the extraction once: deriving k_mod from the bound column keeps
      // the JSON parse at one per row instead of one per derived column
      .withColumn("k", get_json_object($"props", "$.k").cast("long"))
      .select($"event_id", $"k", ($"k" % 10).as("k_mod"))
      .filter($"k".isNotNull)

  /** Tumbling 1-hour window aggregation via `window()` — identical plan
    * works under readStream + watermark. */
  def qEvTumbling(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour").getField("start").as("ws"), $"event_type")
      .agg(count(lit(1)).as("n"),
           sum(round($"value" * 100).cast("long")).as("value_c"))

  /** Sliding window (1 hour every 30 min): each event lands in 2 windows;
    * `window()` explodes to (event × window) before aggregating. */
  def qEvSliding(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window($"ts", "1 hour", "30 minutes").getField("start").as("ws"))
      .agg(count(lit(1)).as("n"),
           sum(round($"value" * 100).cast("long")).as("value_c"))

  /** Gap-based sessionization (30-min inactivity): lag → new-session flag →
    * running sum = session id, then per-session aggregates. One shuffle on
    * user_id; both window functions share the same sort order. Exact-integer
    * µs arithmetic so the gap comparison is engine-independent. */
  def qEvSession(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val gapUs = 30L * 60 * 1000000
    Tables.events(spark, dir)
      .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(byUser))
      .withColumn("new_s",
        when($"prev_us".isNull || unix_micros($"ts") - $"prev_us" > gapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_s").over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
           min(unix_micros($"ts")).as("start_us"),
           max(unix_micros($"ts")).as("end_us"),
           sum(round($"value" * 100).cast("long")).as("value_c"))
  }

  /** Built-in session_window in BATCH mode (same operator the streaming
    * path uses): 30-min-gap sessions per user. Session end is defined as
    * last event + gap; the oracle reproduces that from the gap-based
    * formulation, proving the two sessionization forms agree. */
  def qEvSessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id",
        unix_micros($"w.start").as("start_us"),
        unix_micros($"w.end").as("end_us"),
        $"n_events")

  /** Exact event dedup: first event per (user_id, event_type) in a
    * deterministic total order — the auditable form of dropDuplicates
    * (which keeps an arbitrary row; this keeps a *defined* one). */
  def qEvDedup(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id", $"event_type").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id", $"value")
  }

  /** Daily per-type event rates: date_trunc bucketing. The average is
    * integer micro-units ((cents·10⁴) div n) — exact at any summation
    * order, unlike round(avg(double)) whose last digit is order-dependent. */
  def qEvDaily(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("day", $"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("n"),
           sum(round($"value" * 100).cast("long")).as("value_c"),
           countDistinct($"user_id").as("n_users"))
      .withColumn("avg_value_e6", expr("(value_c * 10000) div n"))
      .orderBy($"day", $"event_type")

  /** Time-series gap filling: build each user's complete daily calendar
    * (sequence + explode between their first and last active day), left
    * join the actual daily totals, and forward-fill misses with the last
    * observed value (LOCF). Scale: the calendar explode is linear in
    * user-days; the fill is one window per user sharing the day sort —
    * the standard distributed form of "resample + ffill". */
  def qEvGapFill(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy($"user_id", date_trunc("day", $"ts").as("day"))
      .agg(sum(round($"value" * 100).cast("long")).as("value_c"))
    val cal = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id",
        explode(sequence($"d0", $"d1", expr("interval 1 day"))).as("day"))
    val w = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cal.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled_c", last($"value_c", ignoreNulls = true).over(w))
      .select($"user_id", $"day", $"filled_c", $"value_c".isNull.as("is_gap"))
  }

  /** SCD2 (slowly-changing-dimension) intervals from the event stream: each
    * user's event_type regime as [valid_from, valid_to) rows — change
    * points via lag, interval ends via lead over the change points, open
    * intervals closed with Long.MaxValue. One shuffle on user_id; both
    * window passes share the sort. This is the batch form of CDC
    * snapshotting at any scale. */
  def qEvScd2(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val changes = Tables.events(spark, dir)
      .withColumn("prev_type", lag($"event_type", 1).over(byUser))
      .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
      .withColumn("valid_from_us", unix_micros($"ts"))
    val byFrom = Window.partitionBy($"user_id").orderBy($"valid_from_us")
    changes
      .withColumn("valid_to_us",
        coalesce(lead($"valid_from_us", 1).over(byFrom), lit(Long.MaxValue)))
      .select($"user_id", $"event_type", $"valid_from_us", $"valid_to_us")
  }

  /** CDC latest-wins compaction: collapse the change stream to one row per
    * key carrying the most recent event's attributes — the MERGE/upsert
    * snapshot step of an incremental pipeline, as a single argmax
    * aggregation. One shuffle on the key, partial aggregation keeps one
    * candidate per group per map task, no sort — the scale-correct
    * compaction shape. The built-in `max_by` would express the same
    * semantics but its string payload forces `SortAggregate` (full
    * per-partition input sorts); [[graft.functions.ArgMaxAggregator]]
    * keeps the plan hash-based (`ObjectHashAggregate`) — see its scaladoc.
    *
    * The argmax key is the lexicographic PAIR (event-time µs, event_id) —
    * a total order with no domain bound: any single-long packing
    * `ts_us * C + id` overflows Long once ts exceeds Long.MaxValue / C
    * (~106 days of headroom for C = 10^6), silently corrupting the winner
    * on real dates. */
  def qEvLatest(spark: SparkSession, dir: String): DataFrame = {
    val latest = udaf(new graft.functions.ArgMaxAggregator)
    Tables.events(spark, dir)
      .groupBy($"user_id")
      .agg(
        latest(unix_micros($"ts"), $"event_id",
               $"event_type", round($"value" * 100).cast("long")).as("lw"),
        max(unix_micros($"ts")).as("last_ts_us"),
        count(lit(1)).as("n_events"))
      .select($"user_id", $"lw.typ".as("last_type"), $"lw.valueC".as("last_value_c"),
              $"last_ts_us", $"n_events")
      .orderBy($"user_id")
  }

  /** Ordered funnel: users who viewed, then clicked AFTER their first view,
    * then purchased AFTER that first qualifying click. Each stage is a
    * filtered aggregate joined to the previous stage's per-user timestamp —
    * three narrow hash aggregations and two equi-joins on user_id, so the
    * funnel never materializes per-user event arrays or sorts the stream.
    * Event subsets shrink stage over stage, and every join keys on the
    * same column, so one partitioning serves the whole chain. */
  def qEvFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("t1"))
    val c = ev.filter($"event_type" === "click")
      .join(v, Seq("user_id")).filter($"us" > $"t1")
      .groupBy($"user_id").agg(min($"us").as("t2"))
    val p = ev.filter($"event_type" === "purchase")
      .join(c, Seq("user_id")).filter($"us" > $"t2")
      .groupBy($"user_id").agg(min($"us").as("t3"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
  }

  /** Daily cohort retention: users grouped by first-activity day, with
    * day+1 / day+7 / day+14 return rates. Two hash aggregations over the
    * distinct (user, day) activity set — the per-user retention flags
    * collapse BEFORE the cohort rollup, so no Expand (the multi-
    * countDistinct plan) and no per-cohort distinct is ever shuffled. */
  def qEvRetention(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select($"user_id",
        datediff(to_date($"ts"), lit("2024-01-01").cast("date"))
          .cast("long").as("d"))
      .distinct()
    val flags = days
      .join(days.groupBy($"user_id").agg(min($"d").as("d0")), Seq("user_id"))
      .groupBy($"user_id", $"d0")
      .agg(
        max(when($"d" === $"d0" + 1L, 1L).otherwise(0L)).as("r1"),
        max(when($"d" === $"d0" + 7L, 1L).otherwise(0L)).as("r7"),
        max(when($"d" === $"d0" + 14L, 1L).otherwise(0L)).as("r14"))
    flags.groupBy($"d0")
      .agg(count(lit(1)).as("n_users"),
           sum($"r1").as("n_d1"), sum($"r7").as("n_d7"), sum($"r14").as("n_d14"))
      .orderBy($"d0")
  }

  /** Bitmap-index retention — the packed-bitmask warehouse pattern: each
    * user's 30-day activity history is folded into ONE 64-bit integer
    * (bit d set ⇔ active on day d, via a `bit_or` of `1L << d`), and the
    * whole day-over-day / day-over-week retention matrix is then computed
    * from the bitmask table alone with shift-and-mask arithmetic — the raw
    * event log is scanned exactly once.
    *
    * This is why bitmap indexes win at 100 TB: the fact table collapses to
    * 8 bytes/user (a ~10⁹-user planet fits in ~8 GB, broadcastable), the
    * fold is a map-side-combining hash aggregate on user_id (the one
    * shuffle), and every retention variant (next-day, next-week, any
    * window) is a re-aggregation of the tiny mask table — no event rescan.
    * The explode is 29 rows per user AFTER the collapse, not per event. */
  def qEvBitmapRetention(spark: SparkSession, dir: String): DataFrame = {
    val masks = Tables.events(spark, dir)
      .select($"user_id",
        datediff(to_date($"ts"), lit("2024-01-01").cast("date"))
          .cast("int").as("d"))
      .groupBy($"user_id")
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), d))").as("mask"))
    masks
      .select($"mask", explode(sequence(lit(0), lit(28))).as("d"))
      .groupBy($"d".cast("long").as("d"))
      .agg(
        sum(expr("shiftright(mask, d) & 1")).as("n_active"),
        sum(expr("shiftright(mask, d) & shiftright(mask, d + 1) & 1"))
          .as("n_ret_next_day"),
        sum(expr("shiftright(mask, d) & shiftright(mask, d + 7) & 1"))
          .as("n_ret_next_week"))
      .orderBy($"d")
  }

  /** Two-proportion A/B test (z-statistic) on conversion-to-purchase:
    * deterministic hash-bucket assignment (user_id parity — the split a
    * real experiment framework would persist), conversion = "user emitted
    * ≥1 purchase event above the 150-value ticket" (the plain any-purchase
    * flag saturates at 100% on the fixture, collapsing the standard error
    * to zero). The z-score uses the pooled standard error; all
    * probabilities are integer e6, the standard error takes the repo's
    * portable `floor(sqrt(x)·10³)` fixed-point (IEEE sqrt/floor are
    * bit-identical on both engines), and the verdict column applies the
    * two-sided 5% critical value 1.96.
    *
    * Scale: per-user conversion flags are one map-side-combining aggregate
    * on user_id; the variant rollup is a 2-row aggregate; the z arithmetic
    * runs on a single row. Nothing after the first aggregate depends on
    * event volume. */
  def qEvAbtest(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(spark, dir)
      .select(($"user_id" % 2L).as("variant"), $"user_id",
              when($"event_type" === "purchase" && $"value" > 150.0, 1L)
                .otherwise(0L).as("p"))
      .groupBy($"variant", $"user_id")
      .agg(max($"p").as("converted"))
    perUser
      .groupBy()
      .agg(
        sum(when($"variant" === 0L, 1L).otherwise(0L)).as("n_a"),
        sum(when($"variant" === 0L, $"converted").otherwise(0L)).as("conv_a"),
        sum(when($"variant" === 1L, 1L).otherwise(0L)).as("n_b"),
        sum(when($"variant" === 1L, $"converted").otherwise(0L)).as("conv_b"))
      .withColumn("pa_e6", expr("conv_a * 1000000 div n_a"))
      .withColumn("pb_e6", expr("conv_b * 1000000 div n_b"))
      .withColumn("pool_e6", expr("(conv_a + conv_b) * 1000000 div (n_a + n_b)"))
      // exact integer radicand numerator; ONE double division + sqrt, so
      // both engines round identically at every step
      .withColumn("se_e6",
        floor(sqrt(expr("cast(pool_e6 * (1000000 - pool_e6) * (n_a + n_b) as double)" +
                        " / cast(n_a * n_b as double)"))).cast("long"))
      .withColumn("z_e3", expr("(pa_e6 - pb_e6) * 1000 div se_e6"))
      .withColumn("significant", (abs($"z_e3") > 1960L).cast("long"))
  }

  /** Interval-overlap self-join WITHOUT a non-equi join: pairs of events
    * (per user) whose 5-minute activity windows overlap. The naive form is
    * a θ-join (`abs(a.us - b.us) < W`) — a nested-loop/cartesian at any
    * scale. Instead each interval is exploded into its (at most 2) covering
    * W-width time buckets and the join becomes an EQUI-join on
    * (user, bucket); a canonical-bucket predicate (the bucket containing
    * the later start — inside both intervals iff they overlap) makes each
    * pair match exactly once, so no distinct pass is needed. Shuffle cost:
    * 2× the input on a fine-grained key — same technique family as the
    * as-of join (one sort) and the LSH band join (bucket collisions). */
  /** The bucketized interval join over any `(user_id, event_id, us)` frame
    * — exposed so the skew spec can run it on a pathological fixture. The
    * (user, bucket) join key is also the SKEW defense: a heavy user whose
    * history spans many windows joins on many distinct keys (one per
    * window), where a user-only key would funnel their entire history —
    * and its quadratic candidate set — into a single join task. */
  private[queries] def intervalPairs(e: DataFrame, W: Long): DataFrame = {
    val withB0 = e.withColumn("b0", expr(s"us div $W"))
    val exploded = withB0.select($"user_id", $"event_id", $"us",
      explode(array($"b0", $"b0" + 1L)).as("bucket"))
    val a = exploded.toDF("user_id", "ea", "ua", "bucket")
    val b = exploded.toDF("user_id", "eb", "ub", "bucket")
    a.join(b, Seq("user_id", "bucket"))
      .filter($"ea" < $"eb" &&
              abs($"ua" - $"ub") < W &&
              $"bucket" === expr(s"greatest(ua, ub) div $W"))
      .select($"user_id", $"ea", $"eb",
              (lit(W) - abs($"ua" - $"ub")).as("overlap_us"))
  }

  def qJoinInterval(spark: SparkSession, dir: String): DataFrame = {
    val W = 300000000L // 5 minutes in µs
    intervalPairs(
      Tables.events(spark, dir)
        .select($"user_id", $"event_id", unix_micros($"ts").as("us")),
      W)
  }

  /** Interval-overlap MASS per user — the aggregate consumer of the
    * bucketized interval join ([[qJoinInterval]] emits the pairs; this is
    * "how much concurrent activity does each user have", the co-activity
    * measure): pair count, total and max pairwise overlap. Rides the
    * exact same canonical-bucket equi-join plan — the aggregation adds one
    * partial+final hash aggregate on user_id, nothing else. */
  def qJoinIntervalMass(spark: SparkSession, dir: String): DataFrame =
    qJoinInterval(spark, dir)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_pairs"),
           sum($"overlap_us").as("overlap_mass_us"),
           max($"overlap_us").as("max_overlap_us"))

  /** Fixed-bin histogram (10 × width-50 buckets over `value`) per event
    * type — binning as pure arithmetic (floor division), one partial+final
    * hash aggregation, no sort until the cosmetic final ordering. */
  def qEvHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("bucket", least(floor($"value" / 50.0), lit(9.0)).cast("long"))
      .groupBy($"event_type", $"bucket")
      .agg(count(lit(1)).as("n"),
           sum(round($"value" * 100).cast("long")).as("value_c"))
      .orderBy($"event_type", $"bucket")

  /** Per-class outlier audit — the "drop the top tail before training" step
    * of data curation: each event type's exact p99 value threshold, the
    * count/value mass above it, and the share of the class it represents.
    * Two passes over one scan shape: a tiny per-class percentile aggregate
    * (5 rows) broadcast back onto the stream, then one partial+final
    * hash aggregate. Thresholds are integer cents (floor of the exact
    * percentile — portable), so the boundary row set is engine-exact. */
  def qEvAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select($"event_type", round($"value" * 100).cast("long").as("value_c"))
    val thresholds = ev.groupBy($"event_type")
      .agg(expr("CAST(floor(percentile(value_c, 0.99)) AS BIGINT)").as("p99_c"))
    ev.join(broadcast(thresholds), Seq("event_type"))
      .groupBy($"event_type")
      .agg(max($"p99_c").as("p99_c"),
           count(lit(1)).as("n"),
           sum(when($"value_c" > $"p99_c", 1L).otherwise(0L)).as("n_outliers"),
           sum(when($"value_c" > $"p99_c", $"value_c").otherwise(0L))
             .as("outlier_value_c"))
      .withColumn("outlier_e4", floor($"n_outliers" * 10000L / $"n").cast("long"))
      .orderBy($"event_type")
  }

  /** First-order Markov transition matrix over each user's event-type
    * sequence — the "what do users do next" model behind next-action
    * prediction and anomaly scoring on clickstreams: for every ordered
    * adjacent pair within a user's timeline, the transition count and the
    * per-source-state probability in basis points.
    *
    * Plan: one shuffle on user_id feeds the lag() window (same exchange +
    * sort shape as sessionization), then a hash aggregate on the
    * (prev, next) pair — at most |types|² = tiny output rows, so the final
    * aggregate is map-side-collapsed no matter how many events flow in.
    * The row_number-free probability uses a window over prev_type on the
    * ALREADY-aggregated |types|² rows — driver-free and constant-cost. */
  def qEvMarkov(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .withColumn("prev_type", lag($"event_type", 1).over(byUser))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type".as("next_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_from",
        sum($"n").over(Window.partitionBy($"prev_type")))
      .withColumn("p_e4", floor($"n" * 10000L / $"n_from").cast("long"))
      .select($"prev_type", $"next_type", $"n", $"n_from", $"p_e4")
  }

  /** Top-20 3-step event paths (A→B→C) across user timelines — the path
    * mining behind "what flows lead to purchase": two lag() windows on the
    * SAME (user_id, ts) sort produce the trigram, then one hash aggregate;
    * like [[qEvMarkov]] the distinct-path space is ≤|types|³, so partial
    * aggregation collapses everything map-side and TakeOrdered handles the
    * top-k without a global sort. */
  def qEvTopPaths(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(spark, dir)
      .withColumn("p1", lag($"event_type", 1).over(byUser))
      .withColumn("p2", lag($"event_type", 2).over(byUser))
      .filter($"p2".isNotNull)
      .groupBy($"p2".as("step1"), $"p1".as("step2"),
               $"event_type".as("step3"))
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"step1", $"step2", $"step3")
      .limit(20)
  }

  /** Exact decile binning of `value` per event type — the feature-
    * quantization step (bucketized features, monotone binning) of a
    * training pipeline: 9 exact integer-floored decile cuts per type from
    * ONE tiny aggregate (5 types × 9 longs through the driver-free
    * broadcast join — the q_ev_anomaly pattern), then bin assignment is a
    * pure map (9 integer comparisons) and a (type, bin) rollup.
    *
    * At corpus scale the exact percentile is the only non-streaming-
    * friendly piece; the documented relaxation is approx_percentile with
    * the same downstream shape (the cuts stay a bounded broadcast). */
  def qEvQuantileBins(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select($"event_type", round($"value" * 100).cast("long").as("value_c"))
    val cutCols = (1 to 9).map(d =>
      expr(s"CAST(floor(percentile(value_c, 0.$d)) AS BIGINT)").as(s"c$d"))
    val cuts = ev.groupBy($"event_type").agg(cutCols.head, cutCols.tail: _*)
    val bin = (1 to 9).map(d => when($"value_c" > col(s"c$d"), 1L).otherwise(0L))
      .reduce(_ + _)
    ev.join(broadcast(cuts), Seq("event_type"))
      .withColumn("bin", bin)
      .groupBy($"event_type", $"bin")
      .agg(count(lit(1)).as("n"),
           min($"value_c").as("min_c"), max($"value_c").as("max_c"))
      .orderBy($"event_type", $"bin")
  }

  /** DAU / trailing-7-day WAU / stickiness — the engagement triple every
    * product-analytics pipeline derives: per activity day, the exact
    * distinct-user count, the exact distinct users over the trailing week,
    * and DAU/WAU in basis points.
    *
    * The scalable exact-WAU trick: distinct (day, user) pairs first (one
    * hash aggregate — the only corpus-scale shuffle), then each pair
    * explodes to the ≤7 window-days it serves and a second distinct-count
    * aggregates per window day. Cost is 7×|daily actives|, NEVER a
    * per-day re-scan of the raw stream, and no window-function sort of
    * user sets. Day arithmetic on integer epoch-days keeps both engines
    * exact. */
  def qEvWau(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .select(expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").as("day"),
              $"user_id")
      .distinct()
    val bounds = daily.agg(min($"day").as("d0"), max($"day").as("d1")).collect()(0)
    val (d0, d1) = (bounds.getLong(0), bounds.getLong(1))
    val dau = daily.groupBy($"day").agg(countDistinct($"user_id").as("dau"))
    val wau = daily
      .select($"user_id", explode(sequence($"day", $"day" + 6)).as("wday"))
      .filter($"wday".between(d0, d1))
      .groupBy($"wday".as("day"))
      .agg(countDistinct($"user_id").as("wau"))
    dau.join(wau, Seq("day"))
      .withColumn("stickiness_e4", floor($"dau" * 10000L / $"wau").cast("long"))
      .orderBy($"day")
  }

  /** RFM (recency / frequency / monetary) user segmentation over purchase
    * events — the classic customer-scoring rollup, done scale-shaped: one
    * per-user aggregate builds the three metrics, tercile thresholds come
    * from ONE bounded percentile aggregate over the (already tiny) user
    * frame, and scores are pure comparisons — no ntile, no global sort of
    * users anywhere. Recency is measured in whole days back from the
    * stream's last day (one scalar). Composite segment = r·100+f·10+m,
    * each score ∈ {1,2,3} (3 = best: recent / frequent / high-spend). */
  def qEvRfm(spark: SparkSession, dir: String): DataFrame = {
    val purchases = Tables.events(spark, dir)
      .filter($"event_type" === "purchase")
      .select($"user_id",
        expr("CAST(unix_micros(ts) div 86400000000 AS BIGINT)").as("day"),
        round($"value" * 100).cast("long").as("value_c"))
    // the stream's last day falls out of the per-user rollup (max of the
    // per-user maxima) — no separate corpus-scale scan for one scalar
    val perUser = purchases.groupBy($"user_id")
      .agg(max($"day").as("user_last_day"),
           count(lit(1)).as("frequency"),
           sum($"value_c").as("monetary_c"))
    val lastDay = broadcast(perUser.agg(max($"user_last_day").as("last_day")))
    val rfm = perUser.crossJoin(lastDay)
      .withColumn("recency_d", $"last_day" - $"user_last_day")
      .select($"user_id", $"recency_d", $"frequency", $"monetary_c")
    val cuts = rfm.agg(
      expr("CAST(floor(percentile(recency_d, 0.3333)) AS BIGINT)").as("r1"),
      expr("CAST(floor(percentile(recency_d, 0.6667)) AS BIGINT)").as("r2"),
      expr("CAST(floor(percentile(frequency, 0.3333)) AS BIGINT)").as("f1"),
      expr("CAST(floor(percentile(frequency, 0.6667)) AS BIGINT)").as("f2"),
      expr("CAST(floor(percentile(monetary_c, 0.3333)) AS BIGINT)").as("m1"),
      expr("CAST(floor(percentile(monetary_c, 0.6667)) AS BIGINT)").as("m2"))
    def asc(v: Column, c1: Column, c2: Column): Column = // higher = better
      when(v > c2, 3L).when(v > c1, 2L).otherwise(1L)
    def desc(v: Column, c1: Column, c2: Column): Column = // lower = better
      when(v <= c1, 3L).when(v <= c2, 2L).otherwise(1L)
    rfm.crossJoin(broadcast(cuts))
      .withColumn("r_score", desc($"recency_d", $"r1", $"r2"))
      .withColumn("f_score", asc($"frequency", $"f1", $"f2"))
      .withColumn("m_score", asc($"monetary_c", $"m1", $"m2"))
      .select($"user_id", $"recency_d", $"frequency", $"monetary_c",
        $"r_score", $"f_score", $"m_score",
        ($"r_score" * 100L + $"f_score" * 10L + $"m_score").as("rfm"))
  }

  /** Per-user EWMA (exponential smoothing, α = 0.2) of event value — the
    * time-series smoothing a metrics/anomaly pipeline runs per entity.
    * The recurrence is INTEGER fixed-point on cents with exact floor
    * division — s₁ = x₁, sₜ = ⌊(2·xₜ + 8·sₜ₋₁)/10⌋ — so both engines agree
    * bit-for-bit (a double α·x + (1−α)·s recurrence would drift in the
    * last ulps and the drift COMPOUNDS through the recursion).
    *
    * A sequential recurrence has no window-function form (each output
    * feeds the next input — prefix sums don't apply without FP powers),
    * so the per-user fold is explicit: sort_array(collect_list) then one
    * `aggregate` HOF that carries (state, outputs) through the event list,
    * unzipped back to per-event rows. One shuffle on user_id.
    *
    * Memory contract (same as the streaming Markov processor): the working
    * set is ONE USER's event history — per-key, never per-corpus. The
    * production dial for unbounded histories is keying by (user, epoch)
    * with carried state across epochs, which is this same plan with a
    * composite group key. */
  /** Per-user event-time-sorted fold scaffolding shared by the smoothing
    * recurrences ([[qEvEwma]], [[qEvHolt]]): project (user, µs, event_id,
    * cents), group, sort by (µs, event_id) — the SAME tie-break the
    * oracles' `ORDER BY ts, event_id` produces — run the caller's
    * `aggregate` fold emitting one output element per event, and unzip
    * back to rows. The projection/sort/zip plumbing is load-bearing for
    * oracle agreement, so it exists exactly once. */
  private def perUserFold(
      spark: SparkSession, dir: String,
      init: Column, step: (Column, Column) => Column,
      finish: Column => Column): DataFrame =
    Tables.events(spark, dir)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id",
              round($"value" * 100).cast("long").as("x_c"))
      .groupBy($"user_id")
      .agg(sort_array(collect_list(struct($"us", $"event_id", $"x_c"))).as("evs"))
      .withColumn("states", aggregate($"evs", init, step, finish))
      .select($"user_id", posexplode(arrays_zip($"evs", $"states")))

  def qEvEwma(spark: SparkSession, dir: String): DataFrame =
    perUserFold(spark, dir,
      struct(lit(0L).as("s"), lit(Array.empty[Long]).as("out")),
      (acc, e) => {
        // floor(·/10) — floor division on BOTH sides (the oracle floors a
        // double division too): integer `div`/`//` would truncate toward
        // zero and diverge from floor on a negative state. The first
        // event seeds the state.
        val sNew = when(size(acc.getField("out")) === 0, e.getField("x_c"))
          .otherwise(floor(
            (e.getField("x_c") * 2L + acc.getField("s") * 8L) / 10L))
        struct(sNew.as("s"),
               concat(acc.getField("out"), array(sNew)).as("out"))
      },
      acc => acc.getField("out"))
    .select($"user_id",
      ($"pos" + 1).cast("long").as("rn"),
      $"col.evs.event_id".as("event_id"),
      $"col.evs.x_c".as("x_c"),
      $"col.states".as("ewma_c"))

  /** Per-user Holt double-exponential smoothing (level + trend; α = 0.2,
    * β = 0.3) with the one-step-ahead forecast and its error — the
    * forecasting extension of [[qEvEwma]]: where EWMA lags a trending
    * series structurally, Holt's trend state projects it forward. Exact
    * integer fixed-point on cents with portable floor division (the trend
    * can go NEGATIVE, where integer `div`/`//` would truncate instead of
    * floor — the EWMA lesson):
    *   l₁ = x₁, b₁ = 0, f₁ = x₁
    *   fₜ = lₜ₋₁ + bₜ₋₁                       (forecast BEFORE seeing xₜ)
    *   lₜ = ⌊(2·xₜ + 8·(lₜ₋₁+bₜ₋₁))/10⌋
    *   bₜ = ⌊(3·(lₜ−lₜ₋₁) + 7·bₜ₋₁)/10⌋
    * Same per-key fold shape, memory contract, and scale story as
    * [[qEvEwma]] — a two-scalar state threaded through one `aggregate`
    * HOF, emitted per event with the forecast error. */
  def qEvHolt(spark: SparkSession, dir: String): DataFrame = {
    val outT = "array<struct<f:bigint,l:bigint,b:bigint>>"
    val folded = perUserFold(spark, dir,
      struct(lit(0L).as("l"), lit(0L).as("b"),
             array().cast(outT).as("out")),
      (acc, e) => {
        val first = size(acc.getField("out")) === 0
        val x = e.getField("x_c")
        val fc = when(first, x)
          .otherwise(acc.getField("l") + acc.getField("b"))
        val lNew = when(first, x)
          .otherwise(floor((x * 2L + (acc.getField("l") + acc.getField("b")) * 8L) / 10L))
        val bNew = when(first, 0L)
          .otherwise(floor(((lNew - acc.getField("l")) * 3L + acc.getField("b") * 7L) / 10L))
        struct(lNew.as("l"), bNew.as("b"),
          concat(acc.getField("out"),
            array(struct(fc.as("f"), lNew.as("l"), bNew.as("b")))).as("out"))
      },
      acc => acc.getField("out"))
    folded.select($"user_id",
      ($"pos" + 1).cast("long").as("rn"),
      $"col.evs.event_id".as("event_id"),
      $"col.evs.x_c".as("x_c"),
      $"col.states.l".as("level_c"),
      $"col.states.b".as("trend_c"),
      $"col.states.f".as("forecast_c"),
      ($"col.evs.x_c" - $"col.states.f").as("err_c"))
  }

  /** CUSUM slack (allowance) K and decision threshold H, in cents —
    * shared with the streaming twin ([[graft.streaming.EventStreams]]). */
  private[graft] val CusumK = 500L
  private[graft] val CusumH = 5000L

  /** Per-user two-sided CUSUM changepoint detection (Page 1954 — the
    * classic sequential drift detector; see PAPERS.md): each user's first
    * event sets the baseline, and the upper/lower cumulative sums
    * S⁺ᵢ = max(0, S⁺ᵢ₋₁ + (xᵢ − base − K)) and
    * S⁻ᵢ = max(0, S⁻ᵢ₋₁ + (base − xᵢ − K)) accumulate sustained drift
    * above/below it, alarming when either crosses H — the "this user's
    * metric shifted regime" signal ([[qEvAnomaly]]'s point-outlier audit
    * can't see a slow drift; CUSUM exists for exactly that). Pure integer
    * add/max — no division anywhere, so there is no floor/truncation
    * subtlety to keep portable.
    *
    * Scale: the same [[perUserFold]] shape as EWMA/Holt — the recurrence
    * is inherently sequential per key, so the per-user fold IS the
    * distributed form; state is 3 longs threaded through one pass. */
  def qEvCusum(spark: SparkSession, dir: String): DataFrame = {
    val outT = "array<struct<b:bigint,sp:bigint,sn:bigint>>"
    val folded = perUserFold(spark, dir,
      struct(lit(0L).as("base"), lit(0L).as("sp"), lit(0L).as("sn"),
             array().cast(outT).as("out")),
      (acc, e) => {
        val first = size(acc.getField("out")) === 0
        val x = e.getField("x_c")
        val base = when(first, x).otherwise(acc.getField("base"))
        val sp = when(first, 0L).otherwise(
          greatest(lit(0L), acc.getField("sp") + (x - base - CusumK)))
        val sn = when(first, 0L).otherwise(
          greatest(lit(0L), acc.getField("sn") + (base - x - CusumK)))
        struct(base.as("base"), sp.as("sp"), sn.as("sn"),
          concat(acc.getField("out"),
            array(struct(base.as("b"), sp.as("sp"), sn.as("sn")))).as("out"))
      },
      acc => acc.getField("out"))
    folded.select($"user_id",
      ($"pos" + 1).cast("long").as("rn"),
      $"col.evs.event_id".as("event_id"),
      $"col.evs.x_c".as("x_c"),
      $"col.states.b".as("base_c"),
      $"col.states.sp".as("s_pos_c"),
      $"col.states.sn".as("s_neg_c"),
      ($"col.states.sp" > CusumH).as("alarm_up"),
      ($"col.states.sn" > CusumH).as("alarm_down"))
  }

  /** Holt-Winters seasonal period (weekly pattern over the daily series). */
  private[graft] val HwPeriod = 7

  /** Additive Holt-Winters (level + trend + weekly seasonality; α=0.2,
    * β=0.3, γ=0.3) over the corpus-level DAILY total — the triple-
    * exponential step past [[qEvHolt]] for series with a repeating cycle:
    * the one-step-ahead forecast lₜ₋₁+bₜ₋₁+sₜ₋₇ anticipates the weekly
    * shape a trend-only model keeps missing in the same direction each
    * weekday. Integer fixed-point recurrences with portable floor division
    * (the deseasonalized deltas go negative); seeding is deterministic:
    * day 1 sets level=x, trend=0, seasonals all 0 (slots fill as their
    * weekday first recurs — the exactly-computable analog of the usual
    * first-cycle averaging init).
    *
    * Scale: the daily rollup is a distributed hash aggregate (cents sum —
    * order-independent); the recurrence then folds ONE bounded series
    * (≤ calendar days rows — a bounded aggregate by construction, NOT a
    * per-key fold: a 30-year history is 11k rows). Fixed-point domain:
    * daily totals must stay under ~9·10¹⁴ cents for the ×8 step to stay
    * exact in the double division — past that, scale the series to whole
    * currency units or DECIMAL on both engines. */
  def qEvHoltWinters(spark: SparkSession, dir: String): DataFrame = {
    val m = HwPeriod
    val outT = "array<struct<f:bigint,l:bigint,b:bigint,s:bigint>>"
    Tables.events(spark, dir)
      .select(expr("unix_micros(ts) div 86400000000").as("day"),
              round($"value" * 100).cast("long").as("xc0"))
      .groupBy($"day").agg(sum($"xc0").as("x_c"))
      .agg(sort_array(collect_list(struct($"day", $"x_c"))).as("evs"))
      .withColumn("states", aggregate(
        $"evs",
        struct(lit(0L).as("l"), lit(0L).as("b"),
               array((0 until m).map(_ => lit(0L)): _*).as("seas"),
               array().cast(outT).as("out")),
        (acc, e) => {
          val n = size(acc.getField("out"))
          val first = n === 0
          val x = e.getField("x_c")
          val pos = n % m // this day's seasonal slot: (t−1) mod m
          val sOld = element_at(acc.getField("seas"), pos + 1)
          val lb = acc.getField("l") + acc.getField("b")
          val fc = when(first, x).otherwise(lb + sOld)
          val lNew = when(first, x)
            .otherwise(floor(((x - sOld) * 2L + lb * 8L) / 10L))
          val bNew = when(first, 0L)
            .otherwise(floor(((lNew - acc.getField("l")) * 3L
              + acc.getField("b") * 7L) / 10L))
          val sNew = when(first, lit(0L))
            .otherwise(floor(((x - lNew) * 3L + sOld * 7L) / 10L))
          struct(lNew.as("l"), bNew.as("b"),
            transform(acc.getField("seas"),
              (v, i) => when(i === pos, sNew).otherwise(v)).as("seas"),
            concat(acc.getField("out"), array(struct(
              fc.as("f"), lNew.as("l"), bNew.as("b"), sNew.as("s")))).as("out"))
        },
        acc => acc.getField("out")))
      .select(posexplode(arrays_zip($"evs", $"states")))
      .select(($"pos" + 1).cast("long").as("rn"),
        $"col.evs.day".as("day"),
        $"col.evs.x_c".as("x_c"),
        $"col.states.f".as("forecast_c"),
        $"col.states.l".as("level_c"),
        $"col.states.b".as("trend_c"),
        $"col.states.s".as("seas_c"),
        ($"col.evs.x_c" - $"col.states.f").as("err_c"))
  }

  /** Conversion attribution — the marketing-analytics staple over the
    * event stream: each `purchase` is attributed to the nearest preceding
    * non-purchase event (last touch) and to the user's earliest
    * non-purchase event (first touch), with the last-touch gap. Events
    * with no preceding touch attribute to `(none)` with gap −1 (visible,
    * not dropped — same under-reporting discipline as the verification
    * tiers).
    *
    * Plan: ONE window pass (partition user, order (time, event_id),
    * unbounded-preceding-to-−1 frame) computes both touches via
    * ignore-nulls last/first over a conditional projection — no self-join,
    * no per-user arrays; the purchase filter then prunes the output. The
    * window partitions on user_id: bounded by a user's history like the
    * sessionization exchange. */
  def qEvAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy($"user_id").orderBy($"us", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = when($"event_type" =!= "purchase", $"event_type")
    val touchUs = when($"event_type" =!= "purchase", $"us")
    Tables.events(spark, dir)
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id", $"event_type")
      .withColumn("last_touch", last(touch, ignoreNulls = true).over(w))
      .withColumn("first_touch", first(touch, ignoreNulls = true).over(w))
      .withColumn("touch_us", last(touchUs, ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id",
        coalesce($"last_touch", lit("(none)")).as("last_touch"),
        coalesce($"first_touch", lit("(none)")).as("first_touch"),
        coalesce($"us" - $"touch_us", lit(-1L)).as("gap_us"))
  }

  /** Funnel latency — the time dimension [[qEvFunnel]]'s counts drop: for
    * users who progressed view → click → purchase (first qualifying event
    * per stage, strictly ordered), the per-transition gap distribution as
    * exact quartiles in microseconds plus the transition count. The
    * conversion-rate question is "how many"; this is "how fast", which
    * decides timeout/attribution windows.
    *
    * Plan: the same stage-chained min-aggregates as the funnel (input
    * shrinks stage over stage, equi-joins on user_id), then ONE bounded
    * 2-row aggregate (one row per transition after the unpivot) computes
    * the exact quartiles — grouped percentile over per-user gap scalars,
    * never a global sort of events. */
  def qEvFunnelTime(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select($"user_id", $"event_type", unix_micros($"ts").as("us"))
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"us").as("t1"))
    val c = ev.filter($"event_type" === "click")
      .join(v, Seq("user_id")).filter($"us" > $"t1")
      .groupBy($"user_id").agg(min($"us").as("t2"), max($"t1").as("t1"))
    val p = ev.filter($"event_type" === "purchase")
      .join(c, Seq("user_id")).filter($"us" > $"t2")
      .groupBy($"user_id").agg(min($"us").as("t3"), max($"t2").as("t2"))
    val gaps = c.select(lit("view->click").as("transition"), ($"t2" - $"t1").as("gap_us"))
      .unionAll(p.select(lit("click->purchase").as("transition"), ($"t3" - $"t2").as("gap_us")))
    gaps.groupBy($"transition")
      .agg(count(lit(1)).as("n_users"),
        expr("CAST(floor(percentile(gap_us, 0.25)) AS BIGINT)").as("p25_us"),
        expr("CAST(floor(percentile(gap_us, 0.5)) AS BIGINT)").as("p50_us"),
        expr("CAST(floor(percentile(gap_us, 0.75)) AS BIGINT)").as("p75_us"),
        max($"gap_us").as("max_us"))
  }

  /** Time-decayed activity ranking — the "trending now" signal: each
    * event contributes 10⁴·2^(−age_weeks) (half-life one week) toward its
    * type's decayed mass, so recent activity dominates and a type's raw
    * popularity can invert against its current momentum (both ranks
    * emitted — the disagreement IS the signal). The decay is a power of
    * two, so 10⁴ div 2^age is EXACT integer arithmetic — the e4 decay
    * floors to 0 past 13 weeks, which the shift cap makes explicit. No
    * FP exp(), nothing to keep portable.
    *
    * Plan: the horizon week is one bounded scalar aggregate broadcast
    * back; the decayed weight is a narrow projection; one partial+final
    * hash aggregate per type + two windows over the ≤|types| frame. */
  def qEvTrending(spark: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 86400000000L
    val ev = Tables.events(spark, dir)
      .select($"event_type", expr(s"unix_micros(ts) div $weekUs").as("wk"))
    val horizon = ev.agg(max($"wk").as("max_wk"))
    val agg = ev.crossJoin(broadcast(horizon))
      .withColumn("age_wk", least($"max_wk" - $"wk", lit(13L)))
      .withColumn("dec_e4", expr("10000 div shiftleft(1L, cast(age_wk as int))"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n_total"), sum($"dec_e4").as("decayed_e4"))
    agg
      .withColumn("rank_total",
        row_number().over(Window.orderBy($"n_total".desc, $"event_type")).cast("long"))
      .withColumn("rank_decayed",
        row_number().over(Window.orderBy($"decayed_e4".desc, $"event_type")).cast("long"))
  }

  /** Weekly cohort-retention matrix — the triangle every growth dashboard
    * draws: users grouped by first-active week (cohort), counted at each
    * age (weeks since cohort) they return. [[qEvRetention]] is the daily
    * fixed-offset view; this is the full (cohort × age) matrix with the
    * cohort size and the retention rate in e4.
    *
    * Plan: distinct (user, week) activity → per-user min week joined back
    * (both hash aggregates on user_id) → one aggregate on the ≤weeks²/2
    * (cohort, age) domain; the rate divides two counts from the SAME
    * aggregate via a window over the cohort partition (bounded by
    * \#ages). */
  def qEvCohortMatrix(spark: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 86400000000L
    val act = Tables.events(spark, dir)
      .select($"user_id", expr(s"unix_micros(ts) div $weekUs").as("wk"))
      .distinct()
    val cohorts = act.groupBy($"user_id").agg(min($"wk").as("cohort_wk"))
    val cells = act.join(cohorts, Seq("user_id"))
      .groupBy($"cohort_wk", ($"wk" - $"cohort_wk").as("age_wk"))
      .agg(count(lit(1)).as("n_active"))
    val wCohort = Window.partitionBy($"cohort_wk")
    cells
      .withColumn("cohort_size", max(when($"age_wk" === 0L, $"n_active")).over(wCohort))
      .select($"cohort_wk", $"age_wk", $"n_active", $"cohort_size",
        expr("(n_active * 10000) div cohort_size").as("retained_e4"))
  }

  /** Growth accounting — the weekly user-lifecycle ledger (new / retained
    * / resurrected / churned) every growth team keeps: a user is NEW in
    * their first active week, RETAINED when active in consecutive weeks,
    * RESURRECTED when returning after a gap, and counts as CHURNED in the
    * first week after an active week with no activity (attributed to the
    * week the absence started, capped at the corpus horizon so the ledger
    * never blames silence past the data). Conservation law (spec-checked):
    * per week, new + retained + resurrected = active users.
    *
    * Plan: distinct (user, week) activity (one hash aggregate), per-user
    * `lag`/`lead` over the week-ordered activity — a window bounded by a
    * user's active weeks — then one aggregate per (week, state). The
    * churn stream is the same frame shifted one week forward and unioned;
    * nothing scans the corpus twice. */
  def qEvLifecycle(spark: SparkSession, dir: String): DataFrame = {
    val weekUs = 7L * 86400000000L
    val active = Tables.events(spark, dir)
      .select($"user_id", expr(s"unix_micros(ts) div $weekUs").as("wk"))
      .distinct()
    val horizon = active.agg(max($"wk").as("max_wk"))
    val w = Window.partitionBy($"user_id").orderBy($"wk")
    val flagged = active
      .withColumn("prev", lag($"wk", 1).over(w))
      .withColumn("state",
        when($"prev".isNull, "new")
          .when($"prev" === $"wk" - 1, "retained")
          .otherwise("resurrected"))
    val churn = flagged
      .withColumn("nxt", lead($"wk", 1).over(w))
      .filter($"nxt".isNull || $"nxt" > $"wk" + 1)
      .crossJoin(broadcast(horizon))
      .filter($"wk" + 1 <= $"max_wk") // silence past the horizon isn't churn
      .select(($"wk" + 1).as("wk"), lit("churned").as("state"))
    flagged.select($"wk", $"state")
      .unionAll(churn)
      .groupBy($"wk", $"state").agg(count(lit(1)).as("n_users"))
      .orderBy($"wk", $"state")
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ev_bitmap_retention" -> qEvBitmapRetention _,
    "q_ev_abtest"   -> qEvAbtest _,
    "q_ev_ewma"     -> qEvEwma _,
    "q_ev_holt"     -> qEvHolt _,
    "q_ev_cusum"    -> qEvCusum _,
    "q_ev_holt_winters" -> qEvHoltWinters _,
    "q_ev_attribution" -> qEvAttribution _,
    "q_ev_lifecycle" -> qEvLifecycle _,
    "q_ev_cohort_matrix" -> qEvCohortMatrix _,
    "q_ev_trending" -> qEvTrending _,
    "q_ev_funnel_time" -> qEvFunnelTime _,
    "q_ev_markov"   -> qEvMarkov _,
    "q_ev_top_paths" -> qEvTopPaths _,
    "q_ev_quantile_bins" -> qEvQuantileBins _,
    "q_ev_wau"      -> qEvWau _,
    "q_ev_rfm"      -> qEvRfm _,
    "q_ev_gap_fill" -> qEvGapFill _,
    "q_ev_latest"   -> qEvLatest _,
    "q_ev_funnel"   -> qEvFunnel _,
    "q_ev_retention" -> qEvRetention _,
    "q_ev_histogram" -> qEvHistogram _,
    "q_ev_anomaly"  -> qEvAnomaly _,
    "q_join_interval" -> qJoinInterval _,
    "q_join_interval_mass" -> qJoinIntervalMass _,
    "q_ev_scd2"     -> qEvScd2 _,
    "q_ev_filter"   -> qEvFilter _,
    "q_ev_json"     -> qEvJson _,
    "q_ev_tumbling" -> qEvTumbling _,
    "q_ev_sliding"  -> qEvSliding _,
    "q_ev_session"  -> qEvSession _,
    "q_ev_session_window" -> qEvSessionWindow _,
    "q_ev_dedup"    -> qEvDedup _,
    "q_ev_daily"    -> qEvDaily _,
  )

  val oracles: Map[String, String] = Map(
    "q_ev_holt" ->
      // Holt as a per-user recursive CTE carrying (level, trend); the new
      // trend references the new level, so its expression nests the level
      // expression (a recursive CTE row cannot reference its own aliases).
      // floor(·/10.0) throughout — the trend goes negative, where `//`
      // truncates (see q_ev_ewma).
      """WITH RECURSIVE base AS (
           SELECT user_id, event_id,
             CAST(round(value * 100) AS BIGINT) AS x_c,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
           FROM events),
         r AS (
           SELECT user_id, rn, event_id, x_c,
             x_c AS l, CAST(0 AS BIGINT) AS b, x_c AS f
           FROM base WHERE rn = 1
           UNION ALL
           SELECT b2.user_id, b2.rn, b2.event_id, b2.x_c,
             CAST(floor((b2.x_c * 2 + (r.l + r.b) * 8) / 10.0) AS BIGINT),
             CAST(floor(((CAST(floor((b2.x_c * 2 + (r.l + r.b) * 8) / 10.0)
                  AS BIGINT) - r.l) * 3 + r.b * 7) / 10.0) AS BIGINT),
             r.l + r.b
           FROM r JOIN base b2
             ON b2.user_id = r.user_id AND b2.rn = r.rn + 1)
         SELECT user_id, rn, event_id, x_c,
           l AS level_c, b AS trend_c, f AS forecast_c,
           x_c - f AS err_c
         FROM r ORDER BY user_id, rn""",
    "q_ev_funnel_time" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         v AS (SELECT user_id, min(us) AS t1 FROM e
               WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(us) AS t2, max(t1) AS t1
               FROM e JOIN v ON e.user_id = v.user_id
               WHERE event_type = 'click' AND us > t1 GROUP BY 1),
         p AS (SELECT e.user_id, min(us) AS t3, max(t2) AS t2
               FROM e JOIN c ON e.user_id = c.user_id
               WHERE event_type = 'purchase' AND us > t2 GROUP BY 1),
         gaps AS (
           SELECT 'view->click' AS transition, t2 - t1 AS gap_us FROM c
           UNION ALL
           SELECT 'click->purchase' AS transition, t3 - t2 AS gap_us FROM p)
         SELECT transition, count(*) AS n_users,
           CAST(floor(quantile_cont(gap_us, 0.25)) AS BIGINT) AS p25_us,
           CAST(floor(quantile_cont(gap_us, 0.5)) AS BIGINT) AS p50_us,
           CAST(floor(quantile_cont(gap_us, 0.75)) AS BIGINT) AS p75_us,
           CAST(max(gap_us) AS BIGINT) AS max_us
         FROM gaps GROUP BY 1 ORDER BY transition""",
    "q_ev_trending" ->
      """WITH e AS (
           SELECT event_type, epoch_us(ts) // 604800000000 AS wk FROM events),
         hz AS (SELECT max(wk) AS max_wk FROM e),
         d AS (
           SELECT event_type,
             10000 // (1::BIGINT << CAST(least(max_wk - wk, 13) AS INT)) AS dec_e4
           FROM e, hz),
         agg AS (
           SELECT event_type, count(*) AS n_total,
             CAST(sum(dec_e4) AS BIGINT) AS decayed_e4
           FROM d GROUP BY 1)
         SELECT event_type, n_total, decayed_e4,
           CAST(row_number() OVER (ORDER BY n_total DESC, event_type) AS BIGINT)
             AS rank_total,
           CAST(row_number() OVER (ORDER BY decayed_e4 DESC, event_type) AS BIGINT)
             AS rank_decayed
         FROM agg ORDER BY event_type""",
    "q_ev_cohort_matrix" ->
      """WITH act AS (
           SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
           FROM events),
         c AS (SELECT user_id, min(wk) AS cohort_wk FROM act GROUP BY 1),
         cells AS (
           SELECT cohort_wk, a.wk - cohort_wk AS age_wk, count(*) AS n_active
           FROM act a JOIN c ON a.user_id = c.user_id
           GROUP BY 1, 2),
         sized AS (
           SELECT *, max(CASE WHEN age_wk = 0 THEN n_active END)
             OVER (PARTITION BY cohort_wk) AS cohort_size
           FROM cells)
         SELECT CAST(cohort_wk AS BIGINT) AS cohort_wk,
           CAST(age_wk AS BIGINT) AS age_wk,
           n_active, cohort_size,
           CAST(n_active * 10000 // cohort_size AS BIGINT) AS retained_e4
         FROM sized ORDER BY cohort_wk, age_wk""",
    "q_ev_lifecycle" ->
      """WITH act AS (
           SELECT DISTINCT user_id,
             epoch_us(ts) // 604800000000 AS wk
           FROM events),
         hz AS (SELECT max(wk) AS max_wk FROM act),
         f AS (
           SELECT user_id, wk,
             lag(wk) OVER (PARTITION BY user_id ORDER BY wk) AS prev,
             lead(wk) OVER (PARTITION BY user_id ORDER BY wk) AS nxt
           FROM act),
         states AS (
           SELECT wk,
             CASE WHEN prev IS NULL THEN 'new'
                  WHEN prev = wk - 1 THEN 'retained'
                  ELSE 'resurrected' END AS state
           FROM f
           UNION ALL
           SELECT wk + 1 AS wk, 'churned' AS state
           FROM f, hz
           WHERE (nxt IS NULL OR nxt > wk + 1) AND wk + 1 <= max_wk)
         SELECT CAST(wk AS BIGINT) AS wk, state, count(*) AS n_users
         FROM states GROUP BY 1, 2 ORDER BY wk, state""",
    "q_ev_attribution" ->
      """WITH e AS (
           SELECT user_id, us, event_id, event_type,
             last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS) OVER w AS last_touch,
             first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS) OVER w AS first_touch,
             last_value(CASE WHEN event_type <> 'purchase' THEN us END
               IGNORE NULLS) OVER w AS touch_us
           FROM (SELECT user_id, epoch_us(ts) AS us, ts, event_id, event_type
                 FROM events)
           WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         SELECT user_id, event_id,
           coalesce(last_touch, '(none)') AS last_touch,
           coalesce(first_touch, '(none)') AS first_touch,
           CAST(coalesce(us - touch_us, -1) AS BIGINT) AS gap_us
         FROM e WHERE event_type = 'purchase'
         ORDER BY user_id, event_id""",
    "q_ev_holt_winters" -> {
      // Holt-Winters over the daily series as ONE recursive CTE carrying
      // the 7 seasonal slots as columns (a recursive CTE cannot carry an
      // array it updates; CASE-per-slot is the columnar form of the Spark
      // side's transform-with-index). The new level nests into the trend
      // AND seasonal expressions (a recursive row cannot reference its own
      // aliases — same technique as the Holt oracle). floor(·/10.0)
      // throughout: the deseasonalized deltas go negative where `//`
      // truncates.
      val m = HwPeriod
      val sOld = s"(CASE (nx.rn - 1) % $m ${
        (0 until m).map(j => s"WHEN $j THEN r.s$j").mkString(" ")} END)"
      val lNew =
        s"CAST(floor((2 * (nx.x_c - $sOld) + 8 * (r.lv + r.tr)) / 10.0) AS BIGINT)"
      val bNew = s"CAST(floor((3 * ($lNew - r.lv) + 7 * r.tr) / 10.0) AS BIGINT)"
      val sNew = s"CAST(floor((3 * (nx.x_c - $lNew) + 7 * $sOld) / 10.0) AS BIGINT)"
      val sSeed = (0 until m).map(j => s"CAST(0 AS BIGINT) AS s$j").mkString(", ")
      val sUpd = (0 until m)
        .map(j => s"CASE WHEN (nx.rn - 1) % $m = $j THEN $sNew ELSE r.s$j END AS s$j")
        .mkString(",\n             ")
      s"""WITH RECURSIVE base AS (
           SELECT day, x_c,
             CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
           FROM (
             SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x_c
             FROM events GROUP BY 1)),
         r AS (
           SELECT rn, day, x_c, x_c AS f, x_c AS lv,
             CAST(0 AS BIGINT) AS tr, CAST(0 AS BIGINT) AS se, $sSeed
           FROM base WHERE rn = 1
           UNION ALL
           SELECT nx.rn, nx.day, nx.x_c,
             r.lv + r.tr + $sOld AS f,
             $lNew AS lv, $bNew AS tr, $sNew AS se,
             $sUpd
           FROM r JOIN base nx ON nx.rn = r.rn + 1)
         SELECT rn, day, x_c, f AS forecast_c, lv AS level_c, tr AS trend_c,
           se AS seas_c, x_c - f AS err_c
         FROM r ORDER BY rn"""
    },
    "q_ev_cusum" ->
      // Two-sided CUSUM as a per-user recursive CTE. Pure add/max integer
      // arithmetic — unlike EWMA/Holt there is no division to keep
      // floor-portable; the baseline (first value) threads through the
      // recursion unchanged.
      s"""WITH RECURSIVE base AS (
           SELECT user_id, event_id,
             CAST(round(value * 100) AS BIGINT) AS x_c,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
           FROM events),
         r AS (
           SELECT user_id, rn, event_id, x_c, x_c AS base_c,
             CAST(0 AS BIGINT) AS s_pos_c, CAST(0 AS BIGINT) AS s_neg_c
           FROM base WHERE rn = 1
           UNION ALL
           SELECT b.user_id, b.rn, b.event_id, b.x_c, r.base_c,
             CAST(greatest(0, r.s_pos_c + (b.x_c - r.base_c - $CusumK)) AS BIGINT),
             CAST(greatest(0, r.s_neg_c + (r.base_c - b.x_c - $CusumK)) AS BIGINT)
           FROM r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1)
         SELECT user_id, rn, event_id, x_c, base_c, s_pos_c, s_neg_c,
           s_pos_c > $CusumH AS alarm_up, s_neg_c > $CusumH AS alarm_down
         FROM r ORDER BY user_id, rn""",
    "q_ev_ewma" ->
      // The same integer recurrence as a per-user recursive CTE: row rn
      // chains onto rn−1 within its user; recursion depth = the longest
      // per-user history. floor(·/10.0) — NOT `//`, which DuckDB truncates
      // toward zero for integer operands — so a negative smoothed state
      // divides exactly like the Spark side's floor().
      """WITH RECURSIVE base AS (
           SELECT user_id, event_id,
             CAST(round(value * 100) AS BIGINT) AS x_c,
             CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
           FROM events),
         r AS (
           SELECT user_id, rn, event_id, x_c, x_c AS ewma_c
           FROM base WHERE rn = 1
           UNION ALL
           SELECT b.user_id, b.rn, b.event_id, b.x_c,
             CAST(floor((b.x_c * 2 + r.ewma_c * 8) / 10.0) AS BIGINT)
           FROM r JOIN base b ON b.user_id = r.user_id AND b.rn = r.rn + 1)
         SELECT user_id, rn, event_id, x_c, ewma_c
         FROM r ORDER BY user_id, rn""",
    "q_ev_rfm" ->
      """WITH p AS (
           SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             CAST(round(value * 100) AS BIGINT) AS value_c
           FROM events WHERE event_type = 'purchase'),
         ld AS (SELECT max(day) AS last_day FROM p),
         rfm AS (
           SELECT user_id,
             CAST((SELECT last_day FROM ld) - max(day) AS BIGINT) AS recency_d,
             count(*) AS frequency,
             CAST(sum(value_c) AS BIGINT) AS monetary_c
           FROM p GROUP BY 1),
         cuts AS (SELECT
             CAST(floor(percentile_cont(0.3333) WITHIN GROUP (ORDER BY recency_d)) AS BIGINT) AS r1,
             CAST(floor(percentile_cont(0.6667) WITHIN GROUP (ORDER BY recency_d)) AS BIGINT) AS r2,
             CAST(floor(percentile_cont(0.3333) WITHIN GROUP (ORDER BY frequency)) AS BIGINT) AS f1,
             CAST(floor(percentile_cont(0.6667) WITHIN GROUP (ORDER BY frequency)) AS BIGINT) AS f2,
             CAST(floor(percentile_cont(0.3333) WITHIN GROUP (ORDER BY monetary_c)) AS BIGINT) AS m1,
             CAST(floor(percentile_cont(0.6667) WITHIN GROUP (ORDER BY monetary_c)) AS BIGINT) AS m2
           FROM rfm),
         scored AS (
           SELECT user_id, recency_d, frequency, monetary_c,
             CASE WHEN recency_d <= r1 THEN 3 WHEN recency_d <= r2 THEN 2
                  ELSE 1 END AS r_score,
             CASE WHEN frequency > f2 THEN 3 WHEN frequency > f1 THEN 2
                  ELSE 1 END AS f_score,
             CASE WHEN monetary_c > m2 THEN 3 WHEN monetary_c > m1 THEN 2
                  ELSE 1 END AS m_score
           FROM rfm, cuts)
         SELECT user_id, recency_d, frequency, monetary_c,
           CAST(r_score AS BIGINT) AS r_score, CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT) AS rfm
         FROM scored ORDER BY user_id""",
    "q_ev_wau" ->
      """WITH daily AS (
           SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
           FROM events),
         b AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         dau AS (SELECT day, count(DISTINCT user_id) AS dau
                 FROM daily GROUP BY 1),
         wau AS (SELECT wday AS day, count(DISTINCT user_id) AS wau
                 FROM daily, b,
                   LATERAL (SELECT unnest(generate_series(day, day + 6)) AS wday) g
                 WHERE wday BETWEEN d0 AND d1 GROUP BY 1)
         SELECT day, dau, wau,
           CAST(dau * 10000 // wau AS BIGINT) AS stickiness_e4
         FROM dau JOIN wau USING (day) ORDER BY day""",
    "q_ev_top_paths" ->
      """WITH seq AS (
           SELECT event_type,
             lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p1,
             lag(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS p2
           FROM events)
         SELECT p2 AS step1, p1 AS step2, event_type AS step3, count(*) AS n
         FROM seq WHERE p2 IS NOT NULL
         GROUP BY 1, 2, 3 ORDER BY n DESC, step1, step2, step3 LIMIT 20""",
    "q_ev_quantile_bins" ->
      """WITH ev AS (SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS value_c FROM events),
         cuts AS (SELECT event_type,
             CAST(floor(percentile_cont(0.1) WITHIN GROUP (ORDER BY value_c)) AS BIGINT) AS c1,
             CAST(floor(percentile_cont(0.2) WITHIN GROUP (ORDER BY value_c)) AS BIGINT) AS c2,
             CAST(floor(percentile_cont(0.3) WITHIN GROUP (ORDER BY value_c)) AS BIGINT) AS c3,
             CAST(floor(percentile_cont(0.4) WITHIN GROUP (ORDER BY value_c)) AS BIGINT) AS c4,
             CAST(floor(percentile_cont(0.5) WITHIN GROUP (ORDER BY value_c)) AS BIGINT) AS c5,
             CAST(floor(percentile_cont(0.6) WITHIN GROUP (ORDER BY value_c)) AS BIGINT) AS c6,
             CAST(floor(percentile_cont(0.7) WITHIN GROUP (ORDER BY value_c)) AS BIGINT) AS c7,
             CAST(floor(percentile_cont(0.8) WITHIN GROUP (ORDER BY value_c)) AS BIGINT) AS c8,
             CAST(floor(percentile_cont(0.9) WITHIN GROUP (ORDER BY value_c)) AS BIGINT) AS c9
           FROM ev GROUP BY event_type),
         binned AS (
           SELECT ev.event_type, value_c,
             (CASE WHEN value_c > c1 THEN 1 ELSE 0 END +
              CASE WHEN value_c > c2 THEN 1 ELSE 0 END +
              CASE WHEN value_c > c3 THEN 1 ELSE 0 END +
              CASE WHEN value_c > c4 THEN 1 ELSE 0 END +
              CASE WHEN value_c > c5 THEN 1 ELSE 0 END +
              CASE WHEN value_c > c6 THEN 1 ELSE 0 END +
              CASE WHEN value_c > c7 THEN 1 ELSE 0 END +
              CASE WHEN value_c > c8 THEN 1 ELSE 0 END +
              CASE WHEN value_c > c9 THEN 1 ELSE 0 END) AS bin
           FROM ev JOIN cuts ON ev.event_type = cuts.event_type)
         SELECT event_type, CAST(bin AS BIGINT) AS bin, count(*) AS n,
           min(value_c) AS min_c, max(value_c) AS max_c
         FROM binned GROUP BY 1, 2 ORDER BY event_type, bin""",
    "q_ev_markov" ->
      """WITH seq AS (
           SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
           FROM events),
         c AS (
           SELECT prev_type, event_type AS next_type, count(*) AS n
           FROM seq WHERE prev_type IS NOT NULL GROUP BY 1, 2)
         SELECT prev_type, next_type, n,
           CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from,
           CAST(n * 10000 // sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
             AS p_e4
         FROM c ORDER BY prev_type, next_type""",
    "q_ev_anomaly" ->
      """WITH ev AS (SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS value_c FROM events),
         th AS (SELECT event_type,
             CAST(floor(percentile_cont(0.99) WITHIN GROUP (ORDER BY value_c))
                  AS BIGINT) AS p99_c
           FROM ev GROUP BY 1)
         SELECT ev.event_type, max(p99_c) AS p99_c, count(*) AS n,
           CAST(sum(CASE WHEN value_c > p99_c THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers,
           CAST(sum(CASE WHEN value_c > p99_c THEN value_c ELSE 0 END) AS BIGINT)
             AS outlier_value_c,
           CAST(sum(CASE WHEN value_c > p99_c THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS outlier_e4
         FROM ev JOIN th ON ev.event_type = th.event_type
         GROUP BY 1 ORDER BY 1""",
    "q_join_interval" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events)
         SELECT a.user_id, a.event_id AS ea, b.event_id AS eb,
           CAST(300000000 - abs(a.us - b.us) AS BIGINT) AS overlap_us
         FROM e a JOIN e b ON a.user_id = b.user_id
           AND a.event_id < b.event_id AND abs(a.us - b.us) < 300000000
         ORDER BY a.user_id, ea, eb""",
    "q_join_interval_mass" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         p AS (
           SELECT a.user_id,
             CAST(300000000 - abs(a.us - b.us) AS BIGINT) AS overlap_us
           FROM e a JOIN e b ON a.user_id = b.user_id
             AND a.event_id < b.event_id AND abs(a.us - b.us) < 300000000)
         SELECT user_id, count(*) AS n_pairs,
           CAST(sum(overlap_us) AS BIGINT) AS overlap_mass_us,
           CAST(max(overlap_us) AS BIGINT) AS max_overlap_us
         FROM p GROUP BY 1 ORDER BY user_id""",
    "q_ev_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         v AS (SELECT user_id, min(us) AS t1 FROM e WHERE event_type = 'view' GROUP BY 1),
         c AS (SELECT e.user_id, min(us) AS t2 FROM e JOIN v ON e.user_id = v.user_id
               WHERE event_type = 'click' AND us > t1 GROUP BY 1),
         p AS (SELECT e.user_id, min(us) AS t3 FROM e JOIN c ON e.user_id = c.user_id
               WHERE event_type = 'purchase' AND us > t2 GROUP BY 1)
         SELECT (SELECT count(*) FROM v) AS n_view,
                (SELECT count(*) FROM c) AS n_click_after_view,
                (SELECT count(*) FROM p) AS n_purchase_after_click""",
    "q_ev_bitmap_retention" ->
      """WITH masks AS (
           SELECT user_id,
             bit_or(CAST(1 AS BIGINT) <<
               CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                    AS INTEGER)) AS mask
           FROM events GROUP BY 1),
         days AS (SELECT CAST(range AS BIGINT) AS d FROM range(0, 29))
         SELECT d,
           CAST(sum((mask >> CAST(d AS INTEGER)) & 1) AS BIGINT) AS n_active,
           CAST(sum((mask >> CAST(d AS INTEGER))
                  & (mask >> CAST(d + 1 AS INTEGER)) & 1) AS BIGINT)
             AS n_ret_next_day,
           CAST(sum((mask >> CAST(d AS INTEGER))
                  & (mask >> CAST(d + 7 AS INTEGER)) & 1) AS BIGINT)
             AS n_ret_next_week
         FROM masks, days GROUP BY d ORDER BY d""",
    "q_ev_abtest" ->
      """WITH per_user AS (
           SELECT user_id % 2 AS variant, user_id,
             max(CASE WHEN event_type = 'purchase' AND value > 150.0
                      THEN 1 ELSE 0 END) AS converted
           FROM events GROUP BY 1, 2),
         counts AS (
           SELECT
             sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN variant = 0 THEN converted ELSE 0 END) AS conv_a,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
             sum(CASE WHEN variant = 1 THEN converted ELSE 0 END) AS conv_b
           FROM per_user),
         rates AS (
           SELECT *,
             conv_a * 1000000 // n_a AS pa_e6,
             conv_b * 1000000 // n_b AS pb_e6,
             (conv_a + conv_b) * 1000000 // (n_a + n_b) AS pool_e6
           FROM counts),
         se AS (
           SELECT *,
             CAST(floor(sqrt(
               CAST(pool_e6 * (1000000 - pool_e6) * (n_a + n_b) AS DOUBLE)
                 / CAST(n_a * n_b AS DOUBLE))) AS BIGINT) AS se_e6
           FROM rates)
         SELECT
           CAST(n_a AS BIGINT) AS n_a, CAST(conv_a AS BIGINT) AS conv_a,
           CAST(n_b AS BIGINT) AS n_b, CAST(conv_b AS BIGINT) AS conv_b,
           CAST(pa_e6 AS BIGINT) AS pa_e6, CAST(pb_e6 AS BIGINT) AS pb_e6,
           CAST(pool_e6 AS BIGINT) AS pool_e6, se_e6,
           CAST((pa_e6 - pb_e6) * 1000 // se_e6 AS BIGINT) AS z_e3,
           CAST(CASE WHEN abs((pa_e6 - pb_e6) * 1000 // se_e6) > 1960
                     THEN 1 ELSE 0 END AS BIGINT) AS significant
         FROM se""",
    "q_ev_retention" ->
      """WITH days AS (
           SELECT DISTINCT user_id,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT) AS d
           FROM events),
         cohort AS (SELECT user_id, min(d) AS d0 FROM days GROUP BY 1),
         flags AS (
           SELECT days.user_id, d0,
             max(CASE WHEN d = d0 + 1 THEN 1 ELSE 0 END) AS r1,
             max(CASE WHEN d = d0 + 7 THEN 1 ELSE 0 END) AS r7,
             max(CASE WHEN d = d0 + 14 THEN 1 ELSE 0 END) AS r14
           FROM days JOIN cohort ON days.user_id = cohort.user_id
           GROUP BY 1, 2)
         SELECT d0, count(*) AS n_users,
           CAST(sum(r1) AS BIGINT) AS n_d1,
           CAST(sum(r7) AS BIGINT) AS n_d7,
           CAST(sum(r14) AS BIGINT) AS n_d14
         FROM flags GROUP BY d0 ORDER BY d0""",
    "q_ev_histogram" ->
      """SELECT event_type,
           CAST(least(floor(value / 50.0), 9.0) AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
         FROM events GROUP BY 1, 2 ORDER BY event_type, bucket""",
    "q_ev_latest" ->
      """WITH ranked AS (
           SELECT user_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS value_c,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn,
             CAST(max(epoch_us(ts)) OVER (PARTITION BY user_id) AS BIGINT)
               AS last_ts_us,
             count(*) OVER (PARTITION BY user_id) AS n_events
           FROM events)
         SELECT user_id, event_type AS last_type, value_c AS last_value_c,
           last_ts_us, n_events
         FROM ranked WHERE rn = 1 ORDER BY user_id""",
    "q_ev_gap_fill" ->
      """WITH daily AS (
           SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
           FROM events GROUP BY 1, 2
         ), cal AS (
           SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
           FROM (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1)
         ), joined AS (
           SELECT c.user_id, c.day, d.value_c FROM cal c
           LEFT JOIN daily d ON c.user_id = d.user_id AND c.day = d.day
         )
         SELECT user_id, day,
           last_value(value_c IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_c,
           (value_c IS NULL) AS is_gap
         FROM joined ORDER BY user_id, day""",
    "q_ev_scd2" ->
      """WITH marked AS (
           SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
           FROM events
         ), changes AS (
           SELECT user_id, event_type, epoch_us(ts) AS valid_from_us
           FROM marked
           WHERE prev_type IS NULL OR prev_type <> event_type
         )
         SELECT user_id, event_type, valid_from_us,
           coalesce(lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us),
                    9223372036854775807) AS valid_to_us
         FROM changes ORDER BY user_id, valid_from_us""",
    "q_ev_filter" ->
      """SELECT event_id, user_id, event_type, value FROM events
         WHERE ts BETWEEN TIMESTAMP '2024-01-05 00:00:00' AND TIMESTAMP '2024-01-20 00:00:00'
           AND event_type IN ('purchase','signup') AND value > 50
         ORDER BY event_id""",
    "q_ev_json" ->
      // TRY_CAST mirrors Spark's null-on-bad-cast: a non-numeric $.k drops
      // the row in both engines instead of erroring only in DuckDB.
      """SELECT event_id,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
         TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod
         FROM events WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
         ORDER BY event_id""",
    "q_ev_tumbling" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS ws, event_type,
         count(*) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
         FROM events GROUP BY 1, 2 ORDER BY ws, event_type""",
    "q_ev_sliding" ->
      """SELECT ws, count(*) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
         FROM (
           SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000) AS ws, value FROM events
           UNION ALL
           SELECT make_timestamp((epoch_us(ts) // 1800000000) * 1800000000 - 1800000000) AS ws, value FROM events
         ) GROUP BY ws ORDER BY ws""",
    "q_ev_session" ->
      """WITH marked AS (
           SELECT user_id, ts, event_id, value,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events
         ), flagged AS (
           SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
                          THEN 1 ELSE 0 END AS new_s
           FROM marked
         ), sess AS (
           SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
           FROM flagged
         )
         SELECT user_id, session_id, count(*) AS n_events,
           min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c
         FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id""",
    "q_ev_session_window" ->
      """WITH marked AS (
           SELECT user_id, ts,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
           FROM events
         ), flagged AS (
           SELECT *, CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000
                          THEN 1 ELSE 0 END AS new_s
           FROM marked
         ), sess AS (
           SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
           FROM flagged
         )
         SELECT user_id, min(epoch_us(ts)) AS start_us,
           max(epoch_us(ts)) + 1800000000 AS end_us,
           count(*) AS n_events
         FROM sess GROUP BY user_id, sid ORDER BY user_id, start_us""",
    "q_ev_dedup" ->
      """SELECT user_id, event_type, event_id, value FROM (
           SELECT user_id, event_type, event_id, value,
             row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
           FROM events
         ) WHERE rn = 1 ORDER BY user_id, event_type""",
    "q_ev_daily" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
         count(*) AS n,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_c,
         count(DISTINCT user_id) AS n_users,
         CAST((CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) * 10000) // count(*) AS BIGINT) AS avg_value_e6
         FROM events GROUP BY 1, 2 ORDER BY day, event_type""",
  )
}
