package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** State-store record types for the stateful processors below. TOP-LEVEL
  * (not nested in the object, not `private`) on purpose: a state encoder's
  * generated `UnsafeProjection` calls the case-class accessors from
  * Janino-compiled code, and a `private` nested class compiles those
  * accessors package-private in bytecode — Janino then fails resolution
  * ("No applicable constructor/method found") and Spark silently falls
  * back to interpreter-mode projection for EVERY state row, the exact
  * de-optimization `StateEncoderCodegenSpec` pins against. */
final case class LastEvent(us: Long, event_id: Long, event_type: String)
final case class EwmaState(us: Long, event_id: Long, ewma_c: Long)
final case class CusumState(
    us: Long, event_id: Long, base_c: Long, sp: Long, sn: Long)
final case class TouchState(us: Long, event_id: Long,
    first_touch: Option[String], last_touch: Option[String], last_us: Long)

/** Structured Streaming transforms over the event stream (SURVEY.md §2.2
  * streaming rows; M4 in the build plan). Each transform is the streaming
  * twin of a batch query in [[graft.queries.Events]] — same logic, same
  * results once the stream is drained, which is exactly what the specs
  * assert (batch/streaming equivalence under Trigger.AvailableNow).
  *
  * Scale: state size is the design constraint, not throughput. Watermarks
  * bound every stateful operator: windowed aggs evict closed windows,
  * dropDuplicatesWithinWatermark evicts seen-keys, and the custom
  * sessionizer uses event-time timeouts — no unbounded state anywhere.
  */
object EventStreams {

  /** Tumbling 1-hour counts with a watermark (late data beyond 2 hours is
    * dropped deterministically). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("ws"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(round(col("value") * 100).cast("long")).as("value_c"))

  /** Streaming dedup on (user_id, event_type) with bounded state: the
    * watermark lets Spark evict seen-keys older than the horizon. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Built-in session windows (30-minute gap), the declarative form. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(round(col("value") * 100).cast("long")).as("value_c"))
      .select(col("user_id"), col("w.start").as("session_start"),
              col("w.end").as("session_end"), col("n_events"), col("value_c"))

  /** Streaming twin of the latest-wins CDC compaction (`q_ev_latest`): the
    * same [[graft.functions.ArgMaxAggregator]] runs as a stateful streaming
    * aggregation — state is ONE small buffer per key (the current winner),
    * updated per micro-batch; a later event simply replaces the buffer.
    * Complete/update output gives the continuously-maintained compacted
    * snapshot the batch query computes from scratch. */
  def latestWins(events: DataFrame): DataFrame = {
    val latest = udaf(new graft.functions.ArgMaxAggregator)
    events
      .groupBy(col("user_id"))
      .agg(latest(unix_micros(col("ts")), col("event_id"),
                  col("event_type"), round(col("value") * 100).cast("long"))
             .as("lw"),
           count(lit(1)).as("n_events"))
      .select(col("user_id"), col("lw.typ").as("last_type"),
              col("lw.valueC").as("last_value_c"), col("n_events"))
  }

  /** Streaming twin of the incremental dedup (`q_dedup_incremental`'s exact
    * tier): drop every incoming document whose content fingerprint already
    * exists in the static seen-corpus index — a stream-static LEFT ANTI
    * join, re-resolved per micro-batch (a refreshed index snapshot is
    * picked up without restart) and carrying NO streaming state: the dedup
    * memory lives in the index, not the state store. `fp` must be the
    * engine-portable md5 fingerprint both sides compute the same way. */
  def dedupAgainstCorpus(docs: DataFrame, seenFps: DataFrame): DataFrame =
    docs.join(broadcast(seenFps), Seq("fp"), "left_anti")

  /** Stream-static enrichment join: every micro-batch joins the (small)
    * static dimension table, explicitly broadcast — a map-side hash join
    * per batch with NO streaming state at all. This is the dimension-join
    * of a streaming ETL at any scale: the stream never shuffles, and the
    * dim is re-resolved per batch (so a swapped-in dim snapshot is picked
    * up without restarting the query). */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), Seq("user_id"), "left")

  /** Stream-stream inner join with watermarks on both sides: impressions ⋈
    * clicks within a bounded event-time window. The time-range conjunct plus
    * both watermarks bound the join state — each side evicts rows once the
    * other side's watermark passes the range. */
  def impressionClickJoin(
      impressions: DataFrame, clicks: DataFrame): DataFrame = {
    val imp = impressions.withWatermark("imp_ts", "1 hour")
    val clk = clicks.withWatermark("click_ts", "1 hour")
    imp.join(
      clk,
      expr("""imp_user = click_user AND
              click_ts >= imp_ts AND
              click_ts <= imp_ts + interval 30 minutes"""))
  }

  final case class RunningTotal(user_id: Long, n: Long, value_c: Long)

  /** Per-user running totals via `transformWithState` — the current-generation
    * arbitrary-state API (successor to (flatMap)GroupsWithState): typed
    * `ValueState` handles, explicit `TimeMode`, TTL support. Emits the
    * updated running total for every input batch (Update mode). */
  class RunningTotalProcessor extends StatefulProcessor[Long, Ev, RunningTotal] {
    @transient private var state: ValueState[RunningTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunningTotal](
        "running", Encoders.product[RunningTotal], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[Ev], timerValues: TimerValues): Iterator[RunningTotal] = {
      val prev = Option(state.get()).getOrElse(RunningTotal(key, 0L, 0L))
      val next = rows.foldLeft(prev) { (acc, e) =>
        RunningTotal(key, acc.n + 1, acc.value_c + math.round(e.value * 100))
      }
      state.update(next)
      Iterator(next)
    }
  }

  def runningTotals(events: Dataset[Ev]): Dataset[RunningTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningTotalProcessor, TimeMode.None(), OutputMode.Update())
  }

  /** [[RunningTotalProcessor]] with a state TTL — the bounded-by-POLICY
    * state shape, completing the lane's taxonomy: the watermarked three
    * bound state by event-time horizon, the TTL-free running total is
    * honestly linear in the key domain, and this variant drops entries
    * idle past `ttl` (a key that goes cold stops holding store memory;
    * its total restarts from zero if it ever returns — the documented
    * trade of the policy). TTL rides the PROCESSING-time clock by API
    * contract (`TTLConfig` has no event-time mode), so expiry depends on
    * wall time between a key's updates, not on data timestamps. */
  class RunningTotalTtlProcessor(ttlMs: Long)
      extends StatefulProcessor[Long, Ev, RunningTotal] {
    @transient private var state: ValueState[RunningTotal] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[RunningTotal](
        "running", Encoders.product[RunningTotal],
        TTLConfig(java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(
        key: Long, rows: Iterator[Ev], timerValues: TimerValues): Iterator[RunningTotal] = {
      val prev = Option(state.get()).getOrElse(RunningTotal(key, 0L, 0L))
      val next = rows.foldLeft(prev) { (acc, e) =>
        RunningTotal(key, acc.n + 1, acc.value_c + math.round(e.value * 100))
      }
      state.update(next)
      Iterator(next)
    }
  }

  def runningTotalsTtl(
      events: Dataset[Ev], ttlMs: Long): Dataset[RunningTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new RunningTotalTtlProcessor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  final case class TypedEv(
      user_id: Long, ts: Timestamp, event_id: Long, event_type: String)
  final case class Transition(user_id: Long, prev_type: String, next_type: String)

  private[streaming] def micros(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Streaming twin of the batch Markov transition matrix
    * ([[graft.queries.Events.qEvMarkov]]): the batch form is a `lag`
    * window, which does not exist under streaming, so the per-user "last
    * event" lives in keyed `ValueState` and each micro-batch chains its
    * (event-time-ordered) rows onto it. State is one tiny record per
    * user; downstream, a standard streaming aggregation over the emitted
    * pairs maintains the live transition counts.
    *
    * Ordering contract: rows within a micro-batch are sorted by event
    * time here, but a row OLDER than the stored per-user tail (a late
    * arrival from a previous micro-batch's time range) cannot be chained
    * retroactively — it is DROPPED, never emitted time-reversed. Matches
    * the batch lag window exactly when micro-batches partition each
    * user's timeline in event-time order (the usual per-shard delivery);
    * under cross-batch lateness the batch re-run remains the repair path
    * (the same contract as any streaming-vs-batch kappa pair).
    *
    * Memory contract: `handleInputRows` materializes and sorts ONE KEY's
    * rows from ONE micro-batch (`rows.toSeq.sortBy`) — the working set is
    * per-(user, batch), not per-stream (cross-batch history lives in the
    * one-record ValueState). A hot key's slice of a huge batch therefore
    * bounds executor memory; the production dial is micro-batch size at
    * the source (admission control — this repo's DSv2 source implements
    * it via ReadLimit), not handler-side chunking: correct chaining needs
    * the key's batch rows in event-time order, so the sort (or an
    * equivalent spill-backed ordering) is inherent to the operator. */
  class TransitionProcessor extends StatefulProcessor[Long, TypedEv, Transition] {
    @transient private var last: ValueState[LastEvent] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[LastEvent](
        "last", Encoders.product[LastEvent], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[TypedEv], timerValues: TimerValues): Iterator[Transition] = {
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      val out = Seq.newBuilder[Transition]
      var prev = Option(last.get())
      sorted.foreach { e =>
        val us = micros(e.ts)
        val isLate = prev.exists(p =>
          p.us > us || (p.us == us && p.event_id > e.event_id))
        if (!isLate) { // late arrival older than the tail: drop, don't reverse
          prev.foreach(p => out += Transition(key, p.event_type, e.event_type))
          prev = Some(LastEvent(us, e.event_id, e.event_type))
        }
      }
      prev.foreach(last.update)
      out.result().iterator
    }
  }

  def transitions(events: Dataset[TypedEv]): Dataset[Transition] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new TransitionProcessor, TimeMode.None(), OutputMode.Append())
  }

  final case class ValEv(user_id: Long, ts: Timestamp, event_id: Long, value: Double)
  final case class EwmaPoint(user_id: Long, event_id: Long, x_c: Long, ewma_c: Long)

  /** Streaming twin of the batch per-user EWMA
    * ([[graft.queries.Events.qEvEwma]]): the integer recurrence
    * s₁ = x₁, sₜ = ⌊(2·xₜ + 8·sₜ₋₁)/10⌋ carries across micro-batches in a
    * one-record `ValueState` per user. Same ordering/late-arrival contract
    * and per-(key, batch) memory contract as [[TransitionProcessor]]: the
    * batch's rows for a key are sorted by (event time, event_id), a row
    * older than the stored tail is dropped (never folded retroactively —
    * the recurrence is order-sensitive, so a late row would corrupt every
    * subsequent smoothed value), and the batch re-run is the repair path. */
  class EwmaProcessor extends StatefulProcessor[Long, ValEv, EwmaPoint] {
    @transient private var last: ValueState[EwmaState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[EwmaState](
        "ewma", Encoders.product[EwmaState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[ValEv], timerValues: TimerValues): Iterator[EwmaPoint] = {
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      val out = Seq.newBuilder[EwmaPoint]
      var prev = Option(last.get())
      sorted.foreach { e =>
        val us = micros(e.ts)
        val isLate = prev.exists(p =>
          p.us > us || (p.us == us && p.event_id > e.event_id))
        if (!isLate) {
          // HALF_UP like Spark's round() in the batch twin — math.round
          // rounds half toward +∞ and would disagree on negative half-cents
          val xc = java.math.BigDecimal.valueOf(e.value * 100)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
          val s = prev match {
            case None    => xc
            case Some(p) => math.floorDiv(2L * xc + 8L * p.ewma_c, 10L)
          }
          out += EwmaPoint(key, e.event_id, xc, s)
          prev = Some(EwmaState(us, e.event_id, s))
        }
      }
      prev.foreach(last.update)
      out.result().iterator
    }
  }

  def ewma(events: Dataset[ValEv]): Dataset[EwmaPoint] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new EwmaProcessor, TimeMode.None(), OutputMode.Append())
  }

  final case class CusumPoint(user_id: Long, event_id: Long, x_c: Long,
      base_c: Long, s_pos_c: Long, s_neg_c: Long,
      alarm_up: Boolean, alarm_down: Boolean)

  /** Streaming twin of the batch two-sided CUSUM
    * ([[graft.queries.Events.qEvCusum]]): the first event per user pins
    * the baseline, and the S⁺/S⁻ drift accumulators carry across
    * micro-batches in one `ValueState` record per user. Pure add/max
    * integer arithmetic (no division, so nothing to keep floor-portable).
    * Same ordering / late-arrival-drop / per-(key, batch) memory contract
    * as [[EwmaProcessor]] — the recurrence is order-sensitive, a late row
    * is dropped, and the batch re-run is the repair path. */
  class CusumProcessor extends StatefulProcessor[Long, ValEv, CusumPoint] {
    private val K = graft.queries.Events.CusumK
    private val H = graft.queries.Events.CusumH
    @transient private var last: ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[CusumState](
        "cusum", Encoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[ValEv], timerValues: TimerValues): Iterator[CusumPoint] = {
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      val out = Seq.newBuilder[CusumPoint]
      var prev = Option(last.get())
      sorted.foreach { e =>
        val us = micros(e.ts)
        val isLate = prev.exists(p =>
          p.us > us || (p.us == us && p.event_id > e.event_id))
        if (!isLate) {
          val xc = java.math.BigDecimal.valueOf(e.value * 100)
            .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
          val st = prev match {
            case None => CusumState(us, e.event_id, xc, 0L, 0L)
            case Some(p) => CusumState(us, e.event_id, p.base_c,
              math.max(0L, p.sp + (xc - p.base_c - K)),
              math.max(0L, p.sn + (p.base_c - xc - K)))
          }
          out += CusumPoint(key, e.event_id, xc, st.base_c,
            st.sp, st.sn, st.sp > H, st.sn > H)
          prev = Some(st)
        }
      }
      prev.foreach(last.update)
      out.result().iterator
    }
  }

  final case class AttributionPoint(user_id: Long, event_id: Long,
      last_touch: String, first_touch: String, gap_us: Long)

  /** Streaming twin of the batch conversion attribution
    * ([[graft.queries.Events.qEvAttribution]]): the first and most recent
    * non-purchase touch carry across micro-batches in one `ValueState`
    * record per user; each purchase emits its attribution immediately —
    * the real-time "which channel converted" feed. The ordering tail
    * advances on EVERY processed event (a purchase also moves it — the
    * batch window orders over all rows), while the touch fields update
    * only on non-purchases. Same late-arrival-drop and per-(key, batch)
    * memory contract as the other ValueState twins. */
  class AttributionProcessor extends StatefulProcessor[Long, TypedEv, AttributionPoint] {
    @transient private var last: ValueState[TouchState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[TouchState](
        "touch", Encoders.product[TouchState], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[TypedEv], timerValues: TimerValues): Iterator[AttributionPoint] = {
      val sorted = rows.toSeq.sortBy(e => (micros(e.ts), e.event_id))
      val out = Seq.newBuilder[AttributionPoint]
      var prev = Option(last.get())
      sorted.foreach { e =>
        val us = micros(e.ts)
        val isLate = prev.exists(p =>
          p.us > us || (p.us == us && p.event_id > e.event_id))
        if (!isLate) {
          val (first, lastT, lastUs) = prev match {
            case Some(p) => (p.first_touch, p.last_touch, p.last_us)
            case None    => (None, None, -1L)
          }
          if (e.event_type == "purchase") {
            out += AttributionPoint(key, e.event_id,
              lastT.getOrElse("(none)"), first.getOrElse("(none)"),
              if (lastT.isDefined) us - lastUs else -1L)
            prev = Some(TouchState(us, e.event_id, first, lastT, lastUs))
          } else {
            prev = Some(TouchState(us, e.event_id,
              first.orElse(Some(e.event_type)), Some(e.event_type), us))
          }
        }
      }
      prev.foreach(last.update)
      out.result().iterator
    }
  }

  def attribution(events: Dataset[TypedEv]): Dataset[AttributionPoint] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new AttributionProcessor, TimeMode.None(), OutputMode.Append())
  }

  def cusum(events: Dataset[ValEv]): Dataset[CusumPoint] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(
        new CusumProcessor, TimeMode.None(), OutputMode.Append())
  }

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, valueC: Long)
  final case class Session(
      user_id: Long, start_us: Long, end_us: Long, n_events: Long, value_c: Long)

  /** Custom stateful sessionizer via flatMapGroupsWithState — the
    * imperative escape hatch for session semantics the built-in operator
    * can't express (e.g. emitting sessions only on close, custom merge
    * rules). Event-time timeout keeps state bounded by the watermark. */
  def sessionize(events: Dataset[Ev], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def update(
        userId: Long,
        rows: Iterator[Ev],
        state: GroupState[SessionState]): Iterator[Session] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator(Session(userId, s.start, s.last, s.n, s.valueC))
      } else {
        var closed = List.empty[Session]
        var cur = state.getOption.orNull
        rows.toSeq.sortBy(e => (e.ts.getTime, e.value)).foreach { e =>
          val us = e.ts.getTime * 1000L
          val cents = math.round(e.value * 100)
          if (cur == null) cur = SessionState(us, us, 1L, cents)
          else if (us - cur.last > gapUs) {
            closed ::= Session(userId, cur.start, cur.last, cur.n, cur.valueC)
            cur = SessionState(us, us, 1L, cents)
          } else cur = SessionState(cur.start, us, cur.n + 1, cur.valueC + cents)
        }
        state.update(cur)
        state.setTimeoutTimestamp(cur.last / 1000L, s"$gapMinutes minutes")
        closed.reverseIterator
      }
    }

    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
