package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitter summary as a typed `Aggregator` — the
  * deterministic-guarantee companion to the count-min-sketch query: one
  * pass, fixed memory (k counters), mergeable partials, and the classic
  * guarantees
  *
  *   - `est(x) <= freq(x)` (never over-counts), and
  *   - `freq(x) - est(x) <= N / (k + 1)`, so
  *   - every key with `freq(x) > N / (k + 1)` is GUARANTEED present in the
  *     summary (candidates are a superset of the true heavy hitters),
  *
  * which CMS cannot give (it over-counts and knows no candidate set).
  *
  * `reduce` is the textbook step: bump a tracked key, insert while fewer
  * than k keys are tracked, otherwise decrement every counter (dropping
  * zeros). `merge` is the mergeable-summaries combine (Agarwal et al.,
  * "Mergeable Summaries", PODS'12): sum counters, then subtract the
  * (k+1)-th largest value and keep positives — which preserves the
  * `N/(k+1)` error bound across any partitioning, so partial aggregation
  * distributes exactly like a built-in sum.
  *
  * The counter VALUES depend on encounter order (any MG implementation's
  * do); the membership guarantee does not. Downstream consumers that need
  * a deterministic result re-count the ≤k candidates exactly in a second
  * bounded pass (see `Advanced.qHeavyHittersMg`) — so only the
  * order-independent candidate-set property is ever relied on.
  *
  * Buffers are immutable maps (≤ k entries): the saturated-path decrement
  * is O(k) per row, amortized out by the partial aggregation that collapses
  * most rows map-side before any buffer saturates.
  */
class MisraGriesAggregator(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k >= 1, s"Misra-Gries needs at least one counter, got $k")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], key: String): Map[String, Long] =
    buf.get(key) match {
      case Some(c)              => buf.updated(key, c + 1L)
      case None if buf.size < k => buf.updated(key, 1L)
      case None =>
        buf.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toIndexedSeq.sortBy(-_).apply(k)
      summed.flatMap { case (t, c) =>
        if (c - cut > 0L) Some(t -> (c - cut)) else None
      }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
