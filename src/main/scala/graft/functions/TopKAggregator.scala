package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF: exact top-k values per group, descending — the engine's
  * custom-aggregation extension point (SURVEY.md §2.2 UDF/UDAF row),
  * expressed as an `Aggregator[IN, BUF, OUT]` so Spark plans it with
  * partial aggregation: each map task keeps at most k values, the shuffle
  * carries k per (group × partition), and merge is k-way — the same
  * communication pattern as a built-in min/max, independent of group size.
  *
  * Deterministic (sorted output, value ties keep all copies), so the DuckDB
  * oracle hash-matches it.
  */
class TopKAggregator(k: Int) extends Aggregator[Double, Seq[Double], Seq[Double]] {
  override def zero: Seq[Double] = Vector.empty

  private def trim(xs: Seq[Double]): Seq[Double] =
    xs.sortBy(-_).take(k)

  override def reduce(buf: Seq[Double], v: Double): Seq[Double] =
    trim(buf :+ v)

  override def merge(a: Seq[Double], b: Seq[Double]): Seq[Double] =
    trim(a ++ b)

  override def finish(buf: Seq[Double]): Seq[Double] = buf

  override def bufferEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
