package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Input/output element of [[TopPairsAggregator]]: a neighbor id with its
  * integer-basis-point score. */
case class ScoredNeighbor(cosE4: Long, nb: Long)

/** Typed UDAF: exact top-k (score, id) pairs per group, ordered by score
  * descending then id ascending — the distributed form of "top-k neighbors
  * per query" that replaces a `row_number` window over the full scored set.
  *
  * Why this beats the window at scale: a window `partitionBy(qid)` shuffles
  * every scored (query × corpus-candidate) row into one task per query — Q
  * tasks for the entire scored set, a straggler machine at 100× corpus.
  * As an `Aggregator` the plan keeps partial aggregation: every map task
  * retains at most k pairs per query, the shuffle carries k × partitions
  * rows per query, and the final merge is k-way — the same communication
  * pattern as a built-in min/max, independent of corpus size.
  *
  * Deterministic (total order with id tie-break), so DuckDB oracles
  * hash-match the flattened output.
  */
class TopPairsAggregator(k: Int)
    extends Aggregator[ScoredNeighbor, Seq[ScoredNeighbor], Seq[ScoredNeighbor]] {
  private val ord: Ordering[ScoredNeighbor] =
    Ordering.by((s: ScoredNeighbor) => (-s.cosE4, s.nb))

  private def trim(xs: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] =
    xs.sorted(ord).take(k)

  override def zero: Seq[ScoredNeighbor] = Vector.empty

  override def reduce(buf: Seq[ScoredNeighbor], v: ScoredNeighbor): Seq[ScoredNeighbor] =
    trim(buf :+ v)

  override def merge(a: Seq[ScoredNeighbor], b: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] =
    trim(a ++ b)

  override def finish(buf: Seq[ScoredNeighbor]): Seq[ScoredNeighbor] = buf

  override def bufferEncoder: Encoder[Seq[ScoredNeighbor]] =
    ExpressionEncoder[Seq[ScoredNeighbor]]()

  override def outputEncoder: Encoder[Seq[ScoredNeighbor]] =
    ExpressionEncoder[Seq[ScoredNeighbor]]()
}
