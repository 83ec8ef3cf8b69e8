package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Input/state of [[ArgMaxAggregator]]: an ordering key with the payload the
  * argmax should carry. `key = Long.MinValue` marks the empty state. */
case class Keyed(key: Long, typ: String, valueC: Long)

/** Typed UDAF: the row with the maximum key per group, carrying its payload
  * columns — argmax ("latest-wins") as a single hash aggregation.
  *
  * Why not the built-in `max_by`: `MaxBy` is a declarative aggregate whose
  * buffer holds the payload itself, and a non-primitive (string) buffer
  * field disqualifies `HashAggregate`, so the plan degrades to
  * `SortAggregate` — a full per-partition sort of the input on BOTH sides
  * of the exchange. As a typed `Aggregator` the plan is
  * `ObjectHashAggregate` (hash-based, partial+final): every map task keeps
  * one candidate per group, the shuffle carries one row per (group ×
  * partition), and nothing is ever sorted.
  *
  * Deterministic for distinct keys (the caller supplies a total-order key),
  * so DuckDB `arg_max` oracles hash-match exactly.
  */
class ArgMaxAggregator extends Aggregator[Keyed, Keyed, Keyed] {
  override def zero: Keyed = Keyed(Long.MinValue, null, 0L)

  override def reduce(buf: Keyed, v: Keyed): Keyed =
    if (v.key > buf.key) v else buf

  override def merge(a: Keyed, b: Keyed): Keyed =
    if (a.key >= b.key) a else b

  override def finish(buf: Keyed): Keyed = buf

  override def bufferEncoder: Encoder[Keyed] = ExpressionEncoder[Keyed]()
  override def outputEncoder: Encoder[Keyed] = ExpressionEncoder[Keyed]()
}
