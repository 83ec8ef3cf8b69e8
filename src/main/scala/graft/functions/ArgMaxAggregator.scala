package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Input/state of [[ArgMaxAggregator]]: a two-component ordering key
  * (compared lexicographically) with the payload the argmax should carry.
  * `key = Long.MinValue` marks the empty state. */
case class Keyed(key: Long, key2: Long, typ: String, valueC: Long)

/** Typed UDAF: the row with the lexicographically-largest (key, key2) per
  * group, carrying its payload columns — argmax ("latest-wins") as a single
  * hash aggregation.
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
  * The key is a PAIR (e.g. event-time micros, unique id tiebreak) compared
  * lexicographically, NOT packed into one long: any `ts * C + id` packing
  * overflows Long once `ts` exceeds `Long.MaxValue / C` (for µs
  * timestamps that is ~106 days of headroom — a silent wrong-winner bug on
  * real dates). Two longs have no domain bound, and a distinct tiebreak
  * makes the result deterministic, so DuckDB window-rank oracles
  * hash-match exactly.
  */
class ArgMaxAggregator extends Aggregator[Keyed, Keyed, Keyed] {
  override def zero: Keyed = Keyed(Long.MinValue, Long.MinValue, null, 0L)

  private def geq(a: Keyed, b: Keyed): Boolean =
    a.key > b.key || (a.key == b.key && a.key2 >= b.key2)

  override def reduce(buf: Keyed, v: Keyed): Keyed =
    if (geq(buf, v)) buf else v

  override def merge(a: Keyed, b: Keyed): Keyed =
    if (geq(a, b)) a else b

  override def finish(buf: Keyed): Keyed = buf

  override def bufferEncoder: Encoder[Keyed] = ExpressionEncoder[Keyed]()
  override def outputEncoder: Encoder[Keyed] = ExpressionEncoder[Keyed]()
}
