package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite band θ-joins into bucketized equi-joins.
  *
  * A join whose (only useful) predicate is a band condition
  * `abs(x − y) < W` (or `<=`) plans as BroadcastNestedLoopJoin /
  * CartesianProduct — every pair of rows is compared, O(|L|·|R|) at any
  * scale. But a band predicate admits the classic bucketization: with
  * buckets of width W, any qualifying pair's bucket ids differ by at most
  * 1. So the rule:
  *
  *  1. projects `bucket(y) = y div W` onto the RIGHT side;
  *  2. explodes the LEFT side into its three candidate buckets
  *     `[bucket(x)−1, bucket(x), bucket(x)+1]` (a narrow 3× row fan-out of
  *     the join KEY, not of the payload width);
  *  3. joins on bucket EQUALITY (plus whatever other conjuncts the join
  *     had — any existing equi-keys stay equi-keys, now finer), keeping
  *     the original band predicate as the in-bucket verifier.
  *
  * Each qualifying pair matches exactly once — the right row's bucket is
  * unique, so no dedup pass is needed (this is why the 3-bucket explode
  * goes on ONE side rather than a 2+2 explode with a canonical-bucket
  * filter). The shuffle moves 3×|L| + |R| narrow rows on a fine-grained
  * key instead of materializing |L|·|R| comparisons; a same-key skew
  * hotspot additionally splits across time buckets (see the interval-join
  * skew spec).
  *
  * Soundness under truncating division: `div` truncates toward zero, so
  * bucket 0 is twice as wide for mixed-sign data — but for INTEGRAL
  * operands two rows in non-adjacent truncated buckets are separated by at
  * least the full middle bucket, whose width is ≥ W, so `|x−y| ≤ W` still
  * implies bucket distance ≤ 1. The rule therefore fires only on
  * integer/long operands (the engine's time axes are epoch micros).
  * Nullability is preserved: a null operand nulls both the band predicate
  * (row dropped by the inner join) and the bucket key (no equi-match).
  *
  * Overflow note: under Spark's non-ANSI default, `x − y` in the USER'S
  * predicate wraps when the true difference exceeds the operand type's
  * range (e.g. int operands at opposite ends of the int range), so the
  * naive nested loop can emit wrap-artifact pairs whose true distance is
  * far larger than W. Buckets are computed in exact 64-bit math, so the
  * rewrite emits a (possibly proper) SUBSET of the naive plan's rows: it
  * never invents a pair, and it drops exactly those wrap artifacts whose
  * true distance puts them in non-adjacent buckets. An artifact pair that
  * happens to land in adjacent 64-bit buckets (possible only when W
  * approaches the operand type's range) still reaches the verifier and is
  * emitted by BOTH plans. The two plans agree exactly whenever |x−y| is
  * representable in the subtraction's type — always true for same-sign
  * data and for any realistic long time axis. Under ANSI mode the
  * verifier itself throws on a reached wrap in both plans; pairs the
  * rewrite prunes before the verifier are dropped where the naive plan
  * would have thrown.
  *
  * Guard rails: inner joins only; deterministic operands; each side of the
  * subtraction must reference exactly one join side; fires ONLY when the
  * join has no extractable equi-conjunct — i.e. exactly when Catalyst
  * would otherwise plan a nested loop / cartesian. A band predicate riding
  * an existing equi key is left alone: such joins already hash-partition,
  * and a hand-bucketized plan (e.g. the interval-join operator, whose
  * post-join filter Catalyst pushes back into the join condition) must not
  * be re-bucketized into a second explode. Re-entry on the rule's own
  * output is additionally blocked by the marker column names; disabled
  * entirely with `spark.graft.bandJoinRewrite.enabled=false`.
  */
object BandJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val BucketL = "__graft_band_bucket_l"
  private val BucketR = "__graft_band_bucket_r"

  private val EnabledKey = "spark.graft.bandJoinRewrite.enabled"

  private def enabled: Boolean =
    conf.getConfString(EnabledKey, "true").toBoolean

  /** The band conjunct: (x, y, W, strict) with x/y integral. Accepts
    * `abs(x−y) < W`, `W > abs(x−y)`, and the `<=`/`>=` forms. */
  private object BandCondition {
    private def longLit(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType)   => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case _                            => None
    }
    private def absDiff(e: Expression): Option[(Expression, Expression)] = e match {
      case Abs(Subtract(x, y, _), _) => Some((x, y))
      case _                         => None
    }
    def unapply(e: Expression): Option[(Expression, Expression, Long)] = e match {
      case LessThan(a, w)        => for ((x, y) <- absDiff(a); lw <- longLit(w)) yield (x, y, lw)
      case LessThanOrEqual(a, w) => for ((x, y) <- absDiff(a); lw <- longLit(w)) yield (x, y, lw)
      case GreaterThan(w, a)     => for ((x, y) <- absDiff(a); lw <- longLit(w)) yield (x, y, lw)
      case GreaterThanOrEqual(w, a) => for ((x, y) <- absDiff(a); lw <- longLit(w)) yield (x, y, lw)
      case _ => None
    }
  }

  private def integral(e: Expression): Boolean =
    e.dataType == LongType || e.dataType == IntegerType

  private def asLong(e: Expression): Expression =
    if (e.dataType == LongType) e else Cast(e, LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint)
          // re-entry guard: our own rewrite's children carry the marker cols
          if !left.output.exists(_.name == BucketL) &&
             !right.output.exists(_.name == BucketR) =>
        val conjuncts = splitConjunctivePredicates(cond)
        def across(a: Expression, b: Expression): Boolean =
          (a.references.subsetOf(left.outputSet) &&
            b.references.subsetOf(right.outputSet)) ||
            (a.references.subsetOf(right.outputSet) &&
              b.references.subsetOf(left.outputSet))
        val hasEquiKey = conjuncts.exists {
          case EqualTo(a, b)       => across(a, b)
          case EqualNullSafe(a, b) => across(a, b)
          case _                   => false
        }
        val band = if (hasEquiKey) None else conjuncts.collectFirst {
          case c @ BandCondition(x, y, w)
              if w > 0 && integral(x) && integral(y) &&
                 x.deterministic && y.deterministic &&
                 ((x.references.subsetOf(left.outputSet) &&
                   y.references.subsetOf(right.outputSet)) ||
                  (x.references.subsetOf(right.outputSet) &&
                   y.references.subsetOf(left.outputSet))) =>
            if (x.references.subsetOf(left.outputSet)) (c, x, y, w)
            else (c, y, x, w)
        }
        band match {
          case None => j
          case Some((_, lExpr, rExpr, w)) =>
            val wLit = Literal(w, LongType)
            // right: its own bucket
            val bR = Alias(IntegralDivide(asLong(rExpr), wLit), BucketR)()
            val projR = Project(right.output :+ bR, right)
            // left: the three candidate buckets, exploded
            val b0 = IntegralDivide(asLong(lExpr), wLit)
            val bandsArr = Alias(CreateArray(Seq(
              Subtract(b0, Literal(1L)), b0, Add(b0, Literal(1L)))),
              "__graft_band_buckets")()
            val projL = Project(left.output :+ bandsArr, left)
            val bucketLAttr =
              AttributeReference(BucketL, LongType, nullable = true)()
            val genL = Generate(
              Explode(bandsArr.toAttribute),
              unrequiredChildIndex = Seq(left.output.length), // drop the array
              outer = false,
              qualifier = None,
              generatorOutput = Seq(bucketLAttr),
              child = projL)
            val newCond = (cond +: Seq[Expression](
              EqualTo(bucketLAttr, bR.toAttribute))).reduce(And)
            Project(j.output, Join(genL, projR, Inner, Some(newCond), hint))
        }
    }
  }
}
