package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd 2-D Morton (z-order) key: interleaves the low 16 bits
  * of two long columns (x gets the even bit positions, y the odd) into one
  * 32-bit key carried in a long.
  *
  * Sorting/range-partitioning a table by this key co-locates rows that are
  * close in BOTH dimensions, so per-file parquet min/max statistics become
  * tight on each dimension simultaneously — a 2-D range predicate prunes
  * files the way a 1-D sort key only manages for its single leading column.
  * This is the standard multi-dimensional data-layout technique (z-ordering
  * in Delta/Iceberg `OPTIMIZE ZORDER BY`, Hudi space-filling curves) and at
  * 100 TB it is the difference between scanning a band of files and
  * scanning the whole table for a two-sided selective filter.
  *
  * The bit-spread uses the classic magic-mask sequence, kept as a static
  * call so the whole computation stays inside whole-stage codegen; the
  * DuckDB oracle replicates the identical shift/mask arithmetic (see
  * [[ZOrder.sqlSpread]]), so derived keys hash-match bit-for-bit.
  */
case class ZOrder2(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"graft_zorder requires two bigint columns, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  protected override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.ZOrder.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder2 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_zorder"
}

object ZOrder {

  /** Spread the low 16 bits of `v` to the even bit positions of a 32-bit
    * value (Morton encode helper; magic-mask bit twiddling). */
  def spread(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** 32-bit Morton key of (x, y): x on even bits, y on odd bits. */
  def interleave(x: Long, y: Long): Long =
    spread(x) | (spread(y) << 1)

  // ---- the identical computation as DuckDB SQL ----------------------------

  /** SQL twin of [[spread]] over an expression string. */
  def sqlSpread(e: String): String = {
    val s0 = s"(($e) & 65535)"
    val s1 = s"(($s0 | ($s0 << 8)) & 16711935)"
    val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
    val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
    s"(($s3 | ($s3 << 1)) & 1431655765)"
  }

  /** SQL twin of [[interleave]]. */
  def sqlInterleave(x: String, y: String): String =
    s"(${sqlSpread(x)} | (${sqlSpread(y)} << 1))"
}
