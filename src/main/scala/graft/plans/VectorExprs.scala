package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd vector kernels for the similarity operators.
  *
  * The higher-order-function formulation (`aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)`) evaluates an interpreted lambda per element per row — for a
  * 64-dim embedding scored against the corpus that is the hot path of
  * every similarity query. These expressions compute the identical
  * left-fold in index order (bit-identical IEEE-754 result, so the DuckDB
  * oracles keep hash-matching) as one tight primitive loop that stays
  * inside whole-stage codegen.
  *
  * Inputs must be non-null-element double arrays of equal length (the
  * engine's embedding columns by construction); evaluation uses the
  * shorter length defensively.
  */
private[plans] trait VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<double> columns, got " +
            s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
    }
}

/** Σᵢ aᵢ·bᵢ in index order — the dot product. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorExprs.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

/** Σᵢ (aᵢ−bᵢ)² in index order — the squared euclidean distance. */
case class SquaredDistance(left: Expression, right: Expression) extends VectorBinaryExpression {
  protected override def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.sqDist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VectorExprs.sqDist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sqdist"
}

object VectorExprs {
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  def sqDist(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { val d = a.getDouble(i) - b.getDouble(i); acc += d * d; i += 1 }
    acc
  }
}
