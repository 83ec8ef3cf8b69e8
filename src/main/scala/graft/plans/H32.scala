package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd 32-bit text hash: the first 4 md5 bytes as an unsigned
  * long — bit-identical to `conv(substr(md5(s),1,8),16,10)` (the portable
  * formulation the DuckDB oracles use) but evaluated as one expression: no
  * 32-char hex string allocation, no string slice, no base conversion.
  * With `doGenCode` it stays inside whole-stage codegen as a static call,
  * unlike a Scala UDF which would break the codegen span and pay
  * serialization on every row.
  */
case class H32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_h32 requires a string column, got ${child.dataType.catalogString}")

  protected override def nullSafeEval(input: Any): Any =
    H32.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.H32.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): H32 =
    copy(child = newChild)

  override def prettyName: String = "graft_h32"
}

object H32 {
  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes, big-endian, as an unsigned 32-bit value in a long —
    * exactly the integer value of the first 8 hex chars of md5(s). */
  def hash(s: UTF8String): Long = {
    val digest = md5.get()
    digest.reset()
    val d = digest.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }
}
