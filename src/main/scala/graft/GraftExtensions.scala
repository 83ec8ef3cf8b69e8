package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.plans.{H32, KplExplode}

/** Session extension entry point: registers the engine's native Catalyst
  * functions so they work from SQL and `expr(...)` in any session created
  * with `spark.sql.extensions=graft.GraftExtensions` (or imperatively via
  * [[GraftExtensions.register]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.kplExplodeDescriptor)
    ext.injectFunction(GraftExtensions.h32Descriptor)
  }
}

object GraftExtensions {
  private val kplExplodeDescriptor = (
    FunctionIdentifier("graft_kpl_explode"),
    new ExpressionInfo(classOf[KplExplode].getName, "graft_kpl_explode"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "graft_kpl_explode takes exactly one argument")
      KplExplode(children.head)
    })

  private val h32Descriptor = (
    FunctionIdentifier("graft_h32"),
    new ExpressionInfo(classOf[H32].getName, "graft_h32"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 1, "graft_h32 takes exactly one argument")
      H32(children.head)
    })

  /** Imperative registration for sessions built without the extensions
    * config (tests, notebooks). Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      kplExplodeDescriptor._1, kplExplodeDescriptor._2, kplExplodeDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      h32Descriptor._1, h32Descriptor._2, h32Descriptor._3)
  }
}
