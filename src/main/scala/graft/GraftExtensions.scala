package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.plans.{DotProduct, H32, KplExplode, SquaredDistance, ZOrder2}

/** Session extension entry point: registers the engine's native Catalyst
  * functions so they work from SQL and `expr(...)` in any session created
  * with `spark.sql.extensions=graft.GraftExtensions` (or imperatively via
  * [[GraftExtensions.register]]).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.kplExplodeDescriptor)
    ext.injectFunction(GraftExtensions.h32Descriptor)
    ext.injectFunction(GraftExtensions.dotDescriptor)
    ext.injectFunction(GraftExtensions.sqDistDescriptor)
    ext.injectFunction(GraftExtensions.zorderDescriptor)
    // Band θ-join → bucketized equi-join rewrite (graft.plans.BandJoinRewrite)
    ext.injectOptimizerRule(_ => graft.plans.BandJoinRewrite)
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

  private val dotDescriptor = (
    FunctionIdentifier("graft_dot"),
    new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "graft_dot takes exactly two arguments")
      DotProduct(children.head, children(1))
    })

  private val sqDistDescriptor = (
    FunctionIdentifier("graft_sqdist"),
    new ExpressionInfo(classOf[SquaredDistance].getName, "graft_sqdist"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "graft_sqdist takes exactly two arguments")
      SquaredDistance(children.head, children(1))
    })

  private val zorderDescriptor = (
    FunctionIdentifier("graft_zorder"),
    new ExpressionInfo(classOf[ZOrder2].getName, "graft_zorder"),
    (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
      require(children.length == 2, "graft_zorder takes exactly two arguments")
      ZOrder2(children.head, children(1))
    })

  /** Imperative registration for sessions built without the extensions
    * config (tests, notebooks). Idempotent. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(graft.plans.BandJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BandJoinRewrite
    spark.sessionState.functionRegistry.registerFunction(
      kplExplodeDescriptor._1, kplExplodeDescriptor._2, kplExplodeDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      h32Descriptor._1, h32Descriptor._2, h32Descriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      dotDescriptor._1, dotDescriptor._2, dotDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      sqDistDescriptor._1, sqDistDescriptor._2, sqDistDescriptor._3)
    spark.sessionState.functionRegistry.registerFunction(
      zorderDescriptor._1, zorderDescriptor._2, zorderDescriptor._3)
  }
}
