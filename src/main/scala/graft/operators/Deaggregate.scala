package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.kpl.KplCodec

/** KPL de-aggregation as a Spark operator (SURVEY.md O3).
  *
  * The reference flattens each physical Kinesis record into its contained
  * user records (`kinesisReader/index.js:120-176`), silently dropping a whole
  * aggregate when the protobuf body is corrupt (`:163-164`). The engine's
  * default surfaces corrupt aggregates as flagged rows instead, so a pipeline
  * can route them to a side output — set `keepCorrupt = false` for the
  * reference's strict-drop behavior.
  *
  * Shape: one input row fans out to N payload rows via `explode`, which
  * Catalyst plans as a `Generate` — the fan-out happens inside the executor
  * task with no driver materialization and no shuffle; downstream filters on
  * the parsed payload still push into the same stage.
  */
object Deaggregate {

  /** `array<binary>` of user payloads; null marks a corrupt aggregate.
    * A bare (non-KPL) record yields a 1-element array — the identity path at
    * `kinesisReader/index.js:170-174`. */
  val kplDeaggregate: UserDefinedFunction =
    udf((data: Array[Byte]) =>
      if (data == null) None
      else KplCodec.deaggregate(data) match {
        case KplCodec.Aggregate(payloads) => Some(payloads)
        case KplCodec.Single(payload)     => Some(Seq(payload))
        case KplCodec.Corrupt(_, _)       => None
      })

  /** True iff the bytes carry the KPL magic prefix. */
  val isKplAggregate: UserDefinedFunction =
    udf((data: Array[Byte]) => data != null && KplCodec.hasMagic(data))

  /** Explode `dataCol` into one row per user record payload.
    *
    * Adds `payloadCol: binary` and `corruptCol: boolean`; corrupt aggregates
    * (when kept) pass through as a single row carrying the raw aggregate
    * bytes with the flag set.
    */
  def explodePayloads(
      df: DataFrame,
      dataCol: String = "data",
      payloadCol: String = "payload",
      corruptCol: String = "_corrupt_aggregate",
      keepCorrupt: Boolean = true): DataFrame = {
    val deagg: Column = kplDeaggregate(col(dataCol))
    val withPayloads = df
      .withColumn("_deagg", deagg)
      .withColumn(corruptCol, col("_deagg").isNull && col(dataCol).isNotNull)
      .withColumn(
        payloadCol,
        explode(coalesce(col("_deagg"), array(col(dataCol)))))
      .drop("_deagg")
    if (keepCorrupt) withPayloads else withPayloads.filter(!col(corruptCol))
  }

  /** Same contract as [[explodePayloads]], but via the native Catalyst
    * generator [[graft.plans.KplExplode]]: payloads stream out of the
    * protobuf decode with no intermediate array materialization. This is
    * the default path ([[explodePayloads]] remains as the portable
    * reference implementation the spec compares against). */
  def explodePayloadsNative(
      df: DataFrame,
      dataCol: String = "data",
      payloadCol: String = "payload",
      corruptCol: String = "_corrupt_aggregate",
      keepCorrupt: Boolean = true): DataFrame = {
    graft.GraftExtensions.register(df.sparkSession)
    val exploded = df.select(
      col("*"),
      expr(s"graft_kpl_explode($dataCol)").as(Seq(payloadCol, corruptCol)))
    if (keepCorrupt) exploded else exploded.filter(!col(corruptCol))
  }
}
