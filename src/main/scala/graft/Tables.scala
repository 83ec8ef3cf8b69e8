package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Loaders for the driver-provided parquet fixtures (see TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives a scale-factor directory and
  * reads tables through here, so filters/projections stay directly above the
  * parquet scan and Catalyst can push them down (PushedFilters / ReadSchema).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * outright; read it as long nanos (legacy flag) and convert to a µs
    * TimestampType column. The fixture's values are µs-precision, so the
    * ns→µs floor is exact (and matches DuckDB's CAST(ts AS TIMESTAMP)).
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` on the session —
    * set at construction by every graft entrypoint (Verify, Bench, specs)
    * rather than mutated here, so a loader call never flips global session
    * state under a caller composing its own reads. */
  def events(spark: SparkSession, dir: String): DataFrame =
    apply(spark, dir, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
