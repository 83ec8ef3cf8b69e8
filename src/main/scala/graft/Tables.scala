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
  /** `events.ts` has shipped in two physical encodings across fixture
    * generations: parquet TIMESTAMP(NANOS) — which Spark's reader only
    * accepts as a long via `spark.sql.legacy.parquet.nanosAsLong=true`, so
    * it surfaces as LongType nanos — and plain TIMESTAMP(MICROS), which
    * surfaces directly as TimestampType. Adapt on the read schema: convert
    * long nanos to a µs timestamp (the values are µs-precision, so the
    * ns→µs floor is exact and matches DuckDB's CAST(ts AS TIMESTAMP));
    * pass a native timestamp through untouched.
    *
    * Entry points still set `nanosAsLong=true` at session construction (a
    * no-op on µs files) rather than mutating here, so a loader call never
    * flips global session state under a caller composing its own reads. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = apply(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // Downstream time arithmetic (unix_micros, window(), watermarks)
        // wants TIMESTAMP; every graft session pins timeZone=UTC, so the
        // NTZ→LTZ cast is value-preserving and matches the DuckDB oracle.
        // Cast to TimestampType directly (not `cast(ts as timestamp)`,
        // which resolves via spark.sql.timestampType and would no-op under
        // a session pinned to TIMESTAMP_NTZ).
        raw.withColumn("ts",
          raw("ts").cast(org.apache.spark.sql.types.TimestampType))
      case org.apache.spark.sql.types.TimestampType => raw
      case t =>
        // Fail loudly at the loader: a silent pass-through of an unexpected
        // physical type (string/int from a malformed fixture) would surface
        // as opaque analysis errors far downstream.
        sys.error(s"events.ts: unsupported physical type $t " +
          "(expected long nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
