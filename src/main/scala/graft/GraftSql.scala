package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Raw-SQL surface: registers every fixture table as a temp view (and the
  * engine's native functions) so the whole operator surface is reachable
  * from `spark.sql(...)` — the third API tier next to the typed builders
  * and the `RecordsQuery` parameter compiler. */
object GraftSql {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Create/replace one temp view per fixture table + register native
    * functions; returns the session for chaining. */
  def open(spark: SparkSession, dir: String): SparkSession = {
    GraftExtensions.register(spark)
    TableNames.filterNot(_ == "events").foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(t)
    }
    // events goes through its loader (ns→µs timestamp conversion).
    Tables.events(spark, dir).createOrReplaceTempView("events")
    spark
  }

  def sql(spark: SparkSession, dir: String, query: String): DataFrame =
    open(spark, dir).sql(query)
}
