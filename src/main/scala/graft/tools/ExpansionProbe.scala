package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sizing probe for the memory-keyed pair-join width ([[Dedup.pairJoinWidth]]):
  * prints the pair-expansion Σc² of the session-shared capped shingle
  * index and of the PPJoin prefix index for a fixture dir, next to the
  * byte arithmetic the engage threshold reads — the numbers behind the
  * round-14 decision to key engagement on estimated per-task working set
  * vs execution budget instead of raw expansion count. */
object ExpansionProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = Runtime.getRuntime.availableProcessors().toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ex = Dedup.cappedIndexFor(spark, dir)
    def expOf(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(col("s")).agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("e")).collect()(0).getLong(0)
    val eCapped = expOf(ex)
    val prefix = Dedup.ppjoinPrefix(ex, Dedup.PpjoinTauE4)
    val ePrefix = expOf(prefix)
    val heap = Runtime.getRuntime.maxMemory
    println(s"""{"dir":"$dir","capped_rows":${ex.count()},""" +
      s""""exp_capped":$eCapped,"exp_prefix":$ePrefix,""" +
      s""""heap":$heap,"bytes_capped":${eCapped * 40L},""" +
      s""""bytes_prefix":${ePrefix * 40L}}""")
    spark.stop()
  }
}
