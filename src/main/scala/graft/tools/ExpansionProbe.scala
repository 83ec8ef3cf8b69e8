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
    // Reproduce the LIVE engage arithmetic: the committed per-pair row
    // widths and the per-task execution budget pairJoinWidth actually
    // reads, plus the width each index family would get from this session
    // — so the probe's output IS the decision, not an approximation of it.
    val perTask = Dedup.perTaskExecBytes(spark)
    val conf = spark.sessionState.conf.numShufflePartitions
    val bytesCapped = eCapped * Dedup.CappedPairRowBytes
    val bytesPrefix = ePrefix * Dedup.PpjoinPairRowBytes
    val widthCapped = Dedup.pairJoinWidth(spark, eCapped, Dedup.CappedPairRowBytes)
    val widthPpjoin = Dedup.pairJoinWidth(spark, ePrefix, Dedup.PpjoinPairRowBytes)
    println(s"""{"dir":"$dir","capped_rows":${ex.count()},""" +
      s""""exp_capped":$eCapped,"exp_prefix":$ePrefix,""" +
      s""""heap":$heap,"per_task_exec_bytes":$perTask,""" +
      s""""shuffle_partitions":$conf,""" +
      s""""bytes_capped":$bytesCapped,"bytes_prefix":$bytesPrefix,""" +
      s""""per_task_capped":${bytesCapped / conf.max(1)},""" +
      s""""per_task_prefix":${bytesPrefix / conf.max(1)},""" +
      s""""engage_width_capped":$widthCapped,""" +
      s""""engage_width_ppjoin":$widthPpjoin}""")
    spark.stop()
  }
}
