package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch main — overwrite freely. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }
    // warmup: shared artifacts (postings, capped index) used by several
    t("warmup q_dedup_jaccard") {
      graft.SparkEntry.queries("q_dedup_jaccard")(spark, dir).count()
    }
    t("q_dedup_lsh_pairs (scored)") {
      graft.SparkEntry.queries("q_dedup_lsh_pairs")(spark, dir).count()
    }
    t("q_dedup_calibration") {
      graft.SparkEntry.queries("q_dedup_calibration")(spark, dir).count()
    }
    t("q_dedup_calibration again") {
      graft.SparkEntry.queries("q_dedup_calibration")(spark, dir).count()
    }
    t("q_dedup_ppjoin") {
      graft.SparkEntry.queries("q_dedup_ppjoin")(spark, dir).count()
    }
    spark.stop()
  }
}
