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
    val dir = "/root/testdata/sf0.001"
    for (name <- args) {
      val p = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      val ex = "Exchange (hash|range|Single)".r.findAllIn(p).size
      val gen = "Generate ".r.findAllIn(p).size
      println(s"[probe] $name exchanges=$ex generates=$gen")
    }
    spark.stop()
  }
}
