package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only scratch main for probing Spark behavior in this environment. */
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
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name ($r) (${(System.nanoTime() - t0) / 1e9}%.2f s)")
    }
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    time("clusters.cold")(graft.queries.Dedup.qDedupClusters(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("clusters.warm")(graft.queries.Dedup.qDedupClusters(spark, dir)
      .write.format("noop").mode("overwrite").save())
    time("lsh_pairs.warm")(graft.queries.Dedup.qDedupLshPairs(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
