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
      println(f"PROBE $name (${(System.nanoTime() - t0) / 1e9}%.2f s)")
    }
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect()
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    val q = graft.queries.Relational.registry("q_date_funcs")
    time("date_funcs.ordered.1")(q(spark, dir).write.format("noop").mode("overwrite").save())
    time("date_funcs.ordered.2")(q(spark, dir).write.format("noop").mode("overwrite").save())
    // same query minus the final sort
    import org.apache.spark.sql.catalyst.plans.logical.Sort
    val df = q(spark, dir)
    val child = df.queryExecution.logical match {
      case Sort(_, true, c, _) => c; case p => p }
    val noSort = org.apache.spark.sql.GraftBridge.ofRows(spark, child)
    time("date_funcs.unordered.1")(noSort.write.format("noop").mode("overwrite").save())
    time("date_funcs.unordered.2")(noSort.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
