package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-16 probe: per-job wall attribution for the iterative graph
  * queries (pagerank / kcore / clusters) whose cost is dominated by
  * fixed per-round overhead at bench scale. Runs each query once under
  * the bench session config with a job listener printing every job's
  * final-stage callsite and wall.
  *
  * Usage: tools/run_main.sh graft.tools.IterProfile [query ...]
  */
object IterProfile {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_graph_pagerank", "q_graph_kcore", "q_dedup_clusters")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
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
    val jobStarts =
      new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val site = e.stageInfos.sortBy(_.stageId).lastOption
            .map(_.name).getOrElse("?")
          jobStarts.put(e.jobId,
            (s"$site [stages=${e.stageInfos.size}]", System.nanoTime()))
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = jobStarts.remove(e.jobId)
          if (st != null)
            System.err.println(
              f"[job] ${(System.nanoTime() - st._2) / 1e9}%7.3f s  ${st._1}")
        }
      })
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect() // warmup
    names.foreach { name =>
      System.err.println(s"===== $name =====")
      val t0 = System.nanoTime()
      graft.SparkEntry.benchQueries.getOrElse(name,
        graft.SparkEntry.queries(name))(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      System.err.println(
        f"===== $name total ${(System.nanoTime() - t0) / 1e9}%.2f s =====")
    }
    spark.stop()
  }
}
