package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
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
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // per-stage spill attribution
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m.memoryBytesSpilled > 0 || m.shuffleWriteMetrics.bytesWritten > (1L << 28))
          stages.add(f"stage=${e.stageInfo.stageId}%4d tasks=${e.stageInfo.numTasks}%4d " +
            f"spillMem=${m.memoryBytesSpilled / 1048576}%6d MB " +
            f"spillDisk=${m.diskBytesSpilled / 1048576}%6d MB " +
            f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1048576}%6d MB " +
            f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1048576}%6d MB " +
            f"out=${m.outputMetrics.recordsWritten} " +
            s"name=${e.stageInfo.name.take(80)}")
      }
    })
    for (name <- args) {
      if (sys.env.contains("SPARK_GRAFT_PROBE_PLAN")) {
        val p = graft.SparkEntry.queries(name)(spark, dir)
          .queryExecution.executedPlan.toString
        p.split("\n").filter(l => l.contains("Exchange") ||
          l.contains("HashAggregate") || l.contains("SortMergeJoin"))
          .foreach(l => println("[plan] " + l.take(160)))
      }
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[probe] $name ${(System.nanoTime() - t0) / 1e9}%.1f s")
      Thread.sleep(1000)
      stages.forEach(s => println("[probe] " + s))
      stages.clear()
    }
    spark.stop()
  }
}
