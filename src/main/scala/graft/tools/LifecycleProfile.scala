package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 measurement harness (guide §1: measure first): times each
  * sub-operation of the dedup-index lifecycle chain the bench's memoized
  * queries pay, so optimization targets the real cost centers instead of
  * the query-level attribution (the memo chain bills whole sub-chains to
  * whichever query runs first alphabetically). Wall-clock per step, one
  * JSON line at the end. Mirrors the bench's session config exactly.
  *
  * Usage: tools/run_main.sh graft.tools.LifecycleProfile [sfDir]
  */
object LifecycleProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    // Per-JOB attribution: log every Spark job's callsite + wall, so the
    // coarse step timings below decompose into the actual jobs (count /
    // saveAsTable / localCheckpoint sites inside CorpusOps).
    val jobStarts =
      new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    @volatile var currentStep = "init"
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          // the final stage's name is the action's short callsite
          // ("count at CorpusOps.scala:290") — the attribution we want
          val site = e.stageInfos.sortBy(_.stageId).lastOption
            .map(_.name.takeWhile(_ != '+').trim).getOrElse("?")
          jobStarts.put(e.jobId, (s"$currentStep | $site", System.nanoTime()))
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val st = jobStarts.remove(e.jobId)
          if (st != null) {
            val sec = (System.nanoTime() - st._2) / 1e9
            if (sec >= 0.15)
              System.err.println(f"[job] ${st._1}%-72s $sec%7.2f s")
          }
        }
      })
    spark.range(1 << 20).selectExpr("sum(id * 2)").collect() // warmup
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }

    val steps = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def timed[T](name: String)(f: => T): T = {
      currentStep = name
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      steps += name -> sec
      System.err.println(f"[profile] $name%-38s $sec%8.2f s")
      r
    }

    import spark.implicits.StringToColumn
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val newSrc = graft.queries.Dedup.NewSources
    val base = docs.filter(!$"source".isin(newSrc: _*))
      .select($"doc_id", $"text")
    val batch = docs.filter($"source".isin(newSrc: _*))
      .select($"doc_id", $"text")

    def fileReport(label: String, dir: String): Unit = {
      val arts = Seq("postings", "capped", "prefix", "signatures",
        "bands", "edges")
      val counts = arts.map { a =>
        val d = new java.io.File(s"$dir/$a")
        val n = Option(d.list())
          .map(_.count(f => !f.startsWith("_") && !f.startsWith(".")))
          .getOrElse(0)
        s"$a=$n"
      }
      System.err.println(s"[files] $label: ${counts.mkString(" ")}")
    }

    // 1. base build (the shared memo every lifecycle query rides)
    val baseDir = graft.TempIndexDirs.create("prof-base")
    timed("build_base")(
      graft.ops.CorpusDedup.buildIndex(base, "doc_id", "text", baseDir))
    fileReport("base_index", baseDir)

    // 2. gate (q_dedup_gate): score batch against stored base, no mutation
    timed("gate_score") {
      graft.ops.CorpusDedup
        .scoreBatchAgainstIndex(batch, "doc_id", "text", baseDir)
        .write.format("noop").mode("overwrite").save()
    }

    // 3. append chain (q_dedup_index_append_bench)
    val appendDir = timed("copy_for_append")(
      graft.TempIndexDirs.copyOf(baseDir, "prof-append"))
    timed("append_with_restate")(
      graft.ops.CorpusDedup.appendToIndex(
        batch, "doc_id", "text", appendDir))
    timed("read_appended_edges") {
      graft.ops.CorpusDedup.fromIndex(spark, appendDir).edges
        .write.format("noop").mode("overwrite").save()
    }
    fileReport("appended_index", appendDir)

    // 4. restate chain (q_dedup_index_restate): deferred append + restate
    val restateDir = timed("copy_for_restate")(
      graft.TempIndexDirs.copyOf(baseDir, "prof-restate"))
    timed("append_deferred")(
      graft.ops.CorpusDedup.appendToIndex(
        batch, "doc_id", "text", restateDir, restateStats = false))
    timed("restate_stats")(
      graft.ops.CorpusDedup.restateIndexStats(spark, restateDir))

    // 5. maintain chain (q_dedup_index_maintain)
    val maintainDir = timed("copy_for_maintain")(
      graft.TempIndexDirs.copyOf(baseDir, "prof-maintain"))
    timed("append_deferred_2")(
      graft.ops.CorpusDedup.appendToIndex(
        batch, "doc_id", "text", maintainDir, restateStats = false))
    timed("maintain_1")(
      graft.ops.CorpusDedup.maintainIndex(spark, maintainDir).collect())
    timed("maintain_2_noop")(
      graft.ops.CorpusDedup.maintainIndex(spark, maintainDir).collect())

    // 6. merge chain (q_dedup_index_merge_bench)
    val rightDir = graft.TempIndexDirs.create("prof-right")
    timed("build_right")(
      graft.ops.CorpusDedup.buildIndex(batch, "doc_id", "text", rightDir))
    val mergedDir = graft.TempIndexDirs.create("prof-merged")
    timed("merge_indexes")(
      graft.ops.CorpusDedup.mergeIndexes(spark, baseDir, rightDir, mergedDir))

    // 7. forget chain (q_dedup_index_forget_bench): copy appended + remove
    val forgetDir = timed("copy_for_forget")(
      graft.TempIndexDirs.copyOf(appendDir, "prof-forget"))
    timed("remove_from_index")(
      graft.ops.CorpusDedup.removeFromIndex(
        spark, forgetDir, batch.select($"doc_id")))

    // 8. compact chain (q_dedup_index_compact)
    val compactDir = timed("copy_for_compact")(
      graft.TempIndexDirs.copyOf(appendDir, "prof-compact"))
    timed("compact_index")(
      graft.ops.CorpusDedup.compactIndex(spark, compactDir))

    // Micro: unaligned (one file per task×bucket) vs bucket-aligned
    // (repartition on the bucket key first; one file per bucket) writes
    // of the same frame — quantifies the small-files tax of writeBucketed.
    {
      val p = graft.queries.Dedup.postingsOf(
        base.select($"doc_id".cast("long").as("doc_id"), $"text")).persist()
      p.count()
      (1 to 2).foreach { i =>
        val d1 = graft.TempIndexDirs.create(s"prof-wb-unaligned$i")
        timed(s"write_unaligned_$i")(
          graft.ops.CorpusDedup.writeBucketed(p, s"$d1/postings", "s", 32))
        System.err.println("[files] unaligned postings=" +
          new java.io.File(s"$d1/postings").list()
            .count(f => !f.startsWith("_") && !f.startsWith(".")))
        val d2 = graft.TempIndexDirs.create(s"prof-wb-aligned$i")
        timed(s"write_aligned_$i")(
          graft.ops.CorpusDedup.writeBucketed(
            p.repartition(32, $"s"), s"$d2/postings", "s", 32))
        System.err.println("[files] aligned postings=" +
          new java.io.File(s"$d2/postings").list()
            .count(f => !f.startsWith("_") && !f.startsWith(".")))
      }
      p.unpersist(false)
    }

    val total = steps.map(_._2).sum
    val json = steps.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", s""","total":$total%.3f}""")
    println(json)
    spark.stop()
  }
}
