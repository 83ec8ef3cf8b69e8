package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Queries execute into the `noop` sink (not `count()`): count lets
  * Catalyst prune projections and skip sorts, which would flatter the
  * numbers; noop forces full materialization of the real result. A small
  * warmup query runs first so JVM/codegen startup isn't billed to the
  * first measured query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // InferFiltersFromGenerate inlines the full generator expression into an
      // inferred size()>0 filter; for expensive array builders (shingling)
      // that re-runs the tokenizer per element per row — measured 12s vs
      // 0.7s on 5k docs. The inferred filter is useless for our non-empty
      // arrays, so exclude the rule.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.sql.session.timeZone", "UTC")
      // events.ts is parquet TIMESTAMP(NANOS); see Tables.events.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.range(1 << 20).selectExpr("sum(id * 2)").collect() // JVM/codegen warmup
    // Touch one small parquet so Hadoop FS + parquet reader initialization
    // (~2 s of first-scan machinery) isn't billed to the first measured
    // query; the table is tiny, so no fixture data is meaningfully cached.
    spark.read.parquet(s"$sfDir/region.parquet").count()

    // SPARK_GRAFT_QUERIES=a,b,c restricts the run (local iteration only;
    // the driver runs the full suite).
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_(name)) }

    var failed = List.empty[String]
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failedJson = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
    // A silently-broken query must not hide inside a healthy-looking bench
    // line: surface it in the exit code too.
    if (failed.nonEmpty) sys.exit(1)
  }
}
