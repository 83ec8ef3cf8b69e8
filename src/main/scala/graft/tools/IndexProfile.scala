package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level timing of the dedup index lifecycle (build → append →
  * probe) at `SPARK_GRAFT_SF_DIR` — the attribution tool behind the
  * bench's heaviest entry (`q_dedup_index_append_bench`). Prints one
  * line per stage; run with:
  *
  * {{{
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.IndexProfile"
  * }}}
  */
object IndexProfile {
  def main(args: Array[String]): Unit = {
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
    import spark.implicits._
    import org.apache.spark.sql.functions._

    spark.range(1 << 20).selectExpr("sum(id * 2)").collect() // warmup

    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[index-profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = graft.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text", $"source")
    val newSources = graft.queries.Dedup.NewSources
    // SPARK_GRAFT_PROFILE_BUCKETS: A/B the artifact bucket count (default
    // the production resolver's pick for this corpus)
    val base = docs.filter(!$"source".isin(newSources: _*)).select($"doc_id", $"text")
    val batch = docs.filter($"source".isin(newSources: _*)).select($"doc_id", $"text")
    val IndexBuckets = sys.env.get("SPARK_GRAFT_PROFILE_BUCKETS").map(_.toInt)
      .getOrElse(graft.ops.CorpusDedup.IndexBuckets)
    println(s"[index-profile] base=${base.count()} docs, batch=${batch.count()} docs, buckets=$IndexBuckets")

    // stage-level replica of buildIndex for attribution
    {
      import graft.queries.Dedup
      import graft.ops.CorpusDedup.writeBucketed
      val d2 = graft.TempIndexDirs.create("graft-index-stage")
      val canonBase = base.select($"doc_id".cast("long").as("doc_id"),
        $"text".cast("string").as("text"))
      val postings = timed("  postingsOf + persist") {
        val p = Dedup.postingsOf(canonBase).persist(); p.count(); p }
      timed("  write postings") { writeBucketed(postings, s"$d2/postings", "s", IndexBuckets) }
      val capped = timed("  cappedFromPostings") {
        val c = Dedup.cappedFromPostings(postings, Dedup.MaxShingleDf).persist(); c.count(); c }
      timed("  write capped") { writeBucketed(capped, s"$d2/capped", "s", IndexBuckets) }
      timed("  write prefix") { writeBucketed(
        Dedup.ppjoinPrefix(capped, Dedup.PpjoinTauE4), s"$d2/prefix", "s", IndexBuckets) }
      val sigs = timed("  signaturesOf") {
        val s = Dedup.signaturesOf(postings).persist(); s.count(); s }
      timed("  write signatures") { writeBucketed(sigs, s"$d2/signatures", "doc_id", IndexBuckets) }
      timed("  write bands") { writeBucketed(Dedup.bandRowsOf(sigs), s"$d2/bands", "bucket", IndexBuckets) }
      timed("  write edges") { writeBucketed(
        Dedup.scoredPairsFromSigs(sigs, Dedup.MaxBandBucket), s"$d2/edges", "da", IndexBuckets) }
      postings.unpersist(false); capped.unpersist(false); sigs.unpersist(false)
    }

    val tmp = graft.TempIndexDirs.create("graft-index-profile")
    timed("buildIndex(base)") {
      graft.ops.CorpusDedup.buildIndex(base, "doc_id", "text", tmp,
        buckets = IndexBuckets)
    }
    timed("appendToIndex(batch)") {
      graft.ops.CorpusDedup.appendToIndex(batch, "doc_id", "text", tmp)
    }
    timed("read stored edges") {
      graft.ops.CorpusDedup.fromIndex(spark, tmp).edges.write
        .format("noop").mode("overwrite").save()
    }
    timed("bench invariants query") {
      graft.queries.Dedup.qDedupIndexAppendBench(spark, sfDir).write
        .format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
