package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val newSources = Seq("src18", "src19")
    val docs = graft.Tables.documents(spark, dir)
      .select($"doc_id", $"text", $"source")
    val base = docs.filter(!$"source".isin(newSources: _*)).select("doc_id", "text")
    val batch = docs.filter($"source".isin(newSources: _*)).select("doc_id", "text")
    println(s"base=${base.count()} batch=${batch.count()}")
    val tmp = java.nio.file.Files.createTempDirectory("probe-append").toString
    val built = graft.ops.CorpusDedup.buildIndex(base, "doc_id", "text", tmp)
    println(s"base edges=${built.edges.count()}")
    val appended = graft.ops.CorpusDedup.appendToIndex(batch, "doc_id", "text", tmp)
    println(s"after append edges=${appended.edges.count()}")
    // live full corpus
    val sigs = graft.ops.CorpusDedup.minhashSignatures(
      docs.select("doc_id", "text"), "doc_id", "text").persist()
    sigs.count()
    val live = graft.queries.Dedup.scoredPairsFromSigs(sigs)
    println(s"live full-corpus pairs=${live.count()}")
    // diff
    val st = appended.edges.select($"da", $"db").withColumn("st", lit(1))
    val lv = live.select($"da", $"db").withColumn("lv", lit(1))
    val d = st.join(lv, Seq("da", "db"), "full")
    println("stored-only=" + d.filter($"lv".isNull).count() +
      " live-only=" + d.filter($"st".isNull).count())
    // stored-only sample with dup analysis
    appended.edges.groupBy($"da", $"db").count().filter($"count" > 1)
      .show(10, false)
    d.filter($"lv".isNull).show(10, false)
    spark.stop()
  }
}
