package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextHash
import graft.syntax._

/** Dev-only scratch main for probing Spark behavior in this environment. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $name => $r (${(System.nanoTime() - t0) / 1e9}%.2f s)")
    }

    val docs = graft.Tables.documents(spark, dir)
    time("docs.count")(docs.count())
    val sh = docs.withColumn("w", TextHash.tokens($"text"))
      .select($"doc_id", TextHash.shinglesFromTokens($"w", 3).as("sh"))
      .persist()
    time("shingles.persist")(sh.write.format("noop").mode("overwrite").save())
    time("shingles.warm")(sh.write.format("noop").mode("overwrite").save())
    val ex = sh.select($"doc_id", size($"sh").as("n"), explode($"sh").as("s")).persist()
    time("explode-from-cached.persist")(ex.write.format("noop").mode("overwrite").save())
    time("explode.warm")(ex.write.format("noop").mode("overwrite").save())
    val a = ex.toDF("da", "na", "s"); val b = ex.toDF("db", "nb", "s")
    val joined = a.join(b, Seq("s")).filter($"da" < $"db")
      .groupBy($"da", $"db")
      .agg(count(lit(1)).as("common"), max($"na").as("na"), max($"nb").as("nb"))
    time("jaccard-join-from-cached")(joined.write.format("noop").mode("overwrite").save())
    val h32ed = ex.select($"doc_id", TextHash.h32($"s").as("h"))
    time("h32-from-cached")(h32ed.write.format("noop").mode("overwrite").save())
    val minExprs = (0 until TextHash.MinhashK).map { i =>
      val (aa, bb) = TextHash.MinhashParams(i)
      min(($"h" * aa + bb) % TextHash.HashPrime).as(s"mh$i")
    }
    val minAgg = h32ed.groupBy($"doc_id").agg(minExprs.head, minExprs.tail: _*)
    time("minhash-agg-from-cached")(minAgg.write.format("noop").mode("overwrite").save())
    val sigOld = sh.select(Seq($"doc_id") ++ (0 until TextHash.MinhashK)
      .map(i => TextHash.minhash($"sh", i).as(s"mh$i")): _*)
    time("minhash-array-from-cached")(sigOld.write.format("noop").mode("overwrite").save())

    // Join cost in isolation: materialize the index to parquet first.
    ex.write.mode("overwrite").parquet("/tmp/ex_idx")
    val exP = spark.read.parquet("/tmp/ex_idx")
    val aP = exP.toDF("da", "na", "s"); val bP = exP.toDF("db", "nb", "s")
    val joinedP = aP.join(bP, Seq("s")).filter($"da" < $"db")
      .groupBy($"da", $"db")
      .agg(count(lit(1)).as("common"), max($"na").as("na"), max($"nb").as("nb"))
      .withColumn("jacc_e4", floor($"common" * 10000L / ($"na" + $"nb" - $"common")).cast("long"))
      .filter($"jacc_e4" >= 2000)
    time("join-from-parquet-1")(joinedP.write.format("noop").mode("overwrite").save())
    time("join-from-parquet-2")(joinedP.write.format("noop").mode("overwrite").save())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    time("join-from-parquet-noBHJ")(joinedP.write.format("noop").mode("overwrite").save())
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("join-from-parquet-noAQE")(joinedP.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
