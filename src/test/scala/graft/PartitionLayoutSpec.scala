package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.syntax._

/** Data-layout techniques for the 100 TB path: hive-style partitioned
  * writes and partition pruning. A date-partitioned table must let a
  * date-filtered query read ONLY the matching directories — the difference
  * between scanning 100 TB and scanning one day's slice — and the pruning
  * must be visible in the plan, not assumed. */
class PartitionLayoutSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val layout = {
    val out = Files.createTempDirectory("graft-partitioned").toString
    Tables.events(spark, dir)
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
      .write.mode("overwrite").partitionBy("day").parquet(out)
    out
  }

  test("partitioned write produces one directory per day") {
    val days = new java.io.File(layout).list().filter(_.startsWith("day="))
    days.length should be > 1
    val expected = Tables.events(spark, dir)
      .select(date_format($"ts", "yyyy-MM-dd")).distinct().count()
    days.length.toLong shouldBe expected
  }

  test("a day filter prunes partitions in the plan and reads only that slice") {
    val someDay = new java.io.File(layout).list().filter(_.startsWith("day="))
      .sorted.head.stripPrefix("day=")
    val q = spark.read.parquet(layout).filter($"day" === someDay)
    val plan = q.queryExecution.executedPlan.toString

    // pruning is visible in the scan node, not applied post-read
    plan should include("PartitionFilters")
    plan should include(someDay)

    // and the pruned read returns exactly the partition's rows
    val expected = Tables.events(spark, dir)
      .filter(date_format($"ts", "yyyy-MM-dd") === someDay).count()
    q.count() shouldBe expected
    expected should be > 0L
  }

  test("partition pruning composes with pushed filters inside the partition") {
    val someDay = new java.io.File(layout).list().filter(_.startsWith("day="))
      .sorted.head.stripPrefix("day=")
    val q = spark.read.parquet(layout)
      .filter($"day" === someDay && $"event_type" === "purchase")
    val plan = q.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include("PushedFilters")
    plan should include("event_type")
    val expected = Tables.events(spark, dir)
      .filter(date_format($"ts", "yyyy-MM-dd") === someDay &&
              $"event_type" === "purchase").count()
    q.count() shouldBe expected
  }
}
