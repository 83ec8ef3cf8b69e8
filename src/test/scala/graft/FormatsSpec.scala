package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.syntax._

/** Source/sink format coverage (SURVEY.md §2.2 scans/sinks rows): parquet,
  * JSON, and CSV round-trips preserve the data, with explicit schemas on
  * read so the text formats stay type-faithful. */
class FormatsSpec extends AnyFunSuite with Matchers with SparkSpec {

  private def sample() =
    Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"user_id", $"event_type", $"value")
      .orderBy($"event_id").limit(100)

  test("parquet write/read round-trip") {
    val dir = Files.createTempDirectory("fmt_parquet").toString
    val df = sample()
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir).orderBy("event_id")
    back.collect().map(_.toSeq) shouldBe df.collect().map(_.toSeq)
  }

  test("json write/read round-trip with explicit schema") {
    val dir = Files.createTempDirectory("fmt_json").toString
    val df = sample()
    df.write.mode("overwrite").json(dir)
    val back = spark.read.schema(df.schema).json(dir).orderBy("event_id")
    back.collect().map(_.toSeq) shouldBe df.collect().map(_.toSeq)
  }

  test("csv write/read round-trip with header and explicit schema") {
    val dir = Files.createTempDirectory("fmt_csv").toString
    val df = sample()
    df.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(df.schema).option("header", "true").csv(dir)
      .orderBy("event_id")
    back.collect().map(_.toSeq) shouldBe df.collect().map(_.toSeq)
  }

  test("events loader fails loudly on an unsupported ts physical type") {
    // A malformed fixture (string ts) must error AT THE LOADER with a
    // descriptive message, not surface as an opaque analysis error three
    // operators downstream (round-6 ADVICE).
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_badev").toString
    Seq((1L, "2024-01-01 00:00:00")).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[RuntimeException] { graft.Tables.events(spark, dir) }
    e.getMessage should include("events.ts")
    e.getMessage should include("unsupported")
  }
}
