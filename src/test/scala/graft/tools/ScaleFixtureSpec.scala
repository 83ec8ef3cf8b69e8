package graft.tools

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Recipe invariants for the derived scale fixture (FIXTURES.md §6) — run
  * at replicas=2 over sf0.001 so the contract the 10×/100× bench lanes
  * depend on is CI-checked without regenerating the big fixtures:
  *
  *  - every replicated table is exactly `replicas ×` the source;
  *  - replica 0 is the identity (the scaled corpus is a strict superset);
  *  - replica r>0 documents live in a DISJOINT token space (every token
  *    carries the `~r` suffix — what makes dedup growth measurements
  *    measure the operator, not duplicate-structure inflation);
  *  - `n_chars` stays consistent with the rewritten text;
  *  - FK relationships hold within replicas (no orphan lineitem/orders);
  *  - embeddings jitter is bounded (±0.05/dim) and actually applied.
  */
class ScaleFixtureSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val src = "/root/testdata/sf0.001"
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_scalefix").toString
    ScaleFixture.ensure(spark, src, d, replicas = 2)
  }
  private def t(name: String) = spark.read.parquet(s"$dir/$name.parquet")
  private def s(name: String) = spark.read.parquet(s"$src/$name.parquet")

  test("replicated tables are exactly replicas x source; dimensions verbatim") {
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem",
                  "events", "documents", "embeddings"))
      withClue(n) { t(n).count() shouldBe 2 * s(n).count() }
    for (n <- Seq("region", "nation"))
      withClue(n) { t(n).count() shouldBe s(n).count() }
  }

  test("replica 0 is the identity copy") {
    val a = t("documents").filter(col("doc_id") < ScaleFixture.KeyStride)
      .select("doc_id", "text", "lang", "source", "n_chars")
    a.exceptAll(s("documents").select("doc_id", "text", "lang", "source", "n_chars"))
      .count() shouldBe 0
  }

  test("replica 1 documents live in a disjoint suffixed token space") {
    val off = t("documents").filter(col("doc_id") >= ScaleFixture.KeyStride)
    // every whitespace token ends in ~1
    off.filter(!col("text").rlike("^(\\S+~1)( \\S+~1)*$"))
      .count() shouldBe 0
    // and n_chars tracks the rewritten text
    off.filter(col("n_chars") =!= expr("length(text)")).count() shouldBe 0
  }

  test("FK relationships hold in every replica") {
    t("lineitem").join(t("orders"),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .count() shouldBe 0
    t("orders").join(t("customer"),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .count() shouldBe 0
  }

  test("embedding jitter is applied and bounded per dimension") {
    val base = s("embeddings").select(col("vec_id"), col("embedding").as("e0"))
    val rep1 = t("embeddings").filter(col("vec_id") >= ScaleFixture.KeyStride)
      .select((col("vec_id") - ScaleFixture.KeyStride).as("vec_id"),
        col("embedding").as("e1"))
    val joined = rep1.join(base, "vec_id")
      .select(aggregate(zip_with(col("e0"), col("e1"),
          (a, b) => abs(a - b)), lit(0.0d),
          (acc, x) => greatest(acc, x.cast("double"))).as("max_dd"))
    val agg = joined.agg(min(col("max_dd")), max(col("max_dd"))).head()
    agg.getDouble(0) should be > 0.0   // jitter actually applied everywhere
    agg.getDouble(1) should be <= 0.0501 // and bounded (float rounding slack)
  }
}
