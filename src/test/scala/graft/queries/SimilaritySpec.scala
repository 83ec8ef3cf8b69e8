package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

class SimilaritySpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("IVF results are a correctly-ranked subset with measurable recall") {
    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val exact = resultSet(Similarity.qSimTopk(spark, dir))
    val ivf = Similarity.qSimIvf(spark, dir)
    val ivfRows = ivf.collect()
    val ivfSet = ivfRows.map(r => (r.getLong(0), r.getLong(2))).toSet

    // recall@5 vs brute force: with random (unclustered) embeddings the
    // expected recall is roughly the probed fraction (nprobe/k = 25%);
    // assert a conservative floor plus basic sanity.
    val recall = ivfSet.intersect(exact).size.toDouble / exact.size
    recall should be >= 0.15

    // ranks within each query are contiguous from 1 and ordered by score
    ivfRows.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(1))
      byRank.map(_.getLong(1)).toSeq shouldBe (1L to byRank.length)
      val scores = byRank.map(_.getLong(3)).toSeq
      scores shouldBe scores.sorted.reverse
    }
  }

  test("IVF is deterministic across runs") {
    val a = Similarity.qSimIvf(spark, dir).collect().map(_.toSeq)
    val b = Similarity.qSimIvf(spark, dir).collect().map(_.toSeq)
    a shouldBe b
  }
}
