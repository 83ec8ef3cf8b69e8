package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.syntax._

/** Proves the shingle document-frequency cap defuses stop-phrase skew: a
  * phrase shared by the whole corpus must not turn the Jaccard self-join
  * quadratic, and a genuine near-duplicate pair must still be found. */
class DedupSkewSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val stopPhrase = "please do not reply to this automated message"

  // 60 docs that share ONLY the stop phrase, plus one genuine near-dup pair
  // (long shared body, one-word difference).
  private lazy val docs = {
    val sqlCtx = spark
    import sqlCtx.implicits._
    val sharedBody = "zeta eta theta iota kappa lambda mu nu xi omicron pi rho"
    val skewed = (0 until 60).map { i =>
      (i.toLong, s"$stopPhrase u${i}a u${i}b u${i}c u${i}d u${i}e")
    }
    val nearDup = Seq(
      (1000L, s"$stopPhrase $sharedBody"),
      (1001L, s"$stopPhrase $sharedBody sigma"))
    (skewed ++ nearDup).toDF("doc_id", "text")
  }

  private def candidatePairs(maxDf: Long): Long = {
    val ex = Dedup.cappedShingleIndex(docs, maxDf)
    val a = ex.select($"doc_id".as("da"), $"s")
    val b = ex.select($"doc_id".as("db"), $"s")
    a.join(b, Seq("s")).filter($"da" < $"db").count()
  }

  test("the cap removes every shingle above the DF threshold") {
    val maxDf = Dedup.cappedShingleIndex(docs, 10L)
      .groupBy($"s").count()
      .agg(org.apache.spark.sql.functions.max($"count")).head.getLong(0)
    maxDf should be <= 10L
  }

  test("stop-phrase candidate explosion is eliminated by the cap") {
    // uncapped: the 6 stop-phrase shingles alone produce 6 × C(62,2) pairs
    val uncapped = candidatePairs(Long.MaxValue)
    val capped = candidatePairs(10L)
    uncapped should be >= 6L * (62 * 61 / 2)
    capped should be < 100L // only the near-dup pair's private shingles remain
  }

  test("genuine near-dups survive the cap; stop-phrase-only pairs do not") {
    val pairs = Dedup.jaccardPairs(docs, 10L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs shouldBe Array((1000L, 1001L))
  }

  test("ppjoin prefix index: DF cap excludes the dominant shingle, load stays balanced") {
    import org.apache.spark.sql.functions._
    val ex = Dedup.cappedShingleIndex(docs, 10L)
    val prefix = Dedup.ppjoinPrefix(ex, Dedup.PpjoinTauE4)
    prefix.count() should be > 0L
    // No prefix entry exceeds the DF cap — the corpus-dominant stop-phrase
    // shingles (DF 62 > cap 10) never reach a prefix, so no prefix-join
    // key can fan out past cap² candidate pairs.
    val maxPrefixDf = prefix.groupBy($"s").count()
      .agg(max($"count")).head.getLong(0)
    maxPrefixDf should be <= 10L
    // Rare-first ordering also keeps the SURVIVING keys balanced: the
    // worst prefix-key load stays within a small constant (here the
    // near-dup pair's shared shingles), so equi-join task input sizes
    // cannot concentrate on one key.
    maxPrefixDf should be <= 4L
    // And the prefix really prunes: strictly fewer rows than the capped
    // index it derives from (prefix length n - ceil(tau*n) + 1 < n).
    prefix.count() should be < ex.count()
  }
}
