package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Sequence-packing manifest invariants: the per-source token streams are
  * contiguous, bin spans are consistent, and bin geometry follows from the
  * offsets — i.e. a packing writer could actually consume this manifest. */
class TextPackSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val B = TextAnalysis.PackBudget

  private lazy val rows =
    TextAnalysis.qTxtPack(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
                 r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))

  test("per-source offsets are contiguous in doc_id order") {
    rows should not be empty
    rows.groupBy(_._2).values.foreach { docs =>
      val ordered = docs.sortBy(_._1)
      ordered.head._4 shouldBe 0L // first doc starts the stream
      ordered.toSeq.sliding(2).foreach {
        case Seq((_, _, nTok, start, _, _, _, _), (_, _, _, nextStart, _, _, _, _)) =>
          nextStart shouldBe start + nTok
        case _ => ()
      }
    }
  }

  test("bin geometry follows from the offsets") {
    rows.foreach { case (_, _, nTok, start, first, last, off, nBins) =>
      first shouldBe start / B
      last shouldBe (start + math.max(nTok, 1L) - 1L) / B
      off shouldBe start % B
      nBins shouldBe last - first + 1
      nBins should be >= 1L
    }
  }

  test("documents longer than the budget straddle, short ones may too") {
    // every doc spans exactly the bins its token span covers
    rows.filter(_._3 > B).foreach { case (_, _, _, _, first, last, _, _) =>
      last should be > first
    }
    // the manifest accounts for every token: per source, the last doc's
    // end offset equals the total token count
    rows.groupBy(_._2).values.foreach { docs =>
      val total = docs.map(_._3).sum
      val lastDoc = docs.maxBy(_._4)
      lastDoc._4 + lastDoc._3 shouldBe total
    }
  }
}
