package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** [[ZOrder2]]: the Morton key must match a bit-by-bit reference through
  * both evaluation paths (interpreted + whole-stage codegen), and the
  * derived z-range "files" must bound BOTH dimensions at once — the
  * property that makes the layout prune 2-D range predicates. */
class ZOrderSpec extends AnyFunSuite with Matchers with SparkSpec {

  /** Reference interleave: bit i of x → bit 2i, bit i of y → bit 2i+1. */
  private def reference(x: Long, y: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("interleave matches the bit-by-bit reference (incl. masking)") {
    val rnd = new scala.util.Random(41)
    val probes = Seq((0L, 0L), (65535L, 65535L), (65536L, 1L), (1L, 65536L)) ++
      Seq.fill(500)((rnd.nextLong().abs, rnd.nextLong().abs))
    probes.foreach { case (x, y) =>
      ZOrder.interleave(x, y) shouldBe reference(x & 0xffffL, y & 0xffffL)
    }
  }

  test("expression evaluates identically through codegen") {
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val zcol = org.apache.spark.sql.GraftBridge.column(
      ZOrder2(
        org.apache.spark.sql.GraftBridge.expression(col("x")),
        org.apache.spark.sql.GraftBridge.expression(col("y"))))
    val got = rows.toDF("x", "y").withColumn("z", zcol)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) => z shouldBe reference(x, y) }
  }

  test("z-range files bound both dimensions (the 8x8 grid property)") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, dir)
      .agg(min(col("l_partkey")).as("plo"), max(col("l_partkey")).as("phi"),
           min(col("l_suppkey")).as("slo"), max(col("l_suppkey")).as("shi"))
      .collect()(0)
    val (pSpan, sSpan) = (li.getLong(1) - li.getLong(0), li.getLong(3) - li.getLong(2))
    val audit = graft.queries.Advanced.qLayoutZorder(spark, dir).collect()
    audit.length should be > 1
    audit.foreach { r =>
      // file_id fixes the top 3 quantized bits of each dim → ≤ 1/8 of the
      // domain per file (+1 for the min-max quantization rounding).
      r.getAs[Long]("pk_span") should be <= pSpan / 8 + 1
      r.getAs[Long]("sk_span") should be <= sSpan / 8 + 1
    }
    // every row lands in exactly one file
    audit.map(_.getAs[Long]("n")).sum shouldBe
      graft.Tables.lineitem(spark, dir).count()
  }

  test("stats pruning skips most files and is sound (skipped files match 0 rows)") {
    // sf0.01: the demo predicate box (pk 500-750, sk 25-40) sits inside
    // this fixture's key domain; at sf0.001 the domain is smaller and the
    // box would select nothing (vacuous demo).
    val rows = graft.queries.Advanced.qLayoutPrune(spark, "/root/testdata/sf0.01")
      .collect()
    val (scanned, skipped) = rows.partition(_.getAs[Boolean]("scanned"))
    // soundness: a file the stats exclude can contain no matching row
    skipped.foreach(_.getAs[Long]("n_match") shouldBe 0L)
    // effectiveness: the 2-D box touches a minority of the z-grid
    skipped.length should be > rows.length / 2
    // the predicate actually selects something (non-vacuous demo)
    scanned.map(_.getAs[Long]("n_match")).sum should be > 0L
  }
}
