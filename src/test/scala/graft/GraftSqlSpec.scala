package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

class GraftSqlSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("raw SQL over registered views matches the typed builder") {
    val viaSql = GraftSql.sql(spark, dir,
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""")
      .collect().map(_.toSeq)
    import org.apache.spark.sql.functions._
    import graft.syntax._
    val viaApi = Tables.lineitem(spark, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag", $"l_linestatus")
      .collect().map(_.toSeq)
    viaSql shouldBe viaApi
  }

  test("native functions are reachable from SQL (joins, events view)") {
    val rows = GraftSql.sql(spark, dir,
      """SELECT e.event_type, count(*) AS n, graft_h32(e.event_type) AS type_hash
         FROM events e
         GROUP BY e.event_type ORDER BY e.event_type""").collect()
    rows.length should be > 0
    // graft_h32 agrees with the portable md5 formulation
    val check = GraftSql.sql(spark, dir,
      """SELECT count(*) AS bad FROM (
           SELECT event_type FROM events
           GROUP BY event_type
           HAVING graft_h32(event_type) <>
                  CAST(conv(substr(md5(event_type), 1, 8), 16, 10) AS BIGINT))""")
      .collect().head.getLong(0)
    check shouldBe 0L
  }

  test("graft_zorder is reachable from SQL and matches the kernel") {
    val rows = GraftSql.sql(spark, dir,
      """SELECT l_partkey, l_suppkey,
                graft_zorder(l_partkey, l_suppkey) AS zkey
         FROM lineitem LIMIT 100""").collect()
    rows.length should be > 0
    rows.foreach { r =>
      r.getLong(2) shouldBe graft.plans.ZOrder.interleave(r.getLong(0), r.getLong(1))
    }
  }
}
