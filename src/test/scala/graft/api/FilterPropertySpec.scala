package graft.api

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Property test (SURVEY.md §5 item 4): the compiled Spark predicates must
  * agree with a naive in-memory evaluator of the reference's filter
  * semantics (`objectFilter/index.js:5-68`) over randomized events —
  * including absent branches, null unions, alt-field fallbacks, and
  * case-insensitive server names. */
class FilterPropertySpec extends AnyFunSuite with Matchers with SparkSpec {

  /** Randomized event: each field independently absent / null / present. */
  private case class RandEvent(
      contactId: Option[Long], contactIdAlt: Option[Long],
      agentId: Option[Long], agentIdAlt: Option[Long],
      shiftId: Option[Long], shiftIdAlt: Option[Long],
      tenantId: Option[Long], tenantIdAlt: Option[Long],
      serverName: Option[String],
      isContact: Boolean) {

    private def l(v: Option[Long]) = v.map(x => s"""{"long":$x}""").getOrElse("null")
    private def s(v: Option[String]) = v.map(x => s"""{"string":"$x"}""").getOrElse("null")

    def json: String = {
      val branch =
        if (isContact)
          s""""com.incontact.datainfra.events.ContactEvent":{"mediaScopeIdentification":{"contactIdentification":{"contactId":${l(contactId)},"contactIdAlt":${l(contactIdAlt)}}}}"""
        else
          s""""com.incontact.datainfra.events.AgentEvent":{"agentShiftIdentification":{"agentIdentification":{"agentId":${l(agentId)},"agentIdAlt":${l(agentIdAlt)}},"agentShiftId":${l(shiftId)},"agentShiftIdAlt":${l(shiftIdAlt)}}}"""
      s"""{"baseEventData":{$branch},"tenantId":{"tenantId":${l(tenantId)},"tenantIdAlt":${l(tenantIdAlt)},"serverName":${s(serverName)}}}"""
    }

    /** The reference's try/catch→false evaluation, straight-line. */
    def matches(q: RecordsQuery.Query): Boolean = {
      def eqOpt(target: Option[Long], v: Long) = target.contains(v)
      q.contactId.forall(v => isContact && (eqOpt(contactId, v) || eqOpt(contactIdAlt, v))) &&
        q.agentId.forall(v => !isContact && (eqOpt(agentId, v) || eqOpt(agentIdAlt, v))) &&
        q.agentShiftId.forall(v => !isContact && (eqOpt(shiftId, v) || eqOpt(shiftIdAlt, v))) &&
        q.tenantId.forall(v => eqOpt(tenantId, v) || eqOpt(tenantIdAlt, v)) &&
        q.serverName.forall(v => serverName.exists(_.equalsIgnoreCase(v)))
    }
  }

  private def randEvent(rnd: scala.util.Random): RandEvent = {
    def ol = if (rnd.nextBoolean()) Some(rnd.nextInt(5).toLong) else None
    def os = if (rnd.nextBoolean()) Some(Seq("Prod-A", "prod-b", "QA")(rnd.nextInt(3))) else None
    RandEvent(ol, ol, ol, ol, ol, ol, ol, ol, os, rnd.nextBoolean())
  }

  private def randQuery(rnd: scala.util.Random): RecordsQuery.Query = {
    def ol = if (rnd.nextInt(3) == 0) Some(rnd.nextInt(5).toLong) else None
    def os = if (rnd.nextInt(3) == 0) Some(Seq("prod-a", "PROD-B", "qa")(rnd.nextInt(3))) else None
    RecordsQuery.Query("s", 960L, ol, ol, os, ol, ol)
  }

  test("compiled predicates agree with the naive reference evaluator (seeded, 20 rounds)") {
    val now = Instant.parse("2024-06-01T12:00:00Z")
    val rnd = new scala.util.Random(99)
    val schema = StructType(Seq(
      StructField("idx", LongType),
      StructField("data", BinaryType),
      StructField("approximateArrivalTimestamp", TimestampType)))
    for (round <- 1 to 20) {
      val events = Seq.fill(40)(randEvent(rnd))
      val q = randQuery(rnd)
      val rows = events.zipWithIndex.map { case (e, i) =>
        Row(i.toLong, e.json.getBytes(UTF_8), Timestamp.from(now.minusSeconds(60)))
      }
      val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      val got = RecordsQuery.plan(df, q, now)
        .select("json").collect().map(_.getString(0)).sorted.toSeq
      val want = events.filter(_.matches(q)).map(_.json).sorted
      withClue(s"round $round, query $q: ") { got shouldBe want }
    }
  }
}
