package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** Event-stream skew — the second adversarial axis next to
  * [[AdversarialCorpusSpec]]'s text skew: one mega-user holds HALF of a
  * 100k-event stream. The sessionization / attribution family partitions
  * its windows by `user_id`, so the mega-user concentrates a 50k-row
  * sorted window partition on one task — the canonical per-entity window
  * hotspot. These queries' scale contract is "cost bounded by a user's
  * HISTORY, never by the corpus": the spec pins that the hotspot stays a
  * single in-task sort (seconds at this size), results stay exact for
  * both the mega-user and the long tail, and the distinct/aggregate paths
  * (WAU) are unaffected because their heavy keys contain the day.
  *
  * Budgets are deliberately loose (the real failure mode — a window
  * repartitioned per event, or a per-user collect — is orders of
  * magnitude off); the sharp assertions are the exact outputs.
  */
class EventSkewSpec extends AnyFunSuite with Matchers with SparkSpec {

  private val BudgetSec = 120.0
  private val MegaUser = 77L
  private val NEvents = 100000
  private val MegaShare = NEvents / 2 // 50k events on one user

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_evskew").toString
    val sqlCtx = spark
    import sqlCtx.implicits._
    // Mega-user: one event per minute (never a 30-min session gap, so ONE
    // giant session — the worst case for the running-sum window). Tail:
    // 500 users × 100 events, one event per hour each (every event its own
    // session). Deterministic types; every 10th event is a purchase.
    val base = 960L * 60000000L // fixture epoch, µs
    val mega = (0 until MegaShare).map { i =>
      (i.toLong, base + i * 60000000L, MegaUser,
        if (i % 10 == 0) "purchase" else "click", i.toDouble, "{}")
    }
    val tail = (0 until (NEvents - MegaShare)).map { i =>
      val u = 1000L + i % 500
      (100000L + i, base + (i / 500).toLong * 3600000000L, u,
        if (i % 10 == 3) "purchase" else "view", i.toDouble, "{}")
    }
    (mega ++ tail)
      .toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", expr("timestamp_micros(ts_us)")).drop("ts_us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(8)
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  test("sessionization: the mega-user is ONE exact session, the tail stays exact") {
    val (rows, sec) = timed(Events.qEvSession(spark, dir).collect())
    sec should be < BudgetSec
    val mega = rows.filter(_.getLong(0) == MegaUser)
    mega.length shouldBe 1 // one uninterrupted 50k-event session
    mega.head.getAs[Long]("n_events") shouldBe MegaShare.toLong
    // tail: hour gaps > 30-min threshold → every event its own session
    val tailSessions = rows.filter(_.getLong(0) != MegaUser)
    tailSessions.map(_.getAs[Long]("n_events")).sum shouldBe
      (NEvents - MegaShare).toLong
    all(tailSessions.map(_.getAs[Long]("n_events"))) shouldBe 1L
  }

  test("attribution: per-purchase touches stay exact under the hotspot") {
    val (rows, sec) = timed(Events.qEvAttribution(spark, dir).collect())
    sec should be < BudgetSec
    val mega = rows.filter(_.getLong(0) == MegaUser)
    mega.length shouldBe MegaShare / 10 // every 10th mega event purchases
    // the first mega event IS a purchase (i=0) with no prior touch
    val first = mega.minBy(_.getLong(1))
    first.getAs[String]("last_touch") shouldBe "(none)"
    // every later purchase's last touch is the click immediately before it
    mega.count(_.getAs[String]("last_touch") == "click") shouldBe
      MegaShare / 10 - 1
  }

  test("WAU/DAU: day-keyed aggregates are skew-free and exact") {
    val (rows, sec) = timed(Events.qEvWau(spark, dir).collect())
    sec should be < BudgetSec
    rows.length should be > 0
    // the mega-user's first day: 500 tail users were active too (they all
    // fire within the first hours) → dau = 501 on day one
    val d0 = rows.minBy(_.getLong(0))
    d0.getAs[Long]("dau") shouldBe 501L
  }
}
