package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** OPT-IN integration check against a real Kinesis-compatible server
  * (kinesalite, LocalStack, or AWS itself) — the protocol-drift net the
  * in-process stub of [[KinesisHttpSpec]] cannot provide (real error
  * bodies, pagination quirks, iterator TTLs).
  *
  * Gated on `SPARK_GRAFT_KINESIS_ENDPOINT`: unset (the usual sandbox/CI
  * case) CANCELS the tests — visibly skipped, never silently passed.
  * To run, e.g. against kinesalite:
  *
  * {{{
  * kinesalite --port 4567 &
  * aws --endpoint-url http://localhost:4567 kinesis create-stream \
  *   --stream-name graft-it --shard-count 2
  * aws --endpoint-url http://localhost:4567 kinesis put-record \
  *   --stream-name graft-it --partition-key a --data aGVsbG8=
  * SPARK_GRAFT_KINESIS_ENDPOINT=http://localhost:4567 \
  * SPARK_GRAFT_KINESIS_STREAM=graft-it \
  * AWS_ACCESS_KEY_ID=x AWS_SECRET_ACCESS_KEY=x sbt \
  *   "testOnly graft.sources.KinesisEndpointIntegrationSpec"
  * }}}
  *
  * Asserts only protocol-level invariants (shards exist, records
  * round-trip with monotonic ordinals, positioned resume returns the
  * same records) — not fixture contents, which the caller owns. */
class KinesisEndpointIntegrationSpec extends AnyFunSuite with Matchers
    with graft.SparkSpec {

  private val endpointEnv = sys.env.get("SPARK_GRAFT_KINESIS_ENDPOINT")
  private val streamName = sys.env.getOrElse("SPARK_GRAFT_KINESIS_STREAM", "graft-it")
  /** Set to the double's iterator TTL (ms) when it runs in TTL mode —
    * gates the expiry-recovery check. */
  private val ttlEnv = sys.env.get("SPARK_GRAFT_KINESIS_ITER_TTL_MS")
  /** Set to the EXPECTED total record count when the double runs in
    * reshard mode — gates the eventual-consistency admission check. */
  private val reshardExpectEnv = sys.env.get("SPARK_GRAFT_KINESIS_RESHARD_EXPECT")

  private def api(): KinesisHttpApi = {
    val endpoint = endpointEnv.get
    new KinesisHttpApi(endpoint,
      sys.env.getOrElse("AWS_REGION", "us-east-1"),
      AwsCredentials(
        sys.env.getOrElse("AWS_ACCESS_KEY_ID", "x"),
        sys.env.getOrElse("AWS_SECRET_ACCESS_KEY", "x"),
        sys.env.get("AWS_SESSION_TOKEN")))
  }

  test("ListShards -> GetShardIterator -> GetRecords round-trips against the live endpoint") {
    assume(endpointEnv.isDefined,
      "SPARK_GRAFT_KINESIS_ENDPOINT not set; integration check skipped")
    val a = api()
    val shards = a.listShards(streamName)
    shards should not be empty
    // drain every shard from TRIM_HORIZON through the seam's backend:
    // ordinal positions must be dense from 0 and data must round-trip
    val backend = new KinesisShardBackend(a, streamName, pageSize = 100)
    val sizes = shards.map(s => s -> backend.latestPosition(s)).toMap
    withClue(s"stream $streamName has no records; put at least one before running") {
      sizes.values.sum should be > 0L
    }
    sizes.foreach { case (shard, n) if n > 0 =>
      val recs = backend.read(shard, 0L, n)
      recs.map(_.sequence) shouldBe (0L until n)
      recs.foreach(_.data should not be null)
    case _ => ()
    }
  }

  test("positioned resume via recorded anchors returns the identical tail") {
    assume(endpointEnv.isDefined,
      "SPARK_GRAFT_KINESIS_ENDPOINT not set; integration check skipped")
    val backend = new KinesisShardBackend(api(), streamName, pageSize = 2)
    val shard = backend.listShards().head
    val n = backend.latestPosition(shard)
    assume(n >= 2, s"need >=2 records in ${streamName}/$shard for the resume check")
    val full = backend.read(shard, 0L, n)
    // a second read of the tail goes through getShardIteratorAtSequence +
    // the anchor store; must agree byte-for-byte with the full drain
    val tail = backend.read(shard, n - 1, n)
    tail.map(_.sequence) shouldBe full.takeRight(1).map(_.sequence)
    tail.head.data.toSeq shouldBe full.last.data.toSeq
    // throttle-retry path: a burst of positioned reads must all succeed
    // (kinesalite throttles GetShardIterator at ~5/s/shard)
    (1 to 8).foreach { _ =>
      backend.read(shard, n - 1, n).map(_.sequence) shouldBe Seq(n - 1)
    }
  }

  test("iterator TTL expiry over the live socket: the drain resumes exactly, no duplicate, no gap") {
    assume(endpointEnv.isDefined && ttlEnv.isDefined,
      "SPARK_GRAFT_KINESIS_ENDPOINT / SPARK_GRAFT_KINESIS_ITER_TTL_MS not " +
        "set; run KinesisDouble with an iterator TTL (arg 5) to exercise this")
    val ttl = ttlEnv.get.toLong
    val a = api()
    val shard = a.listShards(streamName).head
    // expiry BEFORE anything was consumed: the transport re-acquires from
    // the lineage start (nothing to lose)
    val it0 = a.getShardIterator(streamName, shard, None)
    Thread.sleep(ttl + 300L)
    val (p1, next1, _) = a.getRecords(it0, 2)
    p1.map(_.sequence) shouldBe Seq(0L, 1L)
    // expiry MID-DRAIN: the transport must re-acquire AFTER the last
    // consumed real sequence and resume — not TRIM_HORIZON, not fail
    Thread.sleep(ttl + 300L)
    val (p2, _, _) = a.getRecords(next1.get, 100)
    val all = p1 ++ p2
    withClue("ordinals after the expiry recovery must be dense from 0 " +
      "(a gap = skipped records, a repeat = duplicates)") {
      all.map(_.sequence) shouldBe (0L until all.size.toLong)
    }
    all.map(_.partitionKey).distinct.size shouldBe all.size
  }

  test("eventually-consistent ListShards after a reshard: late children drain after the parent, exactly once") {
    assume(endpointEnv.isDefined && reshardExpectEnv.isDefined,
      "SPARK_GRAFT_KINESIS_ENDPOINT / SPARK_GRAFT_KINESIS_RESHARD_EXPECT " +
        "not set; run KinesisDouble in reshard mode (arg 6) to exercise this")
    val expect = reshardExpectEnv.get.toInt
    // the real streaming source against the live socket: shard discovery
    // re-lists per trigger, so the children — hidden by the server for
    // the first N sweeps — appear MID-STREAM, and parent-before-child
    // admission must hold across the late discovery.
    // re-arm the double's eventual-consistency window: earlier tests in
    // this suite already swept ListShards past the reveal point
    api().post("GraftTest.ResetReshardVisibility", "{}")
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, String)]()
    val df = spark.readStream.format(KplFileSource.ProviderClass)
      .option("backend", classOf[KinesisHttpBackend].getName)
      .option("endpoint", endpointEnv.get)
      .option("region", sys.env.getOrElse("AWS_REGION", "us-east-1"))
      .option("streamName", streamName)
      .option("accessKeyId", sys.env.getOrElse("AWS_ACCESS_KEY_ID", "x"))
      .option("secretAccessKey", sys.env.getOrElse("AWS_SECRET_ACCESS_KEY", "x"))
      .load()
    val q = df.selectExpr("shardId", "CAST(data AS STRING) AS payload")
      .writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(250L))
      .foreachBatch {
        (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         id: java.lang.Long) =>
          b.collect().foreach(r =>
            rows.add((id.longValue(), r.getString(0), r.getString(1))))
          ()
      }
      .start()
    try {
      val deadline = System.currentTimeMillis() + 120000L
      while (rows.size < expect && System.currentTimeMillis() < deadline)
        Thread.sleep(500L)
    } finally q.stop()
    import scala.jdk.CollectionConverters._
    val got = rows.asScala.toVector
    withClue(s"expected $expect records (parent + late-revealed children), " +
      s"got ${got.size}: ${got.map(_._3).sorted}") {
      got.size shouldBe expect
    }
    // exactly once: no payload arrived twice across the reshard point
    got.map(_._3).distinct.size shouldBe expect
    // parent-before-child over the wire: every child-shard record lands
    // in a batch AT OR AFTER the batch that finished the (closed) parent
    val parentShard = got.map(_._2).min
    val parentIsClosed = new KinesisShardBackend(api(), streamName, 100)
      .shardMetas().exists(m => m.shardId == parentShard && m.closed)
    parentIsClosed shouldBe true
    val lastParentBatch = got.filter(_._2 == parentShard).map(_._1).max
    val childBatches = got.filterNot(_._2 == parentShard).map(_._1)
    childBatches should not be empty
    all(childBatches) should be >= lastParentBatch
  }
}
