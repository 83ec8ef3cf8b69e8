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
class KinesisEndpointIntegrationSpec extends AnyFunSuite with Matchers {

  private val endpointEnv = sys.env.get("SPARK_GRAFT_KINESIS_ENDPOINT")
  private val streamName = sys.env.getOrElse("SPARK_GRAFT_KINESIS_STREAM", "graft-it")

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
}
