package graft.sources

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import scala.jdk.CollectionConverters._

/** OUT-OF-PROCESS Kinesis double — a standalone `Kinesis_20131202` server
  * for [[KinesisEndpointIntegrationSpec]], so the live-endpoint transport
  * path has a real socket PEER PROCESS on record (the in-process stub in
  * [[KinesisHttpSpec]] shares the JVM with the client; this one does not).
  * It deliberately mimics the live service's awkward corners rather than
  * the fixtures' convenient ones:
  *
  *  - sequence numbers are 56-digit decimals with IRREGULAR gaps (real
  *    Kinesis sequences are sparse time-encoded ~10^55 values; dense
  *    small integers would mask any code path that treats sequences as
  *    ordinals — the transport contract says it must not);
  *  - `ListShards` pages at ONE shard per page with a `NextToken`, so
  *    multi-shard streams always exercise the pagination loop;
  *  - `GetShardIterator` is throttled at ~5 calls/s/shard with
  *    `ProvisionedThroughputExceededException`, the kinesalite behavior
  *    the integration spec's burst test exists for — the client's
  *    backoff-retry loop must absorb it;
  *  - every request's SigV4 signature is fully verified (same
  *    [[AwsSigV4]] math, server side); a mismatch is the live service's
  *    403 `InvalidSignatureException`, which the client must NOT retry.
  *
  * Reference behavior at stake: the GetRecords/GetShardIterator loop of
  * `kinesisReader/index.js:50-108` in the reference, which this engine's
  * transport re-expresses.
  *
  * Run (seeded, prints READY when bound):
  * {{{
  * sbt "Test/runMain graft.sources.KinesisDouble 4567 graft-it 2 6"
  * }}}
  * then in another process:
  * {{{
  * SPARK_GRAFT_KINESIS_ENDPOINT=http://127.0.0.1:4567 \
  * SPARK_GRAFT_KINESIS_STREAM=graft-it \
  * AWS_ACCESS_KEY_ID=x AWS_SECRET_ACCESS_KEY=x \
  * sbt "testOnly graft.sources.KinesisEndpointIntegrationSpec"
  * }}}
  *
  * `PutRecord` is implemented too, so the seeding flow of the spec's
  * docstring (create/put via CLI) has a wire-level equivalent. */
object KinesisDouble {

  private val mapper = new ObjectMapper()

  private final case class Rec(
      sequence: BigInt, tsMillis: Long, partitionKey: String, data: Array[Byte])

  private final class Shard(val shardId: String, seqBase: BigInt) {
    // Irregular, deterministic gaps: sequence i = base + Σ(7, 13, 19, ...)
    private var nextSeq: BigInt = seqBase
    val records = new java.util.concurrent.CopyOnWriteArrayList[Rec]()
    def append(pk: String, data: Array[Byte]): Rec = synchronized {
      nextSeq += BigInt(7) + BigInt(6) * records.size() + (nextSeq % 17)
      val r = Rec(nextSeq, System.currentTimeMillis(), pk, data)
      records.add(r); r
    }
    def start: BigInt = seqBase
  }

  private final class Stream(val name: String, nShards: Int) {
    val shards: Seq[Shard] = (0 until nShards).map { i =>
      new Shard(f"shardId-$i%012d",
        BigInt("49590338271490256608559692538361571095921575989136588800") +
          BigInt(i) * BigInt(10).pow(40))
    }
    def shardFor(pk: String): Shard =
      shards(math.abs(pk.hashCode) % shards.size)
    def shard(id: String): Option[Shard] = shards.find(_.shardId == id)
  }

  // GetShardIterator rate limit: kinesalite-style ~5/s/shard.
  private val iterCalls =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.ArrayDeque[Long]]()
  private def throttled(shardId: String): Boolean = {
    val q = iterCalls.computeIfAbsent(shardId, _ => new java.util.ArrayDeque[Long]())
    q.synchronized {
      val now = System.nanoTime()
      while (!q.isEmpty && now - q.peekFirst() > 1000000000L) q.pollFirst()
      if (q.size >= 5) {
        println(s"[double] THROTTLED GetShardIterator shard=$shardId " +
          "(>5 calls/s) -> ProvisionedThroughputExceededException")
        true
      } else { q.addLast(now); false }
    }
  }

  private def err(t: String, msg: String, status: Int = 400): (Int, String) =
    (status, s"""{"__type": "$t", "message": "$msg"}""")

  private def recJson(r: Rec): String =
    s"""{"SequenceNumber": "${r.sequence}",
       |"ApproximateArrivalTimestamp": ${r.tsMillis / 1000.0},
       |"PartitionKey": "${r.partitionKey}",
       |"Data": "${Base64.getEncoder.encodeToString(r.data)}"}""".stripMargin

  private def shardJson(s: Shard): String =
    s"""{"ShardId": "${s.shardId}",
       |"SequenceNumberRange": {"StartingSequenceNumber": "${s.start}"}}""".stripMargin

  private def iterToken(shardId: String, idx: Int): String =
    Base64.getEncoder.encodeToString(s"$shardId@$idx".getBytes(UTF_8))

  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(4567)
    val streamName = if (args.length > 1) args(1) else "graft-it"
    val nShards = if (args.length > 2) args(2).toInt else 2
    val nSeed = if (args.length > 3) args(3).toInt else 6
    val creds = AwsCredentials(
      sys.env.getOrElse("AWS_ACCESS_KEY_ID", "x"),
      sys.env.getOrElse("AWS_SECRET_ACCESS_KEY", "x"), None)
    val region = sys.env.getOrElse("AWS_REGION", "us-east-1")

    val stream = new Stream(streamName, nShards)
    // Deterministic seed corpus: every shard gets records whose payloads
    // name their position, so the spec's round-trip check has real bytes.
    stream.shards.zipWithIndex.foreach { case (sh, si) =>
      (0 until nSeed).foreach { i =>
        sh.append(s"pk-$si-$i", s"payload-$si-$i".getBytes(UTF_8))
      }
    }

    def verifySig(ex: HttpExchange, body: Array[Byte]): Option[(Int, String)] = {
      val h = ex.getRequestHeaders
      val got = Option(h.getFirst("Authorization")).getOrElse("")
      val amzDate = Option(h.getFirst("x-amz-date")).getOrElse("")
      val want = AwsSigV4.sign("POST", "/", Seq.empty,
        Seq("host" -> Option(h.getFirst("Host")).getOrElse(""),
          "content-type" -> Option(h.getFirst("Content-Type")).getOrElse(""),
          "x-amz-target" -> Option(h.getFirst("X-Amz-Target")).getOrElse("")),
        body, region, "kinesis", creds, amzDate)("Authorization")
      if (got != want)
        Some(err("InvalidSignatureException",
          "The request signature we calculated does not match", 403))
      else None
    }

    def handle(target: String, n: JsonNode): (Int, String) = target match {
      case "Kinesis_20131202.ListShards" =>
        val tok = Option(n.get("NextToken")).filter(!_.isNull).map(_.asText())
        val fromIdx = tok match {
          case Some(t) if t.startsWith("page-") => t.stripPrefix("page-").toInt
          case Some(_) => return err("InvalidArgumentException", "bad NextToken")
          case None =>
            val name = Option(n.get("StreamName")).map(_.asText()).getOrElse("")
            if (name != stream.name)
              return err("ResourceNotFoundException", s"Stream $name not found")
            0
        }
        // one shard per page: pagination is always exercised
        val page = stream.shards.slice(fromIdx, fromIdx + 1)
        val next =
          if (fromIdx + 1 < stream.shards.size)
            s""", "NextToken": "page-${fromIdx + 1}""""
          else ""
        (200, s"""{"Shards": [${page.map(shardJson).mkString(",")}]$next}""")

      case "Kinesis_20131202.GetShardIterator" =>
        val shardId = Option(n.get("ShardId")).map(_.asText()).getOrElse("")
        if (throttled(shardId))
          return err("ProvisionedThroughputExceededException",
            s"Rate exceeded for shard $shardId")
        val sh = stream.shard(shardId).getOrElse(
          return err("ResourceNotFoundException", s"Shard $shardId not found"))
        val recs = sh.records.asScala.toVector
        val idx = Option(n.get("ShardIteratorType")).map(_.asText()).getOrElse("") match {
          case "TRIM_HORIZON" => 0
          case "LATEST" => recs.length
          case "AT_TIMESTAMP" =>
            val tsMs = math.round(n.get("Timestamp").asDouble() * 1000.0)
            val i = recs.indexWhere(_.tsMillis >= tsMs)
            if (i < 0) recs.length else i
          case "AT_SEQUENCE_NUMBER" | "AFTER_SEQUENCE_NUMBER" =>
            val seq = BigInt(n.get("StartingSequenceNumber").asText())
            val at = recs.indexWhere(_.sequence == seq)
            if (at < 0)
              return err("InvalidArgumentException", s"unknown sequence $seq")
            if (n.get("ShardIteratorType").asText() == "AT_SEQUENCE_NUMBER") at
            else at + 1
          case other =>
            return err("InvalidArgumentException", s"iterator type $other")
        }
        (200, s"""{"ShardIterator": "${iterToken(shardId, idx)}"}""")

      case "Kinesis_20131202.GetRecords" =>
        val tok = new String(
          Base64.getDecoder.decode(n.get("ShardIterator").asText()), UTF_8)
        val Array(shardId, idxS) = tok.split('@')
        val sh = stream.shard(shardId).getOrElse(
          return err("ResourceNotFoundException", s"Shard $shardId gone"))
        val recs = sh.records.asScala.toVector
        val idx = idxS.toInt
        val limit = Option(n.get("Limit")).map(_.asInt()).getOrElse(10000)
        val page = recs.slice(idx, math.min(recs.length, idx + limit))
        val nextIdx = idx + page.length
        (200, s"""{"Records": [${page.map(recJson).mkString(",")}],
                 |"NextShardIterator": "${iterToken(shardId, nextIdx)}",
                 |"MillisBehindLatest": ${if (nextIdx >= recs.length) 0 else 1500}}"""
          .stripMargin)

      case "Kinesis_20131202.PutRecord" =>
        val name = Option(n.get("StreamName")).map(_.asText()).getOrElse("")
        if (name != stream.name)
          return err("ResourceNotFoundException", s"Stream $name not found")
        val pk = n.get("PartitionKey").asText()
        val data = Base64.getDecoder.decode(n.get("Data").asText())
        val sh = stream.shardFor(pk)
        val r = sh.append(pk, data)
        (200, s"""{"ShardId": "${sh.shardId}", "SequenceNumber": "${r.sequence}"}""")

      case other =>
        err("UnknownOperationException", other)
    }

    val server = HttpServer.create(new java.net.InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", (ex: HttpExchange) => {
      val body = ex.getRequestBody.readAllBytes()
      val (status, resp) =
        try verifySig(ex, body).getOrElse {
          val target =
            Option(ex.getRequestHeaders.getFirst("X-Amz-Target")).getOrElse("")
          handle(target, mapper.readTree(new String(body, UTF_8)))
        } catch {
          case e: Exception =>
            (500, s"""{"__type": "InternalFailure", "message": "${e.getMessage}"}""")
        }
      val out = resp.getBytes(UTF_8)
      ex.getResponseHeaders.set("Content-Type", "application/x-amz-json-1.1")
      ex.sendResponseHeaders(status, out.length)
      ex.getResponseBody.write(out)
      ex.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    println(s"READY http://127.0.0.1:$port stream=$streamName " +
      s"shards=$nShards records/shard=$nSeed")
    Thread.currentThread().join() // serve until killed
  }
}
