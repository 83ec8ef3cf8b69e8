package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.ObjectMapper

/** LIVE transport for the Kinesis source: a [[KinesisDataApi]] speaking the
  * public `Kinesis_20131202` JSON protocol (`application/x-amz-json-1.1`
  * POSTs dispatched by `X-Amz-Target`, SigV4-signed — the same wire
  * conversation the reference's SDK client holds, `kinesisReader/
  * index.js:19-27,77-108`) over the JDK's `java.net.http.HttpClient`.
  * Everything here is from public documentation: the protocol shape, the
  * header set, the error-type names. Zero AWS SDK dependency — the bodies
  * decode through the same [[KinesisWireJson]] path the recorded-replay
  * backend uses, so the field mapping is one spec-pinned code path however
  * the bytes arrive.
  *
  * Wire→seam position mapping (restart-stable): the [[ShardBackend]] seam
  * uses monotonic longs; Kinesis sequence numbers are 128-bit decimals.
  * Each shard's `SequenceNumberRange.StartingSequenceNumber` (a constant
  * for the shard's lifetime, from ListShards metadata) is the base, and a
  * record's position is `sequence − base` — the same normalization the
  * recorded backend applies, but anchored to service metadata so committed
  * offsets mean the same thing across driver restarts. Range reads resume
  * with `AFTER_SEQUENCE_NUMBER(base + from − 1)` (the caller's `from` is
  * always one past a previously observed record), falling back to
  * TRIM_HORIZON + the seam's range filter if the service rejects the
  * position (e.g. aged past the retention window).
  *
  * Throttling: `GetRecords` is limited per shard per second; throttled
  * calls surface as `ProvisionedThroughputExceededException` /
  * `ThrottlingException` (HTTP 400) or 5xx. Those retry on a bounded
  * exponential backoff; anything else propagates (the micro-batch fails
  * and retries rather than committing a partial range — see
  * [[KinesisShardBackend.read]]'s loss contract).
  */
final class KinesisHttpApi(
    endpoint: String,
    region: String,
    creds: AwsCredentials,
    maxRetries: Int = 8) extends KinesisDataApi {

  import KinesisWireJson._

  @transient private lazy val client =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
  @transient private lazy val mapper = new ObjectMapper()
  @transient private lazy val uri = java.net.URI.create(
    if (endpoint.endsWith("/")) endpoint.dropRight(1) else endpoint)

  /** shardId → metadata, from the last ListShards sweep. */
  @transient private lazy val shardMeta =
    new java.util.concurrent.ConcurrentHashMap[String, ShardInfo]()
  /** live iterator token → its shard (tokens are opaque; GetRecords
    * responses must be attributed to a shard for the base subtraction).
    * Entries are consumed on use and replaced by the next token, so the
    * map stays O(in-flight iterators). */
  @transient private lazy val iteratorShard =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private val RetryableTypes = Set(
    "ProvisionedThroughputExceededException", "ThrottlingException",
    "LimitExceededException", "ServiceUnavailableException")

  private def hostHeader: String =
    uri.getHost + (if (uri.getPort != -1) s":${uri.getPort}" else "")

  private[sources] def post(target: String, body: String): String = {
    val payload = body.getBytes(UTF_8)
    var attempt = 0
    while (true) {
      val amzDate = AwsSigV4.amzDateOf(java.time.Instant.now())
      val baseHeaders = Seq(
        "host" -> hostHeader,
        "content-type" -> "application/x-amz-json-1.1",
        "x-amz-target" -> target)
      val signed = AwsSigV4.sign("POST", "/", Seq.empty, baseHeaders, payload,
        region, "kinesis", creds, amzDate)
      val b = java.net.http.HttpRequest.newBuilder(uri.resolve("/"))
        .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(payload))
        .header("Content-Type", "application/x-amz-json-1.1")
        .header("X-Amz-Target", target)
      signed.foreach { case (k, v) => b.header(k, v) }
      val (status, respBody) =
        try {
          val resp = client.send(b.build(),
            java.net.http.HttpResponse.BodyHandlers.ofString())
          (resp.statusCode(), resp.body())
        } catch {
          case e: java.io.IOException => (-1, e.toString) // retryable transport
        }
      if (status == 200) return respBody
      val errType =
        try Option(mapper.readTree(respBody).get("__type"))
          .map(_.asText().split('#').last).getOrElse("")
        catch { case _: Exception => "" }
      val retryable = status == -1 || status >= 500 || RetryableTypes(errType)
      if (!retryable || attempt >= maxRetries)
        throw new java.io.IOException(
          s"$target failed (HTTP $status${if (errType.nonEmpty) s", $errType" else ""}) " +
            s"after ${attempt + 1} attempt(s): ${respBody.take(300)}")
      Thread.sleep(math.min(100L << attempt, 3200L)) // bounded backoff
      attempt += 1
    }
    throw new IllegalStateException("unreachable")
  }

  private def obj(fields: (String, Any)*): String = {
    val n = mapper.createObjectNode()
    fields.foreach {
      case (k, v: String) => n.put(k, v)
      case (k, v: Int) => n.put(k, v)
      case (k, v: Long) => n.put(k, v)
      case (k, v: Double) => n.put(k, v)
      case (k, v) => n.put(k, String.valueOf(v))
    }
    mapper.writeValueAsString(n)
  }

  /** Full ListShards sweep (paged on NextToken), refreshing the shard
    * metadata map. */
  private def listShardInfos(streamName: String): Seq[ShardInfo] = {
    var out = Vector.empty[ShardInfo]
    var token: Option[String] = None
    var first = true
    while (first || token.isDefined) {
      first = false
      val body = token match {
        case Some(t) => obj("NextToken" -> t)
        case None => obj("StreamName" -> streamName)
      }
      val (shards, next) =
        parseListShardsPage(post("Kinesis_20131202.ListShards", body))
      shards.foreach(s => shardMeta.put(s.shardId, s))
      out ++= shards
      token = next
    }
    out
  }

  private def baseOf(streamName: String, shardId: String): BigInt = {
    val meta = Option(shardMeta.get(shardId)).getOrElse {
      listShardInfos(streamName)
      Option(shardMeta.get(shardId)).getOrElse(
        sys.error(s"shard $shardId not found in stream $streamName"))
    }
    meta.startingSequence
  }

  private def register(token: String, shardId: String): String = {
    iteratorShard.put(token, shardId); token
  }

  override def listShards(streamName: String): Seq[String] =
    listShardInfos(streamName).map(_.shardId)

  override def getShardIterator(streamName: String, shardId: String,
                                atTimestampMs: Option[Long]): String = {
    baseOf(streamName, shardId) // ensure metadata before records flow
    val body = atTimestampMs match {
      case Some(ts) => obj("StreamName" -> streamName, "ShardId" -> shardId,
        "ShardIteratorType" -> "AT_TIMESTAMP", "Timestamp" -> ts / 1000.0)
      case None => obj("StreamName" -> streamName, "ShardId" -> shardId,
        "ShardIteratorType" -> "TRIM_HORIZON")
    }
    register(
      parseShardIterator(post("Kinesis_20131202.GetShardIterator", body)),
      shardId)
  }

  override def getShardIteratorAtSequence(streamName: String, shardId: String,
                                          sequence: Long): String = {
    if (sequence <= 0L) return getShardIterator(streamName, shardId, None)
    val seq = (baseOf(streamName, shardId) + BigInt(sequence - 1)).toString
    val body = obj("StreamName" -> streamName, "ShardId" -> shardId,
      "ShardIteratorType" -> "AFTER_SEQUENCE_NUMBER",
      "StartingSequenceNumber" -> seq)
    try register(
      parseShardIterator(post("Kinesis_20131202.GetShardIterator", body)),
      shardId)
    catch {
      case _: java.io.IOException =>
        // position rejected (typically trimmed past retention): fall back
        // to TRIM_HORIZON; the seam's range filter re-aligns, at the
        // documented O(shard-prefix) cost for this one recovery read.
        getShardIterator(streamName, shardId, None)
    }
  }

  override def latestSequence(streamName: String, shardId: String): Option[Long] =
    Option(shardMeta.get(shardId)).flatMap(_.endingSequence).map { end =>
      // a CLOSED shard's metadata answers the backlog end in O(1):
      // one past the last sequence the shard will ever hold.
      val rel = end - baseOf(streamName, shardId) + 1
      require(rel.isValidLong,
        s"shard $shardId sequence span exceeds the seam's long positions")
      rel.toLong
    }

  override def getRecords(iterator: String, limit: Int)
      : (Seq[ShardRecord], Option[String], Long) = {
    val shardId = Option(iteratorShard.remove(iterator)).getOrElse(
      sys.error("getRecords called with an iterator this transport did not issue"))
    val base = Option(shardMeta.get(shardId)).map(_.startingSequence).getOrElse(
      sys.error(s"no metadata for shard $shardId"))
    val page = parseGetRecords(post("Kinesis_20131202.GetRecords",
      obj("ShardIterator" -> iterator, "Limit" -> limit)))
    val records = page.records.map { w =>
      val rel = w.sequence - base
      require(rel.signum >= 0 && rel.isValidLong,
        s"sequence ${w.sequence} outside shard $shardId's long-position span")
      ShardRecord(rel.toLong, w.tsMillis, w.partitionKey, w.data)
    }
    (records, page.nextShardIterator.map(register(_, shardId)),
      page.millisBehindLatest)
  }
}

/** [[ShardBackend]] over the live HTTP transport, loadable by class name
  * through the `backend` option (see [[BackendSpec]]):
  *
  * {{{
  * spark.readStream.format(KplFileSource.Provider)
  *   .option("backend", classOf[KinesisHttpBackend].getName)
  *   .option("endpoint", "https://kinesis.us-east-1.amazonaws.com")
  *   .option("region", "us-east-1")
  *   .option("streamName", "my-stream")
  *   .option("accessKeyId", ...).option("secretAccessKey", ...)
  * }}}
  *
  * Credentials come from options or the standard public AWS environment
  * variables. Each executor partition constructs its own instance (the
  * HTTP client and iterator state are per-instance and never serialized). */
final class KinesisHttpBackend(options: Map[String, String]) extends ShardBackend {
  private def opt(k: String, env: String): Option[String] =
    options.get(k).orElse(sys.env.get(env))
  private val creds = AwsCredentials(
    accessKeyId = opt("accessKeyId", "AWS_ACCESS_KEY_ID").getOrElse(
      sys.error("kinesis http backend: missing accessKeyId")),
    secretAccessKey = opt("secretAccessKey", "AWS_SECRET_ACCESS_KEY").getOrElse(
      sys.error("kinesis http backend: missing secretAccessKey")),
    sessionToken = opt("sessionToken", "AWS_SESSION_TOKEN"))
  private val region = options.getOrElse("region", "us-east-1")
  private val inner = new KinesisShardBackend(
    new KinesisHttpApi(
      options.getOrElse("endpoint", s"https://kinesis.$region.amazonaws.com"),
      region, creds),
    options.getOrElse("streamName",
      sys.error("kinesis http backend: missing streamName")),
    pageSize = options.getOrElse("maxRecordsPerFetch", "1000").toInt)
  override def listShards(): Seq[String] = inner.listShards()
  override def latestPosition(shard: String): Long = inner.latestPosition(shard)
  override def latestPosition(shard: String, resumeFrom: Long): Long =
    inner.latestPosition(shard, resumeFrom)
  override def read(shard: String, from: Long, until: Long): Seq[ShardRecord] =
    inner.read(shard, from, until)
}
