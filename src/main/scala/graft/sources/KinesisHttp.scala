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
  * Wire→seam position mapping: the [[ShardBackend]] seam uses monotonic
  * longs; REAL Kinesis sequence numbers are 186-bit decimals whose
  * high-order bits encode ingestion time, so `sequence − base` deltas do
  * NOT fit a long on a live stream (they are ~10³⁸). Positions here are
  * therefore ORDINALS — record index from the shard's readable start —
  * assigned by counting as pages arrive. Each served page records an
  * ANCHOR (`position after the page` → `last record's real sequence
  * string`), so a later range read at position `from` resumes with
  * `AFTER_SEQUENCE_NUMBER` of the nearest anchor at-or-below `from` (the
  * seam's range filter drops the ≤ page-size overlap). Anchors live in
  * the PROCESS-WIDE [[KinesisAnchorStore]] — never per-instance, because
  * the DSv2 reader constructs a fresh backend per partition per
  * micro-batch — and, when an `anchorDir` is configured (the micro-batch
  * scan injects `<checkpointLocation>/graft-anchors`), they are
  * snapshotted to durable storage so a RESTARTED process also resumes
  * positioned. Only when no anchor exists anywhere (first contact, or a
  * resume below the eviction horizon) does a read fall back to one
  * TRIM_HORIZON re-enumeration + range filter — correct while the
  * shard's readable start is where the committed ordinals started, but
  * if retention TRIMMED the shard in between, the re-counted ordinals
  * shift relative to the committed offsets; the fallback therefore logs
  * a data-integrity warning naming that hazard (a persisted anchor is
  * immune: `AFTER_SEQUENCE_NUMBER` is stream-absolute). Anchor maps are
  * bounded (oldest positions evicted) and the iterator→state map is a
  * bounded LRU, so a long-lived driver's footprint stays O(1) per shard.
  *
  * AT_TIMESTAMP iterators own a DISTINCT position space (their zero is
  * the timestamp point, not the readable start), so pages served through
  * them never write resume anchors — a positioned ordinal resume must
  * not floor onto a timestamp-space anchor whose real sequence is far
  * ahead (records before the resume point would be silently skipped).
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
    maxRetries: Int = 8,
    anchorDir: Option[String] = None,
    anchorPersistEvery: Int = 16,
    maxAnchorsPerShard: Int = 8192) extends KinesisDataApi {

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
  /** Per-token state: the stream/shard, the ordinal position of the next
    * record the iterator will yield, the anchor store pages should write
    * into (`None` for AT_TIMESTAMP-derived iterators, whose position
    * space must never pollute the ordinal resume anchors), the REAL
    * sequence string of the last record this iterator LINEAGE consumed
    * (the exact `AFTER_SEQUENCE_NUMBER` re-acquire point when the server
    * expires the token mid-drain — seeded with the resume anchor for
    * positioned lineages), and the original AT_TIMESTAMP point for
    * timestamp lineages that expire before consuming anything. */
  private final case class IterState(
      streamName: String, shardId: String, nextPos: Long,
      anchors: Option[KinesisAnchorStore.ShardAnchors],
      lastSeq: Option[String], atTimestampMs: Option[Long])

  /** live iterator token → [[IterState]]. Tokens are opaque, so GetRecords
    * responses must be attributed here. BOUNDED LRU: latestPosition probes
    * and early-exiting reads legitimately abandon their final token
    * (nobody ever consumes it), so an unbounded map would leak one entry
    * per shard per trigger on a long-lived driver; evicted tokens would
    * have expired server-side (5-minute iterator TTL) long before the cap
    * is reached. */
  @transient private lazy val iteratorState =
    java.util.Collections.synchronizedMap(
      new java.util.LinkedHashMap[String, IterState](64, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[String, IterState]): Boolean =
          size() > 4096
      })

  private def anchorsFor(streamName: String, shardId: String) =
    KinesisAnchorStore.forShard(
      KinesisAnchorStore.Key(endpoint, streamName, shardId, anchorDir),
      maxAnchorsPerShard, anchorPersistEvery)

  private val RetryableTypes = Set(
    "ProvisionedThroughputExceededException", "ThrottlingException",
    "LimitExceededException", "ServiceUnavailableException")

  /** GetShardIterator error types that mean the POSITION is gone (anchor
    * aged past retention, crossed a reshard, or the parent shard was
    * deleted) rather than a transient failure: only these fall back to a
    * TRIM_HORIZON re-enumeration. Throttles/5xx already retried in
    * [[post]]; anything else (auth, serialization) must propagate. */
  private val PositionGoneTypes = Set(
    "InvalidArgumentException", "ResourceNotFoundException")

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
        throw new KinesisApiException(errType,
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

  private def metaOf(streamName: String, shardId: String): ShardInfo =
    Option(shardMeta.get(shardId)).getOrElse {
      listShardInfos(streamName)
      Option(shardMeta.get(shardId)).getOrElse(
        sys.error(s"shard $shardId not found in stream $streamName"))
    }

  private def register(token: String, st: IterState): String = {
    iteratorState.put(token, st); token
  }

  override def listShards(streamName: String): Seq[String] =
    listShardInfos(streamName).map(_.shardId)

  /** Reshard lineage straight off the ListShards wire shape: a child is
    * held by [[ReshardAdmission]] until its `ParentShardId` /
    * `AdjacentParentShardId` ancestors (closed ⇔ `EndingSequenceNumber`
    * present) are fully consumed. */
  override def listShardMetas(streamName: String): Seq[ShardMeta] =
    listShardInfos(streamName).map(_.toMeta)

  /** TRIM_HORIZON iterators start the ordinal position space at 0. An
    * AT_TIMESTAMP iterator (API completeness; the seam's backends resume
    * by position, not timestamp) also numbers from 0 — ITS zero is the
    * timestamp point, a DISTINCT position space the caller owns, so its
    * pages never write resume anchors (an ordinal resume flooring onto a
    * timestamp-space anchor would skip records before the resume point). */
  override def getShardIterator(streamName: String, shardId: String,
                                atTimestampMs: Option[Long]): String = {
    metaOf(streamName, shardId) // ensure shard metadata before records flow
    val (body, anchorSink) = atTimestampMs match {
      case Some(ts) => (obj("StreamName" -> streamName, "ShardId" -> shardId,
        "ShardIteratorType" -> "AT_TIMESTAMP", "Timestamp" -> ts / 1000.0),
        None)
      case None => (obj("StreamName" -> streamName, "ShardId" -> shardId,
        "ShardIteratorType" -> "TRIM_HORIZON"),
        Some(anchorsFor(streamName, shardId)))
    }
    register(
      parseShardIterator(post("Kinesis_20131202.GetShardIterator", body)),
      IterState(streamName, shardId, nextPos = 0L, anchorSink,
        lastSeq = None, atTimestampMs = atTimestampMs))
  }

  override def getShardIteratorAtSequence(streamName: String, shardId: String,
                                          sequence: Long): String = {
    if (sequence <= 0L) return getShardIterator(streamName, shardId, None)
    metaOf(streamName, shardId)
    val store = anchorsFor(streamName, shardId)
    // Nearest anchor at-or-below the requested position: resume with
    // AFTER_SEQUENCE_NUMBER of the real sequence recorded there; the
    // caller's range filter drops the ≤ page-size overlap. The store is
    // process-wide and (with anchorDir) snapshot-backed, so fresh
    // per-partition backend instances AND restarted processes resume
    // positioned — only a resume below the eviction horizon, or a truly
    // anchorless shard, pays the TRIM_HORIZON fallback.
    store.floor(sequence) match {
      case Some((anchorPos, anchorSeq)) =>
        val body = obj("StreamName" -> streamName, "ShardId" -> shardId,
          "ShardIteratorType" -> "AFTER_SEQUENCE_NUMBER",
          "StartingSequenceNumber" -> anchorSeq)
        try register(
          parseShardIterator(post("Kinesis_20131202.GetShardIterator", body)),
          IterState(streamName, shardId, nextPos = anchorPos, Some(store),
            lastSeq = Some(anchorSeq), atTimestampMs = None))
        catch {
          // ONLY a genuine position rejection falls back to TRIM_HORIZON
          // (the anchor aged past retention, crossed a reshard, or the
          // parent shard was deleted — the documented non-transient
          // GetShardIterator failures): a transient transport/throttle
          // failure must propagate and fail the batch — a blanket
          // fallback would silently convert a cheap positioned read into
          // a full-shard drain.
          case e: KinesisApiException
              if PositionGoneTypes(e.errorType) =>
            System.err.println(
              s"[graft] kinesis: resume anchor for $shardId rejected " +
                s"(${e.errorType}); re-enumerating from TRIM_HORIZON once. " +
                "WARNING: if retention trimmed this shard since the offsets " +
                "were committed, re-counted ordinals are SHIFTED vs the " +
                "committed positions — records may be skipped; re-seed the " +
                "query from a fresh checkpoint if exactness is required")
            getShardIterator(streamName, shardId, None)
        }
      case None =>
        // No anchor anywhere (first contact with this shard, snapshot
        // missing, or resume below the eviction horizon): one
        // re-enumeration from the shard's readable start; the range
        // filter re-aligns. Correct only while the readable start is
        // where the committed ordinal space started — hence the loud
        // warning about retention trimming.
        System.err.println(
          s"[graft] kinesis: no resume anchor for $shardId@$sequence " +
            "(fresh process without a persisted snapshot, or resume below " +
            "the anchor-eviction horizon); re-enumerating from TRIM_HORIZON " +
            "once. WARNING: if retention trimmed this shard since the " +
            "offsets were committed, re-counted ordinals are SHIFTED vs the " +
            "committed positions — records may be skipped; configure " +
            "anchorDir (on by default under a checkpoint) to avoid this path")
        getShardIterator(streamName, shardId, None)
    }
  }

  /** Always None: positions are ORDINALS, and a sequence-range span from
    * shard metadata equals an ordinal count only when sequences are dense
    * from the base — never true of real Kinesis sequences (time in high
    * bits, span ~10³⁸) and not guaranteed by any wire transcript. The
    * seam's bounded drain, resumed from committed offsets, counts
    * ordinals instead; adapters whose sequences ARE dense ordinals by
    * construction (the in-memory stubs) implement their own fast path. */
  override def latestSequence(streamName: String, shardId: String): Option[Long] =
    None

  /** Re-acquire an iterator for an EXPIRED token's lineage, positioned
    * exactly where the expired one was. Real iterators expire 5 minutes
    * after issuance — any pause between acquiring and consuming (GC,
    * backpressure, a slow micro-batch, a driver checkpoint stall) hits
    * this on a live stream, and the reference's core loop simply keeps
    * reading (`kinesisReader/index.js:84-108`); the data is still there,
    * so this must NOT fall back to TRIM_HORIZON re-enumeration when the
    * lineage has a consumed position. Resume point, in order:
    * `AFTER_SEQUENCE_NUMBER` of the lineage's last-consumed real sequence
    * (exact — no duplicate, no gap); else the lineage's own start
    * position (AT_TIMESTAMP point, or TRIM_HORIZON) when nothing was
    * consumed yet — also exact, `nextPos` is still the start. */
  private def reacquireExpired(st: IterState): String = {
    val body = st.lastSeq match {
      case Some(seq) =>
        obj("StreamName" -> st.streamName, "ShardId" -> st.shardId,
          "ShardIteratorType" -> "AFTER_SEQUENCE_NUMBER",
          "StartingSequenceNumber" -> seq)
      case None => st.atTimestampMs match {
        case Some(ts) =>
          obj("StreamName" -> st.streamName, "ShardId" -> st.shardId,
            "ShardIteratorType" -> "AT_TIMESTAMP", "Timestamp" -> ts / 1000.0)
        case None =>
          obj("StreamName" -> st.streamName, "ShardId" -> st.shardId,
            "ShardIteratorType" -> "TRIM_HORIZON")
      }
    }
    parseShardIterator(post("Kinesis_20131202.GetShardIterator", body))
  }

  override def getRecords(iterator: String, limit: Int)
      : (Seq[ShardRecord], Option[String], Long) = {
    val st = Option(iteratorState.remove(iterator)).getOrElse(
      sys.error("getRecords called with an iterator this transport did not issue"))
    // Expired-iterator recovery: re-acquire from the lineage's own state
    // and retry — bounded (a freshly re-acquired token expiring again
    // means the pause is systemic; propagate rather than spin).
    var token = iterator
    var page: KinesisWireJson.GetRecordsPage = null
    var expiries = 0
    while (page == null) {
      try page = parseGetRecords(post("Kinesis_20131202.GetRecords",
        obj("ShardIterator" -> token, "Limit" -> limit)))
      catch {
        case e: KinesisApiException
            if e.errorType == "ExpiredIteratorException" && expiries < 2 =>
          expiries += 1
          System.err.println(
            s"[graft] kinesis: iterator for ${st.shardId} expired " +
              s"(server-side TTL); re-acquiring at " +
              st.lastSeq.fold("the lineage start")(s =>
                s"AFTER_SEQUENCE_NUMBER $s") + " and resuming")
          token = reacquireExpired(st)
      }
    }
    val records = page.records.zipWithIndex.map { case (w, i) =>
      ShardRecord(st.nextPos + i, w.tsMillis, w.partitionKey, w.data)
    }
    val nextPos = st.nextPos + page.records.size
    // One anchor per served page: to resume at `nextPos`, continue AFTER
    // the page's last real sequence. Ordinal-space iterators only —
    // AT_TIMESTAMP pages (anchors = None) must not write into the resume
    // space. Eviction + durable snapshotting live in the store.
    for (store <- st.anchors; last <- page.records.lastOption)
      store.record(nextPos, last.sequence.toString)
    // the lineage's last-consumed sequence rides every page turn, so a
    // LATER expiry re-acquires exactly after what this page consumed
    val lastSeq = page.records.lastOption
      .map(_.sequence.toString).orElse(st.lastSeq)
    (records,
      page.nextShardIterator.map(register(_,
        st.copy(nextPos = nextPos, lastSeq = lastSeq))),
      page.millisBehindLatest)
  }
}

/** A non-2xx (or retry-exhausted) Kinesis API response, carrying the
  * AWS error type (`__type` tail) so callers can distinguish a genuine
  * position rejection from a transient transport failure. */
final class KinesisApiException(val errorType: String, msg: String)
    extends java.io.IOException(msg)

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
      region, creds,
      // `anchorDir` is injected by the micro-batch scan as
      // `<checkpointLocation>/graft-anchors` (overridable); anchors then
      // survive process restarts wherever the checkpoint survives.
      anchorDir = options.get("anchorDir").filter(_.nonEmpty),
      anchorPersistEvery = options.getOrElse("anchorPersistEvery", "16").toInt,
      maxAnchorsPerShard =
        options.getOrElse("maxAnchorsPerShard", "8192").toInt),
    options.getOrElse("streamName",
      sys.error("kinesis http backend: missing streamName")),
    pageSize = options.getOrElse("maxRecordsPerFetch", "1000").toInt)
  override def listShards(): Seq[String] = inner.listShards()
  override def shardMetas(): Seq[ShardMeta] = inner.shardMetas()
  override def latestPosition(shard: String): Long = inner.latestPosition(shard)
  override def latestPosition(shard: String, resumeFrom: Long): Long =
    inner.latestPosition(shard, resumeFrom)
  override def read(shard: String, from: Long, until: Long): Seq[ShardRecord] =
    inner.read(shard, from, until)
}
