package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Decoders for the AWS Kinesis data-plane WIRE shape — the JSON bodies of
  * ListShards / GetShardIterator / GetRecords responses exactly as the AWS
  * JSON protocol puts them on the wire (and exactly as the reference's SDK
  * client surfaces them, documented inline at `kinesisReader/index.js:50-66`
  * and consumed at `:29,40,98-104`):
  *
  *  - `Records[].Data` — base64 string → bytes
  *  - `Records[].SequenceNumber` — decimal STRING (Kinesis sequence numbers
  *    are 128-bit; they do not fit a long) → `BigInt`
  *  - `Records[].ApproximateArrivalTimestamp` — epoch SECONDS as a double
  *    (the AWS JSON protocol's timestamp encoding) → epoch millis
  *  - `Records[].PartitionKey` — string, verbatim
  *  - `NextShardIterator` — absent/null ⇔ the shard is CLOSED (a reshard
  *    ended it); present ⇔ keep paging
  *  - `MillisBehindLatest` — 0 ⇔ caught up (the reference's catch-up
  *    termination signal)
  *
  * Keeping the decode at the wire level means an SDK adapter is nothing but
  * transport: however the bytes arrive (AWS SDK v2, raw HTTPS, a recorded
  * fixture), the field mapping proven by `KinesisWireSpec` is this one code
  * path. No AWS dependency is involved — the shapes are the public API
  * documentation's. */
object KinesisWireJson {

  private val mapper = new ObjectMapper()

  /** One record as decoded off the wire. `sequence` stays a BigInt here;
    * see [[RecordedKinesisApi]] for the monotonic-long normalization the
    * [[ShardBackend]] seam wants. */
  final case class WireRecord(
      sequence: BigInt,
      tsMillis: Long,
      partitionKey: String,
      data: Array[Byte])

  /** A decoded GetRecords page. */
  final case class GetRecordsPage(
      records: Seq[WireRecord],
      nextShardIterator: Option[String],
      millisBehindLatest: Long)

  private def node(json: String): JsonNode = mapper.readTree(json)

  private def req(n: JsonNode, field: String, ctx: String): JsonNode = {
    val v = n.get(field)
    require(v != null && !v.isNull, s"$ctx: missing required field '$field'")
    v
  }

  /** `{"Shards": [{"ShardId": ...}, ...]}` → shard ids, in listed order. */
  def parseListShards(json: String): Seq[String] = {
    val shards = req(node(json), "Shards", "ListShards response")
    shards.elements().asScala
      .map(s => req(s, "ShardId", "ListShards.Shards[]").asText())
      .toSeq
  }

  /** One ListShards shard entry with the metadata a live adapter needs:
    * the stable per-shard `SequenceNumberRange.StartingSequenceNumber`
    * (the base of the wire→seam long normalization — constant for the
    * shard's lifetime, so positions are restart-stable); for CLOSED
    * shards only, the `EndingSequenceNumber` (the O(1) backlog-end
    * metadata answer — its presence IS the closed flag); and the reshard
    * lineage (`ParentShardId`, plus `AdjacentParentShardId` on a merge
    * child) that drives parent-before-child admission
    * ([[ReshardAdmission]]). */
  final case class ShardInfo(
      shardId: String,
      startingSequence: BigInt,
      endingSequence: Option[BigInt],
      parentIds: Seq[String] = Nil) {
    def closed: Boolean = endingSequence.isDefined
    def toMeta: ShardMeta = ShardMeta(shardId, parentIds, closed)
  }

  /** ListShards page with pagination: `(shards, NextToken)`. The live
    * transport loops until `NextToken` is absent (the service pages at
    * 1000 shards — at production shard counts a single page is NOT the
    * common case). */
  def parseListShardsPage(json: String): (Seq[ShardInfo], Option[String]) = {
    val n = node(json)
    val shards = req(n, "Shards", "ListShards response").elements().asScala.map { s =>
      val range = req(s, "SequenceNumberRange", "ListShards.Shards[]")
      def optText(field: String): Option[String] =
        Option(s.get(field)).filter(!_.isNull).map(_.asText()).filter(_.nonEmpty)
      ShardInfo(
        shardId = req(s, "ShardId", "ListShards.Shards[]").asText(),
        startingSequence =
          BigInt(req(range, "StartingSequenceNumber", "SequenceNumberRange").asText()),
        endingSequence = Option(range.get("EndingSequenceNumber"))
          .filter(!_.isNull).map(e => BigInt(e.asText())),
        parentIds =
          (optText("ParentShardId") ++ optText("AdjacentParentShardId")).toSeq)
    }.toSeq
    (shards, Option(n.get("NextToken")).filter(!_.isNull).map(_.asText()))
  }

  /** `{"ShardIterator": "..."}` → the opaque iterator token. */
  def parseShardIterator(json: String): String =
    req(node(json), "ShardIterator", "GetShardIterator response").asText()

  /** Decode one GetRecords response body. */
  def parseGetRecords(json: String): GetRecordsPage = {
    val n = node(json)
    val records = req(n, "Records", "GetRecords response").elements().asScala.map { r =>
      val seq = BigInt(req(r, "SequenceNumber", "Records[]").asText())
      // AWS JSON protocol timestamps are epoch seconds with fractional part
      val tsSec = req(r, "ApproximateArrivalTimestamp", "Records[]").asDouble()
      WireRecord(
        sequence = seq,
        tsMillis = math.round(tsSec * 1000.0),
        partitionKey = req(r, "PartitionKey", "Records[]").asText(),
        data = java.util.Base64.getDecoder.decode(req(r, "Data", "Records[]").asText()))
    }.toSeq
    val next = Option(n.get("NextShardIterator")).filter(!_.isNull).map(_.asText())
    val behind = req(n, "MillisBehindLatest", "GetRecords response").asLong()
    GetRecordsPage(records, next, behind)
  }
}

/** [[KinesisDataApi]] over RECORDED wire responses — a directory of JSON
  * bodies captured from (or authored in the shape of) the real service:
  *
  * {{{
  *   <dir>/list_shards.json            ListShards response
  *   <dir>/<shardId>/page-000.json     consecutive GetRecords responses,
  *   <dir>/<shardId>/page-001.json     in paging order
  *   ...
  * }}}
  *
  * Replay semantics, chosen to preserve exactly what a live adapter sees:
  *
  *  - Iterator tokens are session-bound opaque strings in the real service,
  *    so replay issues its OWN tokens (`shard#pageIdx`); the RECORDED
  *    `NextShardIterator` contributes only its null-ness — a recorded null
  *    marks the shard closed, ending the chain exactly where the live
  *    session ended it.
  *  - `SequenceNumber`s are 128-bit decimals; the [[ShardBackend]] seam
  *    wants a monotonic long per shard. Replay normalizes by subtracting
  *    the shard's first recorded sequence (gaps preserved — Kinesis
  *    sequences are monotonic but NOT dense, per the public API contract).
  *  - AT_TIMESTAMP / AT_SEQUENCE_NUMBER iterators bisect the recorded pages
  *    the way the service would position them: first page whose tail
  *    reaches the requested point.
  *
  * Constructible through [[BackendSpec]]'s reflective path via
  * [[RecordedKinesisBackend]], so the full DSv2 scan — partitions, offsets,
  * checkpoint recovery — runs over a recorded wire session with zero AWS
  * dependency. */
final class RecordedKinesisApi(dir: String) extends KinesisDataApi {
  import KinesisWireJson._

  private def readFile(p: Path): String = new String(Files.readAllBytes(p), "UTF-8")

  private val shards: Seq[String] =
    parseListShards(readFile(Paths.get(dir, "list_shards.json")))

  /** shard → decoded pages, in recorded order. */
  private val pages: Map[String, IndexedSeq[GetRecordsPage]] =
    shards.map { s =>
      val shardDir = Paths.get(dir, s)
      val files =
        if (Files.isDirectory(shardDir)) {
          val stream = Files.list(shardDir)
          try stream.iterator().asScala
            .filter(_.getFileName.toString.matches("page-\\d+\\.json"))
            .toSeq.sortBy(_.getFileName.toString)
          finally stream.close()
        } else Seq.empty
      s -> files.map(f => parseGetRecords(readFile(f))).toIndexedSeq
    }.toMap

  /** Per-shard sequence base for the wire→seam normalization. */
  private val seqBase: Map[String, BigInt] =
    pages.map { case (s, ps) =>
      s -> ps.flatMap(_.records).headOption.map(_.sequence).getOrElse(BigInt(0))
    }

  private def toShardRecord(shard: String)(w: WireRecord): ShardRecord = {
    val rel = w.sequence - seqBase(shard)
    require(rel.isValidLong, s"recorded sequence span too large on $shard")
    ShardRecord(rel.toLong, w.tsMillis, w.partitionKey, w.data)
  }

  override def listShards(streamName: String): Seq[String] = shards

  /** Lineage from the recorded listing (lenient — recorded fixtures may
    * omit `SequenceNumberRange`): parents from `ParentShardId` /
    * `AdjacentParentShardId` when present; closed from the recorded
    * `EndingSequenceNumber` OR from replay's own closed signal (the last
    * recorded page's null `NextShardIterator`), whichever the session
    * captured. */
  override def listShardMetas(streamName: String): Seq[ShardMeta] = shardMetaList

  // Parsed ONCE per recording like the sibling vals: listShardMetas sits
  // on the latestOffset trigger hot path, and the recorded listing is
  // immutable for the session's lifetime.
  private lazy val shardMetaList: Seq[ShardMeta] = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(readFile(Paths.get(dir, "list_shards.json")))
    val byId = Option(root.get("Shards")).toSeq
      .flatMap(_.elements().asScala).map { s =>
        def optText(field: String): Option[String] =
          Option(s.get(field)).filter(!_.isNull).map(_.asText()).filter(_.nonEmpty)
        val id = s.get("ShardId").asText()
        val endingRecorded = Option(s.get("SequenceNumberRange"))
          .flatMap(r => Option(r.get("EndingSequenceNumber"))).exists(!_.isNull)
        id -> ((optText("ParentShardId") ++ optText("AdjacentParentShardId")).toSeq,
          endingRecorded)
      }.toMap
    shards.map { id =>
      val (parents, endingRecorded) = byId.getOrElse(id, (Nil, false))
      val replayClosed = pages.getOrElse(id, IndexedSeq.empty)
        .lastOption.exists(_.nextShardIterator.isEmpty)
      ShardMeta(id, parents, closed = endingRecorded || replayClosed)
    }
  }

  override def getShardIterator(streamName: String, shardId: String,
                                atTimestampMs: Option[Long]): String = {
    val ps = pages.getOrElse(shardId, IndexedSeq.empty)
    val idx = atTimestampMs match {
      case None => 0
      case Some(ts) =>
        val i = ps.indexWhere(_.records.exists(_.tsMillis >= ts))
        if (i < 0) ps.length else i
    }
    s"$shardId#$idx"
  }

  override def getShardIteratorAtSequence(streamName: String, shardId: String,
                                          sequence: Long): String = {
    val ps = pages.getOrElse(shardId, IndexedSeq.empty)
    val i = ps.indexWhere(_.records.exists(r =>
      (r.sequence - seqBase(shardId)) >= sequence))
    s"$shardId#${if (i < 0) ps.length else i}"
  }

  override def getRecords(iterator: String, limit: Int)
      : (Seq[ShardRecord], Option[String], Long) = {
    val sep = iterator.lastIndexOf('#')
    val (shard, idx) = (iterator.substring(0, sep), iterator.substring(sep + 1).toInt)
    val ps = pages.getOrElse(shard, IndexedSeq.empty)
    if (idx >= ps.length) (Seq.empty, None, 0L)
    else {
      val page = ps(idx)
      // a recorded null NextShardIterator closes the shard mid-stream
      val next =
        if (page.nextShardIterator.isEmpty) None else Some(s"$shard#${idx + 1}")
      (page.records.map(toShardRecord(shard)), next, page.millisBehindLatest)
    }
  }
}

/** [[ShardBackend]] over a recorded wire session, loadable by class name
  * through the `backend` option (see [[BackendSpec]]). Options:
  * `path` (the recorded-session directory), optional `streamName`. */
final class RecordedKinesisBackend(options: Map[String, String]) extends ShardBackend {
  private val inner = new KinesisShardBackend(
    new RecordedKinesisApi(options.getOrElse("path",
      sys.error("recorded backend requires a 'path' option"))),
    options.getOrElse("streamName", "recorded"),
    pageSize = options.getOrElse("maxRecordsPerFetch", "100").toInt)
  override def listShards(): Seq[String] = inner.listShards()
  override def shardMetas(): Seq[ShardMeta] = inner.shardMetas()
  override def latestPosition(shard: String): Long = inner.latestPosition(shard)
  override def latestPosition(shard: String, resumeFrom: Long): Long =
    inner.latestPosition(shard, resumeFrom)
  override def read(shard: String, from: Long, until: Long): Seq[ShardRecord] =
    inner.read(shard, from, until)
}
