package graft.kpl

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

/** KPL (Kinesis Producer Library) aggregate-record binary codec.
  *
  * Wire layout (reference: `kinesisReader/index.js:128-152`,
  * `kinesisReader/resources/constants.js:10-14`):
  *
  * {{{
  *   [4-byte magic 0xF3 0x89 0x9A 0xC2][protobuf AggregatedRecord][16-byte MD5 of the protobuf body]
  * }}}
  *
  * Protobuf schema (reference: `kinesisReader/resources/kpl.proto:1-17`):
  * {{{
  *   message AggregatedRecord {
  *     repeated string partition_key_table     = 1;
  *     repeated string explicit_hash_key_table = 2;
  *     repeated Record records                 = 3;
  *   }
  *   message Record {
  *     required uint64 partition_key_index     = 1;
  *     optional uint64 explicit_hash_key_index = 2;
  *     required bytes  data                    = 3;
  *     repeated Tag    tags                    = 4;
  *   }
  *   message Tag { required string key = 1; optional string value = 2; }
  * }}}
  *
  * The codec is hand-rolled over the protobuf wire format (varint +
  * length-delimited fields only — this schema uses nothing else) so the
  * engine carries zero extra dependencies. Unlike the reference, which only
  * decodes, we also implement the encoder: it generates test fixtures and
  * feeds the streaming-source integration tests.
  */
object KplCodec {

  val Magic: Array[Byte] = Array(0xF3, 0x89, 0x9A, 0xC2).map(_.toByte)
  private val Md5Len = 16

  final case class Tag(key: String, value: Option[String] = None)

  final case class UserRecord(
      partitionKeyIndex: Long,
      explicitHashKeyIndex: Option[Long],
      data: Array[Byte],
      tags: Seq[Tag] = Nil)

  final case class AggregatedRecord(
      partitionKeyTable: Seq[String],
      explicitHashKeyTable: Seq[String],
      records: Seq[UserRecord])

  /** Result of inspecting one physical Kinesis record's payload. */
  sealed trait Deaggregated
  /** Magic present and protobuf+checksum valid → the contained user payloads. */
  final case class Aggregate(payloads: Seq[Array[Byte]]) extends Deaggregated
  /** No KPL magic → the payload is a single bare user record. */
  final case class Single(payload: Array[Byte]) extends Deaggregated
  /** Magic present but the body is corrupt (bad protobuf or checksum).
    * The reference silently drops these (`kinesisReader/index.js:163-164`);
    * the engine surfaces them so a pipeline can route them to a side output. */
  final case class Corrupt(raw: Array[Byte], reason: String) extends Deaggregated

  def hasMagic(bytes: Array[Byte]): Boolean =
    bytes.length >= Magic.length + Md5Len + 1 &&
      bytes(0) == Magic(0) && bytes(1) == Magic(1) &&
      bytes(2) == Magic(2) && bytes(3) == Magic(3)

  private def md5(bytes: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    d.update(bytes, from, until - from)
    d.digest()
  }

  /** Classify + decode one physical record payload.
    *
    * @param verifyChecksum when true, a mismatched MD5 trailer marks the
    *   aggregate corrupt; the reference computes but never enables this
    *   (`kinesisReader/index.js:31`), so the engine default is false too.
    */
  def deaggregate(bytes: Array[Byte], verifyChecksum: Boolean = false): Deaggregated =
    if (!hasMagic(bytes)) Single(bytes)
    else {
      val bodyEnd = bytes.length - Md5Len
      if (verifyChecksum &&
          !java.util.Arrays.equals(
            md5(bytes, Magic.length, bodyEnd),
            java.util.Arrays.copyOfRange(bytes, bodyEnd, bytes.length)))
        Corrupt(bytes, "md5 checksum mismatch")
      else
        decodeBody(bytes, Magic.length, bodyEnd) match {
          case Right(agg) => Aggregate(agg.records.map(_.data))
          case Left(err)  => Corrupt(bytes, err)
        }
    }

  /** Full decode (tables + indexes + tags), e.g. for partition-key recovery. */
  def decode(bytes: Array[Byte]): Either[String, AggregatedRecord] =
    if (!hasMagic(bytes)) Left("missing KPL magic")
    else decodeBody(bytes, Magic.length, bytes.length - Md5Len)

  /** Encode an aggregate: magic + protobuf + MD5 trailer. */
  def encode(agg: AggregatedRecord): Array[Byte] = {
    val body = encodeAggregatedRecord(agg)
    val out = new ByteArrayOutputStream(Magic.length + body.length + Md5Len)
    out.write(Magic, 0, Magic.length)
    out.write(body, 0, body.length)
    val digest = MessageDigest.getInstance("MD5").digest(body)
    out.write(digest, 0, digest.length)
    out.toByteArray
  }

  /** Convenience: aggregate a batch of payloads under one partition key. */
  def aggregate(partitionKey: String, payloads: Seq[Array[Byte]]): Array[Byte] =
    encode(AggregatedRecord(
      partitionKeyTable = Seq(partitionKey),
      explicitHashKeyTable = Nil,
      records = payloads.map(p => UserRecord(0L, None, p))))

  // ---- protobuf wire-format primitives -------------------------------------

  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasRemaining: Boolean = pos < end

    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      while (shift < 64) {
        if (pos >= end) throw new IllegalArgumentException("truncated varint")
        val b = bytes(pos); pos += 1
        result |= (b & 0x7FL) << shift
        if ((b & 0x80) == 0) return result
        shift += 7
      }
      throw new IllegalArgumentException("varint too long")
    }

    def readBytes(): Array[Byte] = {
      val len = readVarint()
      if (len < 0 || pos + len > end)
        throw new IllegalArgumentException(s"bad length-delimited field: len=$len")
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + len.toInt)
      pos += len.toInt
      out
    }

    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => pos += 8
      case 2 => readBytes()
      case 5 => pos += 4
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private def decodeBody(bytes: Array[Byte], from: Int, until: Int): Either[String, AggregatedRecord] =
    try {
      val r = new Reader(bytes, from, until)
      val pks = Seq.newBuilder[String]
      val ehks = Seq.newBuilder[String]
      val recs = Seq.newBuilder[UserRecord]
      while (r.hasRemaining) {
        val key = r.readVarint()
        val (field, wire) = ((key >> 3).toInt, (key & 7).toInt)
        (field, wire) match {
          case (1, 2) => pks += new String(r.readBytes(), UTF_8)
          case (2, 2) => ehks += new String(r.readBytes(), UTF_8)
          case (3, 2) => recs += decodeRecord(r.readBytes())
          case _      => r.skip(wire)
        }
      }
      val agg = AggregatedRecord(pks.result(), ehks.result(), recs.result())
      if (agg.records.isEmpty) Left("aggregate contains no records")
      else Right(agg)
    } catch {
      case e: IllegalArgumentException => Left(e.getMessage)
      case _: ArrayIndexOutOfBoundsException => Left("truncated message")
    }

  private def decodeRecord(bytes: Array[Byte]): UserRecord = {
    val r = new Reader(bytes, 0, bytes.length)
    var pki = -1L
    var ehki: Option[Long] = None
    var data: Array[Byte] = null
    val tags = Seq.newBuilder[Tag]
    while (r.hasRemaining) {
      val key = r.readVarint()
      ((key >> 3).toInt, (key & 7).toInt) match {
        case (1, 0) => pki = r.readVarint()
        case (2, 0) => ehki = Some(r.readVarint())
        case (3, 2) => data = r.readBytes()
        case (4, 2) => tags += decodeTag(r.readBytes())
        case (_, w) => r.skip(w)
      }
    }
    if (pki < 0) throw new IllegalArgumentException("record missing partition_key_index")
    if (data == null) throw new IllegalArgumentException("record missing data")
    UserRecord(pki, ehki, data, tags.result())
  }

  private def decodeTag(bytes: Array[Byte]): Tag = {
    val r = new Reader(bytes, 0, bytes.length)
    var k: String = ""
    var v: Option[String] = None
    while (r.hasRemaining) {
      val key = r.readVarint()
      ((key >> 3).toInt, (key & 7).toInt) match {
        case (1, 2) => k = new String(r.readBytes(), UTF_8)
        case (2, 2) => v = Some(new String(r.readBytes(), UTF_8))
        case (_, w) => r.skip(w)
      }
    }
    Tag(k, v)
  }

  private def writeVarint(out: ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeField(out: ByteArrayOutputStream, field: Int, bytes: Array[Byte]): Unit = {
    writeVarint(out, (field << 3) | 2)
    writeVarint(out, bytes.length.toLong)
    out.write(bytes, 0, bytes.length)
  }

  private def writeVarintField(out: ByteArrayOutputStream, field: Int, value: Long): Unit = {
    writeVarint(out, (field << 3) | 0)
    writeVarint(out, value)
  }

  private def encodeAggregatedRecord(agg: AggregatedRecord): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    agg.partitionKeyTable.foreach(s => writeField(out, 1, s.getBytes(UTF_8)))
    agg.explicitHashKeyTable.foreach(s => writeField(out, 2, s.getBytes(UTF_8)))
    agg.records.foreach(r => writeField(out, 3, encodeRecord(r)))
    out.toByteArray
  }

  private def encodeRecord(r: UserRecord): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeVarintField(out, 1, r.partitionKeyIndex)
    r.explicitHashKeyIndex.foreach(writeVarintField(out, 2, _))
    writeField(out, 3, r.data)
    r.tags.foreach(t => writeField(out, 4, encodeTag(t)))
    out.toByteArray
  }

  private def encodeTag(t: Tag): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeField(out, 1, t.key.getBytes(UTF_8))
    t.value.foreach(v => writeField(out, 2, v.getBytes(UTF_8)))
    out.toByteArray
  }
}
