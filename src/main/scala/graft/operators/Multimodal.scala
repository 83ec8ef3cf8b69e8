package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with a partition-batched decode/feature-extract stage.
  *
  * The pattern mirrors how a training-data pipeline carries images/audio/
  * video: a `payload: binary` column plus a metadata struct, with decode
  * running per-partition against a codec library. The decode stage has
  * two tiers:
  *
  *  - a REAL pure-JVM header decode ([[parseImageHeader]]) for the three
  *    containers whose dimensions are readable without a codec — PNG
  *    (IHDR), JPEG (SOF marker scan), GIF (logical screen descriptor) —
  *    from the published container formats, zero new dependencies. A
  *    payload that sniffs as one of these but fails its header parse is
  *    a DECODE ERROR and lands on the corrupt side-channel
  *    (`decode_error` set, like the JSON path's PERMISSIVE corrupt
  *    column) — never an exception out of the task;
  *  - a clearly-marked STUB for everything else (this container has no
  *    media codecs and the text fixtures carry no real media): a
  *    deterministic md5 fake standing in for the pixel-level decoder,
  *    keeping the output verifiable against a SQL oracle.
  *
  * Everything around the tiers is real and load-bearing: the binary
  * column, the typed `Dataset` schema, the `mapPartitions` batch shape
  * (one iterator per partition, where a real implementation amortizes
  * codec init), the corrupt side-channel, and the downstream columnar
  * hand-off.
  *
  * Scale: decode is a narrow per-partition map — no shuffle; partition
  * sizing (`spark.sql.files.maxPartitionBytes`) is the only knob that
  * matters; decoded features are small relative to payloads, so the
  * payload column is dropped before any wide stage. */
object Multimodal {

  /** Input row: payload bytes + coarse media type from magic-byte sniff. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** Decoded features. `codec` names the tier that produced the row
    * (`png`/`jpeg`/`gif` = real header decode, `stub` = the md5 fake);
    * `decode_error` is the corrupt side-channel — set (with zeroed
    * dimensions) when a sniffed media payload fails its header parse. */
  final case class MediaDecoded(
      doc_id: Long,
      n_bytes: Long,
      magic_hex: String,
      width: Long,
      height: Long,
      n_frames: Long,
      aspect_e4: Long,
      byte_sum8: Long,
      codec: String,
      decode_error: Option[String])

  /** Attach a binary payload column (here: the UTF-8 document text standing
    * in for media bytes — the fixtures carry no real media). */
  def attachPayload(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))

  private def hexLower(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString

  private def be16(p: Array[Byte], i: Int): Long =
    ((p(i) & 0xff) << 8 | (p(i + 1) & 0xff)).toLong
  private def be32(p: Array[Byte], i: Int): Long =
    ((p(i) & 0xffL) << 24) | ((p(i + 1) & 0xffL) << 16) |
      ((p(i + 2) & 0xffL) << 8) | (p(i + 3) & 0xffL)
  private def le16(p: Array[Byte], i: Int): Long =
    ((p(i + 1) & 0xff) << 8 | (p(i) & 0xff)).toLong

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  // One magic predicate per container, shared by [[sniffsAsImage]] and
  // [[parseImageHeader]] — a single definition keeps the sniff routing
  // and the parser dispatch agreeing by construction (an edit to one
  // cannot silently send payloads to the stub tier the parser handles,
  // or vice versa).
  private def magicPng(p: Array[Byte]): Boolean =
    p.length >= 8 && p.take(8).sameElements(PngSig)
  private def magicJpeg(p: Array[Byte]): Boolean =
    p.length >= 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8
  private def magicGif(p: Array[Byte]): Boolean =
    p.length >= 6 && {
      val v = new String(p.take(6), java.nio.charset.StandardCharsets.US_ASCII)
      v == "GIF87a" || v == "GIF89a"
    }

  /** Does the payload CLAIM to be a container [[parseImageHeader]] can
    * read? Sniffing is deliberately conservative about ASCII-legal
    * magics: PNG's signature starts 0x89 and JPEG's 0xFFD8 — neither can
    * open a text document — and GIF requires the full 6-byte
    * `GIF87a`/`GIF89a` version string. (BMP's 2-byte ASCII `BM` is NOT
    * sniffed: prose can open with it, and a false positive would reroute
    * a text row away from the stub tier.) */
  private[graft] def sniffsAsImage(p: Array[Byte]): Boolean =
    magicPng(p) || magicJpeg(p) || magicGif(p)

  /** REAL header decode — `(codec, width, height)` from the published
    * container formats, pure JVM:
    *
    *  - PNG: the 8-byte signature, then the FIRST chunk must be `IHDR`
    *    (length 13 at offset 8, type at 12) with width/height as
    *    big-endian u32 at offsets 16/20 (PNG spec §11.2.2);
    *  - JPEG: `FFD8` then a marker walk — each segment is `FF` + marker +
    *    big-endian u16 length; the frame header (`SOF0..15`, excluding
    *    `DHT`(C4)/`JPG`(C8)/`DAC`(CC)) carries height at +3 and width at
    *    +5 past the length (ITU T.81 §B.2.2);
    *  - GIF: `GIF87a`/`GIF89a`, then the logical screen descriptor's
    *    little-endian u16 width/height at offsets 6/8 (GIF89a spec §18).
    *
    * `Left(reason)` for anything that sniffs as one of these but whose
    * header is truncated, misplaced, or zero-sized — the corrupt
    * side-channel, never an exception. */
  private[graft] def parseImageHeader(
      p: Array[Byte]): Either[String, (String, Long, Long)] = {
    def dims(codec: String, w: Long, h: Long) =
      if (w > 0L && h > 0L) Right((codec, w, h))
      else Left(s"$codec: zero-sized image ($w x $h)")
    if (magicPng(p)) {
      if (p.length < 24) Left("png: truncated before IHDR")
      else if (!(p(12) == 'I' && p(13) == 'H' && p(14) == 'D' && p(15) == 'R'))
        Left("png: first chunk is not IHDR")
      else dims("png", be32(p, 16), be32(p, 20))
    } else if (magicJpeg(p)) {
      // marker walk to the frame header
      var i = 2
      while (i + 3 < p.length) {
        if ((p(i) & 0xff) != 0xff) return Left(
          f"jpeg: expected marker at offset $i, got 0x${p(i) & 0xff}%02x")
        // fill bytes: consecutive FFs pad before the marker id
        var j = i + 1
        while (j < p.length && (p(j) & 0xff) == 0xff) j += 1
        if (j >= p.length) return Left("jpeg: truncated in marker padding")
        val m = p(j) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          // SOFn: length(2) precision(1) height(2) width(2)
          if (j + 8 >= p.length) return Left("jpeg: truncated SOF header")
          return dims("jpeg", be16(p, j + 6), be16(p, j + 4))
        } else if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) {
          i = j + 1 // standalone markers carry no length
        } else if (m == 0xd9 || m == 0xda) {
          // EOI / start-of-scan before any frame header
          return Left("jpeg: no SOF marker before scan/end")
        } else {
          if (j + 2 >= p.length) return Left("jpeg: truncated segment length")
          val len = be16(p, j + 1).toInt
          if (len < 2) return Left(s"jpeg: bad segment length $len")
          i = j + 1 + len
        }
      }
      Left("jpeg: ran out of bytes before a SOF marker")
    } else if (magicGif(p)) {
      if (p.length < 10) Left("gif: truncated logical screen descriptor")
      else dims("gif", le16(p, 6), le16(p, 8))
    } else Left("not a parseable image container")
  }

  /** Decode one payload: the REAL header tier for sniffed PNG/JPEG/GIF
    * (parse failure → corrupt side-channel, zeroed dimensions), the
    * deterministic md5 STUB for everything else. A real pixel decoder
    * replaces only the stub branch; the tier dispatch, error channel,
    * and output schema are the production shape. */
  def decodeOne(r: MediaRow): MediaDecoded = {
    val nBytes = r.payload.length.toLong
    val magic = hexLower(r.payload.take(4))
    val byteSum8 = r.payload.take(8).map(b => (b & 0xff).toLong).sum
    if (sniffsAsImage(r.payload)) parseImageHeader(r.payload) match {
      case Right((codec, w, h)) =>
        MediaDecoded(r.doc_id, nBytes, magic, w, h,
          n_frames = 1L, aspect_e4 = w * 10000L / h, byteSum8,
          codec = codec, decode_error = None)
      case Left(reason) =>
        MediaDecoded(r.doc_id, nBytes, magic, 0L, 0L, 0L, 0L, byteSum8,
          codec = "corrupt", decode_error = Some(reason))
    } else {
      val md5hex = hexLower(MessageDigest.getInstance("MD5").digest(r.payload))
      val h = java.lang.Long.parseLong(md5hex.substring(0, 8), 16)
      val width = h % 1920 + 16
      val height = (h / 1920) % 1080 + 16
      MediaDecoded(r.doc_id, nBytes, magic, width, height,
        n_frames = nBytes % 100 + 1,
        aspect_e4 = width * 10000 / height, byteSum8,
        codec = "stub", decode_error = None)
    }
  }

  /** Partition-batched decode: one iterator per partition so a real codec
    * would init once per task, not once per row. */
  def decodeFeatures(ds: Dataset[MediaRow]): Dataset[MediaDecoded] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decodeOne))
  }

  // ---- audio tier (WAV/RIFF) ----------------------------------------------

  final case class AudioRow(doc_id: Long, payload: Array[Byte])

  /** Decoded audio features: the speech-frontend planning row. `codec` is
    * `wav` (real header decode), `stub` (the md5 fake for containers this
    * sandbox has no codec for), or `corrupt`; `n_fft_hops` is the
    * 25 ms-window / 10 ms-hop analysis-frame count — the feature-batch
    * size an ASR/audio-embedding stage plans for. */
  final case class AudioDecoded(
      doc_id: Long,
      n_bytes: Long,
      channels: Long,
      sample_rate_hz: Long,
      bits_per_sample: Long,
      n_frames: Long,
      duration_ms: Long,
      n_fft_hops: Long,
      codec: String,
      decode_error: Option[String])

  private def le32(p: Array[Byte], i: Int): Long =
    (p(i) & 0xffL) | ((p(i + 1) & 0xffL) << 8) |
      ((p(i + 2) & 0xffL) << 16) | ((p(i + 3) & 0xffL) << 24)

  /** `RIFF….WAVE` — both 4-byte tags, so prose cannot open one (the
    * [[sniffsAsImage]] conservatism note). */
  private[graft] def sniffsAsWav(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  /** REAL WAV header decode — `(channels, sampleRateHz, bitsPerSample,
    * nFrames)` from the RIFF chunk walk (each chunk is a 4-byte ASCII id +
    * LE u32 size, bodies word-aligned with a pad byte after odd sizes —
    * RIFF 1991 spec / WAVE Format): `fmt ` carries channels @+2, sample
    * rate @+4, block align @+12, bits @+14 (all LE); `data`'s size over
    * the block align is the frame count. Foreign chunks (LIST, fact, …)
    * are skipped by size, `fmt ` must precede `data`, and any truncation
    * or zero-valued fmt field is a `Left` — the corrupt side-channel,
    * never an exception. */
  private[graft] def parseWavHeader(
      p: Array[Byte]): Either[String, (Long, Long, Long, Long)] = {
    if (!sniffsAsWav(p)) return Left("not a RIFF/WAVE container")
    // Long offsets: a chunk's declared u32 size can exceed what Int
    // arithmetic holds (body + size wraps negative and re-enters the
    // loop guard) — the walk must run off the END of the payload and
    // return a Left, never throw out of the decode task.
    var i = 12L
    var fmt: Option[(Long, Long, Long, Long)] = None // ch, rate, bits, block
    while (i + 8 <= p.length) {
      val at = i.toInt // safe: i + 8 <= p.length <= Int.MaxValue
      val id = new String(p, at, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(p, at + 4)
      val body = i + 8
      if (id == "fmt ") {
        if (size < 16 || body + 16 > p.length)
          return Left("wav: truncated fmt chunk")
        val channels = le16(p, at + 10)
        val rate = le32(p, at + 12)
        val block = le16(p, at + 20)
        val bits = le16(p, at + 22)
        if (channels == 0L || rate == 0L || block == 0L)
          return Left("wav: zero channels/rate/block in fmt")
        fmt = Some((channels, rate, bits, block))
      } else if (id == "data") {
        fmt match {
          case Some((ch, rate, bits, block)) =>
            if (body + size > p.length) return Left("wav: data chunk truncated")
            return Right((ch, rate, bits, size / block))
          case None => return Left("wav: data chunk before fmt")
        }
      }
      i = body + size + (size & 1L) // word-aligned chunk bodies
    }
    Left(if (fmt.isEmpty) "wav: truncated fmt chunk" else "wav: no data chunk")
  }

  /** Minimal valid PCM WAV bytes (fmt + data, spec-layout) around caller
    * bytes as samples — how the audio queries drive REAL container bytes
    * through [[parseWavHeader]] on fixtures that carry no media. Odd-sized
    * data gets the RIFF pad byte (the size field stays exact). */
  private[graft] def synthWav(
      sampleRateHz: Int, channels: Int, bitsPerSample: Int,
      data: Array[Byte]): Array[Byte] = {
    val block = channels * bitsPerSample / 8
    val pad = data.length & 1
    val out = java.nio.ByteBuffer.allocate(44 + data.length + pad)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length + pad)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(channels.toShort).putInt(sampleRateHz)
      .putInt(sampleRateHz * block).putShort(block.toShort)
      .putShort(bitsPerSample.toShort)
      .put("data".getBytes("US-ASCII")).putInt(data.length).put(data)
    out.array()
  }

  /** 25 ms analysis window / 10 ms hop — the standard speech-frontend
    * framing (kaldi/librosa defaults); the hop count is what an ASR or
    * audio-embedding stage sizes its feature batches by. */
  private val FftWindowMs = 25L
  private val FftHopMs = 10L

  /** Decode one audio payload: the REAL chunk-walk tier for RIFF/WAVE
    * (parse failure → corrupt side-channel, zeroed fields), the
    * deterministic md5 STUB for any other container (no audio codecs in
    * this sandbox; a real decoder replaces only the stub branch). */
  def decodeAudioOne(r: AudioRow): AudioDecoded = {
    val nBytes = r.payload.length.toLong
    def planned(ch: Long, rate: Long, bits: Long, frames: Long, codec: String) = {
      val win = rate * FftWindowMs / 1000L
      val hop = rate * FftHopMs / 1000L
      AudioDecoded(r.doc_id, nBytes, ch, rate, bits, frames,
        duration_ms = frames * 1000L / rate,
        n_fft_hops =
          if (frames >= win && hop > 0L) 1L + (frames - win) / hop else 0L,
        codec = codec, decode_error = None)
    }
    if (sniffsAsWav(r.payload)) parseWavHeader(r.payload) match {
      case Right((ch, rate, bits, frames)) =>
        planned(ch, rate, bits, frames, "wav")
      case Left(reason) =>
        AudioDecoded(r.doc_id, nBytes, 0L, 0L, 0L, 0L, 0L, 0L,
          codec = "corrupt", decode_error = Some(reason))
    } else {
      val md5hex = hexLower(MessageDigest.getInstance("MD5").digest(r.payload))
      val h = java.lang.Long.parseLong(md5hex.substring(0, 8), 16)
      planned(ch = 1L + (h / 4L) % 2L,
        rate = Array(8000L, 16000L, 22050L, 44100L)((h % 4L).toInt),
        bits = 16L, frames = nBytes * 64L, codec = "stub")
    }
  }

  /** Partition-batched audio decode — same one-iterator-per-partition
    * shape as [[decodeFeatures]]. */
  def decodeAudioFeatures(ds: Dataset[AudioRow]): Dataset[AudioDecoded] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decodeAudioOne))
  }

  // ---- video tier (MP4 / ISO BMFF) -----------------------------------------

  final case class VideoRow(doc_id: Long, payload: Array[Byte])

  /** Decoded video features: presentation duration + display dimensions
    * from the movie header, and the 1-frame-per-second sampling plan
    * ([[graft.queries.MultimodalQ.qMmFrames]]' fan-out sized from REAL
    * container time instead of the stub frame count). */
  final case class VideoDecoded(
      doc_id: Long,
      n_bytes: Long,
      width: Long,
      height: Long,
      timescale_hz: Long,
      duration_ms: Long,
      n_sampled_1fps: Long,
      codec: String,
      decode_error: Option[String])

  private def be64(p: Array[Byte], i: Int): Long =
    (be32(p, i) << 32) | be32(p, i + 4)

  /** `….ftyp` at offset 4 — the ISO BMFF file-type box every MP4-family
    * container opens with (ISO/IEC 14496-12 §4.3). */
  private[graft] def sniffsAsMp4(p: Array[Byte]): Boolean =
    p.length >= 12 &&
      p(4) == 'f' && p(5) == 't' && p(6) == 'y' && p(7) == 'p' &&
      be32(p, 0) >= 8L

  /** REAL MP4 header decode — `(width, height, timescaleHz,
    * durationTicks)` from the ISO BMFF box walk (ISO/IEC 14496-12):
    * boxes are `[u32 size][4cc type]` (size 1 → u64 largesize follows,
    * size 0 → to end-of-buffer); `moov`'s children are walked for
    *
    *  - `mvhd` (§8.2.2): version 0 carries timescale/duration as u32 at
    *    body +12/+16, version 1 as u32/u64 at +20/+24 (the movie clock);
    *  - the first `trak` whose `tkhd` (§8.3.2) has nonzero width/height
    *    (16.16 fixed-point at body +76/+80 for v0, +88/+92 for v1) —
    *    audio-only tracks carry zeros there, so this finds the video
    *    track without parsing sample tables.
    *
    * `Left(reason)` for truncation, a moov without mvhd, a zero
    * timescale, or a box that lies about its size — the corrupt
    * side-channel, never an exception. (No JDK decoder exists for MP4 to
    * cross-pin against — the offsets above are the published spec's,
    * pinned by the synthesis round-trip and hand-layout specs.) */
  private[graft] def parseMp4Header(
      p: Array[Byte]): Either[String, (Long, Long, Long, Long)] = {
    if (!sniffsAsMp4(p)) return Left("not an ISO-BMFF container")
    // walk the children of [from, until): returns (bodyStart, bodyEnd) of
    // the first box with the wanted type, scanning by declared sizes
    def findBox(from: Int, until: Int, want: String)
        : Either[String, (Int, Int)] = {
      var i = from
      while (i + 8 <= until) {
        val size0 = be32(p, i)
        val tpe = new String(p, i + 4, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        val (body, end) =
          if (size0 == 1L) {
            if (i + 16 > until) return Left(s"mp4: truncated largesize '$tpe'")
            val ls = be64(p, i + 8)
            if (ls < 16L || ls > (until - i).toLong)
              return Left(s"mp4: box '$tpe' lies about its largesize")
            (i + 16, i + ls.toInt)
          } else if (size0 == 0L) (i + 8, until) // box extends to the end
          else {
            if (size0 < 8L || size0 > (until - i).toLong)
              return Left(s"mp4: box '$tpe' lies about its size")
            (i + 8, i + size0.toInt)
          }
        if (tpe == want) return Right((body, end))
        i = end
      }
      Left(s"mp4: no '$want' box")
    }
    findBox(0, p.length, "moov").flatMap { case (moovB, moovE) =>
      findBox(moovB, moovE, "mvhd").flatMap { case (mv, mvE) =>
        if (mv >= mvE || mvE > p.length) Left("mp4: empty mvhd")
        else {
          val ver = p(mv) & 0xff
          val need = if (ver == 1) 32 else 20
          if (mv + need > mvE) Left("mp4: truncated mvhd")
          else {
            val (ts, dur) =
              if (ver == 1) (be32(p, mv + 20), be64(p, mv + 24))
              else (be32(p, mv + 12), be32(p, mv + 16))
            if (ts == 0L) Left("mp4: zero timescale")
            else {
              // first trak with a nonzero-dimension tkhd = the video track
              var i = moovB
              var dims: Option[(Long, Long)] = None
              while (dims.isEmpty && i < moovE) {
                findBox(i, moovE, "trak") match {
                  case Right((tb, te)) =>
                    findBox(tb, te, "tkhd") match {
                      case Right((kb, ke)) =>
                        val kver = p(kb) & 0xff
                        val off = if (kver == 1) 88 else 76
                        if (kb + off + 8 <= ke) {
                          val w = be32(p, kb + off) >> 16 // 16.16 fixed
                          val h = be32(p, kb + off + 4) >> 16
                          if (w > 0L && h > 0L) dims = Some((w, h))
                        }
                      case Left(_) => // track without tkhd: skip it
                    }
                    i = te
                  case Left(_) => i = moovE
                }
              }
              dims match {
                case Some((w, h)) => Right((w, h, ts, dur))
                case None => Left("mp4: no video track (tkhd) dimensions")
              }
            }
          }
        }
      }
    }
  }

  /** Minimal valid ISO-BMFF bytes (`ftyp` + `moov[mvhd, trak[tkhd]]`,
    * v0 boxes, spec-layout) — the video synthesis twin of [[synthWav]]. */
  private[graft] def synthMp4(
      timescaleHz: Int, durationTicks: Long, w: Int, h: Int): Array[Byte] = {
    val ftypSize = 16
    val mvhdSize = 8 + 100 // v0 mvhd body is exactly 100 bytes (§8.2.2)
    val tkhdSize = 8 + 84  // v0 tkhd body is exactly 84 bytes (§8.3.2)
    val trakSize = 8 + tkhdSize
    val moovSize = 8 + mvhdSize + trakSize
    val out = java.nio.ByteBuffer.allocate(ftypSize + moovSize)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    def tag(s: String) = out.put(s.getBytes("US-ASCII"))
    out.putInt(ftypSize); tag("ftyp"); tag("isom"); out.putInt(0x200)
    out.putInt(moovSize); tag("moov")
    out.putInt(mvhdSize); tag("mvhd")
    out.putInt(0) // version 0 + flags
      .putInt(0).putInt(0) // ctime, mtime
      .putInt(timescaleHz).putInt(durationTicks.toInt)
      .putInt(0x00010000).putShort(0x0100.toShort).putShort(0.toShort) // rate, volume
      .putLong(0L) // reserved
      .putInt(0x00010000).putInt(0).putInt(0) // identity matrix rows…
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0) // predefined
      .putInt(2) // next track id
    out.putInt(trakSize); tag("trak")
    out.putInt(tkhdSize); tag("tkhd")
    out.putInt(7) // version 0 + flags (enabled|in-movie|in-preview)
      .putInt(0).putInt(0) // ctime, mtime
      .putInt(1).putInt(0) // track id, reserved
      .putInt(durationTicks.toInt)
      .putLong(0L) // reserved
      .putShort(0.toShort).putShort(0.toShort) // layer, alternate group
      .putShort(0.toShort).putShort(0.toShort) // volume (video: 0), reserved
      .putInt(0x00010000).putInt(0).putInt(0) // identity matrix…
      .putInt(0).putInt(0x00010000).putInt(0)
      .putInt(0).putInt(0).putInt(0x40000000)
      .putInt(w << 16).putInt(h << 16) // 16.16 fixed
    out.array()
  }

  /** Decode one video payload: the REAL box-walk tier for ISO BMFF (parse
    * failure → corrupt side-channel), the md5 STUB for other containers
    * (no video codecs in this sandbox). The 1 fps sampling plan mirrors
    * the keyframe-thumbnail pass a vision pipeline runs before paying
    * for full decode: ⌈duration⌉ sampled frames. */
  def decodeVideoOne(r: VideoRow): VideoDecoded = {
    val nBytes = r.payload.length.toLong
    def planned(w: Long, h: Long, ts: Long, durTicks: Long, codec: String) = {
      val durMs = durTicks * 1000L / ts
      VideoDecoded(r.doc_id, nBytes, w, h, ts, durMs,
        n_sampled_1fps = (durMs + 999L) / 1000L, codec = codec,
        decode_error = None)
    }
    if (sniffsAsMp4(r.payload)) parseMp4Header(r.payload) match {
      case Right((w, h, ts, dur)) => planned(w, h, ts, dur, "mp4")
      case Left(reason) =>
        VideoDecoded(r.doc_id, nBytes, 0L, 0L, 0L, 0L, 0L,
          codec = "corrupt", decode_error = Some(reason))
    } else {
      val md5hex = hexLower(MessageDigest.getInstance("MD5").digest(r.payload))
      val hsh = java.lang.Long.parseLong(md5hex.substring(0, 8), 16)
      planned(w = hsh % 1920L + 16L, h = (hsh / 1920L) % 1080L + 16L,
        ts = 1000L, durTicks = nBytes * 40L, codec = "stub")
    }
  }

  /** Partition-batched video decode — same shape as [[decodeFeatures]]. */
  def decodeVideoFeatures(ds: Dataset[VideoRow]): Dataset[VideoDecoded] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions(_.map(decodeVideoOne))
  }

  /** documents → payloads → decoded features, as a DataFrame plan with
    * the legacy 8-column contract (clean rows only — the corrupt
    * side-channel is [[decodedAll]]'s `decode_error` filter). */
  def features(spark: SparkSession, dir: String): DataFrame =
    decodedAll(spark, dir)
      .filter(col("decode_error").isNull)
      .select("doc_id", "n_bytes", "magic_hex", "width", "height",
        "n_frames", "aspect_e4", "byte_sum8")
      .orderBy("doc_id")

  /** The full decode output including tier labels and the corrupt
    * side-channel. */
  def decodedAll(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = attachPayload(graft.Tables.documents(spark, dir))
      .select(col("doc_id"), col("payload"))
      .as[MediaRow]
    decodeFeatures(media).toDF()
  }
}
