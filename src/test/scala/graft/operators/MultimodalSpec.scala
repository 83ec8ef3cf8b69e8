package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec
import graft.functions.TextHash

/** The imperative mapPartitions decode stub must agree byte-for-byte with
  * the declarative column-expression formulation of the same fake decode —
  * the property that makes the multimodal path oracle-verifiable. */
class MultimodalSpec extends AnyFunSuite with Matchers with SparkSpec {

  test("mapPartitions stub decode == column-expression equivalent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "tiny"),
      (3L, "a b c d e f g h i j k l m n o p"))
      .toDF("doc_id", "text")

    val decoded = Multimodal
      .decodeFeatures(Multimodal.attachPayload(docs)
        .select($"doc_id", $"payload").as[Multimodal.MediaRow])
      .toDF().orderBy("doc_id")
    // plain text takes the STUB tier, clean
    decoded.select($"codec").distinct().collect()
      .map(_.getString(0)) shouldBe Array("stub")
    decoded.filter($"decode_error".isNotNull).count() shouldBe 0L
    val viaMap = decoded.select("doc_id", "n_bytes", "magic_hex", "width",
      "height", "n_frames", "aspect_e4", "byte_sum8")

    val h = TextHash.h32($"text")
    val width = h % 1920 + 16
    val height = (h / 1920).cast("long") % 1080 + 16
    val sum8 = (1 to 8)
      .map(i => coalesce(ascii(substring($"text", i, 1)), lit(0)).cast("long"))
      .reduce(_ + _)
    val strlen = org.apache.spark.sql.functions.length($"text").cast("long")
    val viaExpr = docs.select(
      $"doc_id",
      strlen.as("n_bytes"),
      lower(hex(substring($"text".cast("binary"), 1, 4))).as("magic_hex"),
      width.cast("long").as("width"),
      height.cast("long").as("height"),
      (strlen % 100 + 1).as("n_frames"),
      floor(width * 10000 / height).cast("long").as("aspect_e4"),
      sum8.as("byte_sum8")).orderBy("doc_id")

    viaMap.collect().map(_.toSeq) shouldBe viaExpr.collect().map(_.toSeq)
  }

  /** REAL image bytes, written by the JDK's own codecs (`ImageIO`) — the
    * strongest in-sandbox witness for the hand-rolled header parser: the
    * encoder and the parser are independent implementations of the
    * published container formats. */
  private def realImage(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
    bos.toByteArray
  }

  test("real header decode: JDK-encoded PNG/JPEG/GIF dimensions parse from real bytes") {
    import spark.implicits._
    val media = Seq(
      (1L, realImage("png", 7, 5)),
      (2L, realImage("jpg", 16, 9)),
      (3L, realImage("gif", 4, 3)),
      (4L, "not an image at all".getBytes("UTF-8")))
    val out = Multimodal
      .decodeFeatures(media.toDF("doc_id", "payload")
        .as[Multimodal.MediaRow])
      .collect().map(r => r.doc_id -> r).toMap
    out(1L).codec shouldBe "png"
    (out(1L).width, out(1L).height) shouldBe ((7L, 5L))
    out(2L).codec shouldBe "jpeg"
    (out(2L).width, out(2L).height) shouldBe ((16L, 9L))
    out(3L).codec shouldBe "gif"
    (out(3L).width, out(3L).height) shouldBe ((4L, 3L))
    out(4L).codec shouldBe "stub"
    // real dimensions feed the downstream planning columns
    out(2L).aspect_e4 shouldBe 16L * 10000L / 9L
    out(2L).n_frames shouldBe 1L
    Seq(1L, 2L, 3L, 4L).foreach(out(_).decode_error shouldBe None)
    // and the parser agrees with the JDK DECODER (not just the encoder)
    for ((fmt, w, h) <- Seq(("png", 7, 5), ("jpg", 16, 9), ("gif", 4, 3))) {
      val bytes = realImage(fmt, w, h)
      val viaJdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val Right((_, pw, ph)) = Multimodal.parseImageHeader(bytes)
      (pw, ph) shouldBe ((viaJdk.getWidth.toLong, viaJdk.getHeight.toLong))
    }
  }

  test("corrupt media lands on the decode_error side-channel, never throws") {
    import spark.implicits._
    val png = realImage("png", 7, 5)
    val media = Seq(
      (1L, png.take(20)),                        // PNG truncated inside IHDR
      (2L, Array[Byte](0xff.toByte, 0xd8.toByte, // JPEG with EOI before SOF
        0xff.toByte, 0xd9.toByte)),
      (3L, "GIF89a".getBytes("US-ASCII")),       // GIF without screen desc
      (4L, png))                                  // a clean row rides along
    val out = Multimodal
      .decodeFeatures(media.toDF("doc_id", "payload")
        .as[Multimodal.MediaRow])
      .collect().map(r => r.doc_id -> r).toMap
    Seq(1L, 2L, 3L).foreach { id =>
      out(id).codec shouldBe "corrupt"
      out(id).decode_error.isDefined shouldBe true
      out(id).width shouldBe 0L
    }
    out(1L).decode_error.get should include("png")
    out(2L).decode_error.get should include("jpeg")
    out(3L).decode_error.get should include("gif")
    out(4L).decode_error shouldBe None
    // the features() contract drops corrupt rows; decodedAll keeps them
    out(4L).codec shouldBe "png"
  }

  /** A real WAV via the JDK's own encoder (javax.sound.sampled — file IO
    * only, no audio device): `frames` frames of silence at the given
    * format. */
  private def realWav(rateHz: Float, channels: Int, frames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rateHz, 16, channels, true, false)
    val pcm = new Array[Byte](frames * fmt.getFrameSize)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV header decode: JDK-encoded containers parse from real bytes") {
    import spark.implicits._
    val media = Seq(
      (1L, realWav(16000f, 1, 8000)),  // 0.5 s mono
      (2L, realWav(44100f, 2, 4410)),  // 0.1 s stereo
      (3L, "not audio".getBytes("UTF-8")))
    val out = Multimodal
      .decodeAudioFeatures(media.toDF("doc_id", "payload")
        .as[Multimodal.AudioRow])
      .collect().map(r => r.doc_id -> r).toMap
    out(1L).codec shouldBe "wav"
    (out(1L).channels, out(1L).sample_rate_hz, out(1L).bits_per_sample,
      out(1L).n_frames) shouldBe ((1L, 16000L, 16L, 8000L))
    out(1L).duration_ms shouldBe 500L
    // 25ms window = 400 frames, 10ms hop = 160 @16k: 1 + (8000-400)/160
    out(1L).n_fft_hops shouldBe 48L
    out(2L).codec shouldBe "wav"
    (out(2L).channels, out(2L).sample_rate_hz, out(2L).n_frames) shouldBe
      ((2L, 44100L, 4410L))
    out(2L).duration_ms shouldBe 100L
    out(3L).codec shouldBe "stub"
    Seq(1L, 2L, 3L).foreach(out(_).decode_error shouldBe None)
    // and the parser agrees with the JDK DECODER (not just the encoder)
    val bytes = realWav(22050f, 1, 1234)
    val jdkFmt = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(bytes))
    val Right((ch, rate, _, frames)) = Multimodal.parseWavHeader(bytes)
    (ch, rate, frames) shouldBe ((jdkFmt.getFormat.getChannels.toLong,
      jdkFmt.getFormat.getSampleRate.toLong, jdkFmt.getFrameLength.toLong))
  }

  test("WAV chunk walk: foreign chunks skip by size, errors land on the side-channel") {
    // a LIST chunk (odd-sized body + pad byte) BEFORE fmt must be skipped
    val base = Multimodal.synthWav(8000, 1, 16, Array[Byte](1, 2, 3, 4))
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](9, 9, 9, 0) // size 3 + pad
    val withList = base.take(12) ++ list ++ base.drop(12)
    Multimodal.parseWavHeader(withList) shouldBe Right((1L, 8000L, 16L, 2L))
    // data before fmt: loud reason, not a guess
    val dataFirst = base.take(12) ++ base.drop(36) ++ base.slice(12, 36)
    Multimodal.parseWavHeader(dataFirst).left.get should include("before fmt")
    // truncated fmt / truncated data / zero rate
    Multimodal.parseWavHeader(base.take(20)).left.get should include("fmt")
    Multimodal.parseWavHeader(base.dropRight(2)).left.get should
      include("data chunk truncated")
    val zeroRate = base.clone()
    zeroRate(24) = 0; zeroRate(25) = 0; zeroRate(26) = 0; zeroRate(27) = 0
    Multimodal.parseWavHeader(zeroRate).left.get should include("zero")
    // non-RIFF bytes never reach the corrupt channel (stub tier instead)
    Multimodal.sniffsAsWav("RIFFxxxxJUNK".getBytes("US-ASCII")) shouldBe false
  }

  test("WAV chunk walk: a near-Int.MaxValue declared chunk size is a Left, not an overflow throw") {
    // A u32 chunk size large enough that Int arithmetic on body+size
    // wraps negative (and negative i re-enters an Int loop guard): the
    // walk must run off the END of the payload and land on the corrupt
    // side-channel, never throw out of the decode task.
    def withFirstChunk(id: String, sizeLe: Long): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(32)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(24)
        .put("WAVE".getBytes("US-ASCII"))
        .put(id.getBytes("US-ASCII")).putInt(sizeLe.toInt)
      bb.array()
    }
    for (size <- Seq(Int.MaxValue.toLong - 9L, Int.MaxValue.toLong,
        0xffffffffL)) {
      val res = Multimodal.parseWavHeader(withFirstChunk("LIST", size))
      res.isLeft shouldBe true // ran off the end: no fmt ever found
      // and the full decode path side-channels it rather than failing
      Multimodal.decodeAudioOne(
        Multimodal.AudioRow(1L, withFirstChunk("LIST", size)))
        .decode_error.isDefined shouldBe true
    }
    // an oversized DATA size after a valid fmt is the truncation Left
    val base = Multimodal.synthWav(8000, 1, 16, Array[Byte](1, 2, 3, 4))
    val big = base.clone()
    val bb = java.nio.ByteBuffer.wrap(big, 40, 4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(Int.MaxValue - 5) // data declares ~2 GiB it does not carry
    Multimodal.parseWavHeader(big).left.get should
      include("data chunk truncated")
  }

  /** `[u32 size][4cc]` + body — ISO BMFF box framing for hand layouts. */
  private def mp4box(tpe: String, body: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + body.length)
    bb.putInt(8 + body.length).put(tpe.getBytes("US-ASCII")).put(body)
    bb.array()
  }

  test("MP4 box walk: round-trip, v1 offsets, foreign boxes, corrupt lanes") {
    val good = Multimodal.synthMp4(1000, 12345L, 640, 360)
    Multimodal.parseMp4Header(good) shouldBe Right((640L, 360L, 1000L, 12345L))
    // a 'free' box between ftyp and moov is skipped by declared size
    val withFree = good.take(16) ++
      mp4box("free", Array.fill[Byte](5)(0)) ++ good.drop(16)
    Multimodal.parseMp4Header(withFree) shouldBe
      Right((640L, 360L, 1000L, 12345L))
    // version-1 boxes carry 64-bit times: mvhd timescale/duration move to
    // body +20/+24, tkhd dims to +88 — only those fields need to be real
    val mvhd1 = java.nio.ByteBuffer.allocate(112)
    mvhd1.put(0, 1.toByte)          // version 1
    mvhd1.putInt(20, 90000)         // timescale
    mvhd1.putLong(24, 900000L)      // duration (10 s)
    val tkhd1 = java.nio.ByteBuffer.allocate(96)
    tkhd1.put(0, 1.toByte)
    tkhd1.putInt(88, 1920 << 16)    // 16.16 fixed
    tkhd1.putInt(92, 1080 << 16)
    val moov1 = mp4box("moov", mp4box("mvhd", mvhd1.array()) ++
      mp4box("trak", mp4box("tkhd", tkhd1.array())))
    Multimodal.parseMp4Header(good.take(16) ++ moov1) shouldBe
      Right((1920L, 1080L, 90000L, 900000L))
    // corrupt lanes: truncated moov, zero timescale, audio-only track
    Multimodal.parseMp4Header(good.take(30)).left.get should
      include("lies about its size")
    Multimodal.parseMp4Header(Multimodal.synthMp4(0, 1L, 640, 360))
      .left.get should include("zero timescale")
    Multimodal.parseMp4Header(Multimodal.synthMp4(1000, 1L, 0, 0))
      .left.get should include("no video track")
    // non-BMFF bytes go to the stub tier, not the corrupt channel
    Multimodal.sniffsAsMp4("plain prose, no ftyp".getBytes("UTF-8")) shouldBe false
    // and the decode plan: 12345 ms at 1 fps samples ceil(12.345) = 13
    val dec = Multimodal.decodeVideoOne(Multimodal.VideoRow(1L, good))
    (dec.codec, dec.duration_ms, dec.n_sampled_1fps) shouldBe (("mp4", 12345L, 13L))
  }

  test("payload column is real binary with the text's UTF-8 bytes") {
    import spark.implicits._
    val df = Multimodal.attachPayload(Seq((7L, "abc")).toDF("doc_id", "text"))
    val bytes = df.select($"payload").collect().head.getAs[Array[Byte]](0)
    bytes.toSeq shouldBe "abc".getBytes("UTF-8").toSeq
  }

  test("phash banding is COMPLETE for its verdict radius (bands-1 bits)") {
    val dir = "/root/testdata/sf0.001"
    val hs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextHash.h32(col("text")).as("lo"),
        TextHash.h32(reverse(col("text"))).as("hi"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def ham(a: (Long, Long, Long), b: (Long, Long, Long)): Int =
      java.lang.Long.bitCount(a._2 ^ b._2) + java.lang.Long.bitCount(a._3 ^ b._3)
    val withinRadius = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
      if ham(hs(i), hs(j)) <= 3
    } yield {
      val (x, y) = (hs(i)._1, hs(j)._1)
      (math.min(x, y), math.max(x, y))
    }).toSet
    val got = graft.queries.MultimodalQ.qMmPhash(spark, dir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(3), r.getBoolean(4))))
    val gotPairs = got.map(_._1).toSet
    // pigeonhole: 4 bands, <= 3 differing bits — at least one band is
    // untouched, so the pair MUST be nominated by the band join
    withinRadius.subsetOf(gotPairs) shouldBe true
    // and the reported distances/verdicts are exact
    val hsMap = hs.map(h => h._1 -> h).toMap
    got.foreach { case ((a, b), (d, dup)) =>
      d shouldBe ham(hsMap(a), hsMap(b)).toLong
      dup shouldBe (d <= 3L)
    }
  }
}
