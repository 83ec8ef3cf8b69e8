package graft.kpl

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import KplCodec._

class KplCodecSpec extends AnyFunSuite with Matchers {

  private def payloads(ss: String*): Seq[Array[Byte]] = ss.map(_.getBytes(UTF_8))

  test("magic prefix is f3 89 9a c2") {
    Magic.map(b => f"${b & 0xff}%02x").mkString shouldBe "f3899ac2"
  }

  test("encode/decode round-trip preserves tables, indexes, data, tags") {
    val agg = AggregatedRecord(
      partitionKeyTable = Seq("pk-a", "pk-b"),
      explicitHashKeyTable = Seq("123456789"),
      records = Seq(
        UserRecord(0L, Some(0L), "hello".getBytes(UTF_8), Seq(Tag("k", Some("v")), Tag("bare"))),
        UserRecord(1L, None, Array[Byte](0, 1, 2, -1))))
    val bytes = encode(agg)
    hasMagic(bytes) shouldBe true
    val decoded = decode(bytes).toOption.get
    decoded.partitionKeyTable shouldBe agg.partitionKeyTable
    decoded.explicitHashKeyTable shouldBe agg.explicitHashKeyTable
    decoded.records.map(_.partitionKeyIndex) shouldBe Seq(0L, 1L)
    decoded.records.map(_.explicitHashKeyIndex) shouldBe Seq(Some(0L), None)
    decoded.records.map(_.data.toSeq) shouldBe agg.records.map(_.data.toSeq)
    decoded.records.head.tags shouldBe Seq(Tag("k", Some("v")), Tag("bare", None))
  }

  test("deaggregate of an aggregate yields the payloads in order") {
    val bytes = aggregate("pk", payloads("a", "bb", "ccc"))
    deaggregate(bytes) shouldBe a[Aggregate]
    deaggregate(bytes).asInstanceOf[Aggregate].payloads.map(new String(_, UTF_8)) shouldBe
      Seq("a", "bb", "ccc")
  }

  test("non-KPL bytes pass through as Single") {
    val raw = """{"plain":"record"}""".getBytes(UTF_8)
    deaggregate(raw) shouldBe Single(raw)
  }

  test("short buffers (even magic-prefixed) are Single, like the reference length guard") {
    // kinesisReader/index.js:129 requires len > magic+md5 before treating as aggregate
    deaggregate(Magic) shouldBe Single(Magic)
  }

  test("magic + garbage body is Corrupt, not an exception") {
    val junk = Magic ++ Array.fill[Byte](40)(0x7F)
    deaggregate(junk) shouldBe a[Corrupt]
  }

  test("checksum verification catches a flipped body byte only when enabled") {
    val bytes = aggregate("pk", payloads("x", "y"))
    val tampered = bytes.clone()
    tampered(5) = (tampered(5) ^ 0x01).toByte
    // disabled (reference default, kinesisReader/index.js:31): decode may still
    // succeed or fail structurally, but enabled must flag the checksum.
    deaggregate(tampered, verifyChecksum = true) shouldBe a[Corrupt]
    deaggregate(bytes, verifyChecksum = true) shouldBe a[Aggregate]
  }

  test("property: round-trip over randomized payload batches (seeded)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 200) {
      val batch = Seq.fill(1 + rnd.nextInt(20)) {
        val b = new Array[Byte](1 + rnd.nextInt(256)); rnd.nextBytes(b); b
      }
      val pk = "pk-" + rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString
      val bytes = aggregate(pk, batch)
      val out = deaggregate(bytes, verifyChecksum = true)
      out shouldBe a[Aggregate]
      out.asInstanceOf[Aggregate].payloads.map(_.toSeq) shouldBe batch.map(_.toSeq)
      val full = decode(bytes).toOption.get
      full.partitionKeyTable shouldBe Seq(pk)
      full.records.forall(_.partitionKeyIndex == 0L) shouldBe true
    }
  }
}
