package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.SparkSpec

/** End-to-end over a real socket, reproducing the reference's own e2e cases
  * (`app/server/test/index.js:38-80`): 200 with a JSON array, 404 on an
  * unknown path, structured 400 on validation failure — plus the
  * `{badRequest, error}` scan-failure body (`app/server/index.js:65-72`)
  * the reference covers only implicitly. */
class RecordsHttpServerSpec extends AnyFunSuite with Matchers with SparkSpec
    with BeforeAndAfterAll {

  private val now = Instant.parse("2024-06-01T12:00:00Z")

  private def payload(contactId: Long): String =
    s"""{"baseEventData":{"com.incontact.datainfra.events.ContactEvent":{"mediaScopeIdentification":{"contactIdentification":{"contactId":{"long":$contactId},"contactIdAlt":null}}}},"tenantId":{"tenantId":null,"tenantIdAlt":null,"serverName":null}}"""

  private def envelope(jsons: Seq[String]): DataFrame = {
    val schema = StructType(Seq(
      StructField("data", BinaryType),
      StructField("approximateArrivalTimestamp", TimestampType)))
    val rows = jsons.zipWithIndex.map { case (j, i) =>
      Row(j.getBytes(UTF_8), Timestamp.from(now.minusSeconds(60 * (i + 1))))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  private val records = Seq(payload(1), payload(2), payload(3))

  private var server: RecordsHttpServer = _
  private var port: Int = 0

  override protected def beforeAll(): Unit = {
    super.beforeAll()
    server = new RecordsHttpServer(
      streamname =>
        if (streamname == "test-stream") envelope(records)
        else throw new IllegalArgumentException(
          s"Stream $streamname under account 000000000000 not found"),
      now = () => now)
    port = server.start()
  }

  override protected def afterAll(): Unit = {
    server.stop()
    super.afterAll()
  }

  private val client = HttpClient.newHttpClient()

  private def get(path: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("GET /records returns OK with the records as a JSON array") {
    val res = get("/records?streamname=test-stream")
    res.statusCode() shouldBe 200
    res.headers().firstValue("Content-Type").get() shouldBe "application/json"
    // order-independent: the echo is unordered, like the reference's array
    res.body() should startWith("[")
    val parts = res.body().stripPrefix("[").stripSuffix("]")
      .split("""(?<=\}\})\,(?=\{)""").toSet
    parts shouldBe records.toSet
  }

  test("GET on an invalid path returns Not Found") {
    get("/INVALID_PATH").statusCode() shouldBe 404
  }

  test("GET / serves the self-contained browser client wired to /records (O15)") {
    val res = get("/")
    res.statusCode() shouldBe 200
    res.headers().firstValue("Content-Type").get() shouldBe
      "text/html; charset=utf-8"
    // the page is self-contained (air-gap safe: no external assets) and
    // issues the same wire call the reference UI does
    res.body() should include("records")
    res.body() should include("streamname")
    res.body() should include("duration")
    res.body() should include("Get JSON")
    (res.body() should not).include("http://") // no CDN script/style pulls
    (res.body() should not).include("https://")
    get("/ui").body() shouldBe res.body()
  }

  test("HEAD /records is served like GET (status + headers, no body) — Express app.get parity") {
    val res = client.send(
      HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:$port/records?streamname=test-stream"))
        .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    res.statusCode() shouldBe 200
    res.headers().firstValue("Content-Type").get() shouldBe "application/json"
    res.body() shouldBe ""
    // HEAD's whole purpose: advertise the GET body's length without the body
    val getLen = get("/records?streamname=test-stream").body()
      .getBytes(UTF_8).length.toLong
    res.headers().firstValueAsLong("Content-Length").getAsLong shouldBe getLen
  }

  test("non-GET methods on /records return Not Found (Express registers only app.get)") {
    val res = client.send(
      HttpRequest.newBuilder(URI.create(
          s"http://127.0.0.1:$port/records?streamname=test-stream"))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    res.statusCode() shouldBe 404
  }

  test("GET /records without streamname returns the structured 400 shape") {
    val res = get("/records")
    res.statusCode() shouldBe 400
    res.body() shouldBe """{"badRequest":true,"missingRequiredParams":["streamname"],"invalidParams":[]}"""
  }

  test("unknown query params produce invalidParams in the 400 body") {
    val res = get("/records?streamname=test-stream&bogus=1")
    res.statusCode() shouldBe 400
    res.body() shouldBe """{"badRequest":true,"missingRequiredParams":[],"invalidParams":["bogus"]}"""
  }

  test("a source failure returns the {badRequest, error} body") {
    val res = get("/records?streamname=missing-stream")
    res.statusCode() shouldBe 400
    res.body() should startWith("""{"badRequest":true,"error":"""")
    res.body() should include("missing-stream")
  }

  test("malformed percent-encoding gets a 400 body, not a dropped connection") {
    // HttpClient refuses to even send such a URI, so drive a raw socket.
    val sock = new java.net.Socket("127.0.0.1", port)
    try {
      val out = sock.getOutputStream
      out.write(
        ("GET /records?streamname=%zz HTTP/1.1\r\n" +
          s"Host: 127.0.0.1:$port\r\nConnection: close\r\n\r\n").getBytes(UTF_8))
      out.flush()
      val response = new String(sock.getInputStream.readAllBytes(), UTF_8)
      // the JDK server layer rejects the malformed URI itself with a 400
      // before the handler runs; the handler's own catch covers anything
      // that slips through to the decode
      response should startWith("HTTP/1.1 400")
    } finally sock.close()
  }

  test("attribute filters apply over HTTP") {
    val res = get("/records?streamname=test-stream&contactId=2")
    res.statusCode() shouldBe 200
    res.body() shouldBe s"[${payload(2)}]"
  }
}
