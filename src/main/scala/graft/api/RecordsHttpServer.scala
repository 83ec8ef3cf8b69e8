package graft.api

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Instant

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.DataFrame

/** HTTP binding of the `GET /records` surface — the reference's primary
  * entry point (an Express route on port 4000, `app/server/index.js:43-85`),
  * reproduced over the JDK's built-in server so the engine exposes the same
  * wire contract without any new dependency:
  *
  *  - `GET /records?...` → 200 with the filtered records as a JSON array
  *    (`responses/index.js:26-37`: Content-Type application/json).
  *  - validation failure → 400 with the structured
  *    `{badRequest, missingRequiredParams, invalidParams}` body (O12).
  *  - source/scan failure → 400 with `{badRequest, error}`
  *    (`app/server/index.js:65-72`).
  *  - any other path → 404 (the Express default for an unmatched route).
  *
  * The response body is the reference-parity bounded echo
  * ([[RecordsQuery.toJsonArray]]); a production deployment sinks the same
  * plan with `df.write` / `writeStream` instead of buffering it through an
  * HTTP response. The source seam is `envelope(streamname)` — exactly the
  * stub point the reference's own e2e suite injects
  * (`app/server/test/index.js:13-18`).
  */
final class RecordsHttpServer(
    envelope: String => DataFrame,
    port: Int = 0,
    now: () => Instant = () => Instant.now()) {

  private val server =
    HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = handleSafely(ex)
  })
  server.setExecutor(null) // serve on the dispatch thread; tests + parity only

  /** Start listening; returns the bound port (useful with port=0). */
  def start(): Int = { server.start(); server.getAddress.getPort }

  def stop(): Unit = server.stop(0)

  private def handleSafely(ex: HttpExchange): Unit =
    try route(ex)
    catch {
      case e: Throwable =>
        // e.g. malformed percent-encoding in the query string: answer with
        // the scan-failure error shape rather than dropping the connection.
        try respond(ex, 400,
          s"""{"badRequest":true,"error":${jsonString(e.toString)}}""")
        catch { case _: Throwable => ex.close() }
    }

  private def route(ex: HttpExchange): Unit =
    // The reference registers ONLY app.get('/records'); Express answers every
    // other (method, path) with its default 404 — mirror that, so a POST
    // never triggers a scan. Express serves HEAD through app.get too
    // (status + headers, no body), so HEAD is routed like GET and
    // [[respond]] suppresses the body. The browser client the reference
    // hosts as a separate static app (O15) is served here at GET / — one
    // self-contained page ([[RecordsUi]]) calling the same /records wire.
    if (Set("/", "/index.html", "/ui")(ex.getRequestURI.getPath) &&
        Set("GET", "HEAD")(ex.getRequestMethod))
      respond(ex, 200, RecordsUi.Html, contentType = "text/html; charset=utf-8")
    else if (ex.getRequestURI.getPath != "/records" ||
        !Set("GET", "HEAD")(ex.getRequestMethod))
      respond(ex, 404, """{"error":"Not Found"}""")
    else {
      val params = parseQuery(ex.getRequestURI.getRawQuery)
      RecordsQuery.validate(params) match {
        case Left(err) => respond(ex, 400, err.toJson)
        case Right(q) =>
          try {
            val df = RecordsQuery.plan(envelope(q.streamName), q, now())
            respond(ex, 200, RecordsQuery.toJsonArray(df))
          } catch {
            case e: Throwable =>
              // Scan-failure shape, `app/server/index.js:65-72`.
              respond(ex, 400,
                s"""{"badRequest":true,"error":${jsonString(e.toString)}}""")
          }
      }
    }

  /** Last-one-wins query-string parse (no params → empty map). */
  private def parseQuery(raw: String): Map[String, String] =
    Option(raw).filter(_.nonEmpty).toSeq
      .flatMap(_.split("&").toSeq).filter(_.nonEmpty)
      .map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) URLDecoder.decode(kv, UTF_8) -> ""
        else URLDecoder.decode(kv.substring(0, i), UTF_8) ->
          URLDecoder.decode(kv.substring(i + 1), UTF_8)
      }.toMap

  private def jsonString(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def respond(ex: HttpExchange, status: Int, body: String,
                      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    if (ex.getRequestMethod == "HEAD") {
      // Express HEAD semantics: same status + headers as GET — INCLUDING the
      // Content-Length the GET body would have (the header HEAD exists to
      // convey) — with no body. The JDK server refuses an explicit length
      // for HEAD (and logs a warning), so set the header directly and
      // declare "no response body" with -1.
      ex.getResponseHeaders.set("Content-Length", bytes.length.toString)
      ex.sendResponseHeaders(status, -1L)
    } else {
      ex.sendResponseHeaders(status, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
    ex.close()
  }
}
