package graft.http

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.config.PipelineConfig.{Pagination, Retry, Source}
import HttpJsonSource._

/** Pagination/fetch tests against an in-process stub server (the
  * environment has no egress), mirroring the payload shapes of
  * /root/reference/examples/config/pipelines.yaml and FIXTURES.md §1.5.
  */
class HttpJsonSourceSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val flakyHits = new AtomicInteger(0)
  private val rateHits = new java.util.concurrent.atomic.AtomicInteger(0)

  private val retry = Retry(maxAttempts = 3, maxDelaySecs = 1, minDelaySecs = 0)

  private def qparams(ex: HttpExchange): Map[String, String] =
    graft.HttpStub.qparams(ex)

  private def respond(ex: HttpExchange, body: String,
      contentType: String = "application/json", status: Int = 200): Unit =
    graft.HttpStub.respond(ex, body, contentType, status)

  // 7 items served in pages: ids 1..7
  private def items(from: Int, to: Int): String =
    (from to to).map(i => s"""{"id": $i, "name": "u$i"}""").mkString("[", ",", "]")

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/offset", (ex: HttpExchange) => {
      val p = qparams(ex)
      val limit = p("limit").toInt
      val start = p("start").toInt
      val end = math.min(start + limit, 7)
      val page = if (start >= 7) "[]" else items(start + 1, end)
      respond(ex, s"""{"data": $page}""")
    })
    server.createContext("/paged", (ex: HttpExchange) => {
      val p = qparams(ex)
      val page = p("page").toInt
      val per = p("per_page").toInt
      val startIx = (page - 1) * per
      val end = math.min(startIx + per, 7)
      val data = if (startIx >= 7) "[]" else items(startIx + 1, end)
      respond(ex,
        s"""{"data": $data, "metadata": {"total_items": 7, "total_pages": ${(7 + per - 1) / per}}}""")
    })
    server.createContext("/ndjson", (ex: HttpExchange) =>
      respond(ex, "{\"id\": 1}\n{\"id\": 2}\n\n{\"id\": 3}\n",
        contentType = "application/x-ndjson"))
    // a large NDJSON page, written to the socket in chunks (length 0 =
    // chunked transfer) — the shape that must never materialize as one
    // body String on the client
    server.createContext("/ndjson-big", (ex: HttpExchange) => {
      ex.getResponseHeaders.set("Content-Type", "application/x-ndjson")
      ex.sendResponseHeaders(200, 0L)
      val out = new java.io.BufferedOutputStream(ex.getResponseBody, 1 << 16)
      (1 to 50000).foreach { i =>
        out.write(s"""{"id": $i, "body": "${"x" * 64}"}\n"""
          .getBytes(StandardCharsets.UTF_8))
      }
      out.close()
      ex.close()
    })
    server.createContext("/ratelimited", (ex: HttpExchange) => {
      if (rateHits.incrementAndGet() < 2) {
        ex.getResponseHeaders.set("Retry-After", "1")
        respond(ex, """{"error":"slow down"}""", status = 429)
      } else respond(ex, """{"id":7}""")
    })
    server.createContext("/flaky", (ex: HttpExchange) => {
      if (flakyHits.incrementAndGet() < 3) respond(ex, "boom", status = 500)
      else respond(ex, """[{"id": 42}]""")
    })
    server.createContext("/cursor", (ex: HttpExchange) => {
      val p = qparams(ex)
      p.get("cursor") match {
        case None => respond(ex, """{"data": [{"id": 1}], "next_cursor": "c2"}""")
        case Some("c2") => respond(ex, """{"data": [{"id": 2}], "next_cursor": null}""")
        case Some(other) => respond(ex, s"""{"data": [], "err": "$other"}""")
      }
    })
    server.createContext("/auth", (ex: HttpExchange) => {
      val h = ex.getRequestHeaders.getFirst("X-API-KEY")
      if (h == "secret") respond(ex, """[{"ok": true}]""")
      else respond(ex, "[]", status = 403)
    })
    server.createContext("/bearer", (ex: HttpExchange) => {
      val h = Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")
      respond(ex, s"""[{"auth": "$h"}]""")
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  override def afterAll(): Unit = server.stop(0)

  private def spec(path: String, dataPath: Option[String] = Some("/data")) =
    FetchSpec(s"$base$path", Seq.empty, Seq.empty, dataPath, retry)

  test("limit_offset pages until the first empty page (fetcher.rs:302-304)") {
    val pages = fetchLimitOffset(spec("/offset"), "limit", "start", limit = 3).toSeq
    assert(pages.map(_.size) == Seq(3, 3, 1))
    assert(pages.flatten.size == 7)
  }

  test("page_number with Items total hint fans out on executors (fetcher.rs:412-497)") {
    val spark = graft.SparkTestSession.spark
    val fetched = fetchPageNumber(spark, spec("/paged"), "page", "per_page",
      perPage = 3, totalHint = Some(TotalHint.Items("/metadata/total_items")))
    assert(fetched.firstPage.size == 3)
    assert(fetched.rows.count() == 7)
  }

  test("page_number with Pages hint and without hint agree") {
    val spark = graft.SparkTestSession.spark
    val withPages = fetchPageNumber(spark, spec("/paged"), "page", "per_page",
      perPage = 2, totalHint = Some(TotalHint.Pages("/metadata/total_pages")))
    val without = fetchPageNumber(spark, spec("/paged"), "page", "per_page",
      perPage = 2, totalHint = None)
    assert(withPages.rows.count() == 7)
    assert(without.rows.count() == 7)
  }

  test("HTTP/2 parity (reference README.md:128): the client negotiates h2 " +
      "by default and degrades cleanly to a 1.1-only server") {
    // the JDK client's default version IS HTTP_2 — the reference's
    // last roadmap item costs nothing here, but pin it so a future
    // builder edit (e.g. .version(HTTP_1_1) while debugging a proxy)
    // can't silently drop the capability
    val client = graft.http.HttpJsonSource.buildClient(spec("/ndjson"))
    assert(client.version() == java.net.http.HttpClient.Version.HTTP_2,
      "buildClient must prefer HTTP/2 (negotiation falls back per server)")
    // the stub (com.sun HttpServer) speaks only 1.1 and ignores the
    // h2c upgrade — the exchange must complete on the downgraded
    // protocol, which is exactly the mixed-fleet production story
    val req = java.net.http.HttpRequest.newBuilder(
      java.net.URI.create(s"$base/ndjson")).GET().build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() == 200 &&
      resp.version() == java.net.http.HttpClient.Version.HTTP_1_1,
      s"downgrade to the server's protocol must be clean, got ${resp.version()}")
  }

  test("NDJSON bodies framed line-by-line (fetcher.rs:61-66,95-133)") {
    val rows = fetchPage(buildClient(spec("/ndjson")),
      spec("/ndjson", dataPath = None), Seq.empty)
    assert(rows == Seq("""{"id":1}""", """{"id":2}""", """{"id":3}"""))
  }

  test("large chunked NDJSON body streams through the line path (fetcher.rs:115-124)") {
    val s = spec("/ndjson-big", dataPath = None)
    val rows = fetchPage(buildClient(s), s, Seq.empty)
    assert(rows.size == 50000)
    assert(rows.head.contains("\"id\":1"))
    assert(rows.last.contains("\"id\":50000"))
  }

  test("NDJSON line framing is incremental — one line in flight, not the whole body") {
    var pulled = 0
    val lines = Iterator.tabulate(1000000) { i => pulled += 1; s"""{"n": $i}""" }
    val rows = parseNdjsonLines(lines, None)
    // consuming 10 extracted rows must not have drained the million-line
    // source: the framing reads a line at a time off the stream
    assert(rows.take(10).toSeq.size == 10)
    assert(pulled < 100, s"framing materialized the body ($pulled lines pulled)")
  }

  test("data_path pointer: array flattens, null/missing yields none (fetcher.rs:74-93)") {
    assert(parseBody("""{"data": [{"a":1},{"a":2}]}""", None, Some("/data")).size == 2)
    assert(parseBody("""{"data": null}""", None, Some("/data")).isEmpty)
    assert(parseBody("""{"other": 1}""", None, Some("/data")).isEmpty)
    assert(parseBody("""{"data": {"a": 1}}""", None, Some("/data")) == Seq("""{"a":1}"""))
    assert(parseBody("""{"data": 5}""", None, Some("/data")) == Seq("5"))
  }

  test("retry with backoff recovers from 5xx (http_retry.rs:96-114)") {
    flakyHits.set(0)
    val rows = fetchPage(buildClient(spec("/flaky")),
      spec("/flaky", dataPath = None), Seq.empty)
    assert(rows == Seq("""{"id":42}"""))
    assert(flakyHits.get() == 3)
  }

  test("retry gives up after max_attempts") {
    flakyHits.set(-100) // needs 103 hits to succeed; only 3 attempts allowed
    val e = intercept[RuntimeException] {
      fetchPage(buildClient(spec("/flaky")), spec("/flaky", dataPath = None), Seq.empty)
    }
    assert(e.getMessage.contains("after 3 attempts"))
  }

  test("429 retries with backoff, honoring a Retry-After delta") {
    // rate limiting is the one 4xx a parallel page fan-out reliably
    // produces; failing the partition on it turns a polite server
    // into a hard error. The server's Retry-After (delta-seconds)
    // overrides a shorter computed backoff.
    rateHits.set(0)
    val t0 = System.nanoTime()
    val rows = fetchPage(buildClient(spec("/ratelimited")),
      spec("/ratelimited", dataPath = None), Seq.empty)
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    assert(rows == Seq("""{"id":7}"""))
    assert(rateHits.get() == 2)
    // minDelaySecs = 0, so any wait >= ~1 s came from Retry-After: 1
    assert(elapsedMs >= 900L, s"Retry-After not honored: ${elapsedMs}ms")
  }

  test("4xx fails fast without retry") {
    flakyHits.set(0)
    val s = spec("/auth", dataPath = None)
    val e = intercept[RuntimeException] {
      fetchPage(buildClient(s), s, Seq.empty)
    }
    assert(e.getMessage.contains("HTTP 403"))
  }

  test("custom headers are sent (mod.rs:13-94)") {
    val s = FetchSpec(s"$base/auth", Seq("X-API-KEY" -> "secret"),
      Seq.empty, None, retry)
    assert(fetchPage(buildClient(s), s, Seq.empty) == Seq("""{"ok":true}"""))
  }

  test("bearer token arrives as Authorization: Bearer (mod.rs:32-59)") {
    val s = FetchSpec(s"$base/bearer", Seq.empty, Seq.empty, None, retry,
      bearerToken = Some("tok-123"))
    assert(fetchPage(buildClient(s), s, Seq.empty) ==
      Seq("""{"auth":"Bearer tok-123"}"""))
  }

  test("a valid bearer token replaces a custom Authorization header, like the reference") {
    val s = FetchSpec(s"$base/bearer", Seq("Authorization" -> "ApiKey xyz"),
      Seq.empty, None, retry, bearerToken = Some("tok-9"))
    // reqwest's HeaderMap::insert replaces — one Authorization line out
    assert(effectiveHeaders(s) == Seq("Authorization" -> "Bearer tok-9"))
    assert(fetchPage(buildClient(s), s, Seq.empty) ==
      Seq("""{"auth":"Bearer tok-9"}"""))
  }

  test("invalid bearer token chars skip the header with a warning, like the reference") {
    val s = FetchSpec(s"$base/bearer", Seq.empty, Seq.empty, None, retry,
      bearerToken = Some("bad\ntoken"))
    // the header is dropped (mod.rs:55-58) — the request still succeeds
    assert(fetchPage(buildClient(s), s, Seq.empty) == Seq("""{"auth":""}"""))
    // custom headers survive the dropped bearer
    assert(effectiveHeaders(s.copy(headers = Seq("X-K" -> "v")))
      == Seq("X-K" -> "v"))
  }

  test("cursor pagination threads next_cursor (implemented beyond the reference's stub)") {
    val pages = fetchCursor(spec("/cursor"), "cursor", None).toSeq
    assert(pages.flatten == Seq("""{"id":1}""", """{"id":2}"""))
  }

  test("end-to-end load: source config → DataFrame with inferred schema") {
    val spark = graft.SparkTestSession.spark
    val source = Source(
      name = "users", url = s"$base/offset",
      tableDestinationName = Some("users"),
      headers = Seq.empty, queryParams = Seq.empty,
      pagination = Some(Pagination.LimitOffset("limit", "start")),
      dataPath = Some("/data"), retry = retry, primaryKeyInDest = Some("id"))
    val df = HttpJsonSource.load(spark, source, pageSize = 4)
    assert(df.count() == 7)
    assert(df.schema.fieldNames.toSet == Set("id", "name"))
    assert(df.filter(df("id") > 5).count() == 2)
  }
}
