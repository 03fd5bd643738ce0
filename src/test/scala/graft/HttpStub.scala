package graft

import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.HttpExchange

/** Shared helpers for the com.sun.net.httpserver stub servers the
  * HTTP-facing suites boot (HttpJsonSourceSpec, MainSpec,
  * LocalClusterSpec, QuickStartE2ESpec) — one copy of the query-param
  * parse and the respond idiom instead of one drifting copy per
  * suite.
  */
object HttpStub {

  /** Query params of the request, URL-decoded, last-wins. */
  def qparams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split('&')
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
      }.toMap

  /** Write a complete response and close the exchange. */
  def respond(ex: HttpExchange, body: String,
      contentType: String = "application/json", status: Int = 200): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }
}
