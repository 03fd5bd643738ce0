package graft.http

import java.net.URI
import java.net.URLEncoder
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.ObjectMapper

import graft.config.PipelineConfig.{Retry, Source}

/** OAuth2 client-credentials token acquisition for the HTTP source —
  * the reference lists OAuth2 as planned and unimplemented
  * (/root/reference/README.md:121-124); this wires the standard
  * RFC-6749 §4.4 flow into the existing bearer plumbing: the fetched
  * access token simply BECOMES the source's bearer token, so every
  * downstream path (header build, invalid-char guard, executor
  * fan-out) is the one already tested.
  *
  * Tokens cache per (token_url, client_id) with their `expires_in`
  * horizon (default 3600 s when the server omits it) minus a 30 s
  * refresh margin — a pipeline run touching one API N times fetches
  * one token, and a token expiring mid-session refreshes on the next
  * source resolution rather than failing a page fetch. The token
  * POST follows the page-fetch retry contract: 5xx and IO errors
  * back off and retry, 4xx fails fast with a body peek (a wrong
  * secret should read as a config error, not a transient).
  */
object OAuth2 {

  @transient private lazy val log =
    org.slf4j.LoggerFactory.getLogger(getClass)

  final case class TokenSpec(
      tokenUrl: String, clientId: String, clientSecret: String,
      scope: Option[String], retry: Retry,
      requestTimeoutSecs: Long = 30)

  private final case class Cached(token: String, expiresAtMs: Long)

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Cached]()

  private[http] val refreshMarginMs = 30000L

  /** Drop every cached token (tests; credential rotation). */
  def clearCache(): Unit = cache.clear()

  /** A valid access token for `spec` — cached until its expiry
    * horizon minus the refresh margin, then re-fetched.
    */
  def token(spec: TokenSpec,
      nowMs: () => Long = () => System.currentTimeMillis()): String = {
    val key = (spec.tokenUrl, spec.clientId)
    Option(cache.get(key))
      .filter(_.expiresAtMs - refreshMarginMs > nowMs())
      .map(_.token)
      .getOrElse {
        val fetched = fetchToken(spec, nowMs)
        cache.put(key, fetched)
        fetched.token
      }
  }

  private def enc(s: String): String =
    URLEncoder.encode(s, StandardCharsets.UTF_8)

  private def fetchToken(spec: TokenSpec, nowMs: () => Long): Cached = {
    val form = Seq(
      "grant_type" -> "client_credentials",
      "client_id" -> spec.clientId,
      "client_secret" -> spec.clientSecret) ++ spec.scope.map("scope" -> _)
    val body = form.map { case (k, v) => s"${enc(k)}=${enc(v)}" }.mkString("&")
    val client = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(10)).build()
    val req = HttpRequest.newBuilder(URI.create(spec.tokenUrl))
      .timeout(Duration.ofSeconds(spec.requestTimeoutSecs))
      .header("Content-Type", "application/x-www-form-urlencoded")
      .header("Accept", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    var attempt = 0
    var delayMs = spec.retry.minDelaySecs * 1000
    while (true) {
      attempt += 1
      val resp: Either[Throwable, HttpResponse[String]] =
        try Right(client.send(req, HttpResponse.BodyHandlers.ofString()))
        catch { case e: java.io.IOException => Left(e) }
      resp match {
        case Right(r) if r.statusCode() < 500 =>
          if (r.statusCode() >= 400) throw new RuntimeException(
            s"oauth2 token endpoint ${spec.tokenUrl} returned " +
              s"${r.statusCode()}: ${r.body().take(200)}")
          return parseToken(r.body(), spec, nowMs)
        case other =>
          if (attempt >= spec.retry.maxAttempts) other match {
            case Right(r) => throw new RuntimeException(
              s"oauth2 token endpoint ${spec.tokenUrl} returned " +
                s"${r.statusCode()} after $attempt attempts")
            case Left(e) => throw new RuntimeException(
              s"oauth2 token request to ${spec.tokenUrl} failed " +
                s"after $attempt attempts", e)
          }
          Thread.sleep(delayMs)
          delayMs = math.min(delayMs * 2, spec.retry.maxDelaySecs * 1000)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private def parseToken(body: String, spec: TokenSpec,
      nowMs: () => Long): Cached = {
    val node = new ObjectMapper().readTree(body)
    val tok = Option(node.get("access_token")).map(_.asText())
      .filter(_.nonEmpty).getOrElse(throw new RuntimeException(
        s"oauth2 token endpoint ${spec.tokenUrl} returned no " +
          s"access_token: ${body.take(200)}"))
    val expiresIn = Option(node.get("expires_in")).map(_.asLong(3600L))
      .getOrElse(3600L)
    log.debug("oauth2.token url={} expires_in={}s", spec.tokenUrl,
      expiresIn.toString)
    Cached(tok, nowMs() + expiresIn * 1000)
  }

  /** Resolve a source's auth: an `oauth2:` block fetches (or reuses)
    * a token and installs it as the bearer; otherwise the static
    * bearer env-indirection applies. The CLI's one auth entry point.
    */
  def applyAuth(source: Source,
      getenv: String => Option[String] = sys.env.get,
      nowMs: () => Long = () => System.currentTimeMillis()): Source =
    source.oauth2 match {
      case Some(o) =>
        source.copy(bearerToken = Some(token(TokenSpec(
          o.tokenUrl, o.resolvedClientId(getenv),
          o.resolvedClientSecret(getenv), o.scope, source.retry), nowMs)))
      case None => source.withBearerResolved(getenv)
    }
}
