package graft.writer

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.http.OAuth2

/** BigQuery sink over the REST `jobs.query` endpoint — the writer the
  * reference plans (/root/reference/README.md:120) built on this
  * engine's [[DataWriter]] seam. BigQuery has no JDBC surface of its
  * own; its public API is HTTPS + OAuth2 bearer, which is exactly the
  * client stack this engine already ships ([[graft.http.OAuth2]],
  * `java.net.http`), so unlike a driver-jar writer this one is fully
  * exercisable end-to-end against a stub server in tests.
  *
  * Distributed shape mirrors [[PostgresWriter]]: DDL once on the
  * driver, then each executor partition posts its own literal-SQL
  * batches (INSERT for append, MERGE for merge — BigQuery's native
  * upsert). Batches are bounded BOTH by row count and by rendered
  * query size, because `jobs.query` caps un-parameterized query text
  * at 1 MB ([[BigQueryWriter.MaxQueryBytes]] keeps headroom under it).
  *
  * Auth is either a static bearer token or an [[OAuth2.TokenSpec]];
  * with a spec, each JVM (driver, every executor) resolves and
  * caches its own token through the shared OAuth2 cache and retries
  * once on a 401 after invalidating — the same lifecycle as the HTTP
  * source path.
  */
final class BigQueryWriter(
    endpoint: String, // e.g. https://bigquery.googleapis.com (stub in tests)
    project: String,
    dataset: String,
    table: String,
    auth: BigQueryWriter.Auth,
    primaryKey: Seq[String] = Seq.empty,
    batchSize: Int = 500,
    autoCreate: Boolean = true,
    requestTimeoutSecs: Long = 60) extends DataWriter with Serializable {

  private def tablePath = s"$dataset.$table"

  /** Same normalization contract as the other writers: nested →
    * JSON text, temporals → strings, so literal rendering sees only
    * scalar JVM types.
    */
  private def normalized(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.toIndexedSeq.map { f =>
      f.dataType match {
        case _: StructType | _: ArrayType | _: MapType =>
          to_json(col(f.name)).as(f.name)
        case TimestampType | DateType =>
          col(f.name).cast(StringType).as(f.name)
        case _ => col(f.name)
      }
    }
    df.select(cols: _*)
  }

  override def truncate(): Unit =
    try BigQueryWriter.post(endpoint, project, auth,
      BqSql.truncateSql(tablePath), requestTimeoutSecs)
    catch {
      // idempotent like the Postgres 42P01 swallow: BigQuery reports
      // a missing table as a notFound job error ("Not found: Table")
      case e: graft.errors.GraftError.WriterError
          if e.getMessage.contains("notFound") ||
            e.getMessage.contains("Not found") => ()
    }

  override def write(df: DataFrame, mode: WriteMode): WriteStats = {
    if (mode == WriteMode.Merge && primaryKey.isEmpty)
      throw new IllegalArgumentException("merge mode requires a primary key")
    val prepared = normalized(df)
    // typed off the ORIGINAL schema so normalized nested columns keep
    // their JSON destination (their frame type is now string)
    val schema = BqSql.schemaOfSpark(df.schema)

    if (autoCreate)
      BigQueryWriter.post(endpoint, project, auth,
        BqSql.createTableSql(tablePath, schema, primaryKey), requestTimeoutSecs)

    val (ep, proj, a, tbl, pk, bs, timeout) =
      (endpoint, project, auth, tablePath, primaryKey, batchSize, requestTimeoutSecs)
    val md = mode
    val counter = df.sparkSession.sparkContext.longAccumulator("rowsWritten")

    prepared.foreachPartition { (rows: Iterator[Row]) =>
      val buf = new scala.collection.mutable.ArrayBuffer[Seq[Any]](bs)
      var bufBytes = 0
      def flush(): Unit = if (buf.nonEmpty) {
        val sql = md match {
          case WriteMode.Append => BqSql.insertSql(tbl, schema, buf.toSeq)
          case WriteMode.Merge => BqSql.mergeSql(tbl, schema, pk, buf.toSeq)
        }
        BigQueryWriter.post(ep, proj, a, sql, timeout)
        counter.add(buf.size.toLong)
        buf.clear()
        bufBytes = 0
      }
      rows.foreach { r =>
        val vals = r.toSeq
        // conservative rendered-size estimate: literals roughly double
        // worst-case under escaping, plus per-value punctuation
        val rowBytes = vals.iterator.map {
          case null => 4
          case s: String => 2 * s.length + 8
          case b: Array[Byte] => (b.length * 4) / 3 + 16
          case other => other.toString.length + 4
        }.sum
        // flush BEFORE the cap would be breached, so no statement ever
        // renders past it (a single over-cap row still ships alone —
        // nothing smaller could carry it)
        if (buf.nonEmpty &&
            (buf.size >= bs || bufBytes + rowBytes >= BigQueryWriter.MaxQueryBytes))
          flush()
        buf += vals
        bufBytes += rowBytes
      }
      flush()
    }
    WriteStats(counter.value)
  }
}

object BigQueryWriter {

  /** Flush threshold for rendered literal bytes — half of BigQuery's
    * documented 1 MB un-parameterized query cap, leaving headroom for
    * escaping growth and statement scaffolding.
    */
  val MaxQueryBytes: Int = 512 * 1024

  sealed trait Auth extends Serializable
  final case class StaticToken(token: String) extends Auth
  final case class OAuth(spec: OAuth2.TokenSpec) extends Auth

  private def bearer(a: Auth): String = a match {
    case StaticToken(t) => t
    case OAuth(spec) => OAuth2.token(spec)
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper

  /** One client per JVM — `java.net.http.HttpClient` is thread-safe
    * and pools connections, so every partition's batch POSTs reuse
    * keep-alive connections instead of paying a TLS handshake per
    * statement.
    */
  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(30)).build()

  /** POST one statement to `jobs.query`; retries once with a fresh
    * token on 401 (OAuth only), fails on HTTP or job errors. Package
    * scope so the spec can drive single statements.
    */
  private[writer] def post(endpoint: String, project: String, auth: Auth,
      sql: String, timeoutSecs: Long): Unit = {
    val body = mapper.createObjectNode()
    body.put("query", sql)
    body.put("useLegacySql", false)
    val payload = mapper.writeValueAsString(body)

    def send(token: String): HttpResponse[String] = {
      val req = HttpRequest.newBuilder()
        .uri(URI.create(s"$endpoint/bigquery/v2/projects/$project/queries"))
        .timeout(Duration.ofSeconds(timeoutSecs))
        .header("Authorization", s"Bearer $token")
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(payload, StandardCharsets.UTF_8))
        .build()
      client.send(req, HttpResponse.BodyHandlers.ofString())
    }

    var resp = send(bearer(auth))
    if (resp.statusCode() == 401) auth match {
      case OAuth(spec) =>
        // expired/revoked grant: evict and retry once with a fresh
        // token, the HTTP-source 401 recovery contract
        OAuth2.invalidate(spec)
        resp = send(bearer(auth))
      case _ => ()
    }
    if (resp.statusCode() / 100 != 2)
      throw new graft.errors.GraftError.WriterError(
        s"bigquery jobs.query HTTP ${resp.statusCode()}: ${resp.body().take(500)}")
    val node = mapper.readTree(resp.body())
    if (node.has("errors") && node.get("errors").size() > 0)
      throw new graft.errors.GraftError.WriterError(
        s"bigquery job errors: ${node.get("errors").toString.take(500)}")
  }
}
