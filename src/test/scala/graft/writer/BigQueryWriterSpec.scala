package graft.writer

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.HttpStub.respond
import graft.config.PipelineConfig.Retry
import graft.http.OAuth2

/** BigQuery writer e2e against a stub `jobs.query` endpoint — the
  * whole distributed write path runs for real (normalize, partition
  * batches, literal SQL, bearer auth, job-error surfacing); only the
  * Google service is stubbed. The reference plans this writer and
  * never built it (/root/reference/README.md:120).
  */
class BigQueryWriterSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def withServer(f: (HttpServer, String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.start()
    try f(server, s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  private def readBody(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper

  private def queryOf(body: String): String =
    mapper.readTree(body).get("query").asText()

  test("append: CREATE once on the driver, INSERT batches per partition") {
    import spark.implicits._
    val df = Seq((1L, "it's a", Seq(1L, 2L)), (2L, "b", Seq(3L)))
      .toDF("id", "name", "tags")

    withServer { (server, base) =>
      val queries = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      @volatile var lastAuth = ""
      server.createContext("/bigquery/v2/projects/p1/queries", ex => {
        lastAuth = ex.getRequestHeaders.getFirst("Authorization")
        queries.add(queryOf(readBody(ex)))
        respond(ex, """{"jobComplete": true}""")
      })

      val w = new BigQueryWriter(base, "p1", "ds", "t",
        BigQueryWriter.StaticToken("tok-1"))
      val stats = w.write(df, WriteMode.Append)
      assert(stats.rowsWritten == 2)
      assert(lastAuth == "Bearer tok-1")

      import scala.jdk.CollectionConverters._
      val qs = queries.asScala.toList
      val creates = qs.filter(_.startsWith("CREATE TABLE"))
      assert(creates == List("CREATE TABLE IF NOT EXISTS `ds.t` " +
        "(`id` INT64, `name` STRING, `tags` JSON)"))
      val inserts = qs.filter(_.startsWith("INSERT"))
      // every row lands exactly once, nested column as a JSON literal,
      // quote escaped the GoogleSQL way
      assert(inserts.exists(_.contains("""(1, 'it\'s a', JSON '[1,2]')""")))
      assert(inserts.exists(_.contains("(2, 'b', JSON '[3]')")))
      assert(inserts.forall(_.startsWith(
        "INSERT INTO `ds.t` (`id`, `name`, `tags`) VALUES ")))
    }
  }

  test("merge mode posts MERGE and requires a key; job errors surface") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "v")

    withServer { (server, base) =>
      val queries = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      server.createContext("/bigquery/v2/projects/p1/queries", ex => {
        val q = queryOf(readBody(ex))
        queries.add(q)
        if (q.startsWith("MERGE") && q.contains("boom"))
          respond(ex, """{"errors": [{"reason": "invalidQuery"}]}""")
        else respond(ex, """{"jobComplete": true}""")
      })

      val w = new BigQueryWriter(base, "p1", "ds", "t",
        BigQueryWriter.StaticToken("tok"), primaryKey = Seq("id"))
      w.write(df, WriteMode.Merge)
      import scala.jdk.CollectionConverters._
      val merge = queries.asScala.find(_.startsWith("MERGE")).get
      assert(merge.startsWith("MERGE `ds.t` AS t USING (SELECT 1 AS `id`, 'a' AS `v`)"))
      assert(merge.contains("WHEN NOT MATCHED THEN INSERT (`id`, `v`)"))

      intercept[IllegalArgumentException] {
        new BigQueryWriter(base, "p1", "ds", "t",
          BigQueryWriter.StaticToken("tok")).write(df, WriteMode.Merge)
      }

      // a job-level error (HTTP 200 + errors array) fails the write;
      // thrown in an executor task, it surfaces wrapped by Spark —
      // the WriterError must sit in the cause chain
      val err = intercept[Exception] {
        new BigQueryWriter(base, "p1", "ds", "boom",
          BigQueryWriter.StaticToken("tok"), primaryKey = Seq("id"))
          .write(Seq((9L, "boom")).toDF("id", "v"), WriteMode.Merge)
      }
      val chain = Iterator.iterate[Throwable](err)(_.getCause)
        .takeWhile(_ != null).toList
      assert(chain.exists(_.isInstanceOf[graft.errors.GraftError.WriterError]),
        chain.map(_.getClass.getName))
      assert(chain.exists(t =>
        Option(t.getMessage).exists(_.contains("invalidQuery"))))
    }
  }

  test("oauth auth: fetches a token, retries once with fresh grant on 401") {
    import spark.implicits._
    OAuth2.clearCache()
    val df = Seq((1L, "a")).toDF("id", "v")

    withServer { (server, base) =>
      val tokenCalls = new AtomicInteger(0)
      server.createContext("/token", ex => {
        readBody(ex)
        val n = tokenCalls.incrementAndGet()
        respond(ex,
          s"""{"access_token":"t$n","token_type":"Bearer","expires_in":3600}""")
      })
      val rejected = new AtomicInteger(0)
      server.createContext("/bigquery/v2/projects/p1/queries", ex => {
        val auth = ex.getRequestHeaders.getFirst("Authorization")
        readBody(ex)
        // the first grant is always rejected: simulates a token the
        // API considers revoked even though it just minted
        if (auth == "Bearer t1") {
          rejected.incrementAndGet()
          respond(ex, """{"error": "expired"}""", status = 401)
        } else respond(ex, """{"jobComplete": true}""")
      })

      val spec = OAuth2.TokenSpec(s"$base/token", "cid", "secret", None,
        Retry(maxAttempts = 2, maxDelaySecs = 1, minDelaySecs = 0))
      val w = new BigQueryWriter(base, "p1", "ds", "t",
        BigQueryWriter.OAuth(spec))
      val stats = w.write(df, WriteMode.Append)
      assert(stats.rowsWritten == 1)
      assert(rejected.get() >= 1) // the 401 path actually exercised
      assert(tokenCalls.get() >= 2) // invalidate forced a re-grant
    }
  }

  test("truncate is idempotent on a missing table, like the Postgres 42P01 swallow") {
    withServer { (server, base) =>
      val calls = new AtomicInteger(0)
      server.createContext("/bigquery/v2/projects/p1/queries", ex => {
        val q = queryOf(readBody(ex))
        calls.incrementAndGet()
        if (q.startsWith("TRUNCATE"))
          respond(ex,
            """{"errors": [{"reason": "notFound", """ +
              """"message": "Not found: Table p1:ds.missing"}]}""")
        else if (q.contains("boom"))
          respond(ex, """{"errors": [{"reason": "invalidQuery"}]}""")
        else respond(ex, """{"jobComplete": true}""")
      })
      val w = new BigQueryWriter(base, "p1", "ds", "missing",
        BigQueryWriter.StaticToken("tok"))
      w.truncate() // must not throw
      assert(calls.get() == 1)
      // only notFound is swallowed — other failures still surface
      intercept[graft.errors.GraftError.WriterError] {
        BigQueryWriter.post(base, "p1",
          BigQueryWriter.StaticToken("tok"), "SELECT boom", 5)
      }
    }
  }
}
