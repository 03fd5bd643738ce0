package graft.cli

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.writer.{PgSql, PgTestServer}

/** The composed Quick-Start analog, in ONE run: a `.sql` module
  * against a bearer-gated page_number API whose token arrives via
  * `bearer_token_env` + `.env`, orchestrated by the CLI (render →
  * capture → paged fetch → infer → SQL → sink), then the writer's
  * generated DDL + PG-15 MERGE applied to a LIVE postgres with the
  * pipeline's actual rows. Every piece has its own spec
  * (MainSpec, DotEnvSpec, HttpJsonSourceSpec, PgLiveSpec); this one
  * pins the integration of all of them end-to-end.
  */
class QuickStartE2ESpec extends AnyFunSuite with BeforeAndAfterAll {

  private var server: HttpServer = _
  private var base: String = _
  private val requests = new AtomicInteger(0)

  private val pg = new PgTestServer
  private var pgUp = false

  override def beforeAll(): Unit = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    // bearer-gated, page_number-paginated: 7 users over page_size 3
    server.createContext("/users", (ex: HttpExchange) => {
      requests.incrementAndGet()
      val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      val (status, body) =
        if (!auth.contains("Bearer qs-tok-42")) (403, """{"data": []}""")
        else {
          val params = graft.HttpStub.qparams(ex)
          val page = params.getOrElse("page", "1").toInt
          val per = params.getOrElse("per_page", "100").toInt
          val all = (1 to 7).map(i =>
            s"""{"id": $i, "name": "u$i", "score": ${i * 3 / 2.0}}""")
          val slice = all.slice((page - 1) * per, (page - 1) * per + per)
          (200, s"""{"meta": {"total": 7}, "data": [${slice.mkString(",")}]}""")
        }
      graft.HttpStub.respond(ex, body, status = status)
    })
    server.start()
    base = s"http://127.0.0.1:${server.getAddress.getPort}"
    pgUp = pg.start()
    if (!pgUp) info(s"live PG unavailable, PG leg cancelled:\n${pg.lastBootLog}")
  }

  override def afterAll(): Unit = {
    if (server != null) server.stop(0)
    if (pgUp) pg.stop()
  }

  private def sql(q: String): String = {
    val (code, out) = pg.sqlRaw(q)
    assert(code == 0, s"psql failed for:\n$q\n$out")
    out
  }

  test("CLI + .env bearer + paged fetch + SQL + MERGE into live PG 15") {
    val spark = graft.SparkTestSession.spark
    val dir = Files.createTempDirectory("quickstart")
    val modules = Files.createDirectories(dir.resolve("modules"))
    val warehouse = dir.resolve("warehouse").toString

    Files.writeString(modules.resolve("users.sql"),
      """{{ sink(name="pg_sink") }}
        |SELECT id, name, score
        |FROM {{ use_source("users_api") }}
        |WHERE id <= 6""".stripMargin)
    Files.writeString(dir.resolve("pipelines.yaml"),
      s"""sources:
         |  - name: users_api
         |    url: $base/users
         |    table_destination_name: users
         |    data_path: /data
         |    primary_key_in_dest: id
         |    page_size: 3
         |    bearer_token_env: QS_API_TOKEN
         |    pagination:
         |      kind: page_number
         |      page_param: page
         |      per_page_param: per_page
         |      total_items_pointer: /meta/total
         |targets:
         |  - name: pg_sink
         |    type: postgres
         |    host: localhost
         |    database: unused
         |    auth:
         |      username: u
         |      password: p
         |""".stripMargin)
    // the token exists ONLY in the .env next to the config — the run
    // must thread it .env → bearer_token_env → Authorization header
    Files.writeString(dir.resolve(".env"), "QS_API_TOKEN=qs-tok-42\n")

    requests.set(0)
    val args = Main.Args(
      modulesDir = modules.toString,
      configPath = dir.resolve("pipelines.yaml").toString,
      warehouse = Some(warehouse))
    assert(Main.run(args, spark,
      graft.config.DotEnv.resolver(dir.toString)) == 0)
    // 7 items at page_size 3 = 3 pages, no empty-page probe
    assert(requests.get == 3, s"expected 3 page requests, saw ${requests.get}")

    val out = spark.read.parquet(s"$warehouse/users")
    val rows = out.orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name"),
        r.getAs[Double]("score")))
    assert(rows.toSeq == (1 to 6).map(i => (i.toLong, s"u$i", i * 3 / 2.0)))

    // --- the PG leg: writer-generated DDL + MERGE with these rows ---
    assume(pgUp, "live PG unavailable")
    val digits = sql("SHOW server_version").takeWhile(_.isDigit)
    assume(digits.nonEmpty && digits.toInt >= 15,
      s"server version digits '$digits', MERGE path needs 15+")

    val schema = PgSql.schemaOfSpark(out.schema)
    def lits(rs: Seq[(Long, String, Double)]): Seq[String] =
      rs.flatMap { case (id, name, score) =>
        Seq(id.toString, s"'$name'", score.toString)
      }
    sql("DROP TABLE IF EXISTS users")
    sql(PgSql.createTableSql("users", schema, Seq("id")))
    sql(PgTestServer.fill(
      PgSql.mergeSql("users", schema, Seq("id"), rows.length), lits(rows.toSeq)))
    assert(sql("SELECT count(*) FROM users") == "6")
    assert(sql("SELECT name FROM users WHERE id = 4") == "u4")

    // re-merge with one changed and one new row: MERGE updates in
    // place and inserts the unmatched — the pipeline is re-runnable
    val delta = Seq((4L, "u4-renamed", 99.5), (7L, "u7", 10.5))
    sql(PgTestServer.fill(
      PgSql.mergeSql("users", schema, Seq("id"), delta.length), lits(delta)))
    assert(sql("SELECT count(*) FROM users") == "7")
    assert(sql("SELECT name || '/' || score FROM users WHERE id = 4")
      == "u4-renamed/99.5")
    assert(sql("SELECT name FROM users WHERE id = 7") == "u7")
  }
}
