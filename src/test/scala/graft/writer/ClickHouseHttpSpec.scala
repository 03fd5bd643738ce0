package graft.writer

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.HttpStub.respond

/** ClickHouse writer end-to-end over the native SQL-over-HTTP
  * transport against a stub server — the BigQueryWriter test pattern.
  * Unlike the JDBC path (no driver jar in this sandbox), this drives
  * the ACTUAL distributed write path: DDL on the driver, NDJSON
  * INSERT batches from executor partitions, the driver-side
  * OPTIMIZE FINAL compaction, evolution read-back, and the
  * writer-managed version column.
  */
class ClickHouseHttpSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  /** Every POST body (the SQL text, plus NDJSON for inserts). */
  private def withServer(tsvFor: String => Option[String] = _ => None)(
      f: (java.util.concurrent.ConcurrentLinkedQueue[String], String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val bodies = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    server.createContext("/", (ex: HttpExchange) => {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      bodies.add(body)
      respond(ex, tsvFor(body).getOrElse(""))
    })
    server.start()
    try f(bodies, s"http://127.0.0.1:${server.getAddress.getPort}/?database=db")
    finally server.stop(0)
  }

  import scala.jdk.CollectionConverters._

  test("merge over HTTP: versioned DDL, NDJSON partition inserts, one OPTIMIZE FINAL") {
    import spark.implicits._
    val df = Seq((1L, "it's \"a\""), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("id", "v").repartition(2)
    withServer() { (bodies, base) =>
      val w = new ClickHouseWriter(base, "u1", "p1", "t", primaryKey = Seq("id"))
      val stats = w.write(df, WriteMode.Merge)
      assert(stats.rowsWritten == 4)
      val qs = bodies.asScala.toList
      assert(qs.head ==
        "CREATE TABLE IF NOT EXISTS `t` (`id` Int64, `v` Nullable(String), " +
          "`__graft_ver` UInt64) ENGINE = ReplacingMergeTree(`__graft_ver`) " +
          "ORDER BY (`id`)")
      assert(qs.last == "OPTIMIZE TABLE `t` FINAL")
      val inserts = qs.filter(_.startsWith("INSERT"))
      assert(inserts.nonEmpty)
      inserts.foreach(b => assert(b.startsWith(
        "INSERT INTO `t` (`id`, `v`, `__graft_ver`) FORMAT JSONEachRow\n")))
      // every row landed exactly once, JSON-escaped, version stamped
      val rows = inserts.flatMap(_.linesIterator.drop(1)).filter(_.nonEmpty)
      assert(rows.size == 4)
      assert(rows.exists(_.contains(""""id":1,"v":"it's \"a\"","__graft_ver":""")))
      // rows within one partition carry strictly increasing versions
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper
      inserts.foreach { b =>
        val vers = b.linesIterator.drop(1).filter(_.nonEmpty)
          .map(l => mapper.readTree(l).get("__graft_ver").asLong()).toList
        assert(vers == vers.sorted && vers.distinct == vers,
          s"in-partition versions must strictly increase: $vers")
      }
    }
  }

  test("a second write() call out-versions the first — later loads always win") {
    import spark.implicits._
    val df = Seq((1L, "first")).toDF("id", "v").coalesce(1)
    val df2 = Seq((1L, "second")).toDF("id", "v").coalesce(1)
    withServer() { (bodies, base) =>
      val w = new ClickHouseWriter(base, "u", "p", "t", primaryKey = Seq("id"))
      w.write(df, WriteMode.Merge)
      w.write(df2, WriteMode.Merge)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper
      val vers = bodies.asScala.toList.filter(_.startsWith("INSERT"))
        .flatMap(_.linesIterator.drop(1).filter(_.nonEmpty))
        .map(l => mapper.readTree(l).get("__graft_ver").asLong())
      assert(vers.size == 2)
      assert(vers(1) > vers(0),
        "the replace-on-merge must keep the LATER load's row")
    }
  }

  test("append without a key: plain MergeTree, no version column") {
    import spark.implicits._
    val df = Seq((1L, 2.5), (2L, 3.5)).toDF("id", "score").coalesce(1)
    withServer() { (bodies, base) =>
      val w = new ClickHouseWriter(base, "u", "p", "t")
      val stats = w.write(df, WriteMode.Append)
      assert(stats.rowsWritten == 2)
      val qs = bodies.asScala.toList
      assert(qs.head == "CREATE TABLE IF NOT EXISTS `t` " +
        "(`id` Nullable(Int64), `score` Nullable(Float64)) " +
        "ENGINE = MergeTree ORDER BY tuple()")
      assert(!qs.exists(_.contains("__graft_ver")))
      assert(!qs.exists(_.startsWith("OPTIMIZE")))
    }
  }

  test("schema evolution over HTTP: read-back TSV drives ALTERs; ver column untouched") {
    import spark.implicits._
    // destination already has id + v(Int64) + the version column;
    // incoming widens v to Float64 and adds tags
    val tsv = "id\tInt64\nv\tNullable(Int64)\n__graft_ver\tUInt64\n"
    val df = Seq((1L, 2.5, "x")).toDF("id", "v", "tags").coalesce(1)
    withServer(b => if (b.startsWith("SELECT name, type")) Some(tsv) else None) {
      (bodies, base) =>
        val w = new ClickHouseWriter(base, "u", "p", "t",
          primaryKey = Seq("id"), schemaEvolution = true)
        w.write(df, WriteMode.Merge)
        val qs = bodies.asScala.toList
        val alters = qs.filter(_.startsWith("ALTER"))
        assert(alters == Seq(
          "ALTER TABLE `t` MODIFY COLUMN `v` Nullable(Float64)",
          "ALTER TABLE `t` ADD COLUMN IF NOT EXISTS `tags` Nullable(String)"))
    }
  }

  test("truncate posts the idempotent statement; HTTP errors surface as WriterError") {
    withServer() { (bodies, base) =>
      new ClickHouseWriter(base, "u", "p", "t").truncate()
      assert(bodies.asScala.toList == List("TRUNCATE TABLE IF EXISTS `t`"))
    }
    // a server error fails the statement instead of being swallowed
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => {
      ex.getRequestBody.readAllBytes()
      respond(ex, "Code: 60. DB::Exception: Table db.t does not exist", status = 500)
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}/"
      val err = intercept[graft.errors.GraftError.WriterError] {
        new ClickHouseWriter(base, "u", "p", "t").truncate()
      }
      assert(err.getMessage.contains("500"))
    } finally server.stop(0)
  }

  test("TabSeparated read-back unescapes server escapes — a backslash watermark round-trips") {
    // ClickHouse TSV output escapes \t \n \r \\ etc.; queryPairs must
    // DECODE them or an opaque cursor watermark containing any of
    // those bytes comes back corrupted (and the HTTP and JDBC
    // transports disagree on the same stored row)
    assert(ClickHouseWriter.unescapeTsv("""plain""") == "plain")
    assert(ClickHouseWriter.unescapeTsv("""a\\b""") == """a\b""")
    assert(ClickHouseWriter.unescapeTsv("""tab\there""") == "tab\there")
    assert(ClickHouseWriter.unescapeTsv("""line\nbreak""") == "line\nbreak")
    assert(ClickHouseWriter.unescapeTsv("""cr\rchar""") == "cr\rchar")
    assert(ClickHouseWriter.unescapeTsv("""q\'uote""") == "q'uote")
    // read-side leniency: unknown escape and trailing backslash pass through
    assert(ClickHouseWriter.unescapeTsv("""odd\zseq""") == """odd\zseq""")
    assert(ClickHouseWriter.unescapeTsv("""tail\""") == """tail\""")

    // end-to-end: a stub emitting the ESCAPED form, the sync-state
    // read path returning the decoded watermark
    val stored = "cursor\\with\ttab"
    val escaped = """cursor\\with\ttab"""
    withServer(b =>
      if (b.startsWith("SELECT `source_name`, `watermark`")) Some(s"src1\t$escaped\n")
      else None) { (_, base) =>
      val st = new ChSyncState(base, "u", "p")
      assert(st.get("src1").contains(stored))
    }
  }

  test("JSONEachRow rendering follows the bind coercion lattice") {
    import scala.collection.immutable.ListMap
    import ChSql._
    val schema = ListMap("i" -> ChInt64, "f" -> ChFloat64,
      "s" -> ChString, "b" -> ChBool)
    val out = jsonEachRow(schema, Seq(
      Seq("42", "2.5", 7L, "true"),          // strings parse, number stringifies
      Seq(1.5, Double.NaN, "tab\there", "1"), // fractional→null, NaN→null, escape
      Seq(null, null, null, null)))
    assert(out ==
      """{"i":42,"f":2.5,"s":"7","b":true}""" + "\n" +
      """{"i":null,"f":null,"s":"tab\there","b":true}""" + "\n" +
      """{"i":null,"f":null,"s":null,"b":null}""" + "\n")
  }

  test("staged-swap replace over HTTP: stage, load, ONE atomic exchange, drop old") {
    import spark.implicits._
    val df = Seq((1L, "new-a"), (2L, "new-b")).toDF("id", "v").coalesce(1)
    withServer() { (bodies, base) =>
      val w = new ClickHouseWriter(base, "u", "p", "t", primaryKey = Seq("id"))
      val stats = w.replace(df)
      assert(stats.rowsWritten == 2)
      val qs = bodies.asScala.toList
      // phase 1: staging reset, ensure-dest, then staging as an empty
      // STRUCTURAL CLONE of the destination (user-managed columns,
      // engine, TTL all survive the swap) — the destination's ROWS
      // are untouched until the exchange
      assert(qs.take(3) == List(
        "DROP TABLE IF EXISTS `t__graft_stage`",
        "CREATE TABLE IF NOT EXISTS `t` " +
          "(`id` Int64, `v` Nullable(String), `__graft_ver` UInt64) " +
          "ENGINE = ReplacingMergeTree(`__graft_ver`) ORDER BY (`id`)",
        "CREATE TABLE `t__graft_stage` AS `t`"))
      // phase 2: every insert targets STAGING, never the destination,
      // and replace adds no OPTIMIZE (the swap ships the relation
      // wholesale)
      val inserts = qs.filter(_.startsWith("INSERT"))
      assert(inserts.nonEmpty && inserts.forall(
        _.startsWith("INSERT INTO `t__graft_stage` ")))
      assert(!qs.exists(_.startsWith("OPTIMIZE")))
      // phase 3: ONE atomic exchange, then the old generation drops
      assert(qs.takeRight(2) == List(
        "EXCHANGE TABLES `t` AND `t__graft_stage`",
        "DROP TABLE IF EXISTS `t__graft_stage`"))
      // no TRUNCATE anywhere: there is no empty-destination instant
      assert(!qs.exists(_.startsWith("TRUNCATE")))
    }
  }
}
