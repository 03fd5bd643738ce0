package graft.writer

import scala.collection.immutable.ListMap

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import PgSql._

/** Live-PostgreSQL integration for the writer SQL surface (A18, A20,
  * A21, A23): boots a throwaway server from the container's postgres
  * binaries (unix socket only, trust auth) and executes the EXACT SQL
  * the writer generates — DDL with PK, multi-row INSERT, ON CONFLICT
  * upsert, PG-15 MERGE, idempotent TRUNCATE, jsonb casts — via psql.
  *
  * The JDBC bind path (A19 bind lattice, A25 per-partition
  * transactions) still cannot run live: the sandbox has no PostgreSQL
  * JDBC driver jar and no egress to fetch one, so those stay covered
  * by the recorded-bind proxy specs. Placeholders are filled with
  * literals here for the same reason — psql has no extended protocol.
  *
  * Cancels (rather than fails) when postgres binaries are absent or
  * the server cannot boot, so the suite stays green in minimal
  * environments.
  */
class PgLiveSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val pg = new PgTestServer
  private var up: Boolean = false

  override def beforeAll(): Unit = {
    up = pg.start()
    if (!up) info(s"live PG unavailable, tests cancelled:\n${pg.lastBootLog}")
  }

  override def afterAll(): Unit = if (up) pg.stop()

  /** Run SQL, fail the test on error, return trimmed rows output. */
  private def sql(q: String): String = {
    val (code, out) = pg.sqlRaw(q)
    assert(code == 0, s"psql failed for:\n$q\n$out")
    out
  }

  /** Run SQL expecting failure, return the combined error text. */
  private def sqlErr(q: String): String = {
    val (code, out) = pg.sqlRaw(q)
    assert(code != 0, s"expected failure for:\n$q\nbut got:\n$out")
    out
  }

  /** Fill JDBC `?` placeholders with SQL literals, in order. */
  private def fill(sqlText: String, lits: Seq[String]): String =
    PgTestServer.fill(sqlText, lits)

  private val schema = ListMap(
    "id" -> PgBigInt, "name" -> PgText, "score" -> PgDouble,
    "active" -> PgBoolean, "props" -> PgJsonb)

  test("auto-created table enforces the generated PRIMARY KEY (A18)") {
    assume(up)
    sql("DROP TABLE IF EXISTS t_live")
    sql(createTableSql("t_live", schema, Seq("id")))
    sql(createTableSql("t_live", schema, Seq("id"))) // IF NOT EXISTS: idempotent
    sql(fill(insertSql("t_live", schema, 2), Seq(
      "1", "'ada'", "9.5", "true", "'{\"k\": 1}'",
      "2", "'grace'", "8.0", "false", "'{\"k\": 2}'")))
    assert(sql("SELECT count(*) FROM t_live") == "2")
    val err = sqlErr(fill(insertSql("t_live", schema, 1),
      Seq("1", "'dup'", "0", "false", "'{}'")))
    assert(err.contains("duplicate key"), err)
  }

  test("ON CONFLICT upsert updates in place; all-key schema does nothing (A20)") {
    assume(up)
    sql(fill(upsertSql("t_live", schema, Seq("id"), 1),
      Seq("1", "'ada-2'", "10.0", "true", "'{\"k\": 10}'")))
    assert(sql("SELECT name FROM t_live WHERE id = 1") == "ada-2")
    assert(sql("SELECT count(*) FROM t_live") == "2") // no duplicate row
    val keyOnly = ListMap("id" -> PgBigInt)
    sql("DROP TABLE IF EXISTS t_keys")
    sql(createTableSql("t_keys", keyOnly, Seq("id")))
    sql(fill(upsertSql("t_keys", keyOnly, Seq("id"), 1), Seq("7")))
    sql(fill(upsertSql("t_keys", keyOnly, Seq("id"), 1), Seq("7"))) // DO NOTHING
    assert(sql("SELECT count(*) FROM t_keys") == "1")
  }

  test("PG-15 MERGE updates matched rows and inserts new ones (A21/A22)") {
    assume(up)
    val digits = sql("SHOW server_version").takeWhile(_.isDigit)
    assume(digits.nonEmpty && digits.toInt >= 15,
      s"server version digits '$digits', MERGE path needs 15+")
    sql(fill(mergeSql("t_live", schema, Seq("id"), 2), Seq(
      "2", "'grace-2'", "8.5", "true", "'{\"k\": 20}'", // matched → update
      "3", "'alan'", "7.0", "true", "'{\"k\": 3}'"))) // new → insert
    assert(sql("SELECT name FROM t_live WHERE id = 2") == "grace-2")
    assert(sql("SELECT count(*) FROM t_live") == "3")
  }

  test("MERGE with a column that is NULL in every source row still types (typed VALUES)") {
    assume(up)
    val digits = sql("SHOW server_version").takeWhile(_.isDigit)
    assume(digits.nonEmpty && digits.toInt >= 15,
      s"server version digits '$digits', MERGE path needs 15+")
    // without the per-column casts in the VALUES source, an all-NULL
    // bigint/double column fails type inference for the whole batch
    sql(fill(mergeSql("t_live", schema, Seq("id"), 2), Seq(
      "4", "NULL", "NULL", "NULL", "NULL",
      "5", "NULL", "NULL", "NULL", "NULL")))
    assert(sql("SELECT count(*) FROM t_live WHERE name IS NULL") == "2")
  }

  test("jsonb casts round-trip through the generated placeholders") {
    assume(up)
    assert(sql("SELECT props->>'k' FROM t_live WHERE id = 3") == "3")
  }

  test("TRUNCATE empties; on a missing table it raises SQLSTATE 42P01 (A23)") {
    assume(up)
    sql(truncateSql("t_live"))
    assert(sql("SELECT count(*) FROM t_live") == "0")
    // the writer's idempotency contract swallows exactly 42P01
    val err = sqlErr(truncateSql("t_never_existed"))
    assert(err.contains("does not exist"), err)
  }

  test("COPY stream round-trips the bind lattice's edge cases (live)") {
    assume(up)
    val cschema = ListMap("id" -> PgBigInt, "name" -> PgText,
      "score" -> PgDouble, "active" -> PgBoolean, "props" -> PgJsonb,
      "blob" -> PgBytea)
    sql("DROP TABLE IF EXISTS t_copy")
    sql(createTableSql("t_copy", cschema, Seq("id")))
    val rows = Seq(
      Seq[Any](1L, "plain", 2.5d, true, """{"k": 1}""",
        Array[Byte](0xde.toByte, 0xad.toByte)),
      // lattice coercions + every escaped character in one text field
      Seq[Any](2L, "tab\there\nnl\\bs\rcr", "1e3", "1", "{oops", null),
      Seq[Any](3L, null, Double.NaN, false, null, Array.empty[Byte]))
    val data = rows.map(PgCopy.encodeRow(_, cschema)).mkString
    val (code, out) = pg.copyRaw(PgCopy.copySql("t_copy", cschema), data)
    assert(code == 0, out)
    assert(sql("SELECT count(*) FROM t_copy") == "3")
    // server-side equality so tab/newline bytes never pass through
    // psql's own output escaping
    assert(sql(
      "SELECT name = E'tab\\there\\nnl\\\\bs\\rcr' FROM t_copy WHERE id = 2") == "t")
    assert(sql("SELECT score FROM t_copy WHERE id = 2") == "1000") // "1e3" parsed
    assert(sql("SELECT active FROM t_copy WHERE id = 2") == "t") // "1" is true
    assert(sql("SELECT props::text FROM t_copy WHERE id = 2") == "\"{oops\"")
    assert(sql("SELECT blob IS NULL FROM t_copy WHERE id = 2") == "t")
    assert(sql("SELECT blob = '\\xdead'::bytea FROM t_copy WHERE id = 1") == "t")
    assert(sql("SELECT props->>'k' FROM t_copy WHERE id = 1") == "1")
    assert(sql("SELECT name IS NULL FROM t_copy WHERE id = 3") == "t")
    assert(sql("SELECT score::text FROM t_copy WHERE id = 3") == "NaN")
    assert(sql("SELECT blob = ''::bytea FROM t_copy WHERE id = 3") == "t")
  }

  test("COPY append throughput >= multi-row INSERT at batch 5000 (live)") {
    assume(up)
    val tschema = ListMap("id" -> PgBigInt, "name" -> PgText,
      "score" -> PgDouble, "active" -> PgBoolean, "props" -> PgJsonb)
    sql("DROP TABLE IF EXISTS t_ins")
    sql("DROP TABLE IF EXISTS t_cpy")
    sql(createTableSql("t_ins", tschema))
    sql(createTableSql("t_cpy", tschema))
    val n = 50000
    val batch = 5000 // the writer's default flush size
    def rowVals(i: Int): Seq[Any] =
      Seq(i.toLong, s"user_$i", i * 0.5, i % 2 == 0, s"""{"k": $i}""")

    // INSERT side: the same 5000-row multi-row statements the writer
    // flushes, literals inlined (psql has no extended protocol), all
    // batches in ONE stdin-fed psql process
    val insertScript = (0 until n).grouped(batch).map { chunk =>
      val values = chunk.map { i =>
        val Seq(id, nm, sc, ac, pr) = rowVals(i)
        s"($id, '$nm', $sc, $ac, '$pr')"
      }.mkString(", ")
      s"INSERT INTO t_ins (id, name, score, active, props) VALUES $values;"
    }.mkString("\n")
    // COPY side: the writer's exact encoded stream, inline in a script
    // through the identical one-process stdin channel
    val copyData = (0 until n).map(i =>
      PgCopy.encodeRow(rowVals(i), tschema)).mkString
    val copyScript =
      PgCopy.copySql("t_cpy", tschema) + ";\n" + copyData + "\\.\n"

    def timed(script: String): Double = {
      val t0 = System.nanoTime()
      val (code, out) = pg.scriptRaw(script)
      assert(code == 0, out)
      (System.nanoTime() - t0) / 1e9
    }
    val insSec = timed(insertScript)
    val cpySec = timed(copyScript)
    assert(sql("SELECT count(*), sum(id) FROM t_ins") ==
      sql("SELECT count(*), sum(id) FROM t_cpy"))
    info(f"INSERT $n rows: $insSec%.2f s (${n / insSec}%.0f rows/s); " +
      f"COPY: $cpySec%.2f s (${n / cpySec}%.0f rows/s)")
    assert(cpySec <= insSec,
      f"COPY ($cpySec%.2f s) should not be slower than INSERT ($insSec%.2f s)")
  }

  test("schema evolution between runs: add + widen, data carried (README.md:125)") {
    assume(up)
    // run 1: the source's first shape — integral score, bool flag
    val v1 = ListMap("id" -> PgBigInt, "score" -> PgBigInt, "flag" -> PgBoolean)
    sql("DROP TABLE IF EXISTS t_evolve")
    sql(createTableSql("t_evolve", v1, Seq("id")))
    sql(fill(insertSql("t_evolve", v1, 2), Seq(
      "1", "9", "true",
      "2", "4", "false")))

    // run 2: the API drifted — score became fractional, flag became a
    // count, and a new jsonb field appeared. Read the live columns
    // back through the SAME query text the writer uses over JDBC.
    val v2 = ListMap("id" -> PgBigInt, "score" -> PgDouble,
      "flag" -> PgBigInt, "tags" -> PgJsonb)
    val existing = ListMap(sql(existingSchemaSql("t_evolve")).split('\n').toSeq
      .filter(_.nonEmpty)
      .flatMap { line =>
        val Array(name, typ) = line.split('|')
        ofPgTypeName(typ).map(name -> _)
      }: _*)
    assert(existing == v1) // round-trips through information_schema
    val stmts = evolveSql("t_evolve", existing, v2)
    assert(stmts.size == 3, stmts) // widen score, degrade flag, add tags
    stmts.foreach(sql)

    // pre-existing rows carried: score widened losslessly, the
    // conflicted flag stringified exactly as bindValue would have
    // bound a boolean into a TEXT destination, tags backfilled NULL
    assert(sql("SELECT score FROM t_evolve WHERE id = 1") == "9")
    assert(sql("SELECT pg_typeof(score) FROM t_evolve LIMIT 1") == "double precision")
    assert(sql("SELECT flag FROM t_evolve WHERE id = 1") == "true")
    assert(sql("SELECT count(*) FROM t_evolve WHERE tags IS NULL") == "2")

    // run 2's insert lands through the evolved shape; evolution is
    // idempotent (second diff emits nothing)
    // flag's literal arrives as text — the psql analog of bindValue
    // stringifying a number into a TEXT destination
    sql(fill(insertSql("t_evolve", v2, 1), Seq("3", "7.5", "'12'", "'[\"a\"]'")))
    assert(sql("SELECT score FROM t_evolve WHERE id = 3") == "7.5")
    assert(sql("SELECT tags->>0 FROM t_evolve WHERE id = 3") == "a")
    assert(evolveSql("t_evolve", v2, v2).isEmpty)
  }
}
