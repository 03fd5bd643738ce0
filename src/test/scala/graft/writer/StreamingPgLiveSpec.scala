package graft.writer

import scala.collection.immutable.ListMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import PgSql._

/** Streaming → live-PostgreSQL composition: the watermarked tumbling
  * aggregate runs in UPDATE mode with a `foreachBatch` sink that
  * renders each micro-batch through the writer stack's MERGE SQL and
  * executes it against a live PG 15 — the durable deployment shape
  * the memory-sink parity harnesses deliberately are not. The pin:
  * update-mode re-emissions of a refined window (phase B adds events
  * to a phase-A window) MERGE into the SAME primary-key row, so
  * at-least-once delivery × idempotent sink lands exactly the batch
  * answer.
  *
  * Like `PgLiveSpec`, statements execute via psql with literals
  * filled (the sandbox has no JDBC driver jar); a production sink
  * passes the micro-batch DataFrame to `PostgresWriter.write` —
  * identical SQL surface, JDBC binds instead of literals. The
  * per-batch `collect()` here is sink plumbing over the AGGREGATED
  * micro-batch output (windows × event types, never events).
  */
class StreamingPgLiveSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val pg = new PgTestServer
  private var up: Boolean = false

  private lazy val spark = graft.SparkTestSession.spark

  override def beforeAll(): Unit = {
    up = pg.start()
    if (!up) info(s"live PG unavailable, tests cancelled:\n${pg.lastBootLog}")
  }

  override def afterAll(): Unit = if (up) pg.stop()

  private def sql(q: String): String = {
    val (code, out) = pg.sqlRaw(q)
    assert(code == 0, s"psql failed for:\n$q\n$out")
    out
  }

  private val tblSchema = ListMap(
    "window_start" -> PgText, "event_type" -> PgText,
    "n" -> PgBigInt, "sum_value" -> PgDouble)
  private val pk = Seq("window_start", "event_type")

  /** One micro-batch → MERGE statements (writer-stack SQL, literal
    * transport): a null-free quoted literal per text column, plain
    * literals for numerics.
    */
  private def mergeBatch(df: DataFrame): Unit = {
    val rows = df.select(
        col("window.start").cast("string").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
      .collect()
    rows.grouped(100).foreach { chunk =>
      val lits = chunk.toSeq.flatMap { r =>
        Seq("'" + r.getString(0) + "'", "'" + r.getString(1) + "'",
          r.getLong(2).toString, r.getDouble(3).toString)
      }
      sql(PgTestServer.fill(
        mergeSql("t_stream_agg", tblSchema, pk, chunk.length), lits))
    }
  }

  test("update-mode streaming agg MERGEs idempotently into live PG") {
    assume(up)
    import spark.implicits._
    sql("DROP TABLE IF EXISTS t_stream_agg")
    sql(createTableSql("t_stream_agg", tblSchema, pk))
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2026-01-01 $s")
    val phaseA = Seq(
      (ts("00:10:00"), "view", 1.0), (ts("00:20:00"), "view", 2.0),
      (ts("01:30:00"), "click", 1.5)).toDF("ts", "event_type", "value")
    // phase B REFINES the hour-00 window (00:40 is not late: the
    // watermark after A is below zero) and opens hour 10 — update
    // mode re-emits hour-00 with the new aggregate, and the MERGE
    // must UPDATE the existing PK row, not duplicate it
    val phaseB = Seq(
      (ts("00:40:00"), "view", 4.0), (ts("10:00:00"), "view", 1.0))
      .toDF("ts", "event_type", "value")
    val dir = java.nio.file.Files
      .createTempDirectory("events-stream-pg").toString
    phaseA.coalesce(1).write.mode("append").parquet(dir)
    val q = graft.streaming.EventWindows
      .tumblingStream(spark, dir, phaseA.schema)
      .writeStream.outputMode("update")
      .foreachBatch((df: DataFrame, _: Long) => mergeBatch(df))
      .start()
    try {
      q.processAllAvailable()
      phaseB.coalesce(1).write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val got = sql("""SELECT window_start, event_type, n, sum_value
      |FROM t_stream_agg ORDER BY window_start, event_type""".stripMargin)
    // the batch answer over the union of both phases
    val expect = Seq(
      "2026-01-01 00:00:00|view|3|7",
      "2026-01-01 01:00:00|click|1|1.5",
      "2026-01-01 10:00:00|view|1|1").mkString("\n")
    assert(got == expect, s"got:\n$got")
  }
}
