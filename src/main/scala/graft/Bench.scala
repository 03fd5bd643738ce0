package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main — runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints the full per-query
  * JSON line (also written to SPARK_GRAFT_BENCH_OUT, default
  * `bench_out.json`, so the artifact survives stdout log interleaving)
  * followed by a compact ≤200-byte summary line LAST — the summary is
  * what fits the driver's stdout-tail window (`renderSummary`).
  *
  * Honesty contract (round-7 rework, round-9 interleave):
  *   - a query that THROWS is reported in an `"errors"` object and the
  *     process exits nonzero — a broken query can never masquerade as
  *     a fast one;
  *   - timings are median-of-3 with the reps PASS-INTERLEAVED across
  *     the whole suite (see `runAll`) — robust both to one GC pause
  *     per query and to a single multi-minute host transient, which
  *     back-to-back reps let poison a whole contiguous query block
  *     (the round-8 artifact's `x_embed_quantize`→`x_fingerprint*`
  *     7–13× ghost regression);
  *   - SPARK_GRAFT_BENCH_ACTION=materialize drives each plan with a
  *     noop-datasource write instead of count(): count() lets Spark
  *     prune a grouping-less aggregate's real work (an agg-only query
  *     can satisfy count()=1 without computing the aggregates), the
  *     noop write forces every output column to be evaluated.
  */
object Bench {

  /** One benched query: median wall seconds over `reps` successful
    * runs, or the failure message of the first throwing run.
    */
  final case class QResult(name: String, secs: Option[Double], err: Option[String])

  /** Drive the full plan with every output column evaluated: a
    * noop-datasource write consumes each row's columns on the
    * executors with no sink cost and no driver transfer.
    */
  def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Lower-median: the middle run for odd sizes, the BETTER of the
    * two middles for even sizes — so reps=2 degrades to the old
    * min-of-2 behavior rather than reporting the worse run.
    */
  private def median(xs: Seq[Double]): Double =
    xs.sorted.apply((xs.size - 1) / 2)

  /** A JSON string literal from an arbitrary (exception) message:
    * truncate the RAW text first so no escape pair is ever split,
    * then escape backslash/quote and strip control characters
    * (tabs/CRs in JVM messages are illegal inside JSON strings).
    */
  private def jsonString(raw: String): String =
    "\"" + raw.take(300)
      .map {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case c if c < ' ' => " "
        case c => c.toString
      }.mkString + "\""

  /** Time one query: `reps` timed runs, median. The FIRST exception
    * aborts the query's remaining reps and is reported verbatim —
    * never swallowed (a bench-only breakage, e.g. an OOM at a larger
    * SF than CORRECTNESS runs, must turn the bench red).
    */
  def runOne(name: String, reps: Int, action: DataFrame => Unit)(
      build: => DataFrame): QResult =
    try {
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        action(build)
        (System.nanoTime() - t0) / 1e9
      }
      QResult(name, Some(median(times)), None)
    } catch {
      case e: Throwable =>
        QResult(name, None, Some(s"${e.getClass.getName}: ${e.getMessage}"))
    }

  /** Run a query map; pure over the inputs so the error path is
    * spec-testable without a full bench.
    *
    * Reps are PASS-INTERLEAVED: `reps` full passes over the whole
    * (name-sorted) suite, each query's median taken ACROSS passes.
    * Back-to-back per-query reps (the pre-round-9 shape) let a single
    * multi-minute host transient poison all reps of a contiguous
    * query block — median-of-3 cannot reject a transient longer than
    * one query's reps. With passes minutes apart, a transient inflates
    * at most one of each query's three samples and the median holds.
    *
    * A query that throws in ANY pass is reported as an error (no
    * timing) and skipped in the remaining passes — same honesty
    * contract as before: a broken query can never masquerade as fast.
    */
  def runAll(spark: SparkSession, sfDir: String,
      queries: Seq[(String, (SparkSession, String) => DataFrame)],
      reps: Int, action: DataFrame => Unit): Seq[QResult] = {
    val sorted = queries.sortBy(_._1)
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
    val errs = scala.collection.mutable.Map.empty[String, String]
    for (_ <- 1 to reps; (name, fn) <- sorted if !errs.contains(name))
      try {
        val t0 = System.nanoTime()
        action(fn(spark, sfDir))
        times.update(name,
          times.getOrElse(name, Vector.empty) :+ (System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          errs(name) = s"${e.getClass.getName}: ${e.getMessage}"
      }
    sorted.map { case (name, _) =>
      errs.get(name) match {
        case Some(m) => QResult(name, None, Some(m))
        case None    => QResult(name, Some(median(times(name))), None)
      }
    }
  }

  /** The one JSON line. Field layout is upward-compatible with prior
    * rounds (`metric/value/unit/queries/sf/pipeline_*`); adds
    * `"action"`, `"errors"` and `"status"`.
    */
  def renderJson(results: Seq[QResult], sfDir: String, actionName: String,
      pipelineRows: Long, pipelineSec: Double): String = {
    val ok = results.filter(_.secs.isDefined)
    val qs = ok.map { r => "\"" + r.name + "\":" + f"${r.secs.get}%.3f" }
      .mkString("{", ",", "}")
    val errs = results.flatMap(r => r.err.map(m =>
        "\"" + r.name + "\":" + jsonString(m)))
      .mkString("{", ",", "}")
    val total = ok.flatMap(_.secs).sum
    val status = if (results.exists(_.err.isDefined)) "error" else "ok"
    val rowsPerSec =
      if (pipelineSec > 0) (pipelineRows / pipelineSec).round else 0L
    f"""{"metric":"total","value":$total%.3f,"unit":"sec","action":"$actionName","status":"$status","queries":$qs,"errors":$errs,"sf":"$sfDir","pipeline_rows":$pipelineRows,"pipeline_rows_per_sec":$rowsPerSec}"""
  }

  /** A compact (≤200-byte) summary of the same run, printed LAST.
    *
    * The full JSON line above is ~3 kB but the driver keeps only a
    * ~2.2 kB stdout tail, so for 8 rounds the line's head
    * (`"metric":"total",...`) was always truncated and the driver
    * recorded `parsed: null`. Printing this headline-only object as
    * the final stdout line guarantees the tail window always contains
    * one complete parseable JSON object; the full per-query map still
    * lands in the `SPARK_GRAFT_BENCH_OUT` file artifact.
    */
  def renderSummary(results: Seq[QResult], pipelineRowsPerSec: Long): String = {
    val ok = results.filter(_.secs.isDefined)
    val total = ok.flatMap(_.secs).sum
    val status = if (results.exists(_.err.isDefined)) "error" else "ok"
    f"""{"metric":"total","value":$total%.3f,"unit":"sec","status":"$status","n_queries":${results.size},"n_errors":${results.size - ok.size},"pipeline_rows_per_sec":$pipelineRowsPerSec}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val actionName = sys.env.getOrElse("SPARK_GRAFT_BENCH_ACTION", "count")
    val action: DataFrame => Unit = actionName match {
      case "materialize" => materialize
      case _             => df => { df.count(); () }
    }
    val spark = graft.engine.Sessions.local()
    // warm the JVM + file-listing/codegen paths so the first measured
    // query reflects steady-state, not session startup
    graft.engine.Tables.names.foreach(n =>
      graft.engine.Tables.table(spark, sfDir, n).count())
    val results = runAll(spark, sfDir, SparkEntry.queries.toSeq, reps = 3, action)

    // headline BASELINE comparison: ingest -> SQL transform -> sink
    // load of the 100k-row (at sf0.1) events table, the analog of the
    // reference's "100K+ rows end-to-end" metric (BASELINE.md)
    val events = graft.engine.Tables.table(spark, sfDir, "events")
    def pipelineOnce(): (Long, Double) = {
      val sinkDir = java.nio.file.Files.createTempDirectory("bench-sink").toString
      val p0 = System.nanoTime()
      val loaded = graft.engine.Engine.withSqlOver(spark, events, "events",
        """SELECT event_id, user_id, event_type, value,
          |  get_json_object(props, '$.k') AS k_val FROM events""".stripMargin) { out =>
        new graft.writer.ParquetWriter(s"$sinkDir/events_out")
          .write(out, graft.writer.WriteMode.Append).rowsWritten
      }
      (loaded, (System.nanoTime() - p0) / 1e9)
    }
    // the pipeline leg reports through the same contract as every
    // query: a breakage lands in the errors object and the JSON line
    // + artifact are still emitted (not a crash that discards the
    // preceding full run)
    val (pipelineResult, loaded, pipelineSec) =
      try {
        val runs = (1 to 3).map(_ => pipelineOnce())
        val (rows, sec) = runs.sortBy(_._2).apply((runs.size - 1) / 2)
        (QResult("x_pipeline_100k_load", Some(sec), None), rows, sec)
      } catch {
        case e: Throwable =>
          (QResult("x_pipeline_100k_load", None,
            Some(s"${e.getClass.getName}: ${e.getMessage}")), 0L, 0.0)
      }

    val withPipeline = results :+ pipelineResult
    val line = renderJson(withPipeline, sfDir, actionName, loaded, pipelineSec)
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    val rowsPerSec =
      if (pipelineSec > 0) (loaded / pipelineSec).round else 0L
    val failed = withPipeline.count(_.err.isDefined)
    // stop BEFORE the summary: Spark's shutdown chatter must not land
    // after the compact line, so a bounded combined-output tail always
    // ends with one complete JSON object (see renderSummary)
    spark.stop()
    if (failed > 0)
      System.err.println(s"bench: $failed quer${if (failed == 1) "y" else "ies"} failed")
    println(renderSummary(withPipeline, rowsPerSec))
    System.out.flush()
    if (failed > 0) sys.exit(1)
  }
}
