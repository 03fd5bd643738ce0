package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The bench harness's honesty contract: a throwing query is reported
  * as an error (never a timing), the JSON carries per-query status,
  * and the materialize action evaluates every output column.
  */
class BenchSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private def good(s: org.apache.spark.sql.SparkSession, @annotation.unused d: String): DataFrame = {
    import s.implicits._
    Seq(1, 2, 3).toDF("v")
  }

  private def broken(s: org.apache.spark.sql.SparkSession, @annotation.unused d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.functions._
    // fails at ACTION time, not build time — the shape of a real
    // bench-only breakage (e.g. executor OOM at a larger SF)
    Seq("x").toDF("v").select(assert_true(lit(false)).as("v"))
  }

  test("a deliberately broken query turns the bench red") {
    val results = Bench.runAll(spark, "unused",
      Seq("q_ok" -> good _, "q_broken" -> broken _),
      reps = 3, action = df => { df.count(); () })
    val byName = results.map(r => r.name -> r).toMap
    assert(byName("q_ok").secs.isDefined && byName("q_ok").err.isEmpty)
    assert(byName("q_broken").secs.isEmpty)
    assert(byName("q_broken").err.get.nonEmpty)

    val json = Bench.renderJson(results, "sfX", "count", 100L, 0.5)
    assert(json.contains("\"status\":\"error\""))
    assert(json.contains("\"q_broken\":\""))
    // the timing object must NOT contain the broken query
    assert(!json.contains("\"q_broken\":0"))
  }

  test("all-green run reports ok status and parseable single-line JSON") {
    val results = Bench.runAll(spark, "unused",
      Seq("q_a" -> good _, "q_b" -> good _),
      reps = 3, action = df => { df.count(); () })
    assert(results.forall(_.err.isEmpty))
    val json = Bench.renderJson(results, "sfX", "count", 100L, 0.5)
    assert(json.contains("\"status\":\"ok\""))
    assert(!json.contains("\n"))
    // strict parse via Spark's JSON reader: one row, expected fields
    import spark.implicits._
    val parsed = spark.read.option("mode", "FAILFAST").json(Seq(json).toDS)
    val row = parsed.collect()(0)
    assert(parsed.columns.toSet.contains("queries"))
    assert(row.getAs[String]("status") == "ok")
    assert(row.getAs[String]("metric") == "total")
  }

  test("materialize action drives a grouping-less aggregate's full work") {
    // the noop write must force evaluation: an assert_true(false)
    // column survives count()-style pruning only if never evaluated
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val trapped = Seq(1, 2, 3).toDF("v")
      .agg(sum("v").as("s"), assert_true(lit(false)).as("trap"))
    trapped.count() // count() prunes the trap column: no exception
    intercept[Exception] { Bench.materialize(trapped) }
  }

  test("reps are pass-interleaved across the suite, not back-to-back per query") {
    // one host transient hitting 3 back-to-back reps poisons a query's
    // median; interleaved passes put each query's samples minutes apart
    val order = scala.collection.mutable.Buffer[String]()
    def mk(name: String): (org.apache.spark.sql.SparkSession, String) => DataFrame =
      (s, _) => { order += name; import s.implicits._; Seq(1).toDF("v") }
    Bench.runAll(spark, "unused",
      Seq("q_b" -> mk("q_b"), "q_a" -> mk("q_a")),
      reps = 3, action = df => { df.count(); () })
    assert(order.toSeq == Seq("q_a", "q_b", "q_a", "q_b", "q_a", "q_b"))
  }

  test("runThunks interleaves arbitrary legs (the pipeline leg rides the pass loop)") {
    // the headline pipeline leg is appended as a thunk to the same
    // interleaved pass loop as the queries — its reps must alternate
    // with theirs, not run back-to-back at the end (the round-9
    // artifact's transient-poisoned 31× phantom)
    val order = scala.collection.mutable.Buffer[String]()
    val thunks = Seq[(String, () => Unit)](
      "q_a" -> (() => { order += "q_a"; () }),
      "x_pipeline_100k_load" -> (() => { order += "pipe"; () }))
    val results = Bench.runThunks(thunks, reps = 3)
    assert(order.toSeq ==
      Seq("q_a", "pipe", "q_a", "pipe", "q_a", "pipe"))
    assert(results.map(_.name) == Seq("q_a", "x_pipeline_100k_load"))
    assert(results.forall(_.secs.isDefined))
  }

  test("per-pass time vectors land in the artifact next to the median") {
    // the r12 artifact published a 15 s median for a 3 s-warm query;
    // with only the median recorded, cold-fit/churn contamination was
    // invisible — the raw vector is the audit trail
    val results = Bench.runThunks(
      Seq[(String, () => Unit)]("q_a" -> (() => ())), reps = 3)
    assert(results.head.passes.size == 3)
    val r = Bench.QResult("q_x", Some(3.0), None, Vector(15.2, 3.0, 14.9))
    val json = Bench.renderJson(Seq(r), "sfX", "count", 0L, 0.0)
    assert(json.contains(""""passes":{"q_x":[15.200,3.000,14.900]}"""))
    import spark.implicits._
    val parsed = spark.read.option("mode", "FAILFAST").json(Seq(json).toDS).collect()(0)
    assert(parsed.getAs[org.apache.spark.sql.Row]("passes")
      .getAs[scala.collection.Seq[Double]]("q_x").toSeq == Seq(15.2, 3.0, 14.9))
  }

  test("cold/warm totals split pass-1 from best-of-rest, parsed in both lines") {
    // q_x: cold fit 15.2 s, warm 3.0 s; q_y: flat 1.0 s — attribution
    // of a cold-heavy suite must need no manual tail parse
    val rs = Seq(
      Bench.QResult("q_x", Some(3.0), None, Vector(15.2, 3.0, 14.9)),
      Bench.QResult("q_y", Some(1.0), None, Vector(1.0, 1.0, 1.0)))
    assert(math.abs(Bench.totalCold(rs) - 16.2) < 1e-9)
    assert(math.abs(Bench.totalWarm(rs) - 4.0) < 1e-9)
    import spark.implicits._
    val full = spark.read.option("mode", "FAILFAST")
      .json(Seq(Bench.renderJson(rs, "sfX", "count", 0L, 0.0)).toDS).collect()(0)
    assert(full.getAs[Double]("total_cold") == 16.2)
    assert(full.getAs[Double]("total_warm") == 4.0)
    val summary = spark.read.option("mode", "FAILFAST")
      .json(Seq(Bench.renderSummary(rs, 0L)).toDS).collect()(0)
    assert(summary.getAs[Double]("total_warm") == 4.0)
    // a single-pass leg (errored later passes) contributes its only pass
    val one = Seq(Bench.QResult("q_z", Some(2.0), None, Vector(2.0)))
    assert(Bench.totalWarm(one) == 2.0 && Bench.totalCold(one) == 2.0)
  }

  test("a query erroring in a later pass is still reported as an error") {
    var calls = 0
    def flaky(s: org.apache.spark.sql.SparkSession, @annotation.unused d: String): DataFrame = {
      calls += 1
      if (calls >= 2) throw new RuntimeException("pass-2 failure")
      import s.implicits._; Seq(1).toDF("v")
    }
    val results = Bench.runAll(spark, "unused", Seq("q_flaky" -> flaky _),
      reps = 3, action = df => { df.count(); () })
    assert(results.head.secs.isEmpty)
    assert(results.head.err.get.contains("pass-2 failure"))
    // remaining passes are skipped once a query errors
    assert(calls == 2)
  }

  test("compact summary line stays under the driver tail window and parses") {
    // 100 ok queries + 1 error: the full line would be kilobytes; the
    // summary must stay ≤200 bytes regardless of suite size
    val results = (1 to 100).map(i => Bench.QResult(f"q_$i%03d", Some(1.234), None)) :+
      Bench.QResult("q_bad", None, Some("boom"))
    val s = Bench.renderSummary(results, 123456L)
    assert(s.getBytes("UTF-8").length <= 200)
    assert(!s.contains("\n"))
    import spark.implicits._
    val parsed = spark.read.option("mode", "FAILFAST").json(Seq(s).toDS)
    val row = parsed.collect()(0)
    assert(row.getAs[String]("metric") == "total")
    assert(row.getAs[String]("status") == "error")
    assert(row.getAs[Long]("n_queries") == 101L)
    assert(row.getAs[Long]("n_errors") == 1L)
    assert(row.getAs[Long]("pipeline_rows_per_sec") == 123456L)
  }

  test("median-of-3 takes the middle run") {
    var i = 0
    // wide spread: scheduling overhead on a loaded box only ADDS to a
    // sleep, so the middle (120 ms) run stays separable from 5 ms and
    // 500 ms even with ~300 ms of jitter
    val delays = Seq(5L, 500L, 120L)
    val r = Bench.runOne("m", reps = 3,
      action = _ => { Thread.sleep(delays(i)); i += 1 }) {
      import spark.implicits._
      Seq(1).toDF("v")
    }
    assert(r.secs.get >= 0.115 && r.secs.get < 0.499)
  }

  test("error messages render as valid JSON even when truncated mid-escape") {
    // 299 chars then a backslash: naive escape-then-truncate leaves a
    // lone trailing backslash that swallows the closing quote
    val nasty = "x" * 299 + "\\\"\ttail"
    val r = Bench.QResult("q_bad", None, Some(nasty))
    val json = Bench.renderJson(Seq(r), "sfX", "count", 0L, 0.0)
    import spark.implicits._
    val parsed = spark.read.option("mode", "FAILFAST").json(Seq(json).toDS)
    assert(parsed.collect()(0).getAs[String]("status") == "error")
  }
}
