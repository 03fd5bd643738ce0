package graft.ops

/** Single-query timing harness: run any subset of the gate registry
  * standalone, printing EVERY pass (not a median) so cold-fit vs warm
  * cost is visible — the audit-side complement of the bench
  * artifact's per-pass vectors. Usage:
  * `runMain graft.ops.ProfQuery <sfDir> <reps> <query> [query ...]`.
  * `SPARK_GRAFT_PROFQ_ACTION=materialize` drives each plan with the
  * noop write instead of count() — count() lets Catalyst prune a
  * unique-right-key outer join or a computed projection entirely, so
  * scale claims for join/projection-shaped queries MUST use
  * materialize (the Bench action contract).
  */
object ProfQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "usage: ProfQuery <sfDir> <reps> <query> [query ...]")
    val action: org.apache.spark.sql.DataFrame => Unit =
      if (sys.env.get("SPARK_GRAFT_PROFQ_ACTION").contains("materialize"))
        graft.Bench.materialize
      else df => { df.count(); () }
    val spark = graft.engine.Sessions.local()
    graft.engine.Tables.names
      .filter(n => java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/$n.parquet")))
      .foreach(n => graft.engine.Tables.table(spark, dir, n).count())
    for (name <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      if (sys.env.get("SPARK_GRAFT_PROFQ_EXPLAIN").contains("1"))
        println(fn(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        action(fn(spark, dir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFQ $name ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
