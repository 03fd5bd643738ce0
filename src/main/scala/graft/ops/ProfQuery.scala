package graft.ops

/** Single-query timing harness: run any subset of the gate registry
  * standalone, printing EVERY pass (not a median) so cold-fit vs warm
  * cost is visible — the audit-side complement of the bench
  * artifact's per-pass vectors. Usage:
  * `runMain graft.ops.ProfQuery <sfDir> <reps> <query> [query ...]`.
  */
object ProfQuery {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = args.drop(2).toSeq
    require(names.nonEmpty, "usage: ProfQuery <sfDir> <reps> <query> [query ...]")
    val spark = graft.engine.Sessions.local()
    graft.engine.Tables.names
      .filter(n => java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/$n.parquet")))
      .foreach(n => graft.engine.Tables.table(spark, dir, n).count())
    for (name <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFQ $name ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
