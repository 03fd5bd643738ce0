package graft

/** Plan-inspection main: prints `explain("formatted")` for selected
  * queries so scan pushdown (PushedFilters/ReadSchema), join strategy
  * (broadcast vs sort-merge), and codegen spans can be eyeballed —
  * `runMain graft.Explain [queryName...]`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // when set, each query's formatted plan ALSO lands in
    // <dir>/<name><SPARK_GRAFT_EXPLAIN_SUFFIX>.txt — the round-19
    // optimization deliverable (plans/r19/<q>_{before,after}.txt)
    // without scraping interleaved sbt stdout
    val outDir = sys.env.get("SPARK_GRAFT_EXPLAIN_OUT")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "")
    val spark = graft.engine.Sessions.local()
    // the sketch dedup queries are eagerly materialized (see
    // Dedup.withShingles), so their explain output is a checkpoint
    // scan — only lazily-planned queries are useful here
    val names = if (args.nonEmpty) args.toSeq
      else Seq("b04_filter", "b05_inner_join", "b12_hash_agg",
        "b25_correlated_subquery", "x_dedup_embedding_ann",
        "x_knn_brute", "x_asof_join", "x_range_join")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      outDir.foreach { dir =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/$name$suffix.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
      }
    }
    spark.stop()
  }
}
