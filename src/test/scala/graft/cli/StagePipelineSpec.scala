package graft.cli

import java.nio.file.Files

import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.writer.{PgSql, PgTestServer}

/** The round-15 orchestrator extension end-to-end: `stages:` in
  * pipelines.yaml drive the library's analytics operators and
  * persisted-store lifecycle through the SAME CLI + writer stack as
  * the HTTP→SQL modules — a corpus-clean pipeline lands the
  * gate-verified relation in the parquet warehouse (and its rows
  * MERGE into a live PG 15 via the writer's generated SQL), and a
  * store build/maintain pipeline leaves a committed, queryable store
  * plus its stats audit row on the sink.
  */
class StagePipelineSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private val pg = new PgTestServer
  private var pgUp = false

  override def beforeAll(): Unit = {
    pgUp = pg.start()
    if (!pgUp) info(s"live PG unavailable, PG leg cancelled:\n${pg.lastBootLog}")
  }

  override def afterAll(): Unit = if (pgUp) pg.stop()

  private def sql(q: String): String = {
    val (code, out) = pg.sqlRaw(q)
    assert(code == 0, s"psql failed for:\n$q\n$out")
    out
  }

  test("corpus-clean stage from YAML: parquet warehouse + live-PG MERGE") {
    val dir = Files.createTempDirectory("stage_clean")
    val modules = Files.createDirectories(dir.resolve("modules"))
    val warehouse = dir.resolve("warehouse").toString
    Files.writeString(dir.resolve("pipelines.yaml"),
      s"""stages:
         |  - name: clean_docs
         |    kind: query
         |    query: x_pipeline_corpus_clean
         |    input_dir: $sf
         |    dest_table: clean_docs
         |    primary_key: doc_id
         |""".stripMargin)
    val args = Main.Args(
      modulesDir = modules.toString,
      configPath = dir.resolve("pipelines.yaml").toString,
      warehouse = Some(warehouse))
    assert(Main.run(args, spark) == 0)

    // the landed relation IS the gate-verified operator output
    // (collect everything BEFORE the idempotence re-run below — the
    // file warehouse overwrites, which invalidates this read's files)
    val out = spark.read.parquet(s"$warehouse/clean_docs")
    val want = graft.queries.Extensions
      .queries("x_pipeline_corpus_clean")(spark, sf)
    val n = out.count()
    assert(n > 0)
    assert(out.exceptAll(want).isEmpty && want.exceptAll(out).isEmpty)
    val rows = out.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val schema = PgSql.schemaOfSpark(out.schema)

    // stages are idempotent under re-run exactly like keyed modules
    // (primary_key → MERGE; the file warehouse maps that to overwrite)
    assert(Main.run(args, spark) == 0)
    assert(spark.read.parquet(s"$warehouse/clean_docs").count() == n)

    // --- live-PG leg: the writer's generated DDL + PG-15 MERGE with
    // the stage's actual rows (the QuickStartE2ESpec convention — the
    // sandbox has no PG JDBC driver jar, so the generated SQL runs
    // via psql)
    assume(pgUp, "live PG unavailable")
    val digits = sql("SHOW server_version").takeWhile(_.isDigit)
    assume(digits.nonEmpty && digits.toInt >= 15,
      s"server version digits '$digits', MERGE path needs 15+")
    def lits(rs: Seq[(Long, Int, Int)]): Seq[String] =
      rs.flatMap { case (a, b, c) => Seq(a.toString, b.toString, c.toString) }
    sql("DROP TABLE IF EXISTS clean_docs")
    sql(PgSql.createTableSql("clean_docs", schema, Seq("doc_id")))
    sql(PgTestServer.fill(
      PgSql.mergeSql("clean_docs", schema, Seq("doc_id"), rows.length),
      lits(rows.toSeq)))
    assert(sql("SELECT count(*) FROM clean_docs") == rows.length.toString)
    // re-MERGE is idempotent — the curation pipeline is re-runnable
    sql(PgTestServer.fill(
      PgSql.mergeSql("clean_docs", schema, Seq("doc_id"), rows.length),
      lits(rows.toSeq)))
    assert(sql("SELECT count(*) FROM clean_docs") == rows.length.toString)
  }

  test("store stages from YAML: build + maintain leave a committed store and audit rows") {
    val dir = Files.createTempDirectory("stage_store")
    val modules = Files.createDirectories(dir.resolve("modules"))
    val warehouse = dir.resolve("warehouse").toString
    val storeDir = dir.resolve("ivfpq_store").toString
    Files.writeString(dir.resolve("pipelines.yaml"),
      s"""stages:
         |  - name: build_index
         |    kind: store
         |    store: ivfpq
         |    action: build
         |    input_dir: $sf
         |    table: embeddings
         |    dir: $storeDir
         |    dest_table: index_audit
         |  - name: maintain_index
         |    kind: store
         |    store: ivfpq
         |    action: maintain
         |    input_dir: $sf
         |    dir: $storeDir
         |    dest_table: index_audit
         |  - name: advise_index
         |    kind: store
         |    store: ivfpq
         |    action: recommend
         |    input_dir: $sf
         |    dir: $storeDir
         |    dest_table: index_advice
         |""".stripMargin)
    val args = Main.Args(
      modulesDir = modules.toString,
      configPath = dir.resolve("pipelines.yaml").toString,
      warehouse = Some(warehouse))
    try {
      assert(Main.run(args, spark) == 0)

      // the store committed and answers queries (exhaustive settings
      // equal brute — the IvfPqStoreSpec contract, through YAML)
      val e = graft.engine.Tables.table(spark, sf, "embeddings")
      val got = graft.ops.IvfPqStore.querySelf(spark, storeDir,
        nProbe = 16, candidates = e.count().toInt).collect().toSeq
      assert(got == graft.ops.Similarity.knnBrute(e).collect().toSeq)

      // the audit relation carries the lifecycle: the file warehouse
      // appends, so both stages' stats rows land; a healthy fresh
      // store must decide maintain = no-op
      val audit = spark.read.parquet(s"$warehouse/index_audit")
      val byAction = audit.collect()
        .map(r => r.getAs[String]("action") ->
          r.getAs[Boolean]("compacted")).toMap
      assert(byAction.keySet == Set("build", "maintain"))
      assert(byAction("maintain") == false,
        "a fresh store must not be compacted by maintain")
      assert(audit.columns.contains("train_fingerprint"),
        "audit rows must carry the store lineage")
      // the advisory stage lands the rebuild-vs-compact decision row:
      // a healthy fresh store built FROM this corpus reads ok (the
      // recommend stage feeds the same input_dir corpus in for the
      // lineage-drift check — no false drift)
      val advice = spark.read.parquet(s"$warehouse/index_advice").head()
      assert(advice.getString(advice.fieldIndex("recommendation")) == "ok",
        advice.toString)
    } finally graft.ops.Pq.clearCodebookCache()
  }

  test("dedup action stage flags the batch against the persisted store") {
    val dir = Files.createTempDirectory("stage_dedup")
    val modules = Files.createDirectories(dir.resolve("modules"))
    val warehouse = dir.resolve("warehouse").toString
    val storeDir = dir.resolve("gram_store").toString
    Files.writeString(dir.resolve("pipelines.yaml"),
      s"""stages:
         |  - name: build_grams
         |    kind: store
         |    store: dedup
         |    action: build
         |    input_dir: $sf
         |    dir: $storeDir
         |    dest_table: dedup_audit
         |  - name: flag_batch
         |    kind: store
         |    store: dedup
         |    action: dedup
         |    input_dir: $sf
         |    dir: $storeDir
         |    dest_table: batch_flags
         |""".stripMargin)
    val args = Main.Args(
      modulesDir = modules.toString,
      configPath = dir.resolve("pipelines.yaml").toString,
      warehouse = Some(warehouse))
    try {
      assert(Main.run(args, spark) == 0)
      // the landed flags ARE the library operator's output (here the
      // "batch" is the corpus itself — the machinery pin, same as the
      // store specs; a real pipeline points input_dir at today's data)
      val got = spark.read.parquet(s"$warehouse/batch_flags")
      val docs = graft.engine.Tables.table(spark, sf, "documents")
      val want = graft.ops.DedupStore.dedupAgainst(spark, docs, storeDir)
      assert(got.count() > 0)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    } finally graft.ops.Dedup.clearShingleCache()
  }

  test("stage config validation is loud") {
    import graft.config.PipelineConfig
    intercept[IllegalArgumentException] {
      PipelineConfig.parse(
        "stages:\n  - name: s\n    kind: nope\n    input_dir: /x\n")
    }
    intercept[IllegalArgumentException] {
      PipelineConfig.parse(
        "stages:\n  - name: s\n    kind: query\n    input_dir: /x\n")
    }
    intercept[IllegalArgumentException] {
      PipelineConfig.parse(
        "stages:\n  - name: s\n    kind: store\n    input_dir: /x\n" +
          "    store: ivfpq\n    action: append\n    dir: /s\n")
    }
  }
}
