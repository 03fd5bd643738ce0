package graft.cli

import java.nio.file.Files

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The persisted classifier model (r16 verdict item 2): the trained
  * (label, tok, w) relation committed as a versioned store
  * (Classify.saveModel/loadModel), a `store: classifier` train stage,
  * and `model_dir:` on `stream: classify` so a scheduled drain pays a
  * model READ instead of an O(corpus) training job — pinned by
  * running the drain with NO training corpus available at all.
  */
class ClassifierModelStageSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs = graft.engine.Tables.table(spark, sf, "documents")

  test("saveModel/loadModel round-trip the trained relation bit-exactly; stats audit the lineage") {
    val dir = Files.createTempDirectory("clf_model").resolve("model").toString
    graft.ops.Classify.saveModel(docs, dir)
    val want = graft.ops.Classify.tokenClassifierModel(docs)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val got = graft.ops.Classify.loadModel(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(want.nonEmpty && got == want)

    val s1 = graft.ops.Classify.modelStats(spark, dir).head()
    assert(s1.getAs[Long]("n_weights") == want.size.toLong)
    assert(s1.getAs[Long]("n_labels") == want.map(_._1).size.toLong)
    assert(s1.getAs[String]("label_col") == "lang")
    assert(s1.getAs[Long]("train_cut") == 8000L)
    assert(s1.getAs[Long]("version") == 1L)

    // rebuild commits a fresh version under the same committed-root
    // convention as the four stores
    graft.ops.Classify.saveModel(docs, dir)
    assert(graft.ops.Classify.modelStats(spark, dir)
      .head().getAs[Long]("version") == 2L)
  }

  test("loadModel refuses an unbuilt dir and a dir holding a different store kind") {
    val base = Files.createTempDirectory("clf_refuse")
    val missing = intercept[RuntimeException] {
      graft.ops.Classify.loadModel(spark, base.resolve("nope").toString)
    }
    assert(missing.getMessage.contains("no committed store"), missing.getMessage)

    val gramDir = base.resolve("gram").toString
    graft.ops.DedupStore.save(docs, gramDir)
    val wrong = intercept[IllegalArgumentException] {
      graft.ops.Classify.loadModel(spark, gramDir)
    }
    assert(wrong.getMessage.contains("'DedupStore'"), wrong.getMessage)
    assert(wrong.getMessage.contains("saveModel"), wrong.getMessage)
  }

  test("train stage + model_dir drain: drain-2 predictions identical, zero training jobs in the drain") {
    val sp = spark
    val dir = Files.createTempDirectory("clf_stage")
    val modules = Files.createDirectories(dir.resolve("modules"))
    val warehouse = dir.resolve("warehouse").toString
    val modelDir = dir.resolve("model_store").toString
    val srcDir = Files.createDirectories(dir.resolve("incoming")).toString
    // the scoring stage's input_dir holds NO documents table at all:
    // with model_dir the drain must never train (the whole point of
    // the persisted model) — a training attempt would fail loudly here
    val noCorpus = Files.createDirectories(dir.resolve("no_corpus")).toString
    def batchDf(lo: Long, hi: Long) = docs
      .filter(col("doc_id") >= lo && col("doc_id") < hi)
      .select(col("doc_id"), col("text"))
    // ONE chained YAML: train as its own stage, score against the
    // committed model — the verdict's train→classify composition
    Files.writeString(dir.resolve("pipelines.yaml"),
      s"""stages:
         |  - name: train_model
         |    kind: store
         |    store: classifier
         |    action: build
         |    dir: $modelDir
         |    input_dir: $sf
         |    dest_table: model_audit
         |  - name: score_incoming
         |    kind: stream
         |    stream: classify
         |    model_dir: $modelDir
         |    input_dir: $noCorpus
         |    source_dir: $srcDir
         |    checkpoint: ${dir.resolve("ckpt")}
         |    out_dir: ${dir.resolve("preds")}
         |    dest_table: incoming_preds
         |""".stripMargin)
    val args = Main.Args(
      modulesDir = modules.toString,
      configPath = dir.resolve("pipelines.yaml").toString,
      warehouse = Some(warehouse))
    batchDf(0, 40).coalesce(1).write.mode("append").parquet(srcDir)
    assert(Main.run(args, sp) == 0)
    def preds = sp.read.parquet(dir.resolve("preds").toString)
      .select(col("doc_id"), col("predicted"), col("score"))
    assert(preds.count() == 40)
    // the model audit row landed next to the predictions
    val audit = sp.read.parquet(s"$warehouse/model_audit")
    assert(audit.count() == 1 &&
      audit.head().getAs[String]("action") == "build")

    // parity: identical predictions to the retrain-every-drain shape
    // (same corpus trained the persisted model), bit-exact
    val retrain = Files.createTempDirectory("clf_retrain")
    Files.writeString(retrain.resolve("pipelines.yaml"),
      s"""stages:
         |  - name: score_retrain
         |    kind: stream
         |    stream: classify
         |    input_dir: $sf
         |    source_dir: $srcDir
         |    checkpoint: ${retrain.resolve("ckpt")}
         |    out_dir: ${retrain.resolve("preds")}
         |    dest_table: retrain_preds
         |""".stripMargin)
    assert(Main.run(Main.Args(
      modulesDir = modules.toString,
      configPath = retrain.resolve("pipelines.yaml").toString,
      warehouse = Some(warehouse)), sp) == 0)
    val wantRows = sp.read.parquet(retrain.resolve("preds").toString)
      .select(col("doc_id"), col("predicted"), col("score"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val gotRows = preds.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(wantRows.nonEmpty && gotRows == wantRows)

    // drain 2: still no corpus anywhere near the stage, predictions
    // land exactly-once and drain-1 rows are bit-identical
    val before = preds.collect().map(_.toString).sorted.toSeq
    batchDf(40, 50).coalesce(1).write.mode("append").parquet(srcDir)
    assert(Main.run(args, sp) == 0)
    assert(preds.count() == 50)
    val after = preds.filter(col("doc_id") < 40)
      .collect().map(_.toString).sorted.toSeq
    assert(after == before)
  }

  test("streams against an unbuilt store refuse up front, naming the fix (r16 ADVICE)") {
    val dir = Files.createTempDirectory("clf_unbuilt")
    val srcDir = Files.createDirectories(dir.resolve("incoming")).toString
    // classify with a model_dir that was never built: refused BEFORE
    // any drain, whether or not the source has data yet
    val cfg = graft.config.PipelineConfig.parse(
      s"""stages:
         |  - name: score
         |    kind: stream
         |    stream: classify
         |    model_dir: ${dir.resolve("never_built")}
         |    input_dir: $sf
         |    source_dir: $srcDir
         |    checkpoint: ${dir.resolve("ck1")}
         |    out_dir: ${dir.resolve("preds")}
         |  - name: grow
         |    kind: stream
         |    stream: index_ingest
         |    store: ivf
         |    dir: ${dir.resolve("no_ivf")}
         |    input_dir: $sf
         |    source_dir: $srcDir
         |    checkpoint: ${dir.resolve("ck2")}
         |""".stripMargin)
    val e1 = intercept[IllegalArgumentException] {
      StageRunner.run(spark, cfg.stages.head)
    }
    assert(e1.getMessage.contains("no committed version"), e1.getMessage)
    assert(e1.getMessage.contains("action: build"), e1.getMessage)
    // index_ingest racing BOTH the crawler and the initial build: the
    // old behavior was a confusing requireRoot stack out of the audit
    // read after a skipped drain — now the message names the fix
    val e2 = intercept[IllegalArgumentException] {
      StageRunner.run(spark, cfg.stages(1))
    }
    assert(e2.getMessage.contains("ivf store"), e2.getMessage)
    assert(e2.getMessage.contains("action: build"), e2.getMessage)
  }
}
