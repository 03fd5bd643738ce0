package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.ops.TextOps

/** Streaming scorer for the trained token-rate classifier — the
  * live-ingest counterpart of
  * [[graft.ops.Classify.tokenClassifierPredict]]: documents arriving
  * on a stream are scored against a FROZEN trained model relation
  * and emit (doc_id, predicted, score). Deliberately STATELESS: a
  * document's prediction depends only on its own row and the
  * broadcast model (per-label token→weight maps collected into ONE
  * static row — the scalar-attach convention the streaming
  * decontaminator set), so the query runs in append mode with no
  * watermark, no state store, and exactly one output row per doc in
  * any micro-batching. A model refresh is a new query start — the
  * model-handoff contract shared with the streaming cluster monitor.
  *
  * PARITY contract (spec-pinned == batch): the batch scorer's
  * argmax only ranges over labels sharing at least one token with
  * the doc (its tf⋈model join is inner), and weights can be
  * NEGATIVE — so the in-row form must FILTER zero-hit labels before
  * taking the argmax, not score them as 0: a doc hitting only label
  * A with a negative sum must still predict A, and only a doc
  * hitting NO label's vocabulary reports '?' / 0. Ties break to the
  * lexicographically smallest label, exactly the batch window order.
  *
  * SIZE BOUND: the model travels as one collected row, so vocab × k
  * must fit the driver and a single broadcast row. [[streamingPredict]]
  * counts the model rows at query start and REFUSES past
  * `maxModelRows` with a message naming the batch operator — an
  * over-sized vocabulary reads as a config error, not an opaque
  * broadcast OOM mid-stream. The in-row fold is an interpreted HOF
  * (per-row cost ∝ words × k map lookups) — right for a live scoring
  * rate, while the batch operator remains the full-corpus scale path.
  */
object StreamingClassify {

  /** The trained model as one static row: `models` = array of
    * (label, token→weight map). Array order is whatever collect_list
    * produced — irrelevant, the in-row argmax sorts deterministically.
    */
  private[streaming] def modelRow(model: DataFrame): DataFrame =
    model
      .groupBy(col("label"))
      .agg(map_from_entries(
        collect_list(struct(col("tok"), col("w")))).as("m"))
      .agg(collect_list(struct(col("label"), col("m"))).as("models"))

  /** In-row scoring columns over a words array `ws` against the
    * broadcast `models` array: per label a (label, score, hits)
    * struct, zero-hit labels filtered, argmax by (score DESC, label
    * ASC) via a sort comparator, '?' when nothing hit.
    */
  private[streaming] def predictionCols(ws: Column, models: Column): Seq[Column] = {
    val scored = transform(models, m => struct(
      m.getField("label").as("label"),
      // try_element_at: ANSI element_at THROWS on a missing map key,
      // and most tokens miss most labels' vocabularies
      aggregate(ws, lit(0L), (acc, t) =>
        acc + coalesce(try_element_at(m.getField("m"), t), lit(0L))).as("score"),
      aggregate(ws, lit(0L), (acc, t) =>
        acc + when(try_element_at(m.getField("m"), t).isNotNull, 1L)
          .otherwise(0L)).as("hits")))
    // try_element_at: a full-OOV doc's filtered array is EMPTY, and
    // ANSI element_at would throw instead of yielding the NULL the
    // '?' coalesce needs
    val hit = filter(scored, s => s.getField("hits") > 0)
    val best = try_element_at(array_sort(hit, (l, r) =>
      when(l.getField("score") > r.getField("score"), -1)
        .when(l.getField("score") < r.getField("score"), 1)
        .when(l.getField("label") < r.getField("label"), -1)
        .when(l.getField("label") > r.getField("label"), 1)
        .otherwise(0)), lit(1))
    Seq(
      coalesce(best.getField("label"), lit("?")).as("predicted"),
      coalesce(best.getField("score"), lit(0L)).as("score"))
  }

  /** The ONE guarded scoring body both deliveries share: enforce the
    * model-size cliff, broadcast the single model row, and return the
    * (doc_id, predicted, score) projection of a batch — so a parity
    * fix (the zero-hit-label filter, the tie order) can never reach
    * one sink and not the other.
    */
  private def scorer(model: DataFrame,
      maxModelRows: Long): DataFrame => DataFrame = {
    // one cheap batch count at query START guards the single-row
    // broadcast cliff documented above
    val nRows = model.count()
    require(nRows <= maxModelRows,
      s"model has $nRows (label, token) rows > maxModelRows=$maxModelRows: " +
        "the streaming scorer broadcasts the model as one row; score a " +
        "vocabulary this size in batch " +
        "(graft.ops.Classify.tokenClassifierPredict) where the model join " +
        "is AQE-size-gated")
    val modelStatic = broadcast(modelRow(model))
    val cols = predictionCols(col("ws"), col("models"))
    // a micro-batch inherits the DROP FILE's partitioning — a nightly
    // crawler landing one file per drop would put the whole batch's
    // interpreted per-doc fold (words × k map probes) on ONE task
    // (measured at the 100× PROF row: a 5k-doc single-file batch
    // scored ~30× slower than its 32-way spread). The batch is
    // bounded (a drop, not a corpus), so one tiny text shuffle buys
    // full-cluster scoring parallelism; values are per-row
    // deterministic, so the spread cannot change a prediction.
    batch => batch
      .repartition(batch.sparkSession.sparkContext.defaultParallelism)
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .crossJoin(modelStatic)
      .select(col("doc_id") +: cols: _*)
  }

  /** Predictions over a parquet-file stream, append mode to a memory
    * sink named `queryName`. `model` is the frozen trained relation
    * ([[graft.ops.Classify.tokenClassifierModel]]'s (label, tok, w)).
    */
  def streamingPredict(spark: SparkSession, dir: String, schema: StructType,
      queryName: String, model: DataFrame,
      maxFilesPerTrigger: Int = 0,
      maxModelRows: Long = 2000000L): StreamingQuery = {
    val score = scorer(model, maxModelRows)
    val reader = spark.readStream.schema(schema)
    val src = (if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader).parquet(dir)
    score(src)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .start()
  }

  /** [[streamingPredict]] landing parquet instead of a memory sink —
    * the YAML-orchestratable form ([[graft.cli.StageRunner]]'s
    * `stream: classify`): predictions land under `outDir` through the
    * shared batch-keyed partition overwrite, so foreachBatch's
    * at-least-once replay is idempotent, and the optional durable
    * checkpoint makes successive drains incremental. Same model
    * broadcast, same size guard, same prediction columns — one scoring
    * body ([[scorer]]), two deliveries.
    */
  def streamingPredictToDir(spark: SparkSession, dir: String,
      schema: StructType, model: DataFrame, outDir: String,
      maxFilesPerTrigger: Int = 0, checkpoint: Option[String] = None,
      maxModelRows: Long = 2000000L): StreamingQuery = {
    val score = scorer(model, maxModelRows)
    BatchedParquetSink.start(spark, dir, schema, maxFilesPerTrigger,
      checkpoint) { (batch, batchId) =>
      BatchedParquetSink.landBatch(score(batch), outDir, batchId)
    }
  }
}
