package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  * broadcast model, so the query runs in append mode with no
  * watermark, no state store, and exactly one output row per doc in
  * any micro-batching. A model refresh is a new query start — the
  * model-handoff contract shared with the streaming cluster monitor.
  *
  * PARITY contract (spec-pinned == batch): the batch scorer's
  * argmax only ranges over labels sharing at least one token with
  * the doc (its tf⋈model join is inner), and weights can be
  * NEGATIVE — so the scorer must SKIP zero-hit labels entirely, not
  * score them as 0: a doc hitting only label A with a negative sum
  * must still predict A, and only a doc hitting NO label's
  * vocabulary reports '?' / 0. Ties break to the lexicographically
  * smallest label, exactly the batch window order (labels iterate in
  * ascending order and only a strictly greater score displaces the
  * incumbent).
  *
  * MODEL SHAPE: the (label, tok, w) relation is collected ONCE at
  * query start into per-label java HashMaps and shipped as a spark
  * broadcast — O(1) probes per (token, label). The r17 round learned
  * this the measured way: the previous in-row Catalyst fold probed
  * the model through `try_element_at` over MapData, whose lookup is
  * a LINEAR scan, so every (token, label) probe paid O(vocab) — a
  * 20k-doc drain at the 100× corpus took 42 s parallelized (and >10
  * minutes before the batch was even repartitioned). The SIZE BOUND
  * is unchanged: vocab × k rows must fit the driver and one
  * broadcast, so [[streamingPredict]] counts the model rows at query
  * start and REFUSES past `maxModelRows` with a message naming the
  * batch operator — an over-sized vocabulary reads as a config
  * error, not an opaque OOM mid-stream.
  */
object StreamingClassify {

  /** The ONE guarded scoring body both deliveries share: enforce the
    * model-size cliff, collect + broadcast the per-label hash maps,
    * and return the (doc_id, predicted, score) projection of a batch
    * — so a parity fix (the zero-hit-label skip, the tie order) can
    * never reach one sink and not the other.
    */
  private def scorer(model: DataFrame,
      maxModelRows: Long): DataFrame => DataFrame = {
    val spark = model.sparkSession
    // one cheap batch count at query START guards the driver-collect
    // + broadcast cliff documented above
    val nRows = model.count()
    require(nRows <= maxModelRows,
      s"model has $nRows (label, token) rows > maxModelRows=$maxModelRows: " +
        "the streaming scorer collects and broadcasts the model; score a " +
        "vocabulary this size in batch " +
        "(graft.ops.Classify.tokenClassifierPredict) where the model join " +
        "is AQE-size-gated")
    // labels in ASCENDING order: the tie rule below ("strictly greater
    // displaces") then lands on the smallest label for free
    val labelMaps: Array[(String, java.util.HashMap[String, java.lang.Long])] =
      model.select(col("label"), col("tok"), col("w")).collect()
        .groupBy(_.getString(0)).toArray.sortBy(_._1)
        .map { case (label, rows) =>
          val m = new java.util.HashMap[String, java.lang.Long](
            rows.length * 2)
          rows.foreach(r => m.put(r.getString(1), r.getLong(2)))
          (label, m)
        }
    val bc = spark.sparkContext.broadcast(labelMaps)
    batch => {
      import spark.implicits._
      batch
        // a micro-batch inherits the DROP FILE's partitioning — a
        // nightly crawler landing one file per drop would put the
        // whole batch's scoring on ONE task; the batch is bounded (a
        // drop, not a corpus), so one tiny text shuffle buys
        // full-cluster parallelism, and values are per-row
        // deterministic so the spread cannot change a prediction
        .repartition(batch.sparkSession.sparkContext.defaultParallelism)
        .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
        .as[(Long, Seq[String])]
        .mapPartitions { it =>
          val models = bc.value
          it.map { case (id, words) =>
            var bestLabel: String = null
            var bestScore = 0L
            var li = 0
            while (li < models.length) {
              val (label, m) = models(li)
              var s = 0L
              var hits = 0
              val wi = words.iterator
              while (wi.hasNext) {
                val v = m.get(wi.next())
                if (v != null) { s += v.longValue(); hits += 1 }
              }
              // zero-hit labels never enter the argmax (the batch
              // join is inner); strictly-greater keeps the smallest
              // label on ties
              if (hits > 0 && (bestLabel == null || s > bestScore)) {
                bestLabel = label
                bestScore = s
              }
              li += 1
            }
            if (bestLabel == null) (id, "?", 0L) else (id, bestLabel, bestScore)
          }
        }
        .toDF("doc_id", "predicted", "score")
    }
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
    * broadcast, same size guard, same scoring loop — one scoring
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
