package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming classifier scorer pinned equal to the batch predictor:
  * same held-out rows, forced multi-micro-batch arrival, frozen
  * batch-trained model — plus the two decision edges where a naive
  * in-row scorer silently diverges from the batch join semantics.
  */
class StreamingClassifySpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streaming predictions equal the batch predictor across micro-batches") {
    val docs = graft.engine.Tables.table(spark, sf, "documents")
    val model = Classify.tokenClassifierModel(docs)
    val batch = Classify.tokenClassifierPredict(docs)
      .select(col("doc_id"), col("predicted"), col("score"))
    val heldOut = docs.filter(Sampling.bucketOf(col("doc_id")) >= 8000)
    val dir = java.nio.file.Files
      .createTempDirectory("doc-stream-classify").toString
    heldOut.repartition(4).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.StreamingClassify.streamingPredict(
      spark, dir, heldOut.schema, "classify_stream", model,
      maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) > 1,
      "fixture must actually exercise multiple micro-batches")
    val streamed = spark.table("classify_stream")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("zero-hit labels are excluded from the argmax; full-OOV docs report '?'") {
    val sp = spark; import sp.implicits._
    // weights can be NEGATIVE: a doc hitting ONLY label A with a
    // negative sum must predict A (the batch inner join never ranks
    // B at all) — an in-row scorer that treats missing labels as 0
    // would flip it to B
    val model = Seq(
      ("A", "neg", -5L), ("A", "mix", 2L),
      ("B", "pos", 3L)).toDF("label", "tok", "w")
    val docs = Seq(
      (1L, "neg neg"),  // only A hit, score -10 -> A despite < 0
      (2L, "zzz qqq"),  // nothing hit -> '?' / 0
      (3L, "neg pos"),  // A: -5 (1 hit), B: 3 (1 hit) -> B
      (4L, "mix pos")   // A: 2, B: 3 -> B
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("doc-stream-classify-edge").toString
    docs.write.mode("overwrite").parquet(dir)
    val q = graft.streaming.StreamingClassify.streamingPredict(
      spark, dir, docs.schema, "classify_stream_edge", model)
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("classify_stream_edge").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got(1L) == (("A", -10L)))
    assert(got(2L) == (("?", 0L)))
    assert(got(3L) == (("B", 3L)))
    assert(got(4L) == (("B", 3L)))
  }

  test("ties break to the smallest label on both deliveries") {
    val sp = spark; import sp.implicits._
    val model = Seq(("B", "t", 5L), ("A", "t", 5L)).toDF("label", "tok", "w")
    val docs = Seq((1L, "t")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("doc-stream-classify-tie").toString
    docs.write.mode("overwrite").parquet(dir)
    val q = graft.streaming.StreamingClassify.streamingPredict(
      spark, dir, docs.schema, "classify_stream_tie", model)
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("classify_stream_tie").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("A", 5L)))

    // over the broadcast ceiling the scorer DEGRADES to the join
    // delivery (r17 verdict: no refusal) — same tie, same row
    val q2 = graft.streaming.StreamingClassify.streamingPredict(
      spark, dir, docs.schema, "classify_stream_tie_degrade", model,
      maxModelRows = 1)
    try q2.processAllAvailable() finally q2.stop()
    val got2 = spark.table("classify_stream_tie_degrade").collect()
      .map(r => (r.getString(1), r.getLong(2)))
    assert(got2.toSeq == Seq(("A", 5L)))
  }

  test("over-ceiling models degrade to the batch join scorer, bit-equal; " +
      "under the ceiling the broadcast fast path is still taken") {
    val docs = graft.engine.Tables.table(spark, sf, "documents")
    val model = Classify.tokenClassifierModel(docs)
    val heldOut = docs.filter(Sampling.bucketOf(col("doc_id")) >= 8000)
      .select(col("doc_id"), col("text"))
    val batch = Classify.predictWithModel(heldOut, model)

    // a full streaming drain against an over-ceiling model: multiple
    // micro-batches, each scored by the distributed join — no refusal,
    // predictions bit-equal to the batch scorer
    val dir = java.nio.file.Files
      .createTempDirectory("doc-stream-classify-degrade").toString
    heldOut.repartition(4).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.StreamingClassify.streamingPredict(
      spark, dir, heldOut.schema, "classify_stream_big_vocab", model,
      maxFilesPerTrigger = 1, maxModelRows = 10)
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) > 1,
      "fixture must actually exercise multiple micro-batches")
    val streamed = spark.table("classify_stream_big_vocab")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)

    // the delivery CHOICE is plan-pinned, not inferred from timing:
    // the fast path scores through the typed mapPartitions over the
    // broadcast hash maps (an object-serde plan), the degrade path
    // through the relational join+window argmax — each plan carries
    // its own signature node and NOT the other's
    val fastH = graft.streaming.StreamingClassify
      .scorer(model, maxModelRows = Long.MaxValue)
    val fast = fastH.score(heldOut).queryExecution.optimizedPlan.toString
    assert(fast.contains("MapPartitions") && !fast.contains("Window"),
      s"under the ceiling the broadcast mapPartitions path must score:\n$fast")
    assert(fastH.retained.isEmpty,
      "the fast path must not retain a cached model (broadcast replaces it)")
    val degH = graft.streaming.StreamingClassify.scorer(model, maxModelRows = 10)
    val degraded = degH.score(heldOut).queryExecution.optimizedPlan.toString
    assert(degraded.contains("Window") && !degraded.contains("MapPartitions"),
      s"over the ceiling the join scorer must score:\n$degraded")
    assert(degH.retained.isDefined,
      "the degrade path must hand its cached model back for query-stop release")
    degH.retained.foreach(_.unpersist())
  }
}
