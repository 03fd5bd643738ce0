package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Multimodal, PhashStore}

/** Streaming image dedup pinned equal to the batch operator over the
  * same incoming set under forced multi-micro-batch arrival, plus the
  * replay-idempotence contract of the batch-keyed delivery.
  */
class StreamingImageDedupSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def mix(seed: Long): Long = {
    var x = seed * 0x9E3779B97F4A7C15L + 0x165667B19E3779F9L
    x ^= x >>> 29; x *= 0xBF58476D1CE4E5B9L
    x ^= x >>> 32
    x
  }

  private def png(bits: Long): Array[Byte] =
    Multimodal.grayCellsPng(Multimodal.cellsForBits(bits))

  test("streamed image flags equal the batch store dedup across micro-batches") {
    val sp = spark; import sp.implicits._
    val kept = (1L to 30L).map(i => (i, png(mix(i)))).toDF("doc_id", "payload")
    // incoming: near-copies of a third of the kept corpus + noise
    val incoming = ((101L to 110L).map(i => (i, png(mix(i - 100) ^ 1L))) ++
      (201L to 205L).map(i => (i, png(mix(i))))).toDF("doc_id", "payload")
    val store = java.nio.file.Files
      .createTempDirectory("graft_img_store").toString
    PhashStore.save(kept, store)
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_img_src").toString
    incoming.repartition(4).write.mode("overwrite").parquet(srcDir)
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_img_out").toString + "/flags"
    val q = StreamingImageDedup.streamingDedupAgainstStore(
      spark, srcDir, incoming.schema, store, outDir, maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) > 1,
      "fixture must actually exercise multiple micro-batches")
    val streamed = spark.read.parquet(outDir).drop("graft_batch")
    val batch = PhashStore.dedupAgainst(spark, incoming, store)
    assert(batch.count() >= 10L, "fixture must contain incremental near-dups")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("a replayed micro-batch lands exactly one copy (keyed overwrite)") {
    val sp = spark; import sp.implicits._
    val kept = (1L to 5L).map(i => (i, png(mix(i)))).toDF("doc_id", "payload")
    val store = java.nio.file.Files
      .createTempDirectory("graft_img_store2").toString
    PhashStore.save(kept, store)
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_img_out2").toString + "/flags"
    val batch = Seq((100L, png(mix(2)))).toDF("doc_id", "payload")
    StreamingFingerprintDedup.writeBatch(PhashStore, spark, batch, 7L,
      store, outDir, 3, 4)
    StreamingFingerprintDedup.writeBatch(PhashStore, spark, batch, 7L,
      store, outDir, 3, 4)
    assert(spark.read.parquet(outDir).count() == 1L,
      "an at-least-once replay must overwrite its own batch partition")
  }
}
