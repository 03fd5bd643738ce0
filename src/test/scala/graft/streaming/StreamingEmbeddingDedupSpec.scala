package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming embedding dedup against the persisted store pinned equal
  * to the batch operator over the same incoming set, under forced
  * multi-batch arrival.
  */
class StreamingEmbeddingDedupSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  test("streamed pair flags equal the batch store dedup across micro-batches") {
    val e = graft.engine.Tables
      .table(spark, "/root/testdata/sf0.001", "embeddings")
    val store = java.nio.file.Files
      .createTempDirectory("graft_stream_edup").toString
    try {
      graft.ops.IvfPqStore.save(e, store, nCells = 16)
      val incoming = e.filter(col("vec_id") < 12)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft_stream_edup_src").toString
      incoming.repartition(3).write.mode("overwrite").parquet(srcDir)
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_stream_edup_out").toString + "/pairs"
      val q = StreamingEmbeddingDedup.streamingDedupAgainstStore(
        spark, srcDir, incoming.schema, store, outDir,
        minCosine = 0.3, nProbe = 16, margin = 2.0, maxFilesPerTrigger = 1)
      try q.processAllAvailable() finally q.stop()
      assert(q.recentProgress.count(_.numInputRows > 0) > 1,
        "fixture must actually exercise multiple micro-batches")
      val streamed = spark.read.parquet(outDir).drop("graft_batch")
      val batch = graft.ops.IvfPqStore.dedupAgainst(spark, store, incoming,
        minCosine = 0.3, nProbe = 16, margin = 2.0)
      assert(batch.count() > 0)
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).isEmpty
        && batch.exceptAll(streamed).isEmpty)
    } finally graft.ops.Pq.clearCodebookCache()
  }
}
