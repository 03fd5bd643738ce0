package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming PQ retrieval against the persisted store pinned equal to
  * the batch query over the same query set, under forced multi-batch
  * arrival — external-id semantics included (no self-exclusion).
  */
class StreamingPqQuerySpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  test("streamed top-k equals the batch store query across micro-batches") {
    val e = graft.engine.Tables
      .table(spark, "/root/testdata/sf0.001", "embeddings")
    val store = java.nio.file.Files
      .createTempDirectory("graft_stream_pq").toString
    try {
      graft.ops.PqStore.save(e, store)
      // external queries: 20 corpus embeddings under their own id space
      val queries = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val srcDir = java.nio.file.Files
        .createTempDirectory("graft_stream_pq_src").toString
      queries.repartition(4).write.mode("overwrite").parquet(srcDir)
      val outDir = java.nio.file.Files
        .createTempDirectory("graft_stream_pq_out").toString + "/knn"
      val q = StreamingPqQuery.streamingKnn(
        spark, srcDir, queries.schema, store, outDir,
        k = 3, maxFilesPerTrigger = 1)
      try q.processAllAvailable() finally q.stop()
      assert(q.recentProgress.count(_.numInputRows > 0) > 1,
        "fixture must actually exercise multiple micro-batches")
      val streamed = spark.read.parquet(outDir).drop("graft_batch")
      val batch = graft.ops.PqStore.query(spark, store, queries, k = 3)
      assert(batch.count() == 60, "20 queries x k=3")
      assert(streamed.count() == batch.count())
      assert(streamed.exceptAll(batch).isEmpty
        && batch.exceptAll(streamed).isEmpty)
    } finally graft.ops.Pq.clearCodebookCache()
  }
}
