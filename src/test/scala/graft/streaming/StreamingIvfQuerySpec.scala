package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming ANN against the persisted index pinned equal to the
  * batch query over the same query set, under forced multi-batch
  * arrival — external-id semantics included (no self-exclusion).
  */
class StreamingIvfQuerySpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  test("streamed top-k equals the batch index query across micro-batches") {
    val e = graft.engine.Tables
      .table(spark, "/root/testdata/sf0.001", "embeddings")
    val index = java.nio.file.Files
      .createTempDirectory("graft_stream_ivf").toString
    graft.ops.IvfIndex.save(e, index, nCells = 16)
    // external queries: 20 corpus embeddings under their own id space
    val queries = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_stream_ivf_src").toString
    queries.repartition(4).write.mode("overwrite").parquet(srcDir)
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_stream_ivf_out").toString + "/knn"
    val q = StreamingIvfQuery.streamingKnn(
      spark, srcDir, queries.schema, index, outDir,
      k = 3, nProbe = 12, maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) > 1,
      "fixture must actually exercise multiple micro-batches")
    val streamed = spark.read.parquet(outDir).drop("graft_batch")
    val batch = graft.ops.IvfIndex.query(
      spark, index, queries, k = 3, nProbe = 12)
    assert(batch.count() == 60, "20 queries x k=3")
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
