package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming cluster-occupancy monitor pinned equal to the batch
  * assignment: same rows, forced multi-micro-batch arrival, frozen
  * batch-fit centroids.
  */
class StreamingKmeansSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("streaming cluster counts equal the batch assignment across micro-batches") {
    val emb = graft.engine.Tables.table(spark, sf, "embeddings")
    val cents = Kmeans.centroids(emb)
    val dir = java.nio.file.Files
      .createTempDirectory("emb-stream-kmeans").toString
    // several files -> with maxFilesPerTrigger=1 the stream must carry
    // aggregate state across micro-batches to reach the batch answer
    emb.repartition(4).write.mode("overwrite").parquet(dir)
    val q = graft.streaming.StreamingKmeans.streamingClusterCounts(
      spark, dir, emb.schema, "kmeans_stream_counts", cents,
      maxFilesPerTrigger = 1)
    try q.processAllAvailable() finally q.stop()
    assert(q.recentProgress.count(_.numInputRows > 0) > 1,
      "fixture must actually exercise multiple micro-batches")
    val streamed = spark.table("kmeans_stream_counts")
    val batch = Kmeans.kmeansAssign(emb)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("dist2")).as("sum_dist2"))
    assert(batch.count() > 1, "fixture must populate several clusters")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }
}
