package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.ops.Kmeans

/** Streaming serving half of the lattice k-means family — the
  * topic-mixture monitor a live ingestion pipeline runs: vectors
  * arriving on a stream are assigned to BATCH-FIT centroids (the
  * standard offline-fit / online-serve split: Lloyd needs multi-pass,
  * a stream gets the frozen model), and the running per-cluster
  * occupancy + lattice inertia surface as a continuously-updated
  * table. A cluster whose share of arriving data drifts from the
  * fit-time mixture is the earliest online signal of topic drift /
  * mode collapse in a data feed.
  *
  * State is k rows of counters (cluster → n, Σdist²) — O(k), never
  * the vectors; the assignment itself is a stateless per-row
  * projection (quantize + one native int8_dot per centroid), so the
  * streaming plan is exactly the batch plan's map stage feeding a
  * tiny running aggregate. Determinism carries over: the same rows
  * in any arrival order and any micro-batching produce the same
  * final table as the batch assignment — pinned by the multi-batch
  * parity spec.
  */
object StreamingKmeans {

  /** Running (cluster, n, sum_dist2) over a parquet-file stream of
    * embedding rows, in complete mode to a memory sink named
    * `queryName`. `maxFilesPerTrigger > 0` forces multi-batch
    * execution so specs exercise aggregate state across batches.
    */
  def streamingClusterCounts(spark: SparkSession, dir: String,
      schema: StructType, queryName: String,
      cents: Array[Array[Long]],
      maxFilesPerTrigger: Int = 0): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val src = (if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader).parquet(dir)
    Kmeans.assignWithCentroids(src, cents)
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"), sum(col("dist2")).as("sum_dist2"))
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .start()
  }
}
