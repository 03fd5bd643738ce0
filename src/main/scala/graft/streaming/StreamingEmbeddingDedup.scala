package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.ops.IvfPqStore

/** Live embedding-space dedup/decontamination against the persisted
  * IVF×PQ store — the embedding counterpart of
  * [[StreamingStoreDedup]]: embedding batches arriving on a stream
  * (today's crawl, freshly embedded) are flagged against the
  * HISTORICAL corpus per micro-batch, emitting the qualifying
  * (query_id, corpus_id, cosine) pairs, without the stream ever
  * re-reading or re-encoding the history.
  *
  * Same architecture and delivery as every store streamer:
  * `foreachBatch` runs the EXACT batch operator
  * ([[graft.ops.IvfPqStore.dedupAgainst]]) per micro-batch, each
  * batch resolves the committed store version (a compaction committed
  * mid-stream is picked up at the next trigger), and the batch-keyed
  * partition overwrite makes at-least-once replay idempotent.
  * `nProbe`/`margin` are the recall knobs, exactly as in the batch
  * operator; the per-batch probe broadcast is bounded by micro-batch
  * size × nProbe.
  */
object StreamingEmbeddingDedup {

  /** Stream (query_id, qv) rows from parquet at `dir`, flag against
    * the store at `storeDir`, land (query_id, corpus_id, cosine)
    * pairs under `outDir`.
    */
  def streamingDedupAgainstStore(spark: SparkSession, dir: String,
      schema: StructType, storeDir: String, outDir: String,
      minCosine: Double = 0.3, nProbe: Int = 4, margin: Double = 0.35,
      maxFilesPerTrigger: Int = 0,
      checkpoint: Option[String] = None): StreamingQuery =
    BatchedParquetSink.start(spark, dir, schema, maxFilesPerTrigger,
      checkpoint) { (batch, batchId) =>
      BatchedParquetSink.landBatch(
        IvfPqStore.dedupAgainst(spark, storeDir, batch, minCosine,
          nProbe, margin),
        outDir, batchId)
    }
}
