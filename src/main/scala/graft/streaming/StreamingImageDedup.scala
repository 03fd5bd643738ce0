package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.ops.{AfpStore, FingerprintStore, PhashStore}

/** Live-ingest payload dedup against a PERSISTED fingerprint store —
  * the binary-modality counterpart of [[StreamingStoreDedup]]:
  * payloads arriving on a stream are decoded ONCE (the micro-batch
  * only) and flagged when their perceptual fingerprint lands within
  * the Hamming radius of anything already kept in the store. The
  * historical corpus is never re-decoded — that is the store's whole
  * point. One implementation serves every [[FingerprintStore]]
  * instance ([[StreamingImageDedup]], [[StreamingAudioDedup]]).
  *
  * Shape: `foreachBatch` running the EXACT batch operator
  * ([[FingerprintStore.dedupAgainst]]) per micro-batch — stream ==
  * batch by construction (spec-pinned anyway), and a flag row depends
  * only on the incoming payload and the static store, so the union
  * over micro-batches equals the batch run over the union in any
  * arrival order. No size cliff: the store side is a normal parquet
  * relation band-joined per batch under AQE.
  *
  * Delivery: each micro-batch OVERWRITES its own
  * `outDir/graft_batch=<batchId>` partition ([[BatchedParquetSink]]),
  * so foreachBatch's at-least-once replay lands exactly one copy and
  * a durable `checkpoint` makes scheduled drains incremental.
  */
private[graft] object StreamingFingerprintDedup {

  def start(store: FingerprintStore, spark: SparkSession, dir: String,
      schema: StructType, storeDir: String, outDir: String,
      maxDist: Int, nBands: Int, maxFilesPerTrigger: Int,
      checkpoint: Option[String]): StreamingQuery =
    BatchedParquetSink.start(spark, dir, schema, maxFilesPerTrigger,
      checkpoint) { (batch, batchId) =>
      writeBatch(store, spark, batch, batchId, storeDir, outDir,
        maxDist, nBands)
    }

  /** One micro-batch's work — factored out so the replay-idempotence
    * contract is directly testable: running the same (batch, id)
    * twice must land one copy.
    */
  private[streaming] def writeBatch(store: FingerprintStore,
      spark: SparkSession, batch: DataFrame, batchId: Long,
      storeDir: String, outDir: String,
      maxDist: Int, nBands: Int): Unit =
    BatchedParquetSink.landBatch(
      store.dedupAgainst(spark, batch, storeDir, maxDist, nBands),
      outDir, batchId)
}

/** The image drain: streamed image payloads against a [[PhashStore]]. */
object StreamingImageDedup {

  def streamingDedupAgainstStore(spark: SparkSession, dir: String,
      schema: StructType, storeDir: String, outDir: String,
      maxDist: Int = 3, nBands: Int = 4,
      maxFilesPerTrigger: Int = 0,
      checkpoint: Option[String] = None): StreamingQuery =
    StreamingFingerprintDedup.start(PhashStore, spark, dir, schema,
      storeDir, outDir, maxDist, nBands, maxFilesPerTrigger, checkpoint)
}

/** The audio drain: streamed audio payloads against an [[AfpStore]]. */
object StreamingAudioDedup {

  def streamingDedupAgainstStore(spark: SparkSession, dir: String,
      schema: StructType, storeDir: String, outDir: String,
      maxDist: Int = 3, nBands: Int = 4,
      maxFilesPerTrigger: Int = 0,
      checkpoint: Option[String] = None): StreamingQuery =
    StreamingFingerprintDedup.start(AfpStore, spark, dir, schema,
      storeDir, outDir, maxDist, nBands, maxFilesPerTrigger, checkpoint)
}
