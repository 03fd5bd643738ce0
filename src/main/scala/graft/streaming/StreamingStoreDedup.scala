package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.ops.{Dedup, DedupStore}

/** Live-ingest dedup against the PERSISTED gram store — the streaming
  * counterpart of [[graft.ops.DedupStore.dedupAgainst]]: documents
  * arriving on a stream are flagged when they near-duplicate anything
  * already kept in the store.
  *
  * Shape: `foreachBatch` running the EXACT batch operator per
  * micro-batch, not a streaming-DSL translation, for two reasons:
  *
  *  - the dedup decision needs a per-(incoming, corpus) COUNT of
  *    shared shingles after the store join; as a streaming aggregation
  *    that is stateful (watermarks, update mode, a state store holding
  *    keys that can never recur — every doc arrives exactly once), while
  *    inside `foreachBatch` each micro-batch is a plain batch relation
  *    and the aggregation completes within it;
  *  - reusing [[DedupStore.dedupShingled]] makes stream == batch a
  *    property BY CONSTRUCTION (the spec still pins it), and a doc's
  *    rows depend only on itself and the static store, so the union
  *    over micro-batches equals the batch run over the union in any
  *    arrival order.
  *
  * Unlike the one-collected-row broadcast streamers (decontaminate,
  * classify) there is NO size cliff here: the store side is a normal
  * parquet relation joined per batch under AQE, so it can be
  * arbitrarily large — this is the streaming form that scales with
  * the corpus, which is exactly why it rides the persisted store.
  *
  * Delivery: each micro-batch OVERWRITES its own
  * `outDir/graft_batch=<batchId>` partition — foreachBatch is
  * at-least-once (Spark can replay a batch whose writes landed but
  * whose offset commit didn't), and a blind append would duplicate
  * the replayed batch's rows; keyed overwrite makes the replay
  * idempotent, so with a durable `checkpoint` the LANDED result is
  * exactly-once (batch ids are stable across restarts from the same
  * checkpoint; with the default ephemeral checkpoint a restart
  * renumbers batches and the usual at-least-once caveat applies).
  * Read results with `spark.read.parquet(outDir)` and ignore/drop the
  * `graft_batch` partition column; `outDir` must be fresh or
  * previously written by this sink (mixing layouts breaks partition
  * discovery). Each micro-batch bypasses the
  * plan-hash-keyed shingle memo (it would thrash the bounded cache —
  * see [[DedupStore.dedupShingled]]).
  */
object StreamingStoreDedup {

  def streamingDedupAgainstStore(spark: SparkSession, dir: String,
      schema: StructType, storeDir: String, outDir: String,
      maxFilesPerTrigger: Int = 0,
      checkpoint: Option[String] = None): StreamingQuery =
    BatchedParquetSink.start(spark, dir, schema, maxFilesPerTrigger,
      checkpoint) { (batch, batchId) =>
      writeBatch(spark, batch, batchId, storeDir, outDir)
    }

  /** One micro-batch's work — factored out so the replay-idempotence
    * contract is directly testable: running the same (batch, id)
    * twice must land one copy.
    */
  private[streaming] def writeBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, storeDir: String, outDir: String): Unit = {
    // persist the batch's shingles for the join's two traversals
    // (gram explode + per-doc sizes), then release — the bounded
    // plan-hash memo is deliberately bypassed here (see scaladoc)
    val sh = Dedup.shingled(batch).persist()
    try BatchedParquetSink.landBatch(
      DedupStore.dedupShingled(spark, sh, storeDir), outDir, batchId)
    finally { sh.unpersist(); () }
  }
}
