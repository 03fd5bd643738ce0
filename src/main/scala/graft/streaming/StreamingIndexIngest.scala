package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.ops.{IvfIndex, IvfPqStore, PqStore}

/** Live GROWTH of the persisted ANN indexes: embeddings arriving on a
  * stream (a crawler's fresh documents, a nightly embed job's output)
  * append into the committed store per micro-batch — the write-side
  * counterpart of [[StreamingIvfQuery]]/[[StreamingPqQuery]].
  *
  * Exactly-once growth on top of foreachBatch's at-least-once replay
  * falls out of the stores' append contract: each micro-batch appends
  * under the ingest id `stream_<batchId>`, and a store append is a
  * dynamic partition overwrite of exactly that ingest's subtree — so
  * a replayed batch REPLACES its own earlier output instead of
  * double-inserting vectors (which would occupy two top-k ranks in
  * every query they neighbor). No sink-side dedup state, no
  * transactional log: idempotency is the storage layout.
  *
  * Geometry is frozen at build, per the stores' contract: batches are
  * assigned to the STORED centroids / encoded with the STORED
  * codebook; re-tuning is a rebuild. The stream is the store's single
  * MAINTAINER while it runs (each micro-batch takes and releases the
  * maintainer lease) — a concurrent compaction fails loudly on the
  * lease instead of racing the appends, which is the intended
  * operational answer: stop the stream, compact, restart.
  */
object StreamingIndexIngest {

  private def start(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int, checkpoint: Option[String])(
      append: (DataFrame, String) => Unit): StreamingQuery =
    BatchedParquetSink.start(spark, dir, schema, maxFilesPerTrigger,
      checkpoint) { (batch, batchId) =>
      append(batch, s"stream_$batchId")
    }

  /** Stream (vec_id, embedding) rows from parquet at `dir` into the
    * IVF index at `indexDir`.
    */
  def intoIvf(spark: SparkSession, dir: String, schema: StructType,
      indexDir: String, maxFilesPerTrigger: Int = 0,
      checkpoint: Option[String] = None): StreamingQuery =
    start(spark, dir, schema, maxFilesPerTrigger, checkpoint)(
      (batch, ingestId) => IvfIndex.append(batch, indexDir, ingestId))

  /** Same, into the PQ store at `storeDir`. */
  def intoPq(spark: SparkSession, dir: String, schema: StructType,
      storeDir: String, maxFilesPerTrigger: Int = 0,
      checkpoint: Option[String] = None): StreamingQuery =
    start(spark, dir, schema, maxFilesPerTrigger, checkpoint)(
      (batch, ingestId) => PqStore.append(batch, storeDir, ingestId))

  /** Same, into the composed IVF×PQ store at `storeDir`. */
  def intoIvfPq(spark: SparkSession, dir: String, schema: StructType,
      storeDir: String, maxFilesPerTrigger: Int = 0,
      checkpoint: Option[String] = None): StreamingQuery =
    start(spark, dir, schema, maxFilesPerTrigger, checkpoint)(
      (batch, ingestId) => IvfPqStore.append(batch, storeDir, ingestId))
}
