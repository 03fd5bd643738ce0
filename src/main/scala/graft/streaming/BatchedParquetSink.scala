package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** The shared scaffolding of the foreachBatch-over-parquet streamers
  * ([[StreamingStoreDedup]], [[StreamingIvfQuery]]): a schema'd
  * parquet file source, the optional `maxFilesPerTrigger` throttle,
  * an optional durable checkpoint, and the batch-keyed
  * partition-overwrite delivery that makes foreachBatch's
  * at-least-once replay idempotent — ONE copy of the delivery
  * semantics so the two sinks cannot drift.
  */
private[graft] object BatchedParquetSink {

  /** THE batch-partition column/dir convention (`graft_batch=<id>`),
    * shared with the orchestrator's mirror landing so the two layouts
    * cannot drift.
    */
  val BatchCol = "graft_batch"

  /** Start a parquet-file stream driving `body` per micro-batch. */
  def start(spark: SparkSession, dir: String, schema: StructType,
      maxFilesPerTrigger: Int, checkpoint: Option[String])(
      body: (DataFrame, Long) => Unit): StreamingQuery = {
    val reader = spark.readStream.schema(schema)
    val src = (if (maxFilesPerTrigger > 0)
        reader.option("maxFilesPerTrigger", maxFilesPerTrigger)
      else reader).parquet(dir)
    val writer = src.writeStream.foreachBatch(body)
    checkpoint.foreach(c => writer.option("checkpointLocation", c))
    writer.start()
  }

  /** The idempotent landing: overwrite this batch's own
    * `graft_batch=<id>` partition, so a replayed batch replaces its
    * earlier copy instead of appending a duplicate.
    */
  def landBatch(result: DataFrame, outDir: String, batchId: Long): Unit = {
    result.write.mode("overwrite").parquet(s"$outDir/$BatchCol=$batchId")
    ()
  }
}
