package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming exact deduplication (an extension beyond the reference,
  * whose execution is bounded — SURVEY B37).
  *
  * `dropDuplicatesWithinWatermark` keeps the FIRST PROCESSED arrival
  * of each key and expires its state once the watermark passes the
  * key's event time, so the dedup state is bounded by the watermark
  * horizon instead of growing with the corpus — the property that
  * lets the operator run forever on a 1000-executor cluster.
  *
  * Survivor contract: the KEY SET (and therefore the row count) is
  * deterministic; the surviving PAYLOAD is whichever duplicate is
  * processed first, which depends on partition/processing order. That
  * differs from the batch `Dedup.exactByPrefix`, whose keep-min
  * aggregation picks a deterministic survivor — when duplicates can
  * disagree on non-key columns and the survivor's payload matters,
  * resolve the winner downstream (e.g. a min/argmin over a keyed
  * aggregation) instead of relying on arrival order. The schema must
  * carry the event-time column `ts` for the watermark.
  */
object StreamingDedup {

  def streamingDedupFirst(spark: SparkSession, dir: String,
      schema: StructType, queryName: String,
      keys: Seq[String], watermarkDelay: String = "24 hours"): StreamingQuery = {
    require(keys.nonEmpty, "streamingDedupFirst requires at least one dedup key")
    EventWindows.runToMemory(
      spark.readStream.schema(schema).parquet(dir)
        .withWatermark("ts", watermarkDelay)
        .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*),
      queryName, "append")
  }
}
