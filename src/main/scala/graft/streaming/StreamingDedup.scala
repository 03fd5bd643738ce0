package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming exact deduplication — the unbounded form of
  * `Dedup.exactByPrefix`'s keep-first contract (an extension beyond
  * the reference, whose execution is bounded — SURVEY B37).
  *
  * `dropDuplicatesWithinWatermark` keeps the first arrival of each
  * key and expires its state once the watermark passes the key's
  * event time, so the dedup state is bounded by the watermark horizon
  * instead of growing with the corpus — the property that lets the
  * operator run forever on a 1000-executor cluster. State is a keyed
  * store partitioned by the dedup key, so arrival order across
  * executors does not matter.
  */
object StreamingDedup {

  def streamingDedupFirst(spark: SparkSession, dir: String,
      schema: StructType, queryName: String,
      keys: Seq[String], watermarkDelay: String = "24 hours"): StreamingQuery =
    spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
      .writeStream.outputMode("append")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
}
