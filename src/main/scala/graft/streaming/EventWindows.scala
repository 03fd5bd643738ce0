package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Windowed event analytics — batch and Structured Streaming forms of
  * the same aggregations (an extension beyond the reference, whose
  * "streaming" is bounded incremental pull — SURVEY B37).
  */
object EventWindows {

  /** Tumbling 1-hour counts per event_type (batch form). */
  def tumblingHourly(events: DataFrame): DataFrame =
    events.groupBy(
        window(col("ts"), "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** Sliding 2-hour windows advancing hourly. */
  def slidingTwoHour(events: DataFrame): DataFrame =
    events.groupBy(
        window(col("ts"), "2 hours", "1 hour").getField("start").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("window_start"), col("event_type"))

  /** Sessionization: per-user sessions split on gaps > 30 minutes,
    * expressed with lag + running sum (batch form; the streaming form
    * would use flatMapGroupsWithState).
    */
  def userSessions(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // order by the millisecond epoch (not raw ts): the oracle computes
    // in ms, and ordering must agree where sub-ms timestamps tie
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ms"), col("event_id"))
    val withGap = events
      .withColumn("ms", expr("unix_micros(ts) DIV 1000"))
      .withColumn("prev_ms", lag(col("ms"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ms").isNull
          || col("ms") - col("prev_ms") > 30L * 60 * 1000, 1).otherwise(0))
    withGap
      .withColumn("session_ix", sum(col("new_session")).over(byUser))
      .groupBy(col("user_id"), col("session_ix"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ms")).as("start_ms"), max(col("ms")).as("end_ms"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        max(col("n_events")).as("max_session_events"))
      .orderBy(col("user_id"))
  }

  /** Structured Streaming form of [[tumblingHourly]] with a watermark
    * for late data; reads parquet files as a stream, for tests and as
    * the template for a real unbounded source.
    */
  def streamingTumblingHourly(spark: SparkSession, dir: String,
      schema: StructType, queryName: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(dir)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
}
