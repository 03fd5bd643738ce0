package graft

import org.apache.spark.sql.functions._

/** Runs the Structured Streaming forms of the event analytics against
  * a parquet-backed stream and prints their results next to the batch
  * forms — `runMain graft.StreamDemo [sfDir]`.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.engine.Sessions.local()
    val events = graft.engine.Tables.table(spark, sfDir, "events")
    val dir = java.nio.file.Files.createTempDirectory("stream-demo").toString
    events.write.mode("overwrite").parquet(dir)

    val sq = graft.streaming.EventWindows.streamingUserSessions(
      spark, dir, events.schema, "demo_sessions")
    try sq.processAllAvailable() finally sq.stop()
    val streamed = spark.table("demo_sessions")
    val batch = graft.streaming.EventWindows.userSessions(events)
    println(s"[stream-demo] sessionization: streamed=${streamed.count()} users, " +
      s"batch=${batch.count()} users, " +
      s"diff=${streamed.exceptAll(batch).count() + batch.exceptAll(streamed).count()}")
    streamed.orderBy(col("user_id")).show(5)

    val tq = graft.streaming.EventWindows.streamingTumblingHourly(
      spark, dir, events.schema, "demo_tumbling")
    try tq.processAllAvailable() finally tq.stop()
    println(s"[stream-demo] tumbling windows: ${spark.table("demo_tumbling").count()} rows")
    spark.stop()
  }
}
