package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Query-scoped release of a persisted static relation (the frozen
  * model/benchmark a streaming scorer holds across micro-batches):
  * unpersist when the owning query terminates. A dedicated daemon
  * thread parked in `awaitTermination` replaces the earlier
  * listener-based form, whose subscribe-after-start left a window
  * where a query failing immediately could post its terminated event
  * BEFORE the listener registered (Spark posts the event before
  * deregistering the query from active, so a get()==null probe
  * cannot close the window either) — awaitTermination on an
  * already-terminated query simply returns, so no ordering races.
  */
private[streaming] object StreamRelease {

  def unpersistOnStop(query: StreamingQuery, rel: DataFrame): Unit = {
    val t = new Thread(() => {
      // the query OWNER observes and surfaces failures; this thread
      // exists only to release the cache on any termination
      try query.awaitTermination()
      catch { case _: Throwable => () }
      rel.unpersist(); ()
    }, s"graft-stream-release-${query.id}")
    t.setDaemon(true)
    t.start()
  }
}

/** The foreachBatch memory delivery the scorer-based streams share
  * ([[StreamingClassify.streamingPredict]],
  * [[StreamingDecontaminate.streamingFlags]]): scored rows accumulate
  * driver-side — exactly where `format("memory")` would keep them —
  * under `queryName` as a temp view. The view registers only AFTER
  * the query starts (Spark's duplicate-active-name refusal must not
  * let the loser clobber a live drain's view with an empty one on
  * its way to throwing; registration renders the SHARED accumulator,
  * so the post-start initial render can never mask a batch that beat
  * it), and a start-time failure releases `retained` instead of
  * leaking the scorer's cache.
  */
private[streaming] object AccumulatingMemorySink {

  def start(spark: SparkSession, src: DataFrame, queryName: String,
      outSchema: StructType, retained: Option[DataFrame])(
      score: DataFrame => DataFrame): StreamingQuery = {
    val acc = new java.util.ArrayList[Row]()
    def register(): Unit = acc.synchronized {
      spark.createDataFrame(new java.util.ArrayList(acc), outSchema)
        .createOrReplaceTempView(queryName)
    }
    val q =
      try
        src.writeStream.outputMode("append")
          .queryName(queryName)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val rows = score(batch).collect()
            acc.synchronized { acc.addAll(java.util.Arrays.asList(rows: _*)); () }
            register()
          }
          .start()
      catch {
        case e: Throwable =>
          retained.foreach(_.unpersist())
          throw e
      }
    // a zero-batch drain still reads as an empty relation, not a
    // missing table
    register()
    retained.foreach(StreamRelease.unpersistOnStop(q, _))
    q
  }
}
