package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query-scoped release of a persisted static relation (the frozen
  * model/benchmark a streaming scorer holds across micro-batches):
  * unpersist when the owning query terminates, through a listener
  * that removes itself after firing — a session running many drains
  * accumulates neither caches nor listeners.
  */
private[streaming] object StreamRelease {

  def unpersistOnStop(spark: SparkSession, queryId: java.util.UUID,
      rel: DataFrame): Unit = {
    val l = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
        if (e.id == queryId) {
          rel.unpersist()
          spark.streams.removeListener(this)
        }
    }
    spark.streams.addListener(l)
    // the query can terminate between start() and addListener — the
    // terminated event then predates the subscription and would leak
    // the cache; release directly in that window (unpersist is
    // idempotent, so the listener ALSO firing is harmless)
    if (spark.streams.get(queryId) == null) {
      rel.unpersist()
      spark.streams.removeListener(l)
    }
  }
}
