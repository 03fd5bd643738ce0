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
  * under `queryName` as a temp view.
  *
  * The view is LAZY: it resolves to a [[AccRelation]] whose
  * `buildScan` snapshots the shared accumulator at READ time, so a
  * micro-batch's driver work is O(batch rows) — appending to the list
  * — never a full re-render of everything retained so far (the
  * previous per-batch `createDataFrame(copy(acc))` made a long drain
  * O(total·batches), quadratic exactly where `format("memory")`
  * appended incrementally). Registration still happens only AFTER the
  * query starts (Spark's duplicate-active-name refusal must not let
  * the loser clobber a live drain's view on its way to throwing;
  * laziness means a batch that beats registration is visible the
  * moment the view exists), and a start-time failure releases
  * `retained` instead of leaking the scorer's cache.
  *
  * Read-consistency contract: the snapshot is per SCAN, not per
  * query — a single query that scans the view twice (self-join,
  * `except(self)`) calls `buildScan` once per scan node, and a
  * micro-batch committing between the two calls gives the sides
  * different row sets. The eager per-batch view was self-consistent
  * within one query but paid the quadratic re-render for it; callers
  * needing a self-consistent multi-scan read should materialize once
  * (`spark.table(name).cache()` or `.collect()`) and query the
  * snapshot — the natural idiom for this interactive delivery.
  *
  * BOUNDED: this sink keeps every scored row on the driver for the
  * query's lifetime — the test/interactive delivery contract — so a
  * drain that crosses `maxRetainedRows` fails LOUDLY, pointing at the
  * parquet delivery (`streamingPredictToDir` / [[BatchedParquetSink]],
  * which keeps nothing on the driver) instead of creeping toward an
  * opaque driver OOM. The repo invariant: every unbounded seam has a
  * ceiling with a named escape hatch.
  */
private[streaming] object AccumulatingMemorySink {

  /** Default driver-retained-row ceiling: ~10⁶ small rows is
    * comfortably interactive; anything past it is a production drain
    * in the wrong delivery.
    */
  val DefaultMaxRetainedRows = 1000000L

  private final class AccRelation(
      override val sqlContext: org.apache.spark.sql.SQLContext,
      override val schema: StructType,
      acc: java.util.ArrayList[Row])
      extends org.apache.spark.sql.sources.BaseRelation
      with org.apache.spark.sql.sources.TableScan {
    override def buildScan(): org.apache.spark.rdd.RDD[Row] = {
      val snap = acc.synchronized(acc.toArray(new Array[Row](acc.size())))
      sqlContext.sparkContext.parallelize(snap.toSeq, 1)
    }
  }

  def start(spark: SparkSession, src: DataFrame, queryName: String,
      outSchema: StructType, retained: Option[DataFrame],
      maxRetainedRows: Long = DefaultMaxRetainedRows)(
      score: DataFrame => DataFrame): StreamingQuery = {
    val acc = new java.util.ArrayList[Row]()
    val q =
      try
        src.writeStream.outputMode("append")
          .queryName(queryName)
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val rows = score(batch).collect()
            acc.synchronized {
              val total = acc.size().toLong + rows.length
              if (total > maxRetainedRows)
                throw new IllegalStateException(
                  s"memory delivery '$queryName' would retain $total rows " +
                    s"on the driver (ceiling $maxRetainedRows): this sink " +
                    "is the test/interactive delivery — route long or " +
                    "unbounded drains through streamingPredictToDir (the " +
                    "BatchedParquetSink parquet delivery), which keeps " +
                    "nothing on the driver")
              acc.addAll(java.util.Arrays.asList(rows: _*)); ()
            }
          }
          .start()
      catch {
        case e: Throwable =>
          retained.foreach(_.unpersist())
          throw e
      }
    spark.baseRelationToDataFrame(
        new AccRelation(spark.sqlContext, outSchema, acc))
      .createOrReplaceTempView(queryName)
    retained.foreach(StreamRelease.unpersistOnStop(q, _))
    q
  }
}
