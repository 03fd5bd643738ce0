package graft.ops

import org.apache.spark.sql.SparkSession

/** The maintenance loop the stats relations exist for: read a store's
  * health, compact it exactly when the numbers say so — never blind
  * on a cron, never by an operator eyeballing directory listings.
  *
  * Two signals, matching what compaction actually fixes:
  *
  *  - DEAD ROWS: tombstoned/total above `maxTombstoneRatio` means
  *    every query/batch is paying an anti-join over rows that a
  *    rewrite would simply drop.
  *  - FRAGMENTATION: ingest count above `maxIngests` means appends
  *    have multiplied the file count (each append lands ~a file per
  *    partition it touches) and scans are paying open/footer overhead
  *    a rewrite re-bounds to ~one file per partition.
  *
  * Each `maintain*` returns whether it compacted, so a scheduler can
  * log/alert on the decision. The compact itself runs under the
  * maintainer lease like every maintenance op; racing a live ingest
  * stream fails loudly (stop the stream, maintain, restart — the
  * [[graft.streaming.StreamingIndexIngest]] contract).
  */
object StoreMaintenance {

  /** The decision, exposed for spec/audit: compact when dead rows
    * exceed the ratio or ingests exceed the cap.
    */
  def shouldCompact(nRows: Long, nTombstoned: Long, nIngests: Long,
      maxTombstoneRatio: Double, maxIngests: Long): Boolean =
    (nRows > 0 && nTombstoned.toDouble / nRows > maxTombstoneRatio) ||
      nIngests > maxIngests

  private def decideAndRun(
      stats: org.apache.spark.sql.DataFrame, rowsCol: String,
      maxTombstoneRatio: Double, maxIngests: Long)(
      compact: => Unit): Boolean = {
    val s = stats.head()
    val go = shouldCompact(s.getAs[Long](rowsCol),
      s.getAs[Long]("n_tombstoned"), s.getAs[Long]("n_ingests"),
      maxTombstoneRatio, maxIngests)
    if (go) compact
    go
  }

  def maintainIvf(spark: SparkSession, dir: String,
      maxTombstoneRatio: Double = 0.1, maxIngests: Long = 16): Boolean =
    decideAndRun(IvfIndex.stats(spark, dir), "n_vectors",
      maxTombstoneRatio, maxIngests)(IvfIndex.compact(spark, dir))

  def maintainPq(spark: SparkSession, dir: String,
      maxTombstoneRatio: Double = 0.1, maxIngests: Long = 16): Boolean =
    decideAndRun(PqStore.stats(spark, dir), "n_vectors",
      maxTombstoneRatio, maxIngests)(PqStore.compact(spark, dir))

  def maintainIvfPq(spark: SparkSession, dir: String,
      maxTombstoneRatio: Double = 0.1, maxIngests: Long = 16): Boolean =
    decideAndRun(IvfPqStore.stats(spark, dir), "n_vectors",
      maxTombstoneRatio, maxIngests)(IvfPqStore.compact(spark, dir))

  def maintainDedup(spark: SparkSession, dir: String,
      maxTombstoneRatio: Double = 0.1, maxIngests: Long = 16): Boolean =
    decideAndRun(DedupStore.stats(spark, dir), "n_docs",
      maxTombstoneRatio, maxIngests)(DedupStore.compact(spark, dir))
}
