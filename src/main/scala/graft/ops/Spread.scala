package graft.ops

import org.apache.spark.sql.DataFrame

/** Ensure a scan is parallel enough to feed a work-inflating operator
  * (explode, pairwise scoring, signature aggregation).
  *
  * Small parquet files carry a single row group, and a row group is
  * Spark's minimum split granularity — so a "distributed" dedup query
  * over a 600 KB fixture otherwise executes its entire explode ×300 /
  * O(slice·N) stage on ONE task. At production scale inputs arrive in
  * many splits and this is a no-op: the round-robin repartition only
  * fires when the scan has fewer partitions than half the cluster's
  * cores, so no shuffle is added to an already-parallel plan.
  */
object Spread {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // estimate scan parallelism from the leaf file listing — metadata
    // only, unlike df.rdd.getNumPartitions which forces a full
    // logical→RDD conversion per call just to read a count (each file
    // is at least one split; an in-memory relation lists no files and
    // gets spread, which is the safe direction)
    if (df.inputFiles.length >= math.max(2, target / 2)) df
    else df.repartition(target)
  }
}
