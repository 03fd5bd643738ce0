package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — attach to every left row the latest
  * right row of the same key with `rightTime` ≤ `leftTime` (time ties
  * broken by the last `tieBreak` value, so the result is fully
  * deterministic and oracle-comparable).
  *
  * Spark has no as-of operator; the naive encoding is a range join
  * (`l.key = r.key && r.t <= l.t`) plus a top-1 window, which
  * materializes every (left, earlier-right) match — quadratic per key.
  * This is the union+window single pass instead: tag both inputs, sort
  * each key group by (time, side, tieBreak) with right rows before
  * coincident left rows, and carry the last-seen right payload
  * forward. One shuffle by key + one sort, O(n log n) total — the
  * shape that survives "attach the current dimension state to every
  * event" at 100 TB.
  */
object AsofJoin {

  def asof(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      payload: Seq[String], tieBreak: Seq[String] = Seq.empty): DataFrame = {
    val l = left
      .withColumn("__k", col(leftKey))
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
    // a NULL rightTime can never satisfy rightTime <= leftTime, but
    // NULLS FIRST ordering would make such a row the "earliest" match
    // and attach its payload — drop them before the union
    val r = right.filter(col(rightTime).isNotNull).select(
      Seq(col(rightKey).as("__k"), col(rightTime).as("__t"),
        lit(0).as("__side"), struct(payload.map(col): _*).as("__p")) ++
        tieBreak.zipWithIndex.map { case (c, i) => col(c).as(s"__tie$i") }: _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val order = col("__t").asc +: col("__side").asc +:
      tieBreak.indices.map(i => col(s"__tie$i").asc_nulls_first)
    val w = Window.partitionBy(col("__k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = u
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val payloadCols = payload.map(p => col("__asof").getField(p).as(p))
    withAsof.select(left.columns.map(col).toSeq ++ payloadCols: _*)
  }
}
