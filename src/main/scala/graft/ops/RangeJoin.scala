package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Band (range) join — pairs with equal keys whose numeric times lie
  * within `eps` of each other.
  *
  * Spark plans `l.key = r.key AND abs(l.t - r.t) <= eps` as an
  * equi-join on the key followed by a per-key filter, which means
  * every key's full cross product materializes before the band
  * predicate runs — quadratic in key frequency. Bucketing by
  * floor(t/eps) makes the band part of the JOIN KEY: any in-band pair
  * is at most one bucket apart, so the left side probes its own and
  * both adjacent buckets (a 3× row expansion) and the join touches
  * only near rows. The exact band predicate still applies afterwards,
  * so the result is identical to the theta form.
  */
object RangeJoin {

  /** `leftTime`/`rightTime` must be non-negative numeric columns in
    * the same unit as `eps` (e.g. epoch days). Column names must be
    * disjoint across the two sides (rename before a self-join).
    */
  def band(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String, eps: Long): DataFrame = {
    require(eps > 0, "eps must be positive")
    val lb = left.withColumn("__bucket",
      explode(array((-1 to 1).map(d =>
        (col(leftTime) / eps).cast("long") + d): _*)))
    val rb = right.withColumn("__bucket",
      (col(rightTime) / eps).cast("long"))
    val joined = lb.join(rb,
        lb("__bucket") === rb("__bucket") && col(leftKey) === col(rightKey))
      .filter(abs(col(leftTime) - col(rightTime)) <= eps)
    joined.drop(lb("__bucket")).drop(rb("__bucket"))
  }
}
