package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities.
  *
  * First line of defense is AQE's skew-join splitting (enabled in
  * `Sessions`); explicit salting is for the cases AQE can't fix — a
  * single hot key whose one partition exceeds executor memory, or a
  * skewed aggregation. At 100 TB a hot key (null ids, default values)
  * is the norm, not the exception.
  */
object Skew {

  /** Salted inner equi-join: the skewed (large) side gets a
    * deterministic salt in [0, salts); the dimension side is exploded
    * `salts`× so every (key, salt) bucket finds its match. Result
    * equals `skewed.join(dim, key)` but the hot key's rows spread
    * across `salts` tasks.
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // deterministic salt from the full row, not rand() — keeps the
    // operator replayable (task retries see the same assignment)
    val salted = skewed.withColumn("__salt",
      pmod(hash(struct(skewed.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    val exploded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(exploded, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Two-phase (salted) count for skewed group keys: partial count on
    * (key, salt), final sum on key. The salt comes from the partition
    * id, so a hot key's rows split across tasks; totals are
    * assignment-independent because count/sum is associative.
    */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).cast("long").as("n"))
  }
}
