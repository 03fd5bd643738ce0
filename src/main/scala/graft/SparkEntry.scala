package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every operator's probe query: the SQL-surface corpus
  * (SURVEY §2-B) plus the engine-native and extension operators added
  * per milestone.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001 — a TPC-H-Q1-style
    * pricing summary: filter → hash aggregate (partial+final) → sort.
    * Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity").cast("bigint")).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** One entry per implemented operator from SURVEY.md §2 (b*) plus
    * the training-data extensions (x*).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Probes.queries ++ graft.queries.Extensions.queries

  /** For each key in queries, equivalent SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Probes.oracle ++ graft.queries.Extensions.oracle
}
