package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-table data-integrity audit — the dbt-style test suite
  * (relationships, uniqueness, accepted ranges) a warehouse runs
  * before anything downstream trusts a load. The reference has no
  * analog (its validation stops at schema inference); this is part
  * of the extension surface a production ingest pipeline needs.
  *
  * Every check reduces to ONE integer: the violation count. The
  * report is therefore exactly reproducible by any SQL engine (full
  * DuckDB oracle) and scale-friendly — each relationship check is a
  * left-anti join (dimension sides broadcast when small, and the
  * fact side only ever aggregates to a single partial-agg counter
  * per partition), each uniqueness check is `count(*) −
  * count(distinct key)` (no heap-buffered aggregate mixed in), and
  * the scalar range checks share ONE scan of the fact table
  * (conditional sums unpivoted with stack). Zero rows are
  * emitted per check either way: a PASSING suite is the visible
  * `n_violations = 0` row, not an absent one.
  *
  * Note the fixture truth this surfaces honestly: the synthetic
  * `(l_orderkey, l_linenumber)` pair is NOT unique (TESTDATA.md),
  * so `lineitem_unique_line` reports a genuine nonzero count — the
  * audit's job is to report it, not to hide it.
  */
object Integrity {

  /** Violations of `fact.fk REFERENCES dim.pk`: fact rows whose key
    * matches no dimension row. NULL fks count as violations here
    * (this is the NOT NULL + relationship composite a curation
    * pipeline wants; split the checks if NULLs are legal).
    */
  private def orphans(fact: DataFrame, fk: String,
      dim: DataFrame, pk: String): DataFrame =
    fact.select(col(fk)).join(dim.select(col(pk).as(fk)), Seq(fk), "left_anti")

  private def check(name: String, violations: Column, over: DataFrame): DataFrame =
    over.agg(violations.cast("long").as("n_violations"))
      .select(lit(name).as("check"), col("n_violations"))

  /** The fixed audit suite over the TPC-H-ish tables. `tables` maps a
    * table name to its DataFrame (usually `Tables.table(spark, dir, _)`).
    */
  def audit(tables: String => DataFrame): DataFrame = {
    val lineitem = tables("lineitem")
    val orders = tables("orders")
    val customer = tables("customer")
    val supplier = tables("supplier")
    val nation = tables("nation")

    // the three scalar range checks over the fact table fuse into ONE
    // scan (conditional sums, unpivoted to rows with stack) — at
    // 100 TB re-scanning the fact table once per check is the whole
    // cost; the uniqueness check keeps its own scan because mixing
    // count(DISTINCT) into the same aggregate would Expand-double the
    // scanned rows, and alone it prunes to the two key columns
    val liScalar = lineitem.agg(
        coalesce(sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)), lit(0L))
          .as("nonpos"),
        coalesce(sum(when(col("l_extendedprice") < 0, 1L).otherwise(0L)), lit(0L))
          .as("negprice"),
        coalesce(sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
          .otherwise(0L)), lit(0L)).as("discrange"))
      .selectExpr("stack(3, " +
        "'lineitem_nonpositive_qty', nonpos, " +
        "'lineitem_negative_price', negprice, " +
        "'orders_discount_range', discrange) AS (check, n_violations)")

    val checks = Seq(
      liScalar,
      check("customer_orphan_nation", count(lit(1)),
        orphans(customer, "c_nationkey", nation, "n_nationkey")),
      check("lineitem_orphan_orders", count(lit(1)),
        orphans(lineitem, "l_orderkey", orders, "o_orderkey")),
      check("lineitem_unique_line",
        count(lit(1)) - countDistinct(col("l_orderkey"), col("l_linenumber")),
        lineitem),
      check("orders_orphan_customer", count(lit(1)),
        orphans(orders, "o_custkey", customer, "c_custkey")),
      check("orders_unique_key",
        count(lit(1)) - countDistinct(col("o_orderkey")), orders),
      check("supplier_orphan_nation", count(lit(1)),
        orphans(supplier, "s_nationkey", nation, "n_nationkey")))

    checks.reduce(_ unionByName _).orderBy(col("check"))
  }
}
