package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.engine.Tables

/** SQL-surface probe corpus — SURVEY.md §2-B rows B1..B36.
  *
  * The reference (apitap) hands every module's SQL verbatim to
  * DataFusion (`/root/reference/src/http/fetcher.rs:750`), claiming the
  * full SQL surface (`/root/reference/README.md:98-101`). Here each
  * construct is declared with the DataFrame API so Catalyst owns
  * pushdown, pruning, and join selection; a DuckDB oracle accompanies
  * every hash-matchable probe.
  *
  * Determinism discipline (SURVEY §2-B): total ORDER BY on every
  * hash-matched probe, ROUND(_, 2) on float aggregates, integer
  * aggregates cast to BIGINT on both engines (DuckDB SUM(BIGINT) is
  * HUGEINT otherwise), no approx/wall-clock functions in matched
  * probes.
  */
object Probes {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def sqlWithViews(s: SparkSession, dir: String, q: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(q)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // B1 — parquet scan + count
    "b01_scan_count" -> ((s, d) =>
      t(s, d, "lineitem").agg(count(lit(1)).as("n"))),

    // B2 — projection (column pruning reaches the scan)
    "b02_projection" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100)),

    // B3 — alias & arithmetic expression. ROUND at 4: the product of a
    // 2-decimal price and 0.9 is an exact 3-decimal value, so rounding
    // at 2 sits exactly on the .xx5 boundary where Spark and DuckDB
    // disagree; at 4 the round is a no-op and bit-deterministic.
    "b03_alias_expr" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          round(col("o_totalprice") * lit(0.9), 4).as("discounted"))
        .orderBy(col("o_orderkey"))
        .limit(50)),

    // B4 — filter predicates (BETWEEN / IN / <> / AND)
    "b04_filter" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity").between(10, 20)
          && col("l_returnflag").isin("A", "R")
          && col("l_linestatus") =!= "O")
        .agg(count(lit(1)).as("n"))),

    // B5 — inner equi-join + aggregate
    "b05_inner_join" -> ((s, d) => {
      val o = t(s, d, "orders")
      val c = t(s, d, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "inner")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("c_mktsegment"))
    }),

    // B6 — left outer join
    "b06_left_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .agg(count(lit(1)).as("n"), count(o("o_orderkey")).as("matched"))
    }),

    // B7 — semi join (EXISTS)
    "b07_semi_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n"))
    }),

    // B8 — anti join (NOT EXISTS)
    "b08_anti_join" -> ((s, d) => {
      val c = t(s, d, "customer")
      val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .agg(count(lit(1)).as("n"))
    }),

    // B9 — cross join
    "b09_cross_join" -> ((s, d) =>
      t(s, d, "region").crossJoin(t(s, d, "nation"))
        .agg(count(lit(1)).as("n"))),

    // B10 — theta / non-equi join (equi key + inequality residual)
    "b10_theta_join" -> ((s, d) => {
      val su = t(s, d, "supplier")
      val c = t(s, d, "customer")
      su.join(c, su("s_nationkey") === c("c_nationkey")
          && su("s_acctbal") > c("c_acctbal"))
        .agg(count(lit(1)).as("n"))
    }),

    // B11 — multi-way join (region ⋈ nation ⋈ customer)
    "b11_multi_join" -> ((s, d) => {
      val r = t(s, d, "region")
      val n = t(s, d, "nation")
      val c = t(s, d, "customer")
      r.join(n, n("n_regionkey") === r("r_regionkey"))
        .join(c, c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("r_name"))
    }),

    // B12 — hash aggregation: COUNT/SUM/MIN/MAX (partial + final)
    "b12_hash_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("bigint")).as("sq"),
          round(sum(col("l_extendedprice")), 2).as("sp"),
          min(col("l_orderkey")).as("mn"),
          max(col("l_orderkey")).as("mx"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // B13 — COUNT(DISTINCT)
    "b13_count_distinct" -> ((s, d) =>
      t(s, d, "orders").agg(countDistinct(col("o_custkey")).as("n"))),

    // B14 — HAVING (filter above aggregate)
    "b14_having" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 3)
        .orderBy(col("o_custkey"))),

    // B15 — ROLLUP grouping sets
    "b15_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"), col("n"))),

    // B15 — CUBE grouping sets
    "b15_cube" -> ((s, d) =>
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"), col("n"))),

    // B15 — explicit GROUPING SETS
    "b15_grouping_sets" -> ((s, d) => sqlWithViews(s, d,
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, n""".stripMargin)),

    // B16 — approx distinct (HLL++). Engines' sketches differ, so this
    // is rows-only checked (no oracle entry); accuracy asserted in the
    // ScalaTest suite against the exact count.
    "b16_approx_distinct" -> ((s, d) =>
      t(s, d, "orders")
        .agg(approx_count_distinct(col("o_custkey")).as("n"))),

    // B17 — ranking window (ROW_NUMBER, first order per customer)
    "b17_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_orderkey"), col("rn"))
        .orderBy(col("o_orderkey"))
    }),

    // B18 — analytic window (LAG)
    "b18_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderkey"), lag(col("o_orderkey"), 1).over(w).as("prev"))
        .orderBy(col("o_orderkey"))
        .limit(100)
    }),

    // B19 — aggregate over a ROWS frame
    "b19_window_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(-1, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_orderkey"),
          round(sum(col("o_totalprice")).over(w), 2).as("s2"))
        .orderBy(col("o_orderkey"))
        .limit(100)
    }),

    // B20 — multi-key global sort (DESC/ASC)
    "b20_sort" -> ((s, d) =>
      t(s, d, "lineitem")
        .orderBy(col("l_quantity").desc, col("l_orderkey").asc,
          col("l_linenumber").asc)
        .select(col("l_orderkey"), col("l_linenumber"))
        .limit(50)),

    // B21 — LIMIT + OFFSET (top-k)
    "b21_limit_offset" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"))
        .offset(5)
        .limit(10)),

    // B22 — UNION (distinct)
    "b22_union" -> ((s, d) =>
      t(s, d, "nation").select(col("n_nationkey").as("k"))
        .union(t(s, d, "region").select(col("r_regionkey").as("k")))
        .distinct()
        .orderBy(col("k"))),

    // B23 — INTERSECT
    "b23_intersect" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("k"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("k")))
        .orderBy(col("k"))),

    // B23 — EXCEPT
    "b23_except" -> ((s, d) =>
      t(s, d, "nation").select(col("n_nationkey").as("k"))
        .except(t(s, d, "customer").select(col("c_nationkey").as("k")))
        .orderBy(col("k"))),

    // B24 — uncorrelated scalar subquery
    "b24_scalar_subquery" -> ((s, d) => sqlWithViews(s, d,
      """SELECT COUNT(*) AS n FROM orders
        |WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)""".stripMargin)),

    // B25 — correlated subquery (decorrelated by Catalyst)
    "b25_correlated_subquery" -> ((s, d) => sqlWithViews(s, d,
      """SELECT COUNT(*) AS n FROM lineitem l
        |WHERE l_quantity > (SELECT AVG(l2.l_quantity) FROM lineitem l2
        |                    WHERE l2.l_orderkey = l.l_orderkey)""".stripMargin)),

    // B26 — CTE
    "b26_cte" -> ((s, d) => sqlWithViews(s, d,
      """WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
        |SELECT COUNT(*) AS n FROM big""".stripMargin)),

    // B27 — VALUES inline table
    "b27_values" -> ((s, d) => s.sql(
      "SELECT * FROM (VALUES (1,'a'),(2,'b')) AS t(id, s) ORDER BY id")),

    // B28 — CASE WHEN
    "b28_case_when" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 200000, "big")
            .when(col("o_totalprice") > 100000, "mid")
            .otherwise("small").as("bucket"))
        .orderBy(col("o_orderkey"))
        .limit(100)),

    // B29 — CAST. (l_orderkey, l_linenumber) is not unique in the
    // fixture, so l_quantity joins the sort key to keep output total.
    "b29_cast" -> ((s, d) =>
      t(s, d, "lineitem")
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .select(col("l_quantity").cast("bigint").as("q"),
          col("l_orderkey").cast("string").as("s"))
        .limit(20)),

    // B30 — string functions
    "b30_string_fns" -> ((s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"),
          upper(col("p_brand")).as("b"),
          length(col("p_name")).as("ln"),
          substring(col("p_type"), 1, 5).as("t5"),
          concat(col("p_brand"), lit("-"), col("p_type")).as("bt"))
        .orderBy(col("p_partkey"))
        .limit(50)),

    // B30 — regexp extraction + LIKE
    "b30_regexp" -> ((s, d) =>
      t(s, d, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          col("p_type").like("%a%").as("has_a"))
        .orderBy(col("p_partkey"))
        .limit(50)),

    // B31 — math functions. Sort keys cover every output determinant
    // ((l_orderkey, l_linenumber) alone is not unique in the fixture).
    "b31_math_fns" -> ((s, d) =>
      t(s, d, "lineitem")
        .orderBy(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_discount"))
        .select(col("l_orderkey"), col("l_linenumber"),
          (abs(col("l_discount") - 0.05) > 0.001).as("d"),
          floor(col("l_quantity")).as("f"),
          ceil(col("l_quantity")).as("c"),
          (col("l_orderkey") % 7).as("m"))
        .limit(50)),

    // B32 — date extraction + group
    "b32_date_fns" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(year(col("o_orderdate")).as("y"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("y"))),

    // B32 — DATE_TRUNC grouping (timestamp output)
    "b32_date_trunc" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("m"))),

    // B33 — nested struct field access (dialect-split oracle)
    "b33_struct_access" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(struct(col("l_orderkey").as("a")).as("st"))
        .select(col("st").getField("a").as("a"))
        .orderBy(col("a"))
        .limit(5)),

    // B34 — array functions over the embeddings fixture
    "b34_array_fns" -> ((s, d) =>
      t(s, d, "embeddings")
        .select(col("vec_id"), size(col("embedding")).as("dim"))
        .orderBy(col("vec_id"))
        .limit(10)),

    // B35 — JSON scalar extraction over events.props
    "b35_json_fns" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_val"))
        .orderBy(col("event_id"))
        .limit(20))
  )

  /** DuckDB-dialect oracles. Keys must match [[queries]]; column names
    * must match the Spark output exactly (driver sorts columns by name
    * before hashing). SUMs of integers are cast to BIGINT (DuckDB
    * returns HUGEINT), FLOOR/CEIL cast to BIGINT (DuckDB returns
    * DOUBLE), EXTRACT(YEAR) cast to INT (DuckDB returns BIGINT).
    */
  val oracle: Map[String, String] = Map(
    "b01_scan_count" -> "SELECT COUNT(*) AS n FROM lineitem",
    "b02_projection" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100",
    "b03_alias_expr" ->
      "SELECT o_orderkey, ROUND(o_totalprice * 0.9, 4) AS discounted FROM orders ORDER BY o_orderkey LIMIT 50",
    "b04_filter" ->
      "SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity BETWEEN 10 AND 20 AND l_returnflag IN ('A','R') AND l_linestatus <> 'O'",
    "b05_inner_join" ->
      "SELECT c_mktsegment, COUNT(*) AS n FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey GROUP BY c_mktsegment ORDER BY c_mktsegment",
    "b06_left_join" ->
      "SELECT COUNT(*) AS n, COUNT(o.o_orderkey) AS matched FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey",
    "b07_semi_join" ->
      "SELECT COUNT(*) AS n FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    "b08_anti_join" ->
      "SELECT COUNT(*) AS n FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)",
    "b09_cross_join" ->
      "SELECT COUNT(*) AS n FROM region r CROSS JOIN nation x",
    "b10_theta_join" ->
      "SELECT COUNT(*) AS n FROM supplier s JOIN customer c ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal",
    "b11_multi_join" ->
      "SELECT r_name, COUNT(*) AS n FROM region JOIN nation ON n_regionkey = r_regionkey JOIN customer ON c_nationkey = n_nationkey GROUP BY r_name ORDER BY r_name",
    "b12_hash_agg" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        | CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
        | ROUND(SUM(l_extendedprice), 2) AS sp,
        | MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "b13_count_distinct" ->
      "SELECT COUNT(DISTINCT o_custkey) AS n FROM orders",
    "b14_having" ->
      "SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3 ORDER BY o_custkey",
    "b15_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, n""".stripMargin,
    "b15_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, n""".stripMargin,
    "b15_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST, n""".stripMargin,
    "b30_regexp" ->
      """SELECT p_partkey, regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        | p_type LIKE '%a%' AS has_a
        |FROM part ORDER BY p_partkey LIMIT 50""".stripMargin,
    "b32_date_trunc" -> // DuckDB's month-trunc yields DATE; Spark's a TIMESTAMP
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m, COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY m""".stripMargin,
    "b17_window_rank" ->
      """SELECT o_orderkey, CAST(rn AS INT) AS rn FROM (
        |  SELECT o_orderkey, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) sub
        |WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    "b18_window_lag" ->
      """SELECT o_orderkey, LAG(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "b19_window_frame" ->
      """SELECT o_orderkey, ROUND(SUM(o_totalprice) OVER (
        |  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN 1 PRECEDING AND CURRENT ROW), 2) AS s2
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "b20_sort" ->
      "SELECT l_orderkey, l_linenumber FROM lineitem ORDER BY l_quantity DESC, l_orderkey ASC, l_linenumber LIMIT 50",
    "b21_limit_offset" ->
      "SELECT o_orderkey FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5",
    "b22_union" ->
      "SELECT n_nationkey AS k FROM nation UNION SELECT r_regionkey FROM region ORDER BY k",
    "b23_intersect" ->
      "SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY k",
    "b23_except" ->
      "SELECT n_nationkey AS k FROM nation EXCEPT SELECT c_nationkey FROM customer ORDER BY k",
    "b24_scalar_subquery" ->
      "SELECT COUNT(*) AS n FROM orders WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)",
    "b25_correlated_subquery" ->
      """SELECT COUNT(*) AS n FROM lineitem l
        |WHERE l_quantity > (SELECT AVG(l2.l_quantity) FROM lineitem l2
        |                    WHERE l2.l_orderkey = l.l_orderkey)""".stripMargin,
    "b26_cte" ->
      "WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 100000) SELECT COUNT(*) AS n FROM big",
    "b27_values" ->
      "SELECT * FROM (VALUES (1,'a'),(2,'b')) AS t(id, s) ORDER BY id",
    "b28_case_when" ->
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice > 200000 THEN 'big'
        |      WHEN o_totalprice > 100000 THEN 'mid'
        |      ELSE 'small' END AS bucket
        |FROM orders ORDER BY o_orderkey LIMIT 100""".stripMargin,
    "b29_cast" ->
      """SELECT CAST(l_quantity AS BIGINT) AS q, CAST(l_orderkey AS VARCHAR) AS s
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity LIMIT 20""".stripMargin,
    "b30_string_fns" ->
      """SELECT p_partkey, UPPER(p_brand) AS b, CAST(LENGTH(p_name) AS INT) AS ln,
        | SUBSTR(p_type, 1, 5) AS t5, CONCAT(p_brand, '-', p_type) AS bt
        |FROM part ORDER BY p_partkey LIMIT 50""".stripMargin,
    "b31_math_fns" ->
      """SELECT l_orderkey, l_linenumber,
        | ABS(l_discount - 0.05) > 0.001 AS d,
        | CAST(FLOOR(l_quantity) AS BIGINT) AS f,
        | CAST(CEIL(l_quantity) AS BIGINT) AS c,
        | l_orderkey % 7 AS m
        |FROM lineitem ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount LIMIT 50""".stripMargin,
    "b32_date_fns" ->
      """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS y, COUNT(*) AS n
        |FROM orders GROUP BY 1 ORDER BY y""".stripMargin,
    "b33_struct_access" ->
      "SELECT {'a': l_orderkey}['a'] AS a FROM lineitem ORDER BY a LIMIT 5",
    "b34_array_fns" ->
      "SELECT vec_id, CAST(len(embedding) AS INT) AS dim FROM embeddings ORDER BY vec_id LIMIT 10",
    "b35_json_fns" ->
      "SELECT event_id, json_extract_string(props, '$.k') AS k_val FROM events ORDER BY event_id LIMIT 20"
  )
}
