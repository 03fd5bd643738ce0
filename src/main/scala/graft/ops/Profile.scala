package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling ("ANALYZE"-style column statistics): row count,
  * null count, exact distinct count, min and max for a set of numeric
  * columns, one output row per column.
  *
  * The whole profile is ONE aggregation pass over the table — every
  * per-column statistic is an aggregate expression in the same
  * `agg()`, so Spark plans a single scan with partial aggregation
  * (the multi-`count(DISTINCT)` rewrite expands rows by the number of
  * distinct-aggregates, but the expansion happens after the scan and
  * combines map-side). The per-column pivot to rows happens on the
  * single aggregated row — free. At 100 TB this is the difference
  * between one pass and one pass per column.
  *
  * min/max are emitted as the column's own values cast to double (no
  * arithmetic is performed on them), and counts as longs, so a
  * cross-engine oracle compares exactly.
  */
object Profile {

  /** Pivot a one-row aggregate into one row per profiled column: the
    * per-column stats become an array of structs, exploded and
    * flattened — the pivot runs on a single row, so it's free.
    */
  private def pivotToRows(one: DataFrame,
      stacked: Seq[org.apache.spark.sql.Column]): DataFrame =
    one.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("column"))

  /** Column label for percentile p: "p50" for 0.5, "p99_9" for 0.999
    * — fractional percentiles keep their digits (underscore for the
    * point, struct-field-safe) instead of rounding into a collision.
    */
  private[ops] def pLabel(p: Double): String = {
    // scale in decimal space (BigDecimal of the double's shortest
    // string form × 100): p * 100 in binary double arithmetic turns
    // e.g. 0.29 into 28.999999999999996 and the label goes noisy
    val s = (BigDecimal(p.toString) * 100).underlying
      .stripTrailingZeros.toPlainString
    "p" + s.replace("-", "m").replace(".", "_")
  }

  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nnull"),
        countDistinct(col(c)).as(s"${c}__ndist"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col("__n").as("n_rows"),
        col(s"${c}__nnull").as("n_null"), col(s"${c}__ndist").as("n_distinct"),
        col(s"${c}__min").as("min_v"), col(s"${c}__max").as("max_v"))
    }
    pivotToRows(one, stacked)
  }

  /** Exact percentiles per column, one output row per column.
    * `percentile` is Spark's exact continuous-quantile aggregate: it
    * buffers (value → count) per partial, so memory is bounded by the
    * column's DISTINCT count, not its row count — fine for the
    * bounded-domain measure columns this profiles (and the reason to
    * prefer `approx_percentile` instead when a column's domain is
    * unbounded at 100 TB). The interpolation `lower + (upper−lower)·
    * frac` at rank p·(n−1) is the same IEEE arithmetic DuckDB's
    * quantile_cont performs, so the doubles compare bit-exactly —
    * verified on both the integral and the 2-decimal fixture columns.
    */
  def quantiles(df: DataFrame, cols: Seq[String],
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val pArr = array(ps.map(lit): _*)
    val aggs = cols.map(c => percentile(col(c), pArr).as(s"${c}__q"))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column") +:
        ps.zipWithIndex.map { case (p, i) =>
          element_at(col(s"${c}__q"), i + 1).as(pLabel(p))
        }: _*)
    }
    pivotToRows(one, stacked)
  }

  /** Sketch-based profile — the scale path for columns whose DOMAIN
    * is unbounded, where [[quantiles]]'s (value→count) buffer and
    * [[columnProfile]]'s exact `count(DISTINCT)` stop being safe:
    * HyperLogLog++ distinct estimate and KLL-style approximate
    * percentiles, both constant-memory mergeable sketches with
    * map-side partial aggregation. Still ONE pass over the table.
    * Sketch internals are engine-specific, so this is rows-only in
    * the driver gate; accuracy vs the exact profile is spec-asserted
    * (the exact operators are the oracle anchor, same contract as
    * the HLL probe b16).
    */
  def sketchProfile(df: DataFrame, cols: Seq[String],
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
      accuracy: Int = 10000, rsd: Double = 0.02): DataFrame = {
    val pArr = array(ps.map(lit): _*)
    val aggs = cols.flatMap { c =>
      Seq(approx_count_distinct(col(c), rsd).as(s"${c}__nd"),
        percentile_approx(col(c), pArr, lit(accuracy)).as(s"${c}__q"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.map { c =>
      struct(lit(c).as("column") +: col("__n").as("n_rows") +:
        col(s"${c}__nd").as("approx_distinct") +:
        ps.zipWithIndex.map { case (p, i) =>
          element_at(col(s"${c}__q"), i + 1).cast("double")
            .as("approx_" + pLabel(p))
        }: _*)
    }
    pivotToRows(one, stacked)
  }

  /** Hash-matched accuracy gate for [[sketchProfile]]: the sketch
    * VALUES are engine-specific (rows-only in the driver gate), but
    * their accuracy CONTRACT is a deterministic integer the oracle can
    * pin — per column, `ok_distinct` = the HLL estimate is within 5 %
    * of the exact distinct count (integer cross-multiplication, no
    * float boundary), and `ok_pXX` = the approximate percentile falls
    * inside the exact ±5-rank-point envelope (approx_p50 between exact
    * p45 and p55). The exact distinct count rides along so the hash
    * carries real data. The oracle recomputes the exact side and pins
    * every flag to 1: sketch drift turns the driver gate red instead
    * of passing silently — the same recall-gate pattern that de-risked
    * the IVF ANN path.
    *
    * TWO aggregation passes, deliberately: `count(DISTINCT)` plans
    * through Expand with a partial aggregate KEYED BY the distinct
    * values, so any heap-buffering aggregate sharing that `agg()`
    * (HLL++ registers, exact `percentile`'s value→count map, approx's
    * QuantileSummaries) is instantiated once per distinct VALUE
    * instead of once per partition — ~1.2M live buffers on sf0.1
    * lineitem, an OOM in a 1 GB heap and 37 s of GC churn in a large
    * one (measured; split form runs in ~4 s). So the exact distinct
    * counts (whose per-group partial state is a single long — safe
    * under Expand) aggregate alone, every buffered aggregate rides a
    * second, Expand-free pass, and the two single-row results
    * recombine with a trivial 1×1 cross join.
    */
  def sketchCheck(df: DataFrame, cols: Seq[String],
      ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
      accuracy: Int = 10000, rsd: Double = 0.02): DataFrame = {
    def lo(p: Double) = math.max(p - 0.05, 0.0)
    def hi(p: Double) = math.min(p + 0.05, 1.0)
    val allPs = (ps.map(lo) ++ ps.map(hi)).distinct
    val envArr = array(allPs.map(lit): _*)
    def at(c: String, p: Double) =
      element_at(col(s"${c}__env"), allPs.indexOf(p) + 1)
    val distinctAggs = cols.map { c => countDistinct(col(c)).as(s"${c}__nd") }
    val bufferedAggs = cols.flatMap { c =>
      Seq(approx_count_distinct(col(c), rsd).as(s"${c}__and"),
        percentile(col(c), envArr).as(s"${c}__env"),
        percentile_approx(col(c), array(ps.map(lit): _*), lit(accuracy))
          .as(s"${c}__aq"))
    }
    val one = df.agg(distinctAggs.head, distinctAggs.tail: _*)
      .crossJoin(df.agg(bufferedAggs.head, bufferedAggs.tail: _*))
    val stacked = cols.map { c =>
      val okDistinct =
        (abs(col(s"${c}__and") - col(s"${c}__nd")) * 100 <=
          col(s"${c}__nd") * 5).cast("int")
      val okPs = ps.zipWithIndex.map { case (p, i) =>
        val a = element_at(col(s"${c}__aq"), i + 1).cast("double")
        (a >= at(c, lo(p)) && a <= at(c, hi(p))).cast("int")
          .as("ok_" + pLabel(p))
      }
      struct(lit(c).as("column") +: col(s"${c}__nd").as("n_distinct") +:
        okDistinct.as("ok_distinct") +: okPs: _*)
    }
    pivotToRows(one, stacked)
  }

  /** Winsorization report: the exact clip bounds at (pLo, pHi) and
    * how many rows each bound would clip — the outlier-handling
    * decision a numeric-feature pipeline records before training.
    * Two passes: the percentile aggregate (one row) re-joins the scan
    * as a broadcast; the second pass emits ONLY counts and the data
    * values involved — no float accumulation — so the report is
    * engine-exact. At 100 TB both passes are full scans but the
    * intermediate is a single row; swap in approx_percentile when the
    * column's domain is unbounded.
    */
  def winsorizeReport(df: DataFrame, column: String,
      pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    val c = col(column)
    // ONE array-percentile buffer for both cut points: two scalar
    // percentile aggregates each build their own (value → count) map
    // over the full column — the dominant cost of this report, and
    // measured 2× slower at sf0.1 than the shared buffer
    val cuts = df
      .agg(percentile(c, array(lit(pLo), lit(pHi))).as("q"))
      .select(element_at(col("q"), 1).as("cut_lo"),
        element_at(col("q"), 2).as("cut_hi"))
    // the post-agg filter keeps the empty-input edge engine-exact
    // (n_rows = 0 → zero rows, like the oracle's GROUP BY) without
    // keying the corpus-sized aggregate on float columns — the
    // aggregate stays grouping-less (single buffer, no per-row key
    // hashing) and column-prunable for count-style consumers
    df.select(c).crossJoin(broadcast(cuts))
      .agg(
        first(col("cut_lo")).as("cut_lo"),
        first(col("cut_hi")).as("cut_hi"),
        count(lit(1)).as("n_rows"),
        sum(when(c < col("cut_lo"), 1L).otherwise(0L)).as("n_clip_lo"),
        sum(when(c > col("cut_hi"), 1L).otherwise(0L)).as("n_clip_hi"),
        min(c).cast("double").as("raw_min"),
        max(c).cast("double").as("raw_max"))
      .filter(col("n_rows") > 0)
      .withColumn("column", lit(column))
      .select(col("column"), col("cut_lo"), col("cut_hi"), col("n_rows"),
        col("n_clip_lo"), col("n_clip_hi"), col("raw_min"), col("raw_max"))
  }

  /** Fixed-width histogram with integer bucket edges: bucket i covers
    * [lo + i·width, lo + (i+1)·width). The bucket index is computed
    * by floor-division on (value − lo) — for integral inputs both
    * engines produce the identical bucket, so counts compare exactly.
    * One aggregation, partial map-side combine; the output is at most
    * (max−lo)/width rows — histogram size, not data size.
    */
  def histogram(df: DataFrame, column: String, lo: Double,
      width: Double): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    val b = floor((col(column) - lo) / width).cast("bigint")
    df.filter(col(column).isNotNull)
      .groupBy(b.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .select(col("bucket"), (lit(lo) + col("bucket") * width).as("lo"),
        (lit(lo) + (col("bucket") + 1) * width).as("hi"), col("n"))
      .orderBy(col("bucket"))
  }

  /** EXACT per-group quantiles (type-1: the value at rank
    * ⌈p·n⌉ ascending) — per-source length percentiles are the input
    * to mixture/truncation decisions, and the grouped form is what
    * `approx_percentile` can't give bit-exactly. The percentile is
    * carried as a RATIONAL (num, den): the selection rank is
    * `(num·n + den − 1) div den` — pure integer arithmetic, no float
    * p·n to diverge at a rounding boundary. One window pass per
    * group (row_number + count over the group), filter to the ≤ |ps|
    * selected ranks — output is groups × percentiles rows. Ties in
    * the value column cannot change the selected VALUE (any
    * row_number permutation of equal values yields the same value at
    * a rank), so no tiebreak column is needed for determinism.
    */
  def quantilesByGroup(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[(Int, Int)] = Seq((1, 2), (9, 10), (99, 100))): DataFrame = {
    // NOTE scale limit: exactness requires ONE sort per group (the
    // window below), so a group's rows must fit one task's spill
    // budget. With few giant groups at 100 TB — a corpus-sized
    // `source` — use [[quantilesByGroupSketch]] (constant-memory
    // mergeable per-group sketch) and gate it with
    // [[quantilesByGroupSketchCheck]].
    require(ps.nonEmpty && ps.forall { case (n, d) => n > 0 && n <= d },
      s"percentiles must be rationals in (0, 1]: $ps")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol).asc)
    val ranked = df.filter(col(valueCol).isNotNull)
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))))
    // one pass: each ranked row fans out over the (tiny) percentile
    // list and keeps the rows sitting at a selected rank — a row can
    // legitimately serve several percentiles in a small group
    val pcts = explode(array(ps.map { case (num, den) =>
      struct(lit(num).as("num"), lit(den).as("den"),
        lit(num * 100 / den).as("pct"))
    }: _*))
    ranked.select(col(groupCol).as("grp"), col("n"), col("rk"),
        col(valueCol).as("value"), pcts.as("q"))
      // integer ceil: (num·n + den − 1) div den
      .filter(col("rk") === expr("(q.num * n + q.den - 1) div q.den"))
      .select(col("grp"), col("q.pct").as("pct"), col("n"),
        col("rk").as("rank"), col("value"))
      .orderBy(col("grp"), col("pct"))
  }

  /** The SCALE sibling of [[quantilesByGroup]]: per-group approximate
    * percentiles via `percentile_approx` — a constant-memory GK
    * summary per group with map-side partial merge, so a single
    * corpus-sized group costs bounded executor memory instead of one
    * giant per-group sort. Sketch internals are engine-specific →
    * rows-only in the driver gate; the accuracy contract is pinned by
    * [[quantilesByGroupSketchCheck]] (the `sketchCheck` convention).
    */
  def quantilesByGroupSketch(df: DataFrame, groupCol: String,
      valueCol: String,
      ps: Seq[(Int, Int)] = Seq((1, 2), (9, 10), (99, 100)),
      accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (n, d) => n > 0 && n <= d },
      s"percentiles must be rationals in (0, 1]: $ps")
    val pArr = array(ps.map { case (n, d) => lit(n.toDouble / d) }: _*)
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(count(lit(1)).as("n"),
        percentile_approx(col(valueCol), pArr, lit(accuracy)).as("aq"))
      .select(col("grp"), col("n"),
        explode(array(ps.zipWithIndex.map { case ((num, den), i) =>
          struct(lit(num * 100 / den).as("pct"),
            element_at(col("aq"), i + 1).as("approx_value"))
        }: _*)).as("q"))
      .select(col("grp"), col("q.pct").as("pct"), col("n"),
        col("q.approx_value").as("approx_value"))
      .orderBy(col("grp"), col("pct"))
  }

  /** Hash-matched accuracy gate for [[quantilesByGroupSketch]]: per
    * (group, percentile), the exact ±5-rank-point envelope values
    * (type-1 at the integer-rational clamp ranks — DuckDB recomputes
    * them bit-exactly) and `ok` = the approximate percentile falls
    * inside [exact_lo, exact_hi]. The oracle pins every `ok` to 1, so
    * grouped-sketch drift turns the driver gate red instead of hiding
    * behind the sketch row's no_oracle — the same pattern as
    * [[sketchCheck]] and the IVF recall gate.
    */
  def quantilesByGroupSketchCheck(df: DataFrame, groupCol: String,
      valueCol: String,
      ps: Seq[(Int, Int)] = Seq((1, 2), (9, 10), (99, 100)),
      accuracy: Int = 10000): DataFrame = {
    require(ps.nonEmpty && ps.forall { case (n, d) => n > 0 && n <= d },
      s"percentiles must be rationals in (0, 1]: $ps")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol).asc)
    val ranked = df.filter(col(valueCol).isNotNull)
      .withColumn("rk", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))))
    val pcts = explode(array(ps.zipWithIndex.map { case ((num, den), i) =>
      struct(lit(num).as("num"), lit(den).as("den"),
        lit(num * 100 / den).as("pct"), lit(i + 1).as("ix"))
    }: _*))
    val fan = ranked.select(col(groupCol).as("grp"), col("n"), col("rk"),
      col(valueCol).as("value"), pcts.as("q"))
    // envelope ranks at p ± 1/20, integer-ceil, clamped into [1, n]
    val loRank = greatest(
      expr("((20 * q.num - q.den) * n + 20 * q.den - 1) div (20 * q.den)"),
      lit(1))
    val hiRank = least(
      expr("((20 * q.num + q.den) * n + 20 * q.den - 1) div (20 * q.den)"),
      col("n"))
    val lo = fan.filter(col("rk") === loRank)
      .select(col("grp"), col("q.pct").as("pct"), col("q.ix").as("ix"),
        col("n"), col("value").as("exact_lo"))
    val hi = fan.filter(col("rk") === hiRank)
      .select(col("grp"), col("q.pct").as("pct"),
        col("value").as("exact_hi"))
    val pArr = array(ps.map { case (n, d) => lit(n.toDouble / d) }: _*)
    val approx = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol).as("grp"))
      .agg(percentile_approx(col(valueCol), pArr, lit(accuracy)).as("aq"))
    lo.join(hi, Seq("grp", "pct"))
      .join(approx, Seq("grp"))
      .withColumn("approx", element_at(col("aq"), col("ix")))
      .select(col("grp"), col("pct"), col("n"), col("exact_lo"),
        col("exact_hi"),
        (col("approx") >= col("exact_lo") &&
          col("approx") <= col("exact_hi")).cast("int").as("ok"))
      .orderBy(col("grp"), col("pct"))
  }

  /** Pairwise Pearson correlations over INTEGER-EXACT derived
    * columns, on the moment lattice: one aggregation pass computes
    * every Σx, Σx², Σxy as exact BIGINTs (order-independent sums —
    * `corr()` itself accumulates doubles whose partial order varies
    * per run), and the correlation derives as
    * `num / sqrt(den_x) / sqrt(den_y)` with
    * num = n·Σxy − Σx·Σy, den_c = n·Σc² − (Σc)² — exact integers
    * cast once, a fixed IEEE expression both engines evaluate to the
    * same bits, so even the float column carries the full hash
    * oracle. The one-row aggregate pivots to a row per pair via the
    * free single-row explode ([[pivotToRows]]' pattern); the corpus
    * is scanned exactly once for all pairs. A constant column yields
    * den = 0 and corr NULL (0/0 → NaN is nulled explicitly — the
    * dialect-stable encoding of "undefined").
    */
  def corrReport(df: DataFrame,
      cols: Seq[(String, org.apache.spark.sql.Column)]): DataFrame = {
    require(cols.size >= 2, "corrReport needs at least two columns")
    val named = df.select(cols.map { case (n, c) => c.cast("long").as(n) }: _*)
    val pairs = cols.map(_._1).combinations(2).map(p => (p(0), p(1))).toSeq
    val aggs =
      Seq(count(lit(1)).as("n")) ++
      cols.map { case (n, _) => sum(col(n)).as(s"s_$n") } ++
      cols.map { case (n, _) => sum(col(n) * col(n)).as(s"s2_$n") } ++
      pairs.map { case (a, b) => sum(col(a) * col(b)).as(s"sp_${a}_$b") }
    val one = named.agg(aggs.head, aggs.tail: _*)
    val stacked = pairs.map { case (a, b) =>
      struct(lit(s"$a~$b").as("pair"), col("n").as("n"),
        (col("n") * col(s"sp_${a}_$b") - col(s"s_$a") * col(s"s_$b"))
          .as("num"),
        (col("n") * col(s"s2_$a") - col(s"s_$a") * col(s"s_$a"))
          .as("den_x"),
        (col("n") * col(s"s2_$b") - col(s"s_$b") * col(s"s_$b"))
          .as("den_y"))
    }
    one.select(explode(array(stacked: _*)).as("p"))
      .select(col("p.*"))
      .withColumn("corr", when(col("den_x") > 0 && col("den_y") > 0,
        round(col("num").cast("double")
          / sqrt(col("den_x").cast("double"))
          / sqrt(col("den_y").cast("double")), 4)))
      .orderBy(col("pair"))
  }
}
