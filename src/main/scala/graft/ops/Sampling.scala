package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable splitting and sampling for training
  * corpora. A training pipeline must assign every document to
  * train/val/test (or keep an N% sample) such that the assignment is
  * (a) stable under task retries and re-runs, (b) independent of
  * partitioning and row order, and (c) reproducible by OTHER engines
  * auditing the corpus. `rand()` fails all three; a hash of the stable
  * id fails only (c) when the hash is engine-specific (Spark's
  * xxhash64 exists nowhere else). These ops bucket rows by the first
  * 16 bits of md5(id) — md5 is bit-identical in every engine, so the
  * DuckDB oracle recomputes assignments exactly.
  */
object Sampling {

  /** Bucket 0..9999 from the leading 16 bits of md5 of the id's
    * decimal string — uniform enough for split ratios, and exactly
    * reproducible anywhere md5 exists.
    */
  private[ops] def bucket(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10)
      .cast("int") % 10000

  /** The md5 bucket as a public column — lets composed pipelines
    * ANNOTATE survival (`bucketOf(id) < cutFor(stratum, …)`) instead
    * of filtering, so one aggregation can report every stage's counts.
    */
  def bucketOf(id: Column): Column = bucket(id)

  /** The per-stratum bucket cut (rate × 10000) as a literal CASE
    * column — the decision table [[weightedSample]] filters by.
    */
  def cutFor(stratum: Column, rates: Seq[(String, Double)],
      defaultRate: Double): Column =
    rates.foldRight(lit(math.round(defaultRate * 10000).toInt)) {
      case ((name, r), els) =>
        when(stratum === name, math.round(r * 10000).toInt).otherwise(els)
    }

  /** Assign each row a split label by cumulative weight over the
    * md5 bucket: weights like Seq("train" -> 0.8, "val" -> 0.1,
    * "test" -> 0.1) — must sum to 1. Adds (bucket, split).
    */
  def assignSplits(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val b = bucket(col(idCol))
    val label = weights.map(_._1).zip(cuts)
      .foldRight(lit(weights.last._1)) { case ((name, cut), els) =>
        when(b < math.round(cut * 10000).toInt, name).otherwise(els)
      }
    df.withColumn("bucket", b).withColumn("split", label)
  }

  /** Keep a deterministic `fraction` of rows by the same md5 bucket —
    * the reproducible alternative to `df.sample()` for corpus
    * down-sampling (same rows survive on every engine and every
    * re-run).
    */
  def deterministicSample(df: DataFrame, idCol: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction in [0, 1]")
    df.filter(bucket(col(idCol)) < math.round(fraction * 10000).toInt)
  }

  /** Weighted mixture sampling: keep a per-stratum fraction of rows
    * (domain/source reweighting — "keep all of the curated source,
    * a quarter of the crawl"). The keep decision is the same md5
    * bucket compare as [[deterministicSample]], with the cut chosen
    * per stratum from a literal rate table: no join, no shuffle — one
    * codegen'd filter over the scan, and any engine with md5 can
    * recompute exactly which rows survived. Strata absent from
    * `rates` keep `defaultRate`. Like [[assignSplits]], the output
    * carries the md5 `bucket` column (replacing any existing column
    * of that name) so the keep decision is auditable.
    */
  def weightedSample(df: DataFrame, stratumCol: String,
      idCol: String, rates: Seq[(String, Double)],
      defaultRate: Double = 1.0): DataFrame = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0 && r <= 1),
      "rates in [0, 1]")
    df.withColumn("bucket", bucket(col(idCol)))
      .filter(col("bucket") < cutFor(col(stratumCol), rates, defaultRate))
  }

  /** Rebalance a skewed stratum (language, source, domain) to the
    * MINORITY stratum's size: every stratum keeps
    * `floor(min_count · 10000 / its_count)` of its md5 buckets, so
    * kept counts land within bucket-granularity of the smallest
    * stratum and the post-sample mixture is (approximately) uniform —
    * the "don't let English drown the long tail" step of a
    * multilingual corpus build. The keep decision is the same
    * engine-portable bucket compare as [[deterministicSample]], with
    * the rates DERIVED from the corpus instead of supplied: rates stay
    * exact integers (`(mn · 10000) div n_docs`), so the decision table
    * is reproducible anywhere md5 and integer division exist.
    *
    * Annotates, never filters (`bucket`, `cut`, `keep`) — composed
    * pipelines report every stage's counts from one aggregation, and
    * the filter is `col("keep")` when the caller wants it.
    *
    * Shape at 100 TB: the cuts table is one compact aggregation
    * (stratum cardinality rows) windowed over itself, then a
    * broadcast join back — the corpus moves zero times; the only
    * corpus-sized work is the scan and the codegen'd md5 per row.
    */
  def rebalanceToMin(df: DataFrame, stratumCol: String,
      idCol: String): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_docs"))
    val cuts = counts.withColumn("cut",
      expr("cast((min(n_docs) over () * 10000) div n_docs as int)"))
    // null-safe join: a NULL stratum (undetected language) is a real
    // stratum with its own count row — a using-column join would
    // silently drop those rows, violating the annotate-never-filter
    // contract above
    val cutsK = cuts.withColumnRenamed(stratumCol, "__stratum")
    df.withColumn("bucket", bucket(col(idCol)))
      .join(broadcast(cutsK), col(stratumCol) <=> col("__stratum"))
      .drop("__stratum")
      .withColumn("keep", col("bucket") < col("cut"))
  }

  /** The audit summary of [[rebalanceToMin]]: per-stratum input size,
    * bucket cut, and kept count — the table a data card reports next
    * to the mixture. Runs over the compact (stratum, id) projection,
    * so the corpus-sized relation contributes two column-pruned scans
    * and nothing wider ever shuffles.
    */
  def rebalanceSummary(df: DataFrame, stratumCol: String,
      idCol: String): DataFrame =
    rebalanceToMin(df.select(col(stratumCol), col(idCol)), stratumCol, idCol)
      .groupBy(col(stratumCol), col("n_docs"), col("cut"))
      .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"))
      .select(col(stratumCol).as("stratum"), col("n_docs"), col("cut"),
        col("n_kept"))
      .orderBy(col("stratum"))

  /** Salted two-phase per-group top-n — the skew-proof form every
    * group-quota operator here shares. Skew is the whole problem at
    * 100 TB: one domain (or language) can be a double-digit share of
    * a web corpus, and a single `Window.partitionBy(group)` sorts
    * that entire group in one task. So the rank runs in two exact
    * phases: a salted local top-n per `(group, hash(id) mod salts)`
    * sub-partition first, then the global window over the ≤ `salts·n`
    * survivors per group. The prune is provably lossless FOR ANY
    * TOTAL ORDER: a row beaten by ≥ n rows inside its own salt bucket
    * is beaten by ≥ n rows of its group globally, so no global-top-n
    * row is ever dropped — and the salt choice (engine-local `hash`,
    * never user-visible) therefore cannot affect the output, only the
    * partition sizes. Survivor ranks equal true group ranks for every
    * kept row. NULL groups and NULL ids form their own buckets
    * (null-safe window keys).
    */
  private def saltedTopN(df: DataFrame, groupCol: String, idCol: String,
      order: Seq[Column], n: Int, salts: Int, rankName: String): DataFrame = {
    val local = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol), pmod(hash(col(idCol)), lit(salts)))
      .orderBy(order: _*)
    val global = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(order: _*)
    df.withColumn("__lrk", row_number().over(local))
      .filter(col("__lrk") <= n)
      .drop("__lrk")
      .withColumn(rankName, row_number().over(global))
      .filter(col(rankName) <= n)
  }

  /** Deterministic stratified sample: the `n` rows per stratum whose
    * md5(id) sorts lowest (id as final tie-break) — i.e. "give me N
    * uniformly-pseudo-random rows from every language / source /
    * shard", stable across partitioning, re-runs, and engines. Runs
    * as the [[saltedTopN]] two-phase rank, so a mega-stratum never
    * pins its whole sort on one task; the md5 order makes the kept
    * set (and `rnk`) recomputable by any engine with md5.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
      n: Int): DataFrame =
    saltedTopN(df, stratumCol, idCol,
      Seq(md5(col(idCol).cast("string")).asc, col(idCol).asc),
      n, salts = 32, rankName = "rnk")

  /** Per-group quota by score: keep the `n` best rows of every group
    * (domain caps à la RefinedWeb/FineWeb — no single source may
    * dominate the mixture), ranked by `scoreCol` descending with
    * `idCol` as the deterministic tie-break. Emits the kept rows with
    * their 1-based `rank_in_group`. NULL scores sort last on both
    * engines (`desc_nulls_last`); skew safety and salt invisibility
    * per [[saltedTopN]].
    */
  def capPerGroup(df: DataFrame, groupCol: String, idCol: String,
      scoreCol: String, n: Int, salts: Int = 32): DataFrame =
    saltedTopN(df, groupCol, idCol,
      Seq(col(scoreCol).desc_nulls_last, col(idCol).asc),
      n, salts, rankName = "rank_in_group")

  /** Mixture PLANNER (DoReMi-lite): per stratum, actual token share
    * vs a uniform target, and the deterministic downsampling rate
    * that would land the target — the decision table a mixture
    * rebalance reads before touching any data. All-integer ppm:
    * `keep_rate_ppm = min(1e6, 1e6·target_ppm div actual_ppm)` —
    * over-represented strata get a sub-1e6 keep rate, at-or-under-
    * target strata keep everything (this planner only ever
    * DOWN-samples; up-weighting duplicated epochs is a training-
    * loader concern, not a corpus one). One groupBy of a projected
    * (stratum, token-count) relation plus a 1-row scalar attach —
    * the plan table is strata-sized, broadcastable anywhere.
    */
  def mixturePlan(docs: DataFrame, stratumCol: String = "source"): DataFrame = {
    val per = docs
      .select(col(stratumCol).as("stratum"),
        size(split(col("text"), " ")).cast("long").as("n"))
      .groupBy(col("stratum")).agg(sum(col("n")).as("toks"))
    val tot = per.agg(sum(col("toks")).as("all_toks"),
      count(lit(1)).as("k"))
    per.crossJoin(tot)
      .select(col("stratum"), col("toks"),
        expr("(1000000 * toks) div all_toks").as("actual_ppm"),
        expr("1000000 div k").as("target_ppm"))
      .withColumn("keep_rate_ppm",
        when(col("actual_ppm") <= col("target_ppm"), lit(1000000L))
          .otherwise(expr("(1000000 * target_ppm) div actual_ppm")))
      .orderBy(col("stratum"))
  }

  /** Apply [[mixturePlan]] as a per-doc ANNOTATION: keep = 1 iff the
    * doc's md5 bucket (0..9999, scaled ×100 to ppm) falls under its
    * stratum's keep rate — the same deterministic-survival idiom as
    * [[weightedSample]], so the plan is replayable by any engine with
    * md5 and the downsample composes with every other annotate-don't-
    * filter stage.
    */
  def mixtureApply(docs: DataFrame, idCol: String = "doc_id",
      stratumCol: String = "source"): DataFrame = {
    val plan = mixturePlan(docs, stratumCol)
      .select(col("stratum").as(stratumCol), col("keep_rate_ppm"))
    docs.select(col(idCol), col(stratumCol))
      .join(plan, stratumCol)
      .select(col(idCol), col(stratumCol), col("keep_rate_ppm"),
        (bucket(col(idCol)).cast("long") * 100L < col("keep_rate_ppm"))
          .cast("int").as("keep"))
      .orderBy(col(idCol))
  }
}
