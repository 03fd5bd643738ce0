package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Int8 embedding quantization and quantized similarity search.
  *
  * The storage/bandwidth half of the ANN story: `ops/Similarity`
  * bounds how many pairs are SCORED; quantization bounds how many
  * BYTES each scored pair moves. A 64-dim float32 embedding packs to
  * 64 bytes (4× smaller; 8× vs the double arrays a naive pipeline
  * casts to), and since the candidate shuffles and query/seed
  * broadcasts of the pairwise stages are the dominant I/O term at
  * 100 TB, packing is the difference between shuffling 25 TB and
  * 6 TB for the same candidate set.
  *
  * Scheme: symmetric per-vector scale `max|x|/127` (zero loss of the
  * sign bit, no zero-point), codes `floor(x/scale + 0.5)` — exactly
  * the arithmetic every engine reproduces, which is what lets the
  * driver gate hold the QUANTIZED search output to a full bit-exact
  * oracle, where the float ANN paths needed declared-approximate
  * rows-only checks. Quantized cosine needs no dequantization at all:
  * the scales cancel in `dot/√(a·a)/√(b·b)`, leaving integer dots and
  * integer self-norms — see [[graft.functions.Int8Pack]].
  *
  * Two code forms, pinned to each other inside the oracled profile:
  * `array<long>` (the auditable arithmetic form the oracle recomputes
  * element-wise) and packed binary via the native codegen expressions
  * (the form the search path shuffles). [[quantizeProfile]] emits
  * `self_dot_q` from the array fold and `self_dot_packed` from
  * `int8_dot(pack, pack)` side by side — the driver hash-compare
  * fails if the packed path ever drifts from the formula.
  */
object Quantize {

  /** Symmetric int8 scale: `max|x|/127` as an exact double of the
    * widened float maximum — both engines widen the same float, then
    * perform the identical IEEE division.
    */
  def scaleOf(v: Column): Column =
    array_max(transform(v, x => abs(x))).cast("double") / lit(127.0)

  /** Codes in the auditable `array<long>` form:
    * `floor(x/scale + 0.5)`, all zeros for a zero vector (scale 0),
    * NULL for a NULL scale (an EMPTY embedding array: array_max of
    * nothing) — matching [[graft.functions.Int8Pack]]'s null
    * contract, so the pack==codes identity the quantization audit
    * pins holds on degenerate rows too.
    */
  def codesOf(v: Column, scale: Column): Column =
    when(scale.isNull, lit(null).cast("array<bigint>"))
      .when(scale > 0, transform(v, x => floor(x.cast("double") / scale + lit(0.5))))
      .otherwise(transform(v, _ => lit(0L)))

  /** Codes packed one byte per dimension (the shuffle form). */
  def packedOf(v: Column, scale: Column): Column =
    call_function("int8_pack", v, scale)

  /** Exact integer dot of two packed vectors. */
  def i8dot(a: Column, b: Column): Column = call_function("int8_dot", a, b)

  /** Per-vector quantization audit: scale, dimension count, code
    * sum/min/max, and the integer self-dot computed BOTH ways — the
    * array-fold form the oracle replicates and the packed-binary
    * native-expression form the search path uses. Equal columns in a
    * hash-matched result prove the codegen pack/dot agree with the
    * formula on every corpus vector, not just on spec fixtures.
    *
    * One narrow pass over the corpus, no joins, no shuffle beyond the
    * scan-spread; every column is a codegen'd expression.
    */
  /** Quantized dimension co-moment matrix — the whitening / OPQ-prep
    * statistic (rotate-then-quantize needs exactly these second
    * moments): for every dimension pair i ≤ j, Σ over vectors of
    * code_i·code_j as an exact BIGINT, the per-dimension sums, and
    * the population covariance derived from the exact moments
    * (`(n·Σxy − Σx·Σy) / n²` — one IEEE division of exact integers,
    * fixed order, so the float column carries the full hash oracle;
    * int8 codes make the products exact where raw float embeddings
    * would sum order-dependently).
    *
    * Shape: ONE corpus scan folding each vector into a flat long[]
    * moment buffer ([[graft.functions.DimMoments]]) — one ≈18 KB
    * partial buffer per partition, merged once, exploded into the
    * geometry-sized cell table at the very end. No per-product row
    * ever exists: the explode formulation this replaced materialized
    * n·(d(d+1)/2 + d) struct rows through the hash aggregate and was
    * the most expensive query in the bench by 2×. The covariance
    * division stays OUTSIDE the aggregate, in the same fixed-order
    * integer column expression, so the bit-exact oracle is unchanged.
    */
  def dimCovariance(embeddings: DataFrame): DataFrame = {
    val base = Spread(embeddings)
      .select(col("vec_id"), col("embedding").as("v"))
    val codes = base
      .select(codesOf(col("v"), scaleOf(col("v"))).as("q"))
      .filter(col("q").isNotNull)
    // NOT round(x, 4): Spark's Round goes through BigDecimal.valueOf
    // (the double's SHORTEST decimal string, then HALF_UP) while
    // DuckDB rounds the scaled binary double — at a boundary value
    // the two disagree in the last digit (hit for real at sf0.1:
    // 79.16675 → .1668 vs .1667). floor(x·10⁴ + 0.5)/10⁴ is the same
    // IEEE op sequence in both engines, so the 4-digit cut is
    // bit-stable by construction.
    val covRaw = (col("c.n") * col("c.s_xy") - col("c.s_x") * col("c.s_y"))
      .cast("double") / (col("c.n") * col("c.n")).cast("double")
    codes.agg(graft.functions.DimMoments.dimMoments(col("q")).as("cells"))
      .select(explode(col("cells")).as("c"))
      .select(col("c.i").as("i"), col("c.j").as("j"), col("c.n").as("n"),
        col("c.s_x").as("s_x"), col("c.s_y").as("s_y"),
        col("c.s_xy").as("s_xy"),
        (floor(covRaw * lit(10000.0) + lit(0.5)) / lit(10000.0)).as("cov"))
      .orderBy(col("i"), col("j"))
  }

  def quantizeProfile(embeddings: DataFrame): DataFrame = {
    val base = Spread(embeddings)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("scale", scaleOf(col("v")))
      .withColumn("code", codesOf(col("v"), col("scale")))
      .withColumn("pack", packedOf(col("v"), col("scale")))
    base.select(col("vec_id"), col("scale"),
      size(col("v")).as("n_dims"),
      aggregate(col("code"), lit(0L), (a, x) => a + x).as("sum_code"),
      array_min(col("code")).as("min_code"),
      array_max(col("code")).as("max_code"),
      aggregate(col("code"), lit(0L), (a, x) => a + x * x).as("self_dot_q"),
      i8dot(col("pack"), col("pack")).as("self_dot_packed"))
      .orderBy(col("vec_id"))
  }

  /** Embedding NORM outliers on the exact integer lattice — the
    * broken-vector audit a pipeline runs before trusting a
    * similarity index: a vector whose quantized self-dot sits in the
    * extreme tails is a truncated/corrupted/zero embedding or a
    * scale blow-up, and it poisons every cosine it touches. `selfq`
    * is the exact BIGINT `int8_dot(pack, pack)`; the trim thresholds
    * are EXACT type-1 quantiles at integer-rational ranks
    * ([[Profile.quantilesByGroup]] with a constant group — at 100 TB
    * swap in the GK sketch sibling, the documented giant-group scale
    * path), re-attached via the sanctioned 1-row broadcast. Every
    * column is an integer, so the full flag table hash-matches the
    * DuckDB replay. Annotate-don't-filter: all vectors emit, flagged
    * or not.
    */
  /** The (vec_id, selfq) relation under the outlier audits: exact
    * integer self-dot of each packable vector — one narrow codegen
    * pass, the shared substrate of [[embeddingOutliers]] and
    * [[embeddingOutliersSketch]].
    */
  private def selfqOf(embeddings: DataFrame): DataFrame =
    Spread(embeddings)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("pack", packedOf(col("v"), scaleOf(col("v"))))
      .filter(col("pack").isNotNull)
      .select(col("vec_id"), i8dot(col("pack"), col("pack")).as("selfq"))

  /** Attach trim thresholds (a 1-row relation with `lo_val`/`hi_val`)
    * to the selfq relation and flag the tails — the shared emit of
    * both outlier audits, so exact and sketch forms differ ONLY in
    * how the thresholds are computed.
    */
  private def flagAgainst(sq: DataFrame, thr: DataFrame): DataFrame =
    sq.crossJoin(broadcast(thr))
      .select(col("vec_id"), col("selfq"), col("lo_val"), col("hi_val"),
        (col("selfq") < col("lo_val") || col("selfq") > col("hi_val"))
          .cast("int").as("is_outlier"))
      .orderBy(col("vec_id"))

  def embeddingOutliers(embeddings: DataFrame,
      lo: (Int, Int) = (1, 50), hi: (Int, Int) = (49, 50)): DataFrame = {
    val sq = selfqOf(embeddings)
    val thr = Profile.quantilesByGroup(
        sq.withColumn("g", lit("all")), "g", "selfq", Seq(lo, hi))
      .agg(
        min(when(col("pct") === lit(lo._1 * 100 / lo._2), col("value")))
          .as("lo_val"),
        min(when(col("pct") === lit(hi._1 * 100 / hi._2), col("value")))
          .as("hi_val"))
    flagAgainst(sq, thr)
  }

  /** The SCALE sibling of [[embeddingOutliers]] — same flag table,
    * thresholds from the mergeable GK quantile sketch instead of the
    * exact type-1 rank selection: the exact form's thresholds need ONE
    * window task to sort every vector's selfq (the giant-single-group
    * shape [[Profile.quantilesByGroup]] documents as its scale limit
    * — billions of rows in one task at 100 TB), while
    * `percentile_approx` folds each partition into a constant-memory
    * summary merged once, so the threshold pass is an ordinary
    * map-side-combined aggregate and the whole plan has NO
    * corpus-sized single-task stage. Sketch internals are
    * engine-specific → rows-only at the driver gate; the accuracy
    * contract is hash-pinned by [[embeddingOutliersSketchCheck]]
    * (the `_check` convention shared with the grouped-quantile and
    * profile sketches).
    */
  def embeddingOutliersSketch(embeddings: DataFrame,
      lo: (Int, Int) = (1, 50), hi: (Int, Int) = (49, 50),
      accuracy: Int = 10000): DataFrame = {
    val sq = selfqOf(embeddings)
    val thr = sq
      .agg(percentile_approx(col("selfq"),
        array(lit(lo._1.toDouble / lo._2), lit(hi._1.toDouble / hi._2)),
        lit(accuracy)).as("q"))
      .select(element_at(col("q"), 1).as("lo_val"),
        element_at(col("q"), 2).as("hi_val"))
    flagAgainst(sq, thr)
  }

  /** Hash-matched accuracy gate for [[embeddingOutliersSketch]]: per
    * trim percentile, the exact type-1 values at the ±5-rank-point
    * envelope (integer-rational clamp ranks — the oracle replays them
    * bit-exactly from the code formula) and `ok` = the sketch
    * threshold falls inside [exact_lo, exact_hi]. The oracle pins
    * every `ok` to 1, so sketch-threshold drift turns the driver gate
    * red instead of hiding behind the sketch row's rows-only check —
    * delegates to [[Profile.quantilesByGroupSketchCheck]] with the
    * constant corpus group, so the envelope algebra lives in one
    * place. (The exact side sorts the corpus in one window task —
    * fine for the AUDIT, which runs at gate scale; at 100 TB only the
    * sketch operator runs.)
    */
  def embeddingOutliersSketchCheck(embeddings: DataFrame,
      lo: (Int, Int) = (1, 50), hi: (Int, Int) = (49, 50),
      accuracy: Int = 10000): DataFrame =
    Profile.quantilesByGroupSketchCheck(
      selfqOf(embeddings).withColumn("g", lit("all")), "g", "selfq",
      Seq(lo, hi), accuracy)

  /** Per-DIMENSION diagnostics over the int8 codes — the embedding-
    * space health check a training pipeline runs before trusting a
    * similarity index: a dimension whose codes are all zero (or
    * whose min==max) is collapsed and contributes nothing to any
    * dot product; a dimension pinned at ±127 is saturating its
    * scale. Computed over the quantized CODES, not the raw floats,
    * deliberately: integer sums are order-independent, so unlike a
    * float mean this profile is bit-exact under any partitioning and
    * carries a full DuckDB oracle (a float-sum version would
    * hash-mismatch on reduction order alone).
    *
    * Scale shape: explode n·d code values, aggregate to d rows —
    * partial aggregation collapses every partition to ≤ d counters
    * before the (tiny) shuffle, the same shape as the sketch
    * profiles. Rows with NULL codes (empty embeddings) are excluded
    * and surface via `n` < corpus count rather than poisoning every
    * dimension with NULL.
    */
  def dimensionProfile(embeddings: DataFrame): DataFrame = {
    val codes = Spread(embeddings)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("scale", scaleOf(col("v")))
      .select(codesOf(col("v"), col("scale")).as("code"))
      .filter(col("code").isNotNull)
    codes.select(posexplode(col("code")).as(Seq("dim", "v")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).as("sum_code"),
        min(col("v")).as("min_code"),
        max(col("v")).as("max_code"),
        sum(when(col("v") === 0L, 1L).otherwise(0L)).as("n_zero"))
      .withColumn("mean_code", col("sum_code").cast("double") / col("n"))
      .orderBy(col("dim"))
  }

  /** Exact top-k by QUANTIZED cosine for each query vector: the
    * [[Similarity.knnBrute]] shape — broadcast the packed queries,
    * score every corpus vector, window top-k — but every moved byte
    * is int8 and every scored pair is one integer `int8_dot`. At
    * 100 TB the corpus side stays partitioned and scans 64 B/vector
    * instead of 256 B; the broadcast is Q packed rows.
    *
    * "Exact" here means exactly the quantized ranking — the
    * approximation lives entirely in the (deterministic) rounding of
    * the codes, so unlike the float ANN paths this output carries a
    * FULL value oracle: DuckDB recomputes codes, integer dots, and
    * the ranking bit-for-bit. Ties in quantized cosine (far likelier
    * than in float cosine — small integer lattice) break on
    * neighbor_id, and `dot_q` is emitted alongside so the ranking
    * key is visible in the output.
    */
  def knnQuantized(embeddings: DataFrame, k: Int = 5, nQueries: Long = 5): DataFrame = {
    val e = Spread(embeddings)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("pack", packedOf(col("v"), scaleOf(col("v"))))
      .select(col("vec_id"), col("pack"))
      .withColumn("selfq", i8dot(col("pack"), col("pack")))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("pack").as("qpack"),
        col("selfq").as("qself"))
    val scored = e.select(col("vec_id").as("neighbor_id"), col("pack"), col("selfq"))
      .join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("dot_q", i8dot(col("qpack"), col("pack")))
      .select(col("query_id"), col("neighbor_id"), col("dot_q"),
        // query-norm first, then neighbor-norm: division order is part
        // of the bit-exact contract with the oracle (d/a/b ≠ d/b/a)
        (col("dot_q").cast("double") / sqrt(col("qself").cast("double"))
          / sqrt(col("selfq").cast("double"))).as("qcos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("dot_q"), round(col("qcos"), 4).as("qcosine"))
      .orderBy(col("query_id"), col("rank"))
  }
}
