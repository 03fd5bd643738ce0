package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) over the `embeddings` table — the
  * memory-bound half of the production ANN stack (IVF bounds how many
  * pairs are scored, PQ bounds how many BYTES the resident index
  * holds per vector).
  *
  * The 64-dim vector splits into `m` = 16 subspaces of 4 dims; each
  * subspace trains its own k = 32 centroid codebook (KMeans on the
  * deterministic hash-mod sample, fixed seed, memoized per corpus
  * like `Similarity.quantizerFor`), and a vector encodes as 16
  * 5-bit-range codes — 16 small ints (10 B packed) instead of 256 B
  * of floats, a 16-25× resident-index reduction. The default
  * geometry is the measured covering point for these corpora
  * (`Prof <dir> pq` sweeps m/k/trainMod: the worst true-neighbor PQ
  * rank is 38/48/180 at sf0.001/0.01/0.1, against a 400-candidate
  * depth — coarser 8×16 codebooks leave true neighbors beyond rank
  * 900 on the near-random synthetic embeddings, whose top cosines
  * sit at ~0.3 where quantization error dominates). trainMod=1
  * trains on the full fixture corpus; at 100 TB the modulus is
  * raised exactly like the IVF quantizer's. Query scoring is ADC
  * (asymmetric
  * distance computation): each query precomputes an m×k lookup table
  * of subspace partial dots ONCE, and every (query, candidate) pair
  * costs m table lookups instead of d multiplications.
  *
  * At 100 TB: the codes relation is the scan target (codes + id +
  * PQ norm ≈ 50 B/row); full vectors are touched only for the Q×C
  * rerank fetch, a broadcast-candidate equi-join. The codebook
  * (m·k·subDim = 1024 doubles) embeds as a plan literal — smaller
  * than the centroid table the IVF path already broadcasts.
  *
  * Exactness contract (the `x_knn_ivf_recall` pattern, strengthened):
  * [[knnPqRerank]] takes the PQ top-`candidates` per query and
  * re-scores them with EXACT cosine — at a candidate depth that
  * covers every true neighbor (verified on these corpora by the spec
  * sweep), the output equals [[Similarity.knnBrute]] bit-for-bit and
  * shares its full DuckDB oracle. Production depth is a knob: the
  * two-stage shape (PQ prefilter, exact rerank) is the standard
  * retrieval layout, not a test-only construction.
  */
object Pq {

  /** Codebook: cb(s)(c) = the subDim-dim centroid `c` of subspace
    * `s`, plus the subspace slicing geometry.
    */
  final case class Codebook(m: Int, k: Int, subDim: Int,
      cb: Array[Array[Array[Double]]])

  /** Memoized per (canonical corpus plan, file set, m, k, trainMod) —
    * the `Similarity.quantizerFor` pattern: repeated queries over one
    * corpus train the m subspace codebooks once.
    */
  private val codebooks = new BoundedMemo[(Int, Int, Int, Int, Int), Codebook](
    capacity = 32)

  private[ops] def codebookCacheSize: Int = codebooks.size

  def clearCodebookCache(): Unit = codebooks.clear()

  /** Train (or reuse) the m per-subspace KMeans codebooks on the
    * deterministic hash-mod sample. Fits run on the canonical
    * (vec_id, embedding) projection; each fit's k·subDim centroids
    * are driver-side model state (exactly like `clusterCenters` in
    * the IVF path), never a corpus collect.
    */
  private def codebookFor(e: DataFrame, m: Int, k: Int,
      trainMod: Int): Codebook = {
    val dim = 64
    val subDim = dim / m
    val sample = e.select(col("vec_id"), col("v"))
      .filter(pmod(xxhash64(col("vec_id")), lit(trainMod)) === 0)
    val key = (sample.queryExecution.optimizedPlan.semanticHash(),
      java.util.Arrays.hashCode(e.inputFiles.asInstanceOf[Array[AnyRef]]),
      m, k, trainMod)
    codebooks.getOrElseUpdate(key) {
      // the m fits are independent Spark jobs over tiny per-subspace
      // projections — submit them concurrently (Spark's scheduler
      // interleaves jobs safely) instead of paying m serial
      // fit latencies; each fit is deterministic (fixed seed per
      // subspace), so concurrency cannot change the codebook
      import scala.concurrent.{Await, ExecutionContext, Future}
      import scala.concurrent.duration.Duration
      implicit val ec: ExecutionContext = ExecutionContext.global
      val fits = (0 until m).map { s => Future {
        val sub = sample.select(array_to_vector(
          transform(slice(col("v"), s * subDim + 1, subDim),
            x => x.cast("double"))).as("fv"))
        new KMeans().setK(k).setSeed(42L + s)
          .setFeaturesCol("fv").setPredictionCol("code")
          .fit(sub)
          .clusterCenters.map(_.toArray)
      }}
      Codebook(m, k, subDim,
        fits.map(Await.result(_, Duration.Inf)).toArray)
    }
  }

  /** The codebook as a nested plan literal: [m][k][subDim] doubles.
    * `typedLit` embeds the whole structure as ONE literal object — an
    * `array(lit, …)` of thousands of elements generates one codegen
    * assignment per element and overflows janino's parser (measured:
    * a 2,048-literal CreateArray fails to compile and silently falls
    * back to interpreted evaluation).
    */
  private def cbCol(b: Codebook): Column =
    typedLit(b.cb.map(_.map(_.toIndexedSeq).toIndexedSeq).toIndexedSeq)

  /** Per-(subspace, code) centroid self-dot as a flat [m·k] literal —
    * lets the PQ norm cost m lookups per vector instead of m·subDim
    * multiplications.
    */
  private def sqTabCol(b: Codebook): Column =
    typedLit((for (s <- 0 until b.m; c <- 0 until b.k)
      yield b.cb(s)(c).map(x => x * x).sum).toIndexedSeq)

  /** The codebook as a FLAT plan literal in (s, c, j) order —
    * `pq_encode`'s layout: centroid (s, c) occupies
    * `[(s·k + c)·subDim, +subDim)`.
    */
  private def cbFlatCol(b: Codebook): Column =
    typedLit((for (s <- 0 until b.m; c <- 0 until b.k; j <- 0 until b.subDim)
      yield b.cb(s)(c)(j)).toIndexedSeq)

  /** Encode a vector column: codes(s) = argmin_c ||v[s·subDim ..] −
    * cb(s)(c)||², via the native codegen expression `pq_encode` —
    * the per-vector hot loop of the one-time corpus index build.
    * Distance ties break to the lower code (strict `<` keeps the
    * first minimum), identical to the HOF form [[codesOfHof]] that
    * the bit-equality spec keeps pinned.
    */
  private def codesOf(v: Column, b: Codebook): Column =
    call_function("pq_encode", v, cbFlatCol(b), lit(b.m))

  /** The interpreted-HOF reference implementation of [[codesOf]] —
    * kept solely as the spec's bit-equality oracle for `pq_encode`.
    */
  private[ops] def codesOfHof(v: Column, b: Codebook): Column = {
    val cbc = cbCol(b)
    transform(sequence(lit(0), lit(b.m - 1)), s => {
      val sub = slice(v, s * b.subDim + 1, lit(b.subDim))
      val cents = element_at(cbc, s + 1)
      aggregate(sequence(lit(0), lit(b.k - 1)),
        struct(lit(-1).cast("int").as("c"), lit(Double.MaxValue).as("d")),
        (acc, c) => {
          val d = aggregate(
            zip_with(sub, element_at(cents, c + 1), (x, y) => (x - y) * (x - y)),
            lit(0.0d), (a, x) => a + x)
          when(d < acc.getField("d"),
            struct(c.cast("int").as("c"), d.as("d"))).otherwise(acc)
        }).getField("c")
    })
  }

  /** The encoded corpus: (vec_id, v, norm, codes, pq_norm). `pq_norm`
    * is the reconstruction's norm — since the reconstruction is the
    * concatenation of per-subspace centroids, its self-dot is the sum
    * of m table lookups.
    */
  private[ops] def encoded(embeddings: DataFrame, b: Codebook): DataFrame = {
    val sq = sqTabCol(b)
    Spread(embeddings)
      .select(col("vec_id"), col("embedding").as("v"))
      .withColumn("norm", sqrt(Similarity.dot(col("v"), col("v"))))
      .withColumn("codes", codesOf(col("v"), b))
      .withColumn("pq_norm", sqrt(aggregate(
        zip_with(col("codes"), sequence(lit(0), lit(b.m - 1)),
          (c, s) => element_at(sq, s * b.k + c + 1)),
        lit(0.0d), (a, x) => a + x)))
  }

  /** Spec hook: native and HOF codes side by side for the
    * bit-equality pin of `pq_encode`.
    */
  private[ops] def encodedBoth(embeddings: DataFrame): DataFrame = {
    val base = Spread(embeddings)
      .select(col("vec_id"), col("embedding").as("v"))
    val b = codebookFor(base, 16, 32, 1)
    base.select(col("vec_id"),
      codesOf(col("v"), b).as("codes_native"),
      codesOfHof(col("v"), b).as("codes_hof"))
  }

  /** Spec hook: the encoded corpus for the default geometry. */
  private[ops] def encodedFor(embeddings: DataFrame, m: Int = 16,
      kCodes: Int = 32, trainMod: Int = 1): DataFrame = {
    val base = Spread(embeddings)
      .select(col("vec_id"), col("embedding").as("v"))
    encoded(embeddings, codebookFor(base, m, kCodes, trainMod))
  }

  /** Two-stage kNN: PQ-ADC prefilter to `candidates` per query, exact
    * cosine rerank to `k`. Output contract (columns, ordering,
    * rounding) is [[Similarity.knnBrute]]'s, and at a covering
    * candidate depth the rows are identical — `x_knn_pq_rerank`
    * hash-matches the brute oracle.
    */
  /** The query relation (query_id, qv, qn) for vec_id < nQueries. */
  private def queriesOf(enc: DataFrame, nQueries: Long): DataFrame =
    enc.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qn"))

  /** Attach the per-query ADC lookup table: qtab[s·k + c] =
    * <q[s], cb(s)(c)> — m·k partial dots computed once per QUERY,
    * not per pair.
    */
  private def withQtab(q: DataFrame, b: Codebook): DataFrame = {
    val cbc = cbCol(b)
    q.withColumn("qtab", flatten(
      transform(sequence(lit(0), lit(b.m - 1)), s =>
        transform(sequence(lit(0), lit(b.k - 1)), c =>
          aggregate(
            zip_with(slice(col("qv"), s * b.subDim + 1, lit(b.subDim)),
              element_at(element_at(cbc, s + 1), c + 1), (x, y) => x * y),
            lit(0.0d), (a, x) => a + x)))))
  }

  /** ADC dot of `codes` against `qtab` via the native codegen
    * expression `adc_dot` (m table lookups per pair, fused into the
    * join's codegen stage — same left-fold order as the HOF
    * `aggregate(zip_with(...))` form, bit-identical results).
    */
  private def adcOf(b: Codebook): Column =
    call_function("adc_dot", col("codes"), col("qtab"), lit(b.k))

  /** Rank a (vec_id, codes, pq_norm[, …]) candidate stream against the
    * broadcast query tables by approximate PQ cosine — the shared
    * stage-1 ranking window of both the full-scan and the
    * cell-blocked path.
    */
  private def pqRank(candidates: DataFrame, qSide: DataFrame,
      b: Codebook, joinCols: Seq[String]): DataFrame = {
    val joined = if (joinCols.isEmpty)
      candidates.join(broadcast(qSide), col("query_id") =!= col("vec_id"))
    else candidates.join(broadcast(qSide), joinCols)
      .filter(col("query_id") =!= col("vec_id"))
    val scored = joined.select(col("query_id"),
      col("vec_id").as("neighbor_id"),
      (adcOf(b) / col("qn") / col("pq_norm")).as("pq_cos"))
    val byPq = Window.partitionBy(col("query_id"))
      .orderBy(col("pq_cos").desc, col("neighbor_id"))
    scored.withColumn("crk", row_number().over(byPq))
  }

  /** Stage 2 — exact rerank: fetch full vectors for the Q·candidates
    * ids only (broadcast-candidate equi-join), brute's exact cosine
    * and ordering over that bounded set. One body for both PQ paths,
    * so the check query can never drift from the production shape.
    */
  private def exactRerank(enc: DataFrame, q: DataFrame, cand: DataFrame,
      k: Int): DataFrame = {
    val rescored = enc.select(col("vec_id").as("neighbor_id"),
        col("v"), col("norm"))
      .join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(q.select(col("query_id"), col("qv"), col("qn"))),
        Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        Similarity.cosineWithNorms(col("qv"), col("v"), col("qn"),
          col("norm")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Stage 1 as a standalone relation: every (query, corpus) pair's
    * ADC score with its per-query PQ rank `crk` — shared by the query
    * path and the covering-margin spec (which asserts every TRUE
    * top-k neighbor sits at `crk` well inside the candidate depth,
    * the `annCandidates` profile pattern).
    */
  private[ops] def prefilterRanks(embeddings: DataFrame, nQueries: Long,
      m: Int, kCodes: Int, trainMod: Int): DataFrame = {
    val base = Spread(embeddings)
      .select(col("vec_id"), col("embedding").as("v"))
    val b = codebookFor(base, m, kCodes, trainMod)
    val enc = encoded(embeddings, b)
    val q = withQtab(queriesOf(enc, nQueries), b)
      .select(col("query_id"), col("qtab"), col("qn"))
    pqRank(enc.select(col("vec_id"), col("codes"), col("pq_norm")),
      q, b, Seq.empty)
  }

  /** Candidate depth for a corpus of n vectors: 400 at fixture
    * scale, growing as n/5 past 2,000 — the `autoCells` pattern.
    * Measured necessity (`Prof <dir> pq`): at the 10× ScaleGen corpus
    * the worst true-neighbor PQ rank is 1,148, past any fixed
    * fixture-tuned depth — near-random embeddings put true neighbors
    * (cosine ~0.3) inside a noise cloud that grows with n, so the
    * covering depth must scale with it. Scanning 20 % of the 10-B
    * codes still moves ~128× fewer bytes than scanning 100 % of the
    * 256-B vectors, and the rerank stays Q·C exact cosines; corpora
    * where 20 % is too expensive take [[knnPqIvf]] at production
    * probes (approximate) instead.
    */
  private[ops] def autoCandidates(n: Long): Int =
    math.max(400, (n / 5)).toInt

  def knnPqRerank(embeddings: DataFrame, k: Int = 5, nQueries: Long = 5,
      m: Int = 16, kCodes: Int = 32, candidates: Int = 0,
      trainMod: Int = 1): DataFrame = {
    val base = Spread(embeddings)
      .select(col("vec_id"), col("embedding").as("v"))
    val b = codebookFor(base, m, kCodes, trainMod)
    val enc = encoded(embeddings, b)
    val depth = if (candidates > 0) candidates
      else autoCandidates(embeddings.count())
    val cand = prefilterRanks(embeddings, nQueries, m, kCodes, trainMod)
      .filter(col("crk") <= depth)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(enc, queriesOf(enc, nQueries), cand, k)
  }

  /** IVF × PQ — the canonical large-corpus ANN layout (both scale
    * levers composed): the coarse quantizer's cells bound how many
    * CODES are scanned per query (nProbe/nCells of the corpus), PQ
    * bounds the BYTES per scanned row, and the exact rerank restores
    * full precision on the Q·candidates survivors. Reuses the
    * memoized IVF coarse quantizer (`Similarity.cellsFor` — the same
    * fit every IVF family shares) and this file's codebooks, with the
    * same ranking window and rerank tail as [[knnPqRerank]].
    *
    * At nProbe == nCells every cell is probed, each (query, vector)
    * pair is scored exactly once (a vector lives in one cell, probe
    * rows are unique), and the candidate stream equals the full-scan
    * path's — so the output equals [[knnPqRerank]] and, at covering
    * depth, [[Similarity.knnBrute]] bit-for-bit: the
    * `x_knn_pq_ivf_check` driver gate pins the composition against
    * the brute oracle (the `x_knn_quantized_ivf_check` pattern). At
    * production probe counts it is approximate exactly like
    * [[Similarity.knnIvf]].
    */
  def knnPqIvf(embeddings: DataFrame, k: Int = 5, nQueries: Long = 5,
      nCells: Int = 16, nProbe: Int = 4, m: Int = 16, kCodes: Int = 32,
      candidates: Int = 0, trainMod: Int = 1,
      cellTrainMod: Int = 4): DataFrame = {
    val base = Spread(embeddings)
      .select(col("vec_id"), col("embedding").as("v"))
    val b = codebookFor(base, m, kCodes, trainMod)
    val enc = encoded(embeddings, b)
    val (cells, model) = Similarity.cellsFor(embeddings, nCells, cellTrainMod)
    val depth = if (candidates > 0) candidates
      else autoCandidates(embeddings.count())
    val q = queriesOf(enc, nQueries)
    val qProbed = withQtab(q, b)
      .select(col("query_id"), col("qtab"), col("qn"))
      .join(Similarity.probeSets(
          enc.filter(col("vec_id") < nQueries)
            .select(col("vec_id"), col("v")), model, nProbe)
        .select(col("vec_id").as("query_id"), col("cell")), "query_id")
    val cand = pqRank(
        enc.select(col("vec_id"), col("codes"), col("pq_norm"))
          .join(cells, "vec_id"),
        qProbed, b, Seq("cell"))
      .filter(col("crk") <= depth)
      .select(col("query_id"), col("neighbor_id"))
    exactRerank(enc, q, cand, k)
  }
}
