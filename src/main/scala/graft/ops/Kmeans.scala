package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Lloyd's k-means on the int8 quantization lattice —
  * the semantic-clustering operator a curation pipeline uses to
  * balance topic mixtures, spot mode collapse, and seed
  * cluster-stratified sampling. Unlike the float KMeans inside the
  * IVF quantizer ([[Similarity]] — engine-specific, declared
  * rows-only at the driver gate), every quantity here lives on the
  * integer lattice of [[Quantize]] codes:
  *
  *  - init: the k lowest-`vec_id` vectors' codes (no RNG);
  *  - assignment: exact integer squared distance, ties to the lowest
  *    cluster id (`array_position` returns the FIRST minimum);
  *  - update: element-wise FLOOR mean (`floorDiv`) keeps centroids
  *    integral; an emptied cluster keeps its previous centroid;
  *  - fixed iteration count, then one final assignment.
  *
  * Determinism is the point: integer sums commute, so the result is
  * bit-identical under any partitioning/retry AND replayable by any
  * engine with list arithmetic — the driver gate holds the full
  * assignment table to a DuckDB hash oracle, where float k-means
  * could never survive reduction-order drift.
  *
  * Scale shape: per iteration, one corpus pass — the k×d centroid
  * table rides INTO the scan as a literal (broadcast-by-construction,
  * no join), and the update aggregates (cluster, dim) cells with
  * map-side partial combine, so the shuffle is ≤ k·d rows per
  * partition regardless of corpus size. The k·d longs collected per
  * iteration are model state (the BPE-argmax convention), not a data
  * collect. Centroids memoize per (corpus plan, file set, k, iters)
  * like the IVF quantizer, so the purity/summary queries re-running
  * the fit in one session pay it once.
  */
object Kmeans {

  private val models =
    new BoundedMemo[(Int, Int, Int, Int), Vector[Array[Array[Long]]]](
      capacity = 32)

  /** Corpus-sized cluster count: √n clamped into [2, 256] and never
    * above n — the same √n sizing the float IVF adopted
    * ([[Similarity.autoCells]]) after fixed-cell-count indexes
    * degraded 27× at 10× data; a fixed k=8 likewise under-clusters a
    * big corpus (every topic mixture collapses into 8 buckets).
    * Deliberately a pure integer-pinnable formula — `round ∘ sqrt` of
    * an integer can never land on an exact .5 (that would need
    * n = z²+z+¼), so both engines' half-up rounding agree and the
    * DuckDB oracle replays the rule verbatim. `k = 0` in the public
    * entry points means "size from the data with this rule".
    */
  private[graft] def autoK(n: Long): Int =
    math.min(n,
      math.max(2L, math.min(256L,
        math.round(math.sqrt(n.toDouble))))).toInt

  /** Drop memoized centroid sets (after overwriting a corpus path
    * in-session — same staleness caveat as the IVF quantizer memo).
    */
  def clearCache(): Unit = models.clear()

  /** Non-null int8 code vectors, the clustering substrate — the
    * auditable `array<long>` form (the update step's posexplode and
    * the oracle replay read it) AND the packed binary form the hot
    * distance loops consume; the pack==codes identity is pinned by
    * the quantization audit ([[Quantize.quantizeProfile]]).
    */
  private def codesDf(embeddings: DataFrame): DataFrame =
    Spread(embeddings)
      .select(col("vec_id"), col("embedding").as("v"))
      .select(col("vec_id"),
        Quantize.codesOf(col("v"), Quantize.scaleOf(col("v"))).as("q"),
        Quantize.packedOf(col("v"), Quantize.scaleOf(col("v"))).as("pack"))
      .filter(col("q").isNotNull)

  /** Distances of a packed vector to every centroid, as
    * `array<bigint>`: ONE native `int8_dist2s` loop over the whole
    * k×d centroid block, which rides into the scan as a single binary
    * literal. This replaced the r11 algebraic form
    * (`zip_with(typedLit(cents), …)` computing q·q + c·c − 2·int8_dot
    * per cell): zip_with is a higher-order function — no codegen, one
    * interpreted lambda dispatch per CELL per row — which was
    * tolerable at fixed k=8 but scaled linearly with auto-k
    * (measured 79 s vs ~7 s on the lattice IVF's 100× leg at k=256).
    * Values are bit-identical exact BIGINTs either way, so argmin
    * ties and every oracle are untouched.
    */
  private def distsTo(cents: Array[Array[Long]], pack: Column): Column = {
    require(cents.forall(_.forall(v => v >= -128 && v <= 127)),
      "centroid codes must fit int8")
    call_function("int8_dist2s", pack,
      lit(cents.flatMap(_.map(_.toByte))))
  }

  /** Integer squared distance of `q` to every centroid, the minimum,
    * and the argmin cluster (first match = lowest id on ties).
    *
    * `cluster` is made NON-NULLABLE via the coalesce (r20 opt, the
    * [[Similarity.cellOf]] rationale): the lattice family joins on
    * `cluster` ([[semanticDedup]]'s pair join, [[knnIvfLattice]]'s
    * probe join), and a nullable computed join key gets an inferred
    * `IsNotNull` Filter pushed below this Project — re-evaluating the
    * whole quantize + `int8_dist2s` chain a second time per row.
    * `array_position` can never miss here (`dist2` IS an element of
    * `dists`, both non-null once `q` passed the isNotNull filter), so
    * the −1 arm is dead; it exists only to prove non-nullability to
    * the optimizer.
    */
  private def withCluster(codes: DataFrame,
      cents: Array[Array[Long]]): DataFrame =
    codes
      .withColumn("dists", distsTo(cents, col("pack")))
      .withColumn("dist2", array_min(col("dists")))
      .withColumn("cluster", coalesce(
        (array_position(col("dists"), col("dist2")) - 1).cast("int"),
        lit(-1)))
      .drop("dists")

  /** One Lloyd update: assign against `cents`, then floor-mean the
    * members of each cluster (empty clusters carry over).
    */
  private def step(codes: DataFrame,
      cents: Array[Array[Long]]): Array[Array[Long]] = {
    val next = cents.map(_.clone())
    withCluster(codes, cents)
      .select(col("cluster"), posexplode(col("q")).as(Seq("dim", "v")))
      .groupBy(col("cluster"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
      .collect()
      .foreach { r =>
        next(r.getInt(0))(r.getInt(1)) =
          math.floorDiv(r.getLong(3), r.getLong(2))
      }
    next
  }

  /** Fit (or reuse) the centroid set: k lowest-id seeds, `iters`
    * floor-mean updates. Mixed-dimension corpora are rejected the
    * way [[Pq]] rejects them — zip_with would silently null-pad.
    */
  private def centroidsFor(codes: DataFrame, k: Int,
      iters: Int): Array[Array[Long]] =
    centroidTrail(codes, k, iters).last

  /** The whole centroid TRAIL — element i is the set after i update
    * steps (0 = the raw seeds); [[kmeansFitReport]] replays one
    * assignment against each to expose the per-iteration inertia
    * curve. Memoized as a unit: the trail IS the fit.
    */
  private def centroidTrail(codes: DataFrame, k: Int,
      iters: Int): Vector[Array[Array[Long]]] = {
    // k = 0 (auto) memoizes under its own key: the same data always
    // resolves the same k, so the auto fit is reused without paying
    // the count on warm calls
    val key = (codes.queryExecution.optimizedPlan.semanticHash(),
      java.util.Arrays.hashCode(codes.inputFiles.asInstanceOf[Array[AnyRef]]),
      k, iters)
    models.getOrElseUpdate(key) {
      // quantize once, iterate over the cached codes: the fit makes
      // iters+2 passes (dim check, seeds, one per update), and
      // re-deriving codes from parquet each pass quadruples the scan
      // cost — the cache-the-training-relation contract every
      // iterative fitter (Spark ML KMeans included) assumes. Spilled
      // to disk when the corpus outgrows memory; released before
      // returning either way.
      val cached = codes.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val dims = cached.select(size(col("q")).as("d")).distinct()
          .limit(2).collect().map(_.getInt(0))
        require(dims.length == 1,
          s"kmeansInt8 requires a single embedding dimension, found ${dims.toSeq}")
        val kk = if (k > 0) k else autoK(cached.count())
        val seeds = cached.orderBy(col("vec_id")).limit(kk).collect()
        require(seeds.length == kk,
          s"kmeansInt8 needs at least k=$kk non-null vectors, found ${seeds.length}")
        var trail = Vector(seeds.map(_.getSeq[Long](1).toArray))
        for (_ <- 1 to iters) trail = trail :+ step(cached, trail.last)
        trail
      } finally cached.unpersist()
    }
  }

  /** The fitted centroid set itself — the model handoff for the
    * offline-fit / online-serve split: a streaming job cannot run
    * multi-pass Lloyd, so it fits here on the batch corpus and
    * serves arriving vectors via [[assignWithCentroids]]. Returns a
    * deep copy: the memoized trail's arrays are shared by every later
    * same-fit query in the session, and a caller mutating the handoff
    * must not corrupt them.
    */
  def centroids(embeddings: DataFrame, k: Int = 0,
      iters: Int = 3): Array[Array[Long]] =
    centroidsFor(codesDf(embeddings), k, iters).map(_.clone())

  /** Fit observability — the per-iteration training curve: for each
    * assignment pass i (1 = against the raw seeds, iters+1 = the
    * final model), the assigned count and total lattice inertia.
    * Lloyd's with an EXACT mean decreases inertia monotonically; the
    * floor-mean lattice projection can nudge a step by a few units,
    * so the curve is the *audit* of that tradeoff, not a proof
    * obligation. Rides the memoized trail (no refit); one pass per
    * iteration, each folding to a single row before the union.
    */
  def kmeansFitReport(embeddings: DataFrame, k: Int = 0,
      iters: Int = 3): DataFrame = {
    val codes = codesDf(embeddings)
    // the k column audits the RESOLVED cluster count — under auto-k
    // the sizing rule itself is hash-pinned by the driver gate, so a
    // drifting √n clamp turns the gate red instead of silently
    // re-clustering every downstream mixture decision
    centroidTrail(codes, k, iters).zipWithIndex.map { case (cents, i) =>
      withCluster(codes, cents)
        .agg(count(lit(1)).as("n"), sum(col("dist2")).as("inertia"))
        .select(lit(i + 1).as("iter"), lit(cents.length).as("k"),
          col("n"), col("inertia"))
    }.reduce(_ unionByName _).orderBy(col("iter"))
  }

  /** Assignment against a FIXED centroid set, streaming-safe: no
    * Spread (a streaming relation has no file listing) and no fit —
    * just the quantize + native-dot assignment projection, usable
    * under `readStream` as a pure per-row map. Emits
    * (vec_id, cluster, dist2), unordered.
    */
  def assignWithCentroids(embeddings: DataFrame,
      cents: Array[Array[Long]]): DataFrame = {
    val codes = embeddings
      .select(col("vec_id"), col("embedding").as("v"))
      .select(col("vec_id"),
        Quantize.codesOf(col("v"), Quantize.scaleOf(col("v"))).as("q"),
        Quantize.packedOf(col("v"), Quantize.scaleOf(col("v"))).as("pack"))
      .filter(col("q").isNotNull)
    withCluster(codes, cents)
      .select(col("vec_id"), col("cluster"), col("dist2"))
  }

  /** [[assignWithCentroids]] keeping the packed int8 codes —
    * streaming-safe like it, the substrate the streaming semantic
    * dedup's state function scores pairs on. Emits
    * (vec_id, cluster, pack).
    */
  private[graft] def assignWithCentroidsPacked(embeddings: DataFrame,
      cents: Array[Array[Long]]): DataFrame = {
    val codes = embeddings
      .select(col("vec_id"), col("embedding").as("v"))
      .select(col("vec_id"),
        Quantize.codesOf(col("v"), Quantize.scaleOf(col("v"))).as("q"),
        Quantize.packedOf(col("v"), Quantize.scaleOf(col("v"))).as("pack"))
      .filter(col("q").isNotNull)
    withCluster(codes, cents)
      .select(col("vec_id"), col("cluster"), col("pack"))
  }

  /** Per-vector final assignment: (vec_id, cluster, dist2) — the
    * driver-gate query, hash-exact against the DuckDB replay.
    */
  def kmeansAssign(embeddings: DataFrame, k: Int = 0,
      iters: Int = 3): DataFrame = {
    val codes = codesDf(embeddings)
    withCluster(codes, centroidsFor(codes, k, iters))
      .select(col("vec_id"), col("cluster"), col("dist2"))
      .orderBy(col("vec_id"))
  }

  /** Cluster × label composition — the purity/mixture report a
    * curation run reads to decide stratified quotas: per cluster,
    * its size, per-label member counts, and the integer-lattice
    * inertia contribution. Rides the memoized fit.
    */
  def kmeansPurity(embeddings: DataFrame, k: Int = 0,
      iters: Int = 3): DataFrame = {
    val codes = codesDf(embeddings)
    val asg = withCluster(codes, centroidsFor(codes, k, iters))
    asg.join(Spread(embeddings).select(col("vec_id"), col("label")),
        Seq("vec_id"))
      .groupBy(col("cluster"), col("label"))
      .agg(count(lit(1)).as("n"), sum(col("dist2")).as("sum_dist2"))
      .orderBy(col("cluster"), col("label"))
  }

  /** IVF ANN over the DETERMINISTIC lattice cells: the same
    * cell-probe shape as [[Similarity.knnQuantizedIvf]], but the
    * coarse quantizer is this module's integer k-means — so cell
    * assignment, probe choice (nProbe nearest centroids by integer
    * distance, ties to the lowest cell), candidate set, and the
    * quantized-cosine ranking are ALL bit-deterministic, and the
    * driver gate holds the output to a full DuckDB hash oracle AT
    * PRODUCTION PROBE COUNTS — where the float-quantizer IVF is only
    * hash-checkable in its probe-everything degenerate form.
    * Approximate exactly like any IVF (a true neighbor in an
    * unprobed cell is missed) — but *reproducibly* approximate:
    * every engine replaying the definition gets the identical
    * neighbor lists, which is what an audited retrieval pipeline
    * needs from its index.
    *
    * Scale shape: corpus stays partitioned with its codes (the cell
    * join broadcasts the Q·nProbe query rows); per-pair cost is one
    * integer dot; the only corpus-derived exchange is the top-k
    * window's candidate stream (≈ nProbe/k of the corpus).
    */
  def knnIvfLattice(embeddings: DataFrame, topK: Int = 5,
      nQueries: Long = 5, k: Int = 0, iters: Int = 3,
      nProbe: Int = 3): DataFrame = {
    val codes = codesDf(embeddings)
    val cents = centroidsFor(codes, k, iters)
    val asg = withCluster(codes, cents)
      .withColumn("selfq", Quantize.i8dot(col("pack"), col("pack")))
    val qs = codes.filter(col("vec_id") < nQueries)
      .withColumn("qq", Quantize.i8dot(col("pack"), col("pack")))
      .withColumn("ranked", array_sort(zip_with(
        distsTo(cents, col("pack")),
        // cell count from the RESOLVED fit, not the k parameter —
        // k = 0 means auto-sized
        sequence(lit(0), lit(cents.length - 1)),
        (d, i) => struct(d.as("d"), i.as("i")))))
      .select(col("vec_id").as("query_id"), col("pack").as("qpack"),
        col("qq").as("qself"),
        explode(slice(col("ranked"), 1, nProbe)).as("pc"))
      .select(col("query_id"), col("qpack"), col("qself"),
        col("pc.i").as("cluster"))
    val scored = asg
      .join(broadcast(qs), Seq("cluster"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("dot_q", Quantize.i8dot(col("qpack"), col("pack")))
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("dot_q"),
        // query-norm first, then neighbor-norm — the division order
        // shared with Quantize.knnQuantized and its oracle
        (col("dot_q").cast("double") / sqrt(col("qself").cast("double"))
          / sqrt(col("selfq").cast("double"))).as("qcos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        col("dot_q"), round(col("qcos"), 4).as("qcosine"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-cluster occupancy drift between a BASELINE count relation
    * `(cluster, n_base)` and a CURRENT one `(cluster, n_cur)` — the
    * [[graft.ops.CorpusStats.mixtureDrift]] contract on the semantic
    * clustering: share of each side, the share delta, and an integer
    * `drift` flag raised when |Δshare| exceeds `num/den`. The flag
    * compares CROSS-MULTIPLIED exact integers
    * (|n_cur·tb − n_base·tc|·den > num·tb·tc, in DECIMAL(38,0) so
    * corpus-scale products can't wrap a long), so the cut is
    * bit-exact across engines; the share doubles are fixed-order
    * divisions of exact integers and carry the hash oracle too.
    * Clusters missing from one side count 0 there (full outer);
    * an empty side yields null shares and never flags (0 > 0).
    *
    * Both the batch gate query and the streaming trigger
    * ([[graft.streaming.StreamingKmeans.streamingClusterDrift]])
    * compute exactly this algebra — parity is spec-pinned.
    */
  def occupancyDrift(base: DataFrame, cur: DataFrame,
      num: Int = 1, den: Int = 10): DataFrame =
    occupancyDriftOf(base.join(cur, Seq("cluster"), "full")
      .na.fill(0L, Seq("n_base", "n_cur")), num, den)

  /** The drift algebra over an already-joined
    * (cluster, n_base, n_cur) relation — factored so the gate query
    * can hand in a single-pass count relation (see
    * [[kmeansOccupancyDrift]]) while external callers keep the
    * two-relation [[occupancyDrift]] contract.
    */
  private def occupancyDriftOf(j: DataFrame,
      num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0, s"threshold must be a positive rational: $num/$den")
    val tot = j.agg(sum(col("n_base")).as("tb"), sum(col("n_cur")).as("tc"))
    def dec(c: Column) = c.cast("decimal(38,0)")
    j.crossJoin(broadcast(tot))
      .select(col("cluster"), col("n_base"), col("n_cur"),
        when(col("tb") > 0,
          round(col("n_base").cast("double") / col("tb"), 4)).as("share_base"),
        when(col("tc") > 0,
          round(col("n_cur").cast("double") / col("tc"), 4)).as("share_cur"),
        when(col("tb") > 0 && col("tc") > 0,
          round(col("n_cur").cast("double") / col("tc")
            - col("n_base").cast("double") / col("tb"), 4)).as("delta_share"),
        (abs(dec(col("n_cur")) * dec(col("tb"))
            - dec(col("n_base")) * dec(col("tc"))) * lit(den)
          > lit(num) * dec(col("tb")) * dec(col("tc"))).cast("int").as("drift"))
      .orderBy(col("cluster"))
  }

  /** The gate form of [[occupancyDrift]]: one corpus, split by vec_id
    * parity into a baseline half and a "current" half, both assigned
    * against the ONE memoized full-corpus fit — "which topics are the
    * new arrivals hitting, vs the corpus so far" with zero extra
    * fitting. The parity split is a deterministic stand-in for a
    * time split (the synthetic corpus has no ingest timestamp); a
    * production monitor feeds real epoch slices to [[occupancyDrift]]
    * or watches the stream trigger.
    */
  def kmeansOccupancyDrift(embeddings: DataFrame, num: Int = 1,
      den: Int = 10, k: Int = 0, iters: Int = 3): DataFrame = {
    val codes = codesDf(embeddings)
    val asg = withCluster(codes, centroidsFor(codes, k, iters))
      .select(col("vec_id"), col("cluster"))
    // ONE corpus pass (r20 opt): conditional counts over the parity
    // split are algebraically identical to the former two one-sided
    // aggregates + full-outer join + fill(0) — a cluster with no
    // even (odd) member counts 0 either way, a cluster with no member
    // at all is absent either way — but the corpus is quantized and
    // assigned once instead of twice. Checkpointed because the drift
    // algebra instantiates its input twice (the `tot` scalar and the
    // final projection), which would otherwise re-run even the single
    // pass; the materialized relation is k rows.
    val j = PlanAudit.checkpointed(asg.groupBy(col("cluster")).agg(
      count(when(col("vec_id") % 2 === 0, true)).as("n_base"),
      count(when(col("vec_id") % 2 =!= 0, true)).as("n_cur")))
    occupancyDriftOf(j, num, den)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): cluster the corpus, then mark as duplicates
    * vectors whose quantized cosine to ANY EARLIER member of the same
    * cluster reaches `num/den`, with `vec_id` as the deterministic
    * arrival order.
    *
    * DELIBERATE DEVIATION from the paper's sequential greedy: the
    * paper keeps a vector when it is far from every already-KEPT
    * member, so on a chain A~B~C with A⊀C it keeps A and C; this
    * rule drops against any earlier member (kept or not) and keeps
    * only A. The trade is bought on purpose — the drop decision
    * becomes a pure function of the (unordered) pair set, which is
    * what makes (a) the full DuckDB hash oracle possible and (b) the
    * streaming form's pair emission provably arrival-order-invariant
    * ([[graft.streaming.StreamingKmeans.streamingSemanticPairs]]);
    * the sequential rule is inherently order-dependent and
    * unverifiable by a set-shaped oracle. The deviation only ever
    * drops MORE (every paper-dropped vector is dropped here too), so
    * it is conservative for dedup; KmeansSpec measures the keep-rate
    * delta against a per-cell reference implementation of the
    * paper's chain rule.
    *
    * Cross-cluster near-dups are deliberately out of scope (that is
    * the approximation SemDeDup trades for tractability; the exact
    * all-pairs baseline is [[graft.ops.Dedup.embeddingCosinePairs]]).
    * Annotate-don't-filter: every vector reports its cluster, how
    * many earlier same-cell dups it has, and the keep flag.
    *
    * Everything is exact integer arithmetic on the lattice codes —
    * the cosine cut is cross-multiplied (`dot > 0 ∧ dot²·den² ≥
    * num²·‖a‖²·‖b‖²`, in DECIMAL(38,0) so corpus-scale squares can't
    * wrap), so the whole output carries a full DuckDB hash oracle,
    * which a float-threshold semantic dedup could never do.
    *
    * Scale shape: candidates are generated per CELL (equi-join on the
    * cluster id, never a corpus cross join); √n auto-sized cells hold
    * √n members each, so pair work is Σ|cell|² ≈ n^1.5 instead of n²
    * — the SemDeDup design point — and each pair costs one native
    * `int8_dot`. The per-vector drop decision is a grouped count on
    * the pair stream; nothing is collected.
    */
  def semanticDedup(embeddings: DataFrame, num: Int = 2, den: Int = 5,
      k: Int = 0, iters: Int = 3): DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      s"cosine threshold must be a rational in (0, 1]: $num/$den")
    val codes = codesDf(embeddings)
    // checkpoint the assigned relation (r20 opt): it feeds THREE
    // consumers (both sides of the pair join and the final keep
    // projection), each of which otherwise re-ran the full quantize +
    // int8_dist2s assignment pass over the corpus. ~90 B/row
    // materialized (id, cluster, packed codes, self-dot).
    val asg = PlanAudit.checkpointed(
      withCluster(codes, centroidsFor(codes, k, iters))
        .withColumn("selfq", Quantize.i8dot(col("pack"), col("pack")))
        .select(col("vec_id"), col("cluster"), col("pack"), col("selfq")))
    def dec(c: Column) = c.cast("decimal(38,0)")
    val pairs = asg
      .select(col("cluster"), col("vec_id").as("va"),
        col("pack").as("pa"), col("selfq").as("sa"))
      .join(asg.select(col("cluster"), col("vec_id").as("vb"),
        col("pack").as("pb"), col("selfq").as("sb")), Seq("cluster"))
      .filter(col("va") < col("vb"))
      .withColumn("dot", Quantize.i8dot(col("pa"), col("pb")))
      .filter(col("dot") > 0 &&
        dec(col("dot")) * dec(col("dot")) * lit(den.toLong * den) >=
          lit(num.toLong * num) * dec(col("sa")) * dec(col("sb")))
    val dropped = pairs.groupBy(col("vb").as("vec_id"))
      .agg(count(lit(1)).as("dups"))
    asg.select(col("vec_id"), col("cluster"))
      .join(dropped, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("dups"), lit(0L)).as("n_dups_before"),
        col("dups").isNull.cast("int").as("keep"))
      .orderBy(col("vec_id"))
  }

  /** Cluster-stratified sample: `n` md5-ordered vectors per semantic
    * cluster — the "uniformly across topics, deterministically"
    * draw a curation mixture starts from. Rides the memoized fit
    * and [[Sampling.stratifiedSample]]'s salted two-phase rank.
    */
  def clusterSample(embeddings: DataFrame, n: Int = 3, k: Int = 0,
      iters: Int = 3): DataFrame = {
    val codes = codesDf(embeddings)
    val asg = withCluster(codes, centroidsFor(codes, k, iters))
      .select(col("vec_id"), col("cluster"))
    Sampling.stratifiedSample(asg, "cluster", "vec_id", n)
      .select(col("cluster"), col("rnk"), col("vec_id"))
      .orderBy(col("cluster"), col("rnk"))
  }

  /** Per-cluster TOPIC terms — the human-readable label a semantic
    * cluster needs before a curation decision (keep/downsample/drop a
    * topic): join the lattice assignment to the document corpus on
    * vec_id = doc_id, rank each cluster's BIGRAMS by in-cluster
    * document frequency, and keep the top `topK`. Bigrams, not
    * unigrams: collocations ("gradient descent") are topical where
    * their component words are not, and a unigram surface is one
    * df-cap away from empty on a small-vocabulary corpus. Bigrams
    * carried by more than half the corpus are excluded first
    * (`2·corpus_df ≤ n_docs`, an integer df-cap stopword filter) —
    * without it every cluster's "topic" is the same function-word
    * list. All-integer ordering (df desc, then term), so the whole
    * output carries a full DuckDB hash oracle on top of the replayed
    * k-means CTE.
    *
    * Shape: the assignment rides the memoized fit (k·d driver-side
    * model state only); the term relation shuffles into (cluster,
    * term) counts; the corpus-df side derives from the same logical
    * aggregate. Catalyst collapses that derivation into a second
    * independent pipeline, so the explode physically runs twice —
    * MEASURED and kept: the window alternative (`sum(df) over
    * (partition by term)` on cdf, one explode) re-shuffles AND SORTS
    * the vocabulary relation instead, and loses at both 1× (1.89 vs
    * 1.84 s) and 100× (11.1 vs 9.9 s) because ScaleGen-style corpora
    * grow vocabulary with size — two cheap explode passes beat one
    * vocab sort. n_docs is a 1-row scalar attach; the final window
    * sorts each cluster's vocabulary, never the corpus.
    */
  def clusterTopics(embeddings: DataFrame, docs: DataFrame, topK: Int = 5,
      k: Int = 0, iters: Int = 3): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    val codes = codesDf(embeddings)
    val asg = withCluster(codes, centroidsFor(codes, k, iters))
      .select(col("vec_id"), col("cluster"))
    // the distinct per-doc bigram set IS the bigram-tf substrate's
    // key set (tf keys are distinct by construction), so topics
    // rides the LM family's memoized PERSISTED relation instead of
    // re-tokenizing the corpus — and the cdf/tot double-derivation
    // this operator deliberately kept (the window variant measured
    // slower) now reads cached partitions twice instead of exploding
    // the corpus twice
    val terms = CorpusStats.corpusBigramTf(docs)
      .select(col("doc_id"), col("bg").as("term"))
      .join(asg, col("doc_id") === col("vec_id"))
      .select(col("cluster"), col("doc_id"), col("term"))
    // checkpointed (r20 opt): `cdf` feeds the corpus-df aggregate AND
    // the final join, and each instance re-ran the terms join +
    // (cluster, term) aggregation — the r18 measurement kept the
    // double derivation over the window ALTERNATIVE (which re-sorts
    // the vocabulary); materializing the (cluster, term, df) relation
    // once removes the second derivation without introducing the sort.
    val cdf = PlanAudit.checkpointed(terms.groupBy(col("cluster"), col("term"))
      .agg(count(lit(1)).as("df")))
    val tot = cdf.groupBy(col("term")).agg(sum(col("df")).as("corpus_df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("df").desc, col("term"))
    cdf.join(tot, "term").crossJoin(broadcast(nDocs))
      .filter(col("corpus_df") * 2 <= col("n_docs"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("cluster"), col("rank"), col("term"), col("df"))
      .orderBy(col("cluster"), col("rank"))
  }
}
