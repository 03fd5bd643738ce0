package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF×PQ index — BOTH scale levers composed in one
  * storage artifact, the canonical production layout for ANN over a
  * corpus too large to scan per query (the [[Pq.knnPqIvf]]
  * composition, persisted):
  *
  *  - the coarse quantizer's cells bound WHICH FILES a query reads:
  *    vectors are PARTITIONED BY cell, so the probe join rides
  *    dynamic partition pruning and the stage-1 scan touches
  *    nProbe/nCells of the index files ([[IvfIndex]]'s lever);
  *  - PQ bounds the BYTES PER ROW that scan moves: stage 1 reads
  *    only (vec_id, pcodes, pq_norm) — m packed bytes instead of the
  *    256-byte vector ([[PqStore]]'s lever; the plan spec pins the
  *    pruned ReadSchema);
  *  - the exact rerank restores full precision on the Q·depth
  *    survivors, fetching full vectors through a SECOND pruned scan —
  *    the candidate list carries its cells, so the fetch join is on
  *    (cell, vec_id) and dynamic pruning bounds it to the probed
  *    partitions too, never a full-corpus read.
  *
  * Layout under a [[StoreVersioning versioned root]] (maintainer
  * lease, marker commit, tombstones, compaction — the store-family
  * contract):
  *
  *  - `centroids/` — the coarse quantizer relation (cell, cvec).
  *  - `codebook/`  — the PQ codebook relation (s, c, cvec).
  *  - `vectors/`   — (vec_id, v, norm, pcodes, pq_norm) partitioned
  *    by (ingest, cell): ingest-keyed for idempotent append retry,
  *    cell for the pruning above.
  *  - `deletes/`   — the tombstone relation.
  *
  * Exactness contract: at nProbe == nCells every cell is probed and
  * every (query, vector) pair ADC-scored exactly once; at candidate
  * depth >= store size the prefilter passes every pair; the rerank's
  * cosine, tie order and rounding are [[Similarity.topKByCosine]] —
  * the shared tail of brute/IVF/the other stores — so the gate rows
  * equal [[Similarity.knnBrute]] bit-for-bit and carry its full
  * DuckDB oracle, whatever the two quantizers learned. Production
  * probe counts and depths are the recall knobs, exactly like the
  * in-session [[Pq.knnPqIvf]].
  */
object IvfPqStore {

  private def centroidsPath(root: String) = s"$root/centroids"
  private def codebookPath(root: String) = s"$root/codebook"
  private def vectorsPath(root: String) = s"$root/vectors"
  private def deletesPath(root: String) = s"$root/deletes"

  /** Physical-layout version of the vectors relation (v1:
    * (ingest, cell)-partitioned since the store's introduction) —
    * `_META` + layout gate, the [[IvfIndex]] convention.
    */
  private val Layout = 1L

  private def requireLayout(spark: SparkSession, root: String): Unit = {
    StoreVersioning.requireLayout(spark, root, "IvfPqStore", "vectors",
      Layout)
    requireGeometry(spark, root)
  }

  /** The geometry gate alone — enforced on QUERY/dedup paths too
    * (unlike layout): coarse probing is spherical, so a raw-space root
    * would silently lose partial-probe recall
    * ([[StoreVersioning.requireGeometry]]).
    */
  private def requireGeometry(spark: SparkSession, root: String): Unit =
    StoreVersioning.requireGeometry(spark, root, "IvfPqStore")

  /** Build the index at `dir`: coarse-assign every vector (memoized
    * quantizer — the lineage every IVF family shares), PQ-encode it
    * (memoized codebook), land both model relations plus the
    * cell-partitioned encoded corpus, commit by marker.
    */
  def save(embeddings: DataFrame, dir: String, nCells: Int = 16,
      cellTrainMod: Int = 4, m: Int = 16, kCodes: Int = 32,
      trainMod: Int = 1): Unit = {
    val spark = embeddings.sparkSession
    StoreVersioning.withMaintainerLock(spark, dir, "IvfPqStore.save") {
      val v = StoreVersioning.nextVersion(spark, dir)
      val root = s"$dir/$v"
      val (assigned, model) =
        Similarity.assignedWithModel(embeddings, nCells, cellTrainMod)
      val b = Pq.codebookForStore(embeddings, m, kCodes, trainMod)
      Similarity.centroidsDf(spark, model)
        .coalesce(1)
        .write.mode("overwrite").parquet(centroidsPath(root))
      PqStore.writeCodebook(spark, b, root)
      writeVectors(
        Pq.encoded(embeddings, b)
          .join(assigned.select(col("vec_id"), col("cell")), "vec_id"),
        root, "0", full = true)
      StoreVersioning.writeMeta(spark, root, Seq(
        "store" -> "IvfPqStore",
        "layout" -> Layout.toString,
        "geometry" -> StoreVersioning.UnitSphereGeometry,
        "n_cells" -> nCells.toString,
        "m" -> b.m.toString,
        "k_codes" -> b.k.toString,
        "sub_dim" -> b.subDim.toString,
        "train_fingerprint" -> StoreVersioning.trainFingerprint(embeddings),
        "train_content_fingerprint" ->
          StoreVersioning.contentFingerprint(embeddings)))
      StoreVersioning.commit(spark, dir, v)
    }
  }

  private def writeVectors(encWithCell: DataFrame, root: String,
      ingestId: String, full: Boolean): Unit = {
    // cluster cells into tasks before partitionBy — ~nCells files per
    // build, not tasks×cells (the IvfIndex file-count discipline)
    val w = encWithCell
      .select(col("vec_id"), col("v"), col("norm"), col("pcodes"),
        col("pq_norm"), col("cell"))
      .withColumn("ingest", lit(ingestId))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("ingest", "cell")
    (if (full) w else w.option("partitionOverwriteMode", "dynamic"))
      .parquet(vectorsPath(root))
  }

  /** Grow the index: assign NEW vectors to the STORED centroids and
    * encode them with the STORED codebook (no refit of either —
    * geometry is frozen at build), landed as an idempotent
    * ingest-keyed partition overwrite.
    */
  def append(embeddings: DataFrame, dir: String, ingestId: String): Unit = {
    require(ingestId.nonEmpty && ingestId != "0",
      "ingestId must be a non-empty batch name other than the reserved \"0\"")
    val spark = embeddings.sparkSession
    StoreVersioning.withMaintainerLock(spark, dir, "IvfPqStore.append") {
      val root = StoreVersioning.requireRoot(spark, dir)
      requireLayout(spark, root)
      val cents = spark.read.parquet(centroidsPath(root))
      val b = PqStore.codebookOf(spark, root)
      val enc = Pq.encoded(embeddings, b)
      val asg = Similarity.nearestCellsFrom(
          enc.select(col("vec_id"), col("v")), cents, nProbe = 1)
        .select(col("vec_id"), col("cell"))
      writeVectors(enc.join(asg, "vec_id"), root, ingestId, full = false)
    }
  }

  /** Tombstone retraction — the store-family contract, loud on
    * malformed ids.
    */
  def delete(vecIds: DataFrame, dir: String): Unit =
    StoreVersioning.withMaintainerLock(vecIds.sparkSession, dir,
        "IvfPqStore.delete") {
      val root = StoreVersioning.requireRoot(vecIds.sparkSession, dir)
      val ids = StoreVersioning.requireLongIds(vecIds, "vec_id")
      ids.write.mode("append").parquet(deletesPath(root))
    }

  private def deletesIfAny(spark: SparkSession,
      root: String): Option[DataFrame] = {
    val path = new org.apache.hadoop.fs.Path(deletesPath(root))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) Some(spark.read.parquet(deletesPath(root)))
    else None
  }

  /** Rewrite live rows into a fresh version: tombstones reclaimed,
    * ingests collapsed, cells re-clustered to ~one file each, both
    * model relations carried over unchanged.
    */
  def compact(spark: SparkSession, dir: String): Unit =
    StoreVersioning.withMaintainerLock(spark, dir, "IvfPqStore.compact") {
      val root = StoreVersioning.requireRoot(spark, dir)
      requireLayout(spark, root)
      val v = StoreVersioning.nextVersion(spark, dir)
      val newRoot = s"$dir/$v"
      spark.read.parquet(centroidsPath(root))
        .coalesce(1)
        .write.mode("overwrite").parquet(centroidsPath(newRoot))
      spark.read.parquet(codebookPath(root))
        .coalesce(1)
        .write.mode("overwrite").parquet(codebookPath(newRoot))
      val live = deletesIfAny(spark, root)
        .fold(spark.read.parquet(vectorsPath(root)))(d =>
          spark.read.parquet(vectorsPath(root))
            .join(d, Seq("vec_id"), "left_anti"))
      writeVectors(live.drop("ingest"), newRoot, "0", full = true)
      // geometry is frozen at build: lineage carries over verbatim
      StoreVersioning.writeMeta(spark, newRoot,
        StoreVersioning.metaOf(spark, root).toSeq.sortBy(_._1))
      StoreVersioning.commit(spark, dir, v)
    }

  /** Maintenance introspection — the store-family stats contract,
    * plus the frozen model lineage from the root's `_META` (layout,
    * both quantizers' geometry, the training corpus fingerprint): a
    * maintenance job that sees today's corpus fingerprint diverge
    * from `train_fingerprint` knows the geometry is stale and should
    * recommend REBUILD (re-fit) where fragmentation alone would only
    * warrant a compact.
    */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = StoreVersioning.requireRoot(spark, dir)
    requireLayout(spark, root)
    val vectors = spark.read.parquet(vectorsPath(root))
    val del = deletesIfAny(spark, root)
    val meta = StoreVersioning.metaOf(spark, root)
    val nVec = vectors.count()
    val nTomb = del.fold(0L)(_.select(col("vec_id")).distinct().count())
    val nLive = del.fold(nVec)(d =>
      vectors.join(d, Seq("vec_id"), "left_anti").count())
    Seq((StoreVersioning.versionOf(root),
        vectors.select(col("ingest").cast("string")).distinct().count(),
        StoreVersioning.dataFileCount(spark, vectorsPath(root)),
        nVec,
        spark.read.parquet(centroidsPath(root)).count(),
        nTomb, nLive,
        meta.getOrElse("layout", "unknown"),
        meta.getOrElse("m", "unknown"),
        meta.getOrElse("k_codes", "unknown"),
        meta.getOrElse("train_fingerprint", "unknown")))
      .toDF("version", "n_ingests", "n_vector_files", "n_vectors",
        "n_cells", "n_tombstoned", "n_live_vectors",
        "layout", "m", "k_codes", "train_fingerprint")
  }

  /** Top-k cosine neighbors for an explicit (query_id, qv) relation.
    * External ids are their own namespace (no self-exclusion). The
    * query×probe relation's broadcast is size-gated exactly like
    * [[IvfIndex.query]], but at the QTAB ceiling
    * ([[Pq.MaxBroadcastQtabRows]]): these probe rows each carry the
    * m·k ADC table, ~10× the bare-vector row the IVF constant was
    * sized for.
    */
  def query(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5, nProbe: Int = 4, candidates: Int = 0,
      maxBroadcastProbeRows: Long = Pq.MaxBroadcastQtabRows): DataFrame =
    queryFrom(spark, StoreVersioning.requireRoot(spark, dir),
      queries.select(col("query_id"), col("qv"))
        .withColumn("qn", sqrt(Similarity.dot(col("qv"), col("qv")))),
      k, nProbe, candidates, excludeSelf = false, maxBroadcastProbeRows)

  /** Self-query convenience (the gate contract): live stored vectors
    * with vec_id < nQueries query the index, self-pairs excluded.
    */
  def querySelf(spark: SparkSession, dir: String, k: Int = 5,
      nQueries: Long = 5, nProbe: Int = 4, candidates: Int = 0): DataFrame = {
    val root = StoreVersioning.requireRoot(spark, dir)
    val own = spark.read.parquet(vectorsPath(root))
      .filter(col("vec_id") < nQueries)
    val live = deletesIfAny(spark, root).fold(own)(del =>
      own.join(del, Seq("vec_id"), "left_anti"))
    queryFrom(spark, root,
      live.select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qn")),
      k, nProbe, candidates, excludeSelf = true,
      Pq.MaxBroadcastQtabRows)
  }

  /** Flag incoming embeddings whose cosine against ANY stored vector
    * clears `minCosine` — incremental embedding dedup /
    * decontamination of today's batch against the HISTORICAL corpus
    * without re-reading it (the [[DedupStore.dedupAgainst]] lifecycle
    * in embedding space, through the composed index): the probe join
    * bounds which cells are read (dynamic partition pruning), the ADC
    * margin prefilter bounds which pairs fetch full vectors (10-byte
    * codes in the pair stream, the [[Pq.embeddingNearDupPq]] layout
    * with the query side exact), and the exact verify restores full
    * precision. Output (query_id, corpus_id, cosine), total-ordered,
    * one row per qualifying pair.
    *
    * Exactness: at nProbe == nCells and a pass-all margin (≥ 1 +
    * minCosine) every (incoming, stored) pair reaches the exact
    * verify and the result provably equals the brute pair set — the
    * gate configuration. At production settings margin is the recall
    * knob exactly as in [[Pq.embeddingNearDupPq]]; ADC's one-sided
    * error is strictly smaller than SDC's (one side is exact), so
    * the measured SDC covering margins dominate here. Every broadcast
    * on this path is size-gated on ONE count of the incoming batch —
    * the bare (query, cell) probe pairs at the vector-row ceiling
    * ([[IvfIndex.MaxBroadcastProbeRows]]), the per-QUERY qtab rows at
    * the QTAB ceiling ([[Pq.MaxBroadcastQtabRows]] — these rows carry
    * the m·k ADC table, so their ceiling is a byte budget; r17 splits
    * them off the probe pairs so it binds nQ alone, not nQ×nProbe,
    * and the exhaustive-probe regime keeps its broadcasts), the
    * exact-verify query fetch at the bare-vector ceiling — and the
    * survivor fetch carries NO hint at all: a weak prune (this
    * pass-all gate, an adversarial corpus) stays a partitioned join
    * instead of OOMing the driver; AQE broadcasts when the prune is
    * real. A corpus-sized incoming batch therefore never forces a
    * driver-sized broadcast anywhere — it degrades to partitioned
    * shuffles, same rows (the gate spec pins both regimes equal).
    */
  /** Memoized store-geometry margin certifications, keyed per
    * (version root, vectors file listing, threshold): the QUANTIZER is
    * frozen per root, but the sampled gap is measured over the STORED
    * vectors, and append() grows those under the SAME root — so the
    * file-listing fingerprint rides in the key and any append (new
    * files) forces a fresh certification probe at the next dedup call,
    * instead of a long-lived streaming session certifying forever
    * against the pre-append sample and missing exactly the
    * drifted-append exposure the certification exists to catch. A
    * compact commits a NEW root, so the root key already covers it.
    */
  private val marginCerts =
    new BoundedMemo[(String, String, Double), Double](capacity = 64)

  /** The store's sampled worst one-sided exact−ADC gap at `minCosine`
    * — the memoized certification statistic, exposed for
    * [[StoreMaintenance.recommendIvfPq]] (advisory: compare it to the
    * deployment's dedup margin BEFORE the nightly run refuses).
    */
  private[ops] def sampledDedupGap(spark: SparkSession, dir: String,
      minCosine: Double): Double = {
    val root = StoreVersioning.requireRoot(spark, dir)
    val vectors = spark.read.parquet(vectorsPath(root))
    val b = PqStore.codebookOf(spark, root)
    val fp = StoreVersioning.trainFingerprint(vectors)
    marginCerts.getOrElseUpdate((root, fp, minCosine))(
      Pq.adcSampledGap(
        vectors.select(col("vec_id"), col("v"), col("norm"),
          col("pcodes"), col("pq_norm")),
        b, nearMin = minCosine))
  }

  def dedupAgainst(spark: SparkSession, dir: String, incoming: DataFrame,
      minCosine: Double = 0.3, nProbe: Int = 4, margin: Double = 0.35,
      maxBroadcastProbeRows: Long = Pq.MaxBroadcastQtabRows,
      maxBroadcastQueryRows: Long = IvfIndex.MaxBroadcastProbeRows,
      certifyMargin: Boolean = true)
      : DataFrame = {
    val root = StoreVersioning.requireRoot(spark, dir)
    requireGeometry(spark, root)
    val vectors = spark.read.parquet(vectorsPath(root))
    val cents = spark.read.parquet(centroidsPath(root))
    val b = PqStore.codebookOf(spark, root)
    // Margin self-certification (the embeddingNearDupPq convention,
    // store-side): the worst sampled one-sided exact−ADC gap of the
    // STORE's own quantization must sit inside the configured margin,
    // or true near-duplicates would silently fail the prefilter. ADC
    // error is one-sided-smaller than SDC (the query side is exact),
    // so a store that certifies here is strictly safer than the
    // measured SDC margins; a store whose geometry went stale (built
    // on last year's distribution, appends frozen) is exactly what
    // this catches — rebuild, raise the margin, or opt out.
    if (certifyMargin) {
      val fp = StoreVersioning.trainFingerprint(vectors)
      val gap = marginCerts.getOrElseUpdate((root, fp, minCosine))(
        Pq.adcSampledGap(
          vectors.select(col("vec_id"), col("v"), col("norm"),
            col("pcodes"), col("pq_norm")),
          b, nearMin = minCosine))
      require(gap <= margin,
        f"IvfPqStore.dedupAgainst cannot certify the ADC covering " +
          f"margin at $root: sampled worst exact-ADC gap $gap%.3f " +
          f"exceeds margin $margin%.3f on pairs at/above the " +
          f"$minCosine%.2f threshold - true near-duplicates WOULD be " +
          "lost. Rebuild the store with finer PQ geometry, raise " +
          "`margin`, or pass certifyMargin=false to accept the " +
          "measured recall loss deliberately")
    }
    val q0 = incoming.select(col("query_id"), col("qv"))
      .withColumn("qn", sqrt(Similarity.dot(col("qv"), col("qv"))))
    // one count job serves EVERY broadcast gate on this path
    val nQ = q0.count()
    val probes = Similarity.nearestCellsFrom(
        q0.select(col("query_id").as("vec_id"), col("qv").as("v")),
        cents, nProbe)
      .select(col("vec_id").as("query_id"), col("cell"))
    // r17 (verdict 5): the probe payload is SPLIT — bare (query_id,
    // cell) pairs meet the vectors on the partition column, and the
    // ~m·k·8 B qtab attaches afterwards by query_id, ONE row per
    // QUERY. The r15 shape duplicated each query's qtab onto every
    // probe row before the cell join, so its broadcast ceiling had to
    // bind the PRODUCT nQ×nProbe: the exhaustive regime (nProbe =
    // nCells, the pass-all gate) fell off the broadcast cliff at 16×
    // fewer queries and collapsed the cell join onto nCells shuffle
    // keys (measured 52.2 s vs the r14-era 40.1 s at 100×). Split,
    // the qtab ceiling binds nQ alone (same ~100 MB byte budget), the
    // bare pair list rides the vector-row ceiling, and an over-ceiling
    // batch still degrades to partitioned joins — the OOM-safety
    // contract is unchanged.
    // bare pairs ride the caller's bare-row ceiling (the same knob
    // that gates the exact-verify query fetch) so a spec or a small
    // driver can force BOTH regimes — a hardcoded constant here would
    // leave the partitioned cell join untestable
    val probesHinted =
      if (nQ * nProbe <= maxBroadcastQueryRows) broadcast(probes)
      else probes
    val qtab = Pq.withQtab(q0, b)
      .select(col("query_id"), col("qtab"), col("qn"))
    val qtabHinted =
      if (nQ <= maxBroadcastProbeRows) broadcast(qtab) else qtab
    val cand0 = vectors
      .select(col("vec_id"), col("cell"), col("pcodes"), col("pq_norm"))
      .join(probesHinted, Seq("cell"))
      .join(qtabHinted, Seq("query_id"))
    val cand1 = deletesIfAny(spark, root).fold(cand0)(del =>
      cand0.join(del, Seq("vec_id"), "left_anti"))
    val adc = call_function("adc_dot_packed",
      col("pcodes"), col("qtab"), lit(b.k))
    // keep-on-degenerate, like the SDC filter: a zero-norm
    // reconstruction has no prefilter signal — the exact verify
    // decides (`when` so the division never evaluates on zero rows)
    val pass = when(col("pq_norm") === 0.0d || col("qn") === 0.0d, lit(true))
      .otherwise(adc / col("qn") / col("pq_norm") >= minCosine - margin)
    // a stored vector lives in ONE cell and probe rows are unique per
    // (query, cell), so (query_id, corpus_id) pairs are already
    // distinct — no dedup shuffle needed
    val survivors = cand1.filter(pass)
      .select(col("query_id"), col("vec_id").as("corpus_id"), col("cell"))
    // exact-verify fetch: the query side is the full incoming relation
    // (bare vectors, no qtab), so its hint rides the bare-vector
    // ceiling — gated on the SAME count as the probe join above; an
    // incoming batch big enough to trip the gate partitions instead
    val qFetch = q0.select(col("query_id"), col("qv"), col("qn"))
    val qFetchHinted =
      if (nQ <= maxBroadcastQueryRows) broadcast(qFetch) else qFetch
    val fetched = vectors
      .select(col("vec_id").as("corpus_id"), col("cell"), col("v"),
        col("norm"))
      .join(survivors, Seq("cell", "corpus_id"))
      .join(qFetchHinted, Seq("query_id"))
    fetched.select(col("query_id"), col("corpus_id"),
        Similarity.cosineWithNorms(col("qv"), col("v"), col("qn"),
          col("norm")).as("cos"))
      .filter(col("cos") >= minCosine)
      .select(col("query_id"), col("corpus_id"),
        round(col("cos"), 4).as("cosine"))
      .orderBy(col("query_id"), col("corpus_id"))
  }

  /** Shared tail; the root is resolved ONCE per logical query so a
    * racing commit can never mix generations.
    */
  private def queryFrom(spark: SparkSession, root: String, q0: DataFrame,
      k: Int, nProbe: Int, candidates: Int, excludeSelf: Boolean,
      maxBroadcastProbeRows: Long): DataFrame = {
    requireGeometry(spark, root)
    val vectors = spark.read.parquet(vectorsPath(root))
    val cents = spark.read.parquet(centroidsPath(root))
    val b = PqStore.codebookOf(spark, root)
    val depth =
      if (candidates > 0) candidates
      else Pq.autoCandidates(vectors.count())
    // one count job serves the bound check AND the broadcast gate
    val nQ = q0.count()
    Pq.requireRerankBound(nQ, depth)
    // probe sets from the stored centroids (broadcast, nCells rows)
    val probes = Similarity.nearestCellsFrom(
        q0.select(col("query_id").as("vec_id"), col("qv").as("v")),
        cents, nProbe)
      .select(col("vec_id").as("query_id"), col("cell"))
    val q = Pq.withQtab(q0, b)
      .select(col("query_id"), col("qtab"), col("qn"))
      .join(probes, "query_id")
    val qHinted =
      if (nQ * nProbe <= maxBroadcastProbeRows) broadcast(q) else q
    // stage 1: the cell-pruned, byte-minimal scan — (vec_id, pcodes,
    // pq_norm) joined on the PARTITION column (dynamic pruning reads
    // nProbe/nCells of the files), ADC-scored per pair
    val ranked0 = vectors
      .select(col("vec_id"), col("cell"), col("pcodes"), col("pq_norm"))
      .join(qHinted, Seq("cell"))
    val ranked1 = deletesIfAny(spark, root).fold(ranked0)(del =>
      // tombstones prune the CANDIDATE stream after the cell join —
      // an anti join under the join would sit inside the pruning
      // rule's scan-side pattern and revert to a full index read
      // (the IvfIndex lesson, spec-pinned there)
      ranked0.join(del, Seq("vec_id"), "left_anti"))
    val ranked2 =
      if (excludeSelf) ranked1.filter(col("query_id") =!= col("vec_id"))
      else ranked1
    // the ONE shared ADC-score → rank → depth-cut stage body
    // (Pq.adcCandidates — also Pq.pqRank's tail, PqStore's stage 1),
    // carrying `cell` so the rerank fetch below stays partition-pruned
    val cand = Pq.adcCandidates(ranked2, b, depth, carry = Seq("cell"))
    // stage 2: exact rerank — the survivor fetch joins on
    // (cell, vec_id), so dynamic pruning bounds THIS scan to the
    // probed partitions too (a bare id join would read every cell's
    // full vectors back). cand is ≤ nQ·depth rows by construction
    // (requireRerankBound's 4M cap), so its hint is bounded by
    // contract; the query fetch is gated on nQ like dedupAgainst's.
    val qFetch = q0.select(col("query_id"), col("qv"), col("qn"))
    val qFetchHinted =
      if (nQ <= IvfIndex.MaxBroadcastProbeRows) broadcast(qFetch) else qFetch
    val fetched = vectors
      .select(col("vec_id").as("neighbor_id"), col("cell"), col("v"),
        col("norm"))
      .join(broadcast(cand), Seq("cell", "neighbor_id"))
      .join(qFetchHinted, Seq("query_id"))
    Similarity.topKByCosine(
      fetched.select(col("query_id"), col("neighbor_id"),
        Similarity.cosineWithNorms(col("qv"), col("v"), col("qn"),
          col("norm")).as("cos")),
      k)
  }
}
