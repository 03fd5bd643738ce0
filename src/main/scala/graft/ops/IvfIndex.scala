package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — build ONCE, query MANY.
  *
  * Every in-session IVF operator ([[Similarity.knnIvf]] and friends)
  * re-derives the coarse quantizer and the corpus cell assignment per
  * session; the memo hides that inside one JVM, but at 100 TB the
  * operational pattern is different: the index is built by one job,
  * LANDS ON STORAGE, and is then queried by many later jobs that must
  * not pay the fit or the full-corpus assignment pass again. This
  * module is that seam, Spark-native. Under a
  * [[StoreVersioning versioned root]] — rebuilds and compactions
  * write a fresh `v<n>/` and commit by marker creation, so a crashed
  * rebuild leaves the old index (and its still-applied tombstones)
  * fully intact behind the committed marker, never a gutted or mixed-generation
  * store:
  *
  *  - `centroids/` — the quantizer as a relation (cell, cvec), nCells
  *    rows. The only state a query job needs to plan its probes.
  *  - `vectors/` — (vec_id, v, norm) PARTITIONED BY `cell` (Hive-style
  *    directory partitioning). Partitioning by cell is the scale
  *    design: a probe of `nProbe` of `nCells` cells becomes a join on
  *    the PARTITION column, which Spark turns into dynamic partition
  *    pruning — the scan READS only the probed cells' files
  *    (nProbe/nCells of the bytes), instead of scanning the corpus and
  *    filtering. At √n cells that is the difference between an
  *    O(corpus) read per query batch and an O(corpus/√n·nProbe) one.
  *    `IvfIndexSpec` pins the pruning in the executed plan.
  *  - `deletes/` — the tombstone relation ([[delete]]).
  *
  * Norms are precomputed at build time and stored (a double
  * round-trips parquet exactly), so the query side pays one dot per
  * scored pair — the [[Similarity.cosineWithNorms]] contract — and
  * the scored values are bit-identical to the in-session path: at the
  * recall-exhaustive probe counts the driver gate pins, the persisted
  * path hash-matches the brute-force DuckDB oracle end to end.
  *
  * Incremental growth: [[append]] assigns NEW vectors against the
  * STORED centroids (no refit — the production contract: an index's
  * geometry is frozen at build; re-tuning is a rebuild) and appends
  * their cell partitions. Assignment uses the same broadcast-centroid
  * distance ranking as every probe derivation, so an appended index
  * stays exhaustive-probe-correct by construction — the driver gate
  * queries an even-half-built, odd-half-appended index at
  * nProbe == nCells and still hash-matches the full brute oracle.
  */
object IvfIndex {

  private def centroidsPath(root: String) = s"$root/centroids"
  private def vectorsPath(root: String) = s"$root/vectors"
  private def deletesPath(root: String) = s"$root/deletes"

  /** Physical-layout version of the vectors relation: v1 (round 13)
    * partitioned by `cell` alone; v2 (round 14) by `(ingest, cell)`
    * for idempotent appends. Recorded in each committed root's
    * `_META` and enforced by [[StoreVersioning.requireLayout]] before
    * any maintenance that assumes the layout.
    */
  private val Layout = 2L

  private def requireLayout(spark: SparkSession, root: String): Unit = {
    StoreVersioning.requireLayout(spark, root, "IvfIndex", "vectors", Layout)
    // geometry rides with layout on maintenance paths: an append into
    // a raw-space root would place new vectors by the spherical rule
    requireGeometry(spark, root)
  }

  /** The geometry gate alone — enforced on QUERY paths too (unlike
    * layout, which leaves committed roots query-valid): ranking
    * unit-normalized queries against raw-space centroids silently
    * degrades partial-probe recall ([[StoreVersioning.requireGeometry]]).
    */
  private def requireGeometry(spark: SparkSession, root: String): Unit =
    StoreVersioning.requireGeometry(spark, root, "IvfIndex")

  /** Build the index at `dir`: fits (or reuses — the quantizer memo
    * is keyed on the training lineage, not the caller) the coarse
    * quantizer, assigns every vector, writes centroids and the
    * cell-partitioned vector relation into a fresh version root, and
    * commits by marker creation (which also prunes superseded versions —
    * the fresh index starts with no tombstones).
    */
  def save(embeddings: DataFrame, dir: String, nCells: Int = 16,
      trainMod: Int = 4): Unit = {
    val spark = embeddings.sparkSession
    StoreVersioning.withMaintainerLock(spark, dir, "IvfIndex.save") {
      val v = StoreVersioning.nextVersion(spark, dir)
      val root = s"$dir/$v"
      val (assigned, model) =
        Similarity.assignedWithModel(embeddings, nCells, trainMod)
      Similarity.centroidsDf(spark, model)
        .coalesce(1)
        .write.mode("overwrite").parquet(centroidsPath(root))
      // repartition ON the partition column first: partitionBy splits
      // every writing task by cell, so T upstream tasks × C cells would
      // land T·C small files; clustering cells into tasks bounds the
      // index at ~C files per build — the file-count discipline a
      // √n-cell index needs at corpus scale. `ingest` leads the
      // partition spec so an append ([[append]]) owns a whole
      // `ingest=<id>/` subtree it can dynamically overwrite on retry;
      // `cell` stays a partition column, so the probe join's dynamic
      // pruning is untouched (it prunes on ANY partition column).
      assigned
        .withColumn("ingest", lit("0"))
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("ingest", "cell")
        .parquet(vectorsPath(root))
      StoreVersioning.writeMeta(spark, root, Seq(
        "store" -> "IvfIndex",
        "layout" -> Layout.toString,
        "geometry" -> StoreVersioning.UnitSphereGeometry,
        "n_cells" -> nCells.toString,
        "train_fingerprint" -> StoreVersioning.trainFingerprint(embeddings),
        "train_content_fingerprint" ->
          StoreVersioning.contentFingerprint(embeddings)))
      StoreVersioning.commit(spark, dir, v)
    }
  }

  /** Assign `embeddings` to the index's STORED centroids (nearest by
    * the same codegen'd distance the probe ranking uses) and append
    * them to the committed vector relation. No refit, no touch of
    * existing partitions beyond the append.
    *
    * Assignment-rule parity: [[save]] assigns via the codegen'd
    * `pq_encode` argmin ([[Similarity.cellOf]]), this path via the
    * `dist2_d` fold ranking — both accumulate (xᵢ−yᵢ)² in the same
    * sequential order and break ties to the lower cell, so build and
    * append place a vector identically (the round-15 quantizer rework
    * closed the old MLlib-vs-fold rounding caveat). The append gate
    * and spec still pin nProbe == nCells, where equality with brute
    * force is assignment-independent by construction.
    *
    * `ingestId` names the batch (a date, a run id) and makes the
    * append IDEMPOTENT — the [[DedupStore.append]] contract: the
    * write is a dynamic partition overwrite of exactly this ingest's
    * `ingest=<id>/` subtree, so a retried/replayed append replaces
    * its own partial output instead of double-inserting vectors
    * (a duplicated vector would occupy two top-k ranks in every query
    * it neighbors). The recovery story for any append failure is:
    * run the same append again.
    */
  def append(embeddings: DataFrame, dir: String, ingestId: String): Unit = {
    require(ingestId.nonEmpty && ingestId != "0",
      "ingestId must be a non-empty batch name other than the reserved \"0\"")
    val spark = embeddings.sparkSession
    StoreVersioning.withMaintainerLock(spark, dir, "IvfIndex.append") {
      val root = StoreVersioning.requireRoot(spark, dir)
      requireLayout(spark, root)
      val cents = spark.read.parquet(centroidsPath(root))
      val e = Similarity.withNorm(embeddings)
      val asg = Similarity.nearestCellsFrom(e, cents, nProbe = 1)
        .select(col("vec_id"), col("cell"))
      e.join(asg, "vec_id")
        .select(col("vec_id"), col("v"), col("norm"), col("cell"))
        .withColumn("ingest", lit(ingestId))
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("ingest", "cell")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(vectorsPath(root))
    }
  }

  /** Retract vectors from the index WITHOUT rewriting it: ids land in
    * a tombstone relation and [[query]] anti-joins them out of the
    * candidate stream (broadcast anti on a takedown-sized set), so a
    * retracted vector stops appearing as a neighbor immediately; its
    * dead rows are physically reclaimed by the next [[compact]] or
    * [[save]] — the same retraction lifecycle as [[DedupStore.delete]].
    */
  def delete(vecIds: DataFrame, dir: String): Unit =
    StoreVersioning.withMaintainerLock(vecIds.sparkSession, dir,
        "IvfIndex.delete") {
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

  /** Rewrite the vector relation from its own contents into a fresh
    * version: tombstoned vectors drop out, every cell's rows
    * re-cluster into ~one file (appends add files per ingest; a
    * season of daily appends fragments the very scans the
    * partitioning is for), centroids carried over unchanged — no
    * refit, no embedding re-read. The new version reads from the OLD
    * committed root and lands beside it, so a crashed compaction
    * destroys nothing and the recovery is to run compact again.
    */
  def compact(spark: SparkSession, dir: String): Unit =
    StoreVersioning.withMaintainerLock(spark, dir, "IvfIndex.compact") {
      val root = StoreVersioning.requireRoot(spark, dir)
      requireLayout(spark, root)
      val v = StoreVersioning.nextVersion(spark, dir)
      val newRoot = s"$dir/$v"
      val live = deletesIfAny(spark, root)
        .fold(spark.read.parquet(vectorsPath(root)))(d =>
          spark.read.parquet(vectorsPath(root))
            .join(d, Seq("vec_id"), "left_anti"))
      spark.read.parquet(centroidsPath(root))
        .coalesce(1)
        .write.mode("overwrite").parquet(centroidsPath(newRoot))
      // a season of appends collapses back to the single "0" ingest
      live.drop("ingest").withColumn("ingest", lit("0"))
        .repartition(col("cell"))
        .write.mode("overwrite").partitionBy("ingest", "cell")
        .parquet(vectorsPath(newRoot))
      // geometry is frozen at build: lineage carries over verbatim
      StoreVersioning.writeMeta(spark, newRoot,
        StoreVersioning.metaOf(spark, root).toSeq.sortBy(_._1))
      StoreVersioning.commit(spark, dir, v)
    }

  /** Maintenance introspection — the [[DedupStore.stats]] contract
    * for the index: `n_vector_files` against `n_cells × n_ingests`
    * is the fragmentation signal (each append lands ~a file per cell
    * it touches; the probe join's pruning reads whole cells, so
    * files-per-cell is exactly the scan's open cost), `n_tombstoned /
    * n_vectors` the dead-row ratio each query pays an anti-join for
    * until a compaction reclaims it.
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
        meta.getOrElse("train_fingerprint", "unknown")))
      .toDF("version", "n_ingests", "n_vector_files", "n_vectors",
        "n_cells", "n_tombstoned", "n_live_vectors",
        "layout", "train_fingerprint")
  }

  /** Top-k cosine neighbors from the persisted index for an explicit
    * query relation (query_id, qv: array<float|double>). The probe
    * set derives from the stored centroids (broadcast, nCells rows);
    * the candidate fetch is a broadcast join of the (Q·nProbe)-row
    * query×probe relation against the cell-partitioned scan — the
    * partition-column join dynamic pruning feeds on. Tombstones prune
    * the CANDIDATE stream after the cell join (a broadcast anti on a
    * takedown-sized set), deliberately not the scan itself: an anti
    * join between the scan and the cell join would sit inside the
    * pruning rule's scan-side pattern and silently revert every
    * tombstoned query to a full index read. Same cosine arithmetic,
    * tie order and rounding as [[Similarity.knnIvf]] (the shared
    * [[Similarity.topKByCosine]] tail).
    *
    * `excludeSelf` drops candidates whose vec_id equals the query_id —
    * for self-queries ([[querySelf]]) where the two share an id
    * namespace. External query relations keep the default `false`:
    * their ids are a DIFFERENT namespace, and excluding id-colliding
    * candidates would silently drop true neighbors.
    *
    * The broadcast of the query×probe relation is SIZE-GATED
    * ([[MaxBroadcastProbeRows]]): a typical query batch broadcasts
    * (Q·nProbe rows — the regime where dynamic partition pruning
    * rides the reused broadcast), but a caller probing with millions
    * of queries exceeds the gate, the hint is dropped, and AQE plans
    * a partitioned join instead of OOMing the driver with an
    * unconditional broadcast. Correctness is identical in both
    * regimes (spec-pinned); above the gate the scan may read more
    * partitions than nProbe/nCells — the price of a query relation
    * that IS itself corpus-sized.
    */
  def query(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5, nProbe: Int = 4, excludeSelf: Boolean = false,
      maxBroadcastProbeRows: Long = MaxBroadcastProbeRows): DataFrame =
    queryFrom(spark, StoreVersioning.requireRoot(spark, dir), queries,
      k, nProbe, excludeSelf, maxBroadcastProbeRows)

  /** Probe-row ceiling under which [[query]] broadcasts the
    * query×probe relation: 256k rows ≈ 100 MB at 64-dim float vectors
    * (qv + qn + probe cell per row) — inside Spark's broadcast
    * comfort zone with margin. Past it the hint is dropped and AQE
    * chooses the join strategy from measured sizes.
    */
  val MaxBroadcastProbeRows: Long = 256L * 1024

  /** [[query]] against an already-resolved version root — the root is
    * resolved ONCE per logical query so a commit racing the planning
    * can never mix generations (queries from one version, candidates
    * from another).
    */
  private def queryFrom(spark: SparkSession, root: String,
      queries: DataFrame, k: Int, nProbe: Int, excludeSelf: Boolean,
      maxBroadcastProbeRows: Long = MaxBroadcastProbeRows): DataFrame = {
    requireGeometry(spark, root)
    val vectors = spark.read.parquet(vectorsPath(root))
    val cents = spark.read.parquet(centroidsPath(root))
    val qn = queries
      .select(col("query_id"), col("qv"))
      .withColumn("qn", sqrt(Similarity.dot(col("qv"), col("qv"))))
    val probes = Similarity.nearestCellsFrom(
        qn.select(col("query_id").as("vec_id"), col("qv").as("v")),
        cents, nProbe)
      .select(col("vec_id").as("query_id"), col("cell"))
    val q = qn.join(probes, "query_id")
    // size-gate the broadcast hint: one count of the CALLER's query
    // relation (cheap next to the query itself) decides the regime —
    // forcing the hint on a corpus-sized query batch is a driver OOM,
    // not a plan choice
    val qHinted =
      if (queries.count() * nProbe <= maxBroadcastProbeRows) broadcast(q)
      else q
    val candidates0 = vectors.join(qHinted, Seq("cell"))
    val candidates1 = deletesIfAny(spark, root).fold(candidates0)(del =>
      candidates0.join(del, Seq("vec_id"), "left_anti"))
    val candidates =
      if (excludeSelf) candidates1.filter(col("query_id") =!= col("vec_id"))
      else candidates1
    Similarity.topKByCosine(
      candidates.select(col("query_id"), col("vec_id").as("neighbor_id"),
        Similarity.cosineWithNorms(col("qv"), col("v"), col("qn"), col("norm"))
          .as("cos")),
      k)
  }

  /** Self-query convenience mirroring [[Similarity.knnIvf]]'s gate
    * contract: of the ids below `nQueries`, the non-retracted ones
    * query the index (a tombstoned vector must not keep issuing
    * queries computed from its erased embedding — so a retraction in
    * that id range means FEWER than nQueries query groups, not a
    * substitute query). The query fetch is a (vec_id < nQueries) scan
    * of the vector relation itself — column-pruned to (vec_id, v),
    * tiny even though it crosses partitions; production callers with
    * external queries use [[query]] directly.
    */
  def querySelf(spark: SparkSession, dir: String, k: Int = 5,
      nQueries: Long = 5, nProbe: Int = 4): DataFrame = {
    // resolve the root ONCE for query vectors and candidates alike
    val root = StoreVersioning.requireRoot(spark, dir)
    val own = spark.read.parquet(vectorsPath(root))
      .filter(col("vec_id") < nQueries)
    val live = deletesIfAny(spark, root).fold(own)(del =>
      own.join(del, Seq("vec_id"), "left_anti"))
    queryFrom(spark, root,
      live.select(col("vec_id").as("query_id"), col("v").as("qv")),
      k, nProbe, excludeSelf = true)
  }
}
