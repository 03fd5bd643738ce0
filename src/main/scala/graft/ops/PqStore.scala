package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted PQ retrieval index — codebook + encoded corpus, build
  * ONCE, query MANY.
  *
  * The in-session PQ family ([[Pq.knnPqRerank]] and friends) hides
  * the codebook fit and the corpus encode behind an in-JVM memo, but
  * the cold fit is still paid once per process — the single most
  * expensive cold event in the whole bench (the r13 driver measured
  * 132 s). This store is the [[IvfIndex]]/[[DedupStore]] lifecycle
  * applied to PQ: one job trains the codebook and argmin-encodes the
  * corpus, the artifacts LAND ON STORAGE, and every later job (or
  * JVM) pays neither again. Under a [[StoreVersioning versioned
  * root]] with the maintainer lease, like its siblings:
  *
  *  - `codebook/` — the m·k centroid relation (s, c, cvec), the only
  *    geometry a query job needs; read back as k-row model state
  *    (1024 doubles at the default 16×32×4).
  *  - `vectors/`  — (vec_id, v, norm, pcodes, pq_norm) partitioned by
  *    ingest id: `pcodes` is the m-BYTE packed code vector the ADC
  *    prefilter scans (the 16–25× resident-size lever), `v`/`norm`
  *    ride along for the exact rerank so the store is self-contained.
  *    Unlike [[IvfIndex]] there is no cell partitioning — the PQ
  *    full-scan path READS every code by design (that is its
  *    trade: tiny rows, no recall loss from cell blocking); corpora
  *    that need scan pruning too compose IVF on top
  *    ([[Pq.knnPqIvf]]'s layout).
  *  - `deletes/`  — the tombstone relation ([[delete]]).
  *
  * Query semantics are IDENTICAL to the in-session operators — the
  * stages are the same shared bodies ([[Pq.withQtab]], [[Pq.pqRank]],
  * [[Pq.exactRerank]]), only the encoded relation comes from storage:
  * a fresh full-corpus store's [[querySelf]] equals
  * [[Pq.knnPqRerank]] bit-for-bit, and at covering depth both equal
  * [[Similarity.knnBrute]] — which is what lets the driver gate rows
  * share the full brute DuckDB oracle through the persisted path.
  *
  * Incremental growth: [[append]] encodes NEW vectors against the
  * STORED codebook (no refit — index geometry is frozen at build,
  * re-tuning is a rebuild) as an idempotent ingest-keyed partition
  * overwrite. At exhaustive candidate depth the appended store equals
  * brute force over the union whatever the codebook — the append gate
  * pins the storage machinery (no vector lost, duplicated, or
  * misencoded), not PQ recall, exactly like the IvfIndex append gate
  * at nProbe == nCells.
  */
object PqStore {

  private def codebookPath(root: String) = s"$root/codebook"
  private def vectorsPath(root: String) = s"$root/vectors"
  private def deletesPath(root: String) = s"$root/deletes"

  /** Physical-layout version of the vectors relation (v1: ingest-keyed
    * since the store's introduction) — `_META` + layout gate, the
    * [[IvfIndex]] convention.
    */
  private val Layout = 1L

  private def requireLayout(spark: SparkSession, root: String): Unit =
    StoreVersioning.requireLayout(spark, root, "PqStore", "vectors", Layout)

  private def metaOf(b: Pq.Codebook, embeddings: DataFrame) = Seq(
    "store" -> "PqStore",
    "layout" -> Layout.toString,
    "m" -> b.m.toString,
    "k_codes" -> b.k.toString,
    "sub_dim" -> b.subDim.toString,
    "train_fingerprint" -> StoreVersioning.trainFingerprint(embeddings),
    "train_content_fingerprint" -> StoreVersioning.contentFingerprint(embeddings))

  /** Build the store at `dir`: fit (or reuse — the codebook memo is
    * keyed on the training lineage) the m per-subspace codebooks,
    * encode every vector, land codebook + encoded relation in a fresh
    * version root, commit by marker creation.
    */
  def save(embeddings: DataFrame, dir: String, m: Int = 16,
      kCodes: Int = 32, trainMod: Int = 1): Unit = {
    val spark = embeddings.sparkSession
    StoreVersioning.withMaintainerLock(spark, dir, "PqStore.save") {
      val v = StoreVersioning.nextVersion(spark, dir)
      val root = s"$dir/$v"
      val b = Pq.codebookForStore(embeddings, m, kCodes, trainMod)
      writeCodebook(spark, b, root)
      writeVectors(Pq.encoded(embeddings, b), root, "0", full = true)
      StoreVersioning.writeMeta(spark, root, metaOf(b, embeddings))
      StoreVersioning.commit(spark, dir, v)
    }
  }

  private[ops] def writeCodebook(spark: SparkSession, b: Pq.Codebook,
      root: String): Unit = {
    import spark.implicits._
    (for (s <- 0 until b.m; c <- 0 until b.k) yield (s, c, b.cb(s)(c).toSeq))
      .toDF("s", "c", "cvec")
      .coalesce(1)
      .write.mode("overwrite").parquet(codebookPath(root))
  }

  private def writeVectors(enc: DataFrame, root: String, ingestId: String,
      full: Boolean): Unit = {
    val w = enc
      .select(col("vec_id"), col("v"), col("norm"), col("pcodes"),
        col("pq_norm"))
      .withColumn("ingest", lit(ingestId))
      .write.mode("overwrite").partitionBy("ingest")
    (if (full) w else w.option("partitionOverwriteMode", "dynamic"))
      .parquet(vectorsPath(root))
  }

  /** The stored codebook as driver-side model state (m·k rows — the
    * `clusterCenters` class of collect, never a corpus).
    */
  private[ops] def codebookOf(spark: SparkSession, root: String): Pq.Codebook = {
    val rows = spark.read.parquet(codebookPath(root))
      .select(col("s"), col("c"), col("cvec")).collect()
    require(rows.nonEmpty, s"empty codebook at ${codebookPath(root)}")
    val m = rows.iterator.map(_.getInt(0)).max + 1
    val k = rows.iterator.map(_.getInt(1)).max + 1
    require(rows.length == m * k,
      s"codebook at ${codebookPath(root)} is not dense: " +
        s"${rows.length} rows for m=$m k=$k")
    val subDim = rows.head.getSeq[Double](2).length
    val cb = Array.ofDim[Array[Double]](m, k)
    rows.foreach(r => cb(r.getInt(0))(r.getInt(1)) =
      r.getSeq[Double](2).toArray)
    Pq.Codebook(m, k, subDim, cb)
  }

  /** Encode `embeddings` with the STORED codebook (no refit) and
    * append them as ingest partition `ingestId` — idempotent exactly
    * like [[IvfIndex.append]]: a retried append replaces its own
    * `ingest=<id>/` subtree instead of double-inserting vectors.
    * Encoding uses the same `pq_encode` argmin as the build, so an
    * appended store stays exhaustive-depth-correct by construction.
    */
  def append(embeddings: DataFrame, dir: String, ingestId: String): Unit = {
    require(ingestId.nonEmpty && ingestId != "0",
      "ingestId must be a non-empty batch name other than the reserved \"0\"")
    val spark = embeddings.sparkSession
    StoreVersioning.withMaintainerLock(spark, dir, "PqStore.append") {
      val root = StoreVersioning.requireRoot(spark, dir)
      requireLayout(spark, root)
      val b = codebookOf(spark, root)
      writeVectors(Pq.encoded(embeddings, b), root, ingestId, full = false)
    }
  }

  /** Retract vectors without rewriting the store: tombstones, applied
    * by [[query]]/[[querySelf]] as a broadcast anti join on the code
    * scan; dead rows are physically reclaimed by the next [[compact]]
    * or [[save]]. Malformed ids fail loudly
    * ([[StoreVersioning.requireLongIds]]).
    */
  def delete(vecIds: DataFrame, dir: String): Unit =
    StoreVersioning.withMaintainerLock(vecIds.sparkSession, dir,
        "PqStore.delete") {
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

  /** Rewrite the encoded relation from its own contents into a fresh
    * version: tombstoned vectors drop out, a season of appends
    * collapses to the single "0" ingest, codebook carried over
    * unchanged — no refit, no re-encode, no embedding re-read.
    */
  def compact(spark: SparkSession, dir: String): Unit =
    StoreVersioning.withMaintainerLock(spark, dir, "PqStore.compact") {
      val root = StoreVersioning.requireRoot(spark, dir)
      requireLayout(spark, root)
      val v = StoreVersioning.nextVersion(spark, dir)
      val newRoot = s"$dir/$v"
      spark.read.parquet(codebookPath(root))
        .coalesce(1)
        .write.mode("overwrite").parquet(codebookPath(newRoot))
      val live = deletesIfAny(spark, root)
        .fold(spark.read.parquet(vectorsPath(root)))(d =>
          spark.read.parquet(vectorsPath(root))
            .join(d, Seq("vec_id"), "left_anti"))
      live.drop("ingest").withColumn("ingest", lit("0"))
        .write.mode("overwrite").partitionBy("ingest")
        .parquet(vectorsPath(newRoot))
      // geometry is frozen at build: lineage carries over verbatim
      StoreVersioning.writeMeta(spark, newRoot,
        StoreVersioning.metaOf(spark, root).toSeq.sortBy(_._1))
      StoreVersioning.commit(spark, dir, v)
    }

  /** Maintenance introspection — the [[DedupStore.stats]] contract:
    * file-count fragmentation and the live/tombstoned ratio a
    * compaction decision reads.
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
        nVec, nTomb, nLive,
        meta.getOrElse("layout", "unknown"),
        meta.getOrElse("m", "unknown"),
        meta.getOrElse("k_codes", "unknown"),
        meta.getOrElse("train_fingerprint", "unknown")))
      .toDF("version", "n_ingests", "n_vector_files", "n_vectors",
        "n_tombstoned", "n_live_vectors",
        "layout", "m", "k_codes", "train_fingerprint")
  }

  /** Memoized per (version root, vectors file listing, threshold), the
    * [[IvfPqStore]] convention: the listing fingerprint invalidates
    * the memo on append() — the gap is measured over the stored
    * vectors, which grow under the same root.
    */
  private val sampledGaps =
    new BoundedMemo[(String, String, Double), Double](capacity = 64)

  /** The store's sampled worst one-sided exact−ADC gap at `minCosine`
    * — the [[StoreMaintenance.recommendPq]] statistic: the same
    * frozen-codebook quantization exposure as the composed store,
    * measured over the stored vectors' own reconstructions.
    */
  private[ops] def sampledGap(spark: SparkSession, dir: String,
      minCosine: Double): Double = {
    val root = StoreVersioning.requireRoot(spark, dir)
    val vectors = spark.read.parquet(vectorsPath(root))
    val b = codebookOf(spark, root)
    sampledGaps.getOrElseUpdate(
        (root, StoreVersioning.trainFingerprint(vectors), minCosine))(
      Pq.adcSampledGap(
        vectors.select(col("vec_id"), col("v"), col("norm"),
          col("pcodes"), col("pq_norm")),
        b, nearMin = minCosine))
  }

  /** The live encoded relation at `root`: tombstones anti-joined off
    * the scan (a broadcast anti on a takedown-sized set — there is no
    * partition pruning to protect here, unlike [[IvfIndex]]).
    */
  private def liveVectors(spark: SparkSession, root: String): DataFrame = {
    val vectors = spark.read.parquet(vectorsPath(root))
    deletesIfAny(spark, root).fold(vectors)(d =>
      vectors.join(d, Seq("vec_id"), "left_anti"))
  }

  /** Top-k cosine neighbors from the persisted store for an explicit
    * query relation (query_id, qv): ADC prefilter over the stored
    * packed codes to `candidates` per query (auto: the corpus-scaled
    * [[Pq.autoCandidates]] covering depth), exact cosine rerank from
    * the stored vectors — the [[Pq.knnPqRerank]] stages over storage.
    * External query ids are their OWN namespace: no self-exclusion
    * (the [[IvfIndex.query]] contract).
    */
  def query(spark: SparkSession, dir: String, queries: DataFrame,
      k: Int = 5, candidates: Int = 0): DataFrame =
    queryFrom(spark, StoreVersioning.requireRoot(spark, dir),
      queries.select(col("query_id"), col("qv"))
        .withColumn("qn", sqrt(Similarity.dot(col("qv"), col("qv")))),
      k, candidates, excludeSelf = false)

  /** Self-query convenience mirroring [[Pq.knnPqRerank]]'s gate
    * contract: the live stored vectors with vec_id < nQueries query
    * the store, self-pairs excluded. On a fresh full-corpus store
    * this equals the in-session knnPqRerank bit-for-bit (same
    * codebook lineage, same stages); `candidates` >= the store size
    * makes the prefilter exhaustive and the result equal to brute
    * force whatever the codebook.
    */
  def querySelf(spark: SparkSession, dir: String, k: Int = 5,
      nQueries: Long = 5, candidates: Int = 0): DataFrame = {
    val root = StoreVersioning.requireRoot(spark, dir)
    val q = liveVectors(spark, root)
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        col("norm").as("qn"))
    queryFrom(spark, root, q, k, candidates, excludeSelf = true)
  }

  /** Shared tail: both entries resolve the version root ONCE so a
    * racing commit can never mix generations.
    */
  private def queryFrom(spark: SparkSession, root: String, q: DataFrame,
      k: Int, candidates: Int, excludeSelf: Boolean): DataFrame = {
    val b = codebookOf(spark, root)
    val enc = liveVectors(spark, root)
    val depth =
      if (candidates > 0) candidates
      // parquet-metadata count of the raw store (pre-tombstone): a
      // depth bound only needs the right scale, not exactness
      else Pq.autoCandidates(spark.read.parquet(vectorsPath(root)).count())
    val nQ = q.count()
    Pq.requireRerankBound(nQ, depth)
    // this path broadcasts the qtab query side unconditionally
    // (Pq.pqRank), so the width cap applies — unlike IvfPqStore's
    // size-gated hint
    Pq.requireQtabBroadcastBound(nQ)
    val qt = Pq.withQtab(q, b).select(col("query_id"), col("qtab"), col("qn"))
    val cand = Pq.pqRank(
        enc.select(col("vec_id"), col("pcodes"), col("pq_norm")),
        qt, b, Seq.empty, excludeSelf)
      .filter(col("crk") <= depth)
      .select(col("query_id"), col("neighbor_id"))
    Pq.exactRerank(enc, q, cand, k)
  }
}
