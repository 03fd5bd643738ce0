package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted dedup gram store — shingle the kept corpus ONCE, dedup
  * every future batch against storage.
  *
  * [[Dedup.dedupAgainstCorpus]] is the right SHAPE for daily-ingest
  * dedup but the wrong LIFECYCLE at scale: it re-reads and re-shingles
  * the full historical corpus every run (the in-session memo only
  * helps within one JVM), and at 100 TB the tokenize+explode of the
  * kept side — not the join — is the dominant cost of every batch.
  * This store is the production lifecycle, Spark-native. Under a
  * [[StoreVersioning versioned root]] (rebuilds and compactions
  * commit by marker creation, never by overwriting live data):
  *
  *  - `grams/`  — the exploded (corpus_id, shingle) relation, the
  *    inverted-index side of candidate generation, precomputed and
  *    columnar: a batch run SCANS it (two pruned columns) instead of
  *    re-deriving it from text. Partitioned by ingest id, so appends
  *    are idempotent (see [[append]]).
  *  - `sizes/`  — (corpus_id, nb), the per-doc distinct-shingle count
  *    the Jaccard union term needs, so the store never re-aggregates
  *    its own grams.
  *  - `deletes/` — the tombstone relation ([[delete]]).
  *
  * After a batch is vetted, [[append]] adds the kept documents'
  * grams+sizes in place — the store grows with the corpus, no rebuild.
  * The candidate join, the integer 2·|∩| ≥ |∪| cut ([[Dedup.dupPair]],
  * shared, not copied) and the output contract are bit-identical to
  * the in-session operator, so the driver gate row replays the SAME
  * DuckDB oracle as `x_dedup_incremental` through the persisted path.
  */
object DedupStore {

  private def gramsPath(root: String) = s"$root/grams"
  private def sizesPath(root: String) = s"$root/sizes"
  private def deletesPath(root: String) = s"$root/deletes"

  /** Physical-layout version of the gram/size relations (v1:
    * ingest-keyed since the store's introduction) — `_META` + layout
    * gate, the [[IvfIndex]] convention.
    */
  private val Layout = 1L

  private def requireLayout(spark: SparkSession, root: String): Unit =
    StoreVersioning.requireLayout(spark, root, "DedupStore", "grams", Layout)

  /** Build the store at `dir`: one shingle pass over the kept corpus,
    * grams and sizes landed in a FRESH version root, committed by
    * marker creation. A crashed rebuild leaves the old version — data
    * AND its still-applied tombstones — untouched and still committed;
    * the recovery is to run save again. A successful commit prunes
    * superseded versions (which is also what resets tombstones: the
    * fresh version contains only what `corpus` holds).
    */
  def save(corpus: DataFrame, dir: String): Unit = {
    val spark = corpus.sparkSession
    StoreVersioning.withMaintainerLock(spark, dir, "DedupStore.save") {
      val v = StoreVersioning.nextVersion(spark, dir)
      write(corpus, s"$dir/$v", "0", full = true)
      StoreVersioning.writeMeta(spark, s"$dir/$v", Seq(
        "store" -> "DedupStore",
        "layout" -> Layout.toString,
        "train_fingerprint" -> StoreVersioning.trainFingerprint(corpus),
        "train_content_fingerprint" -> StoreVersioning.contentFingerprint(corpus)))
      StoreVersioning.commit(spark, dir, v)
    }
  }

  /** Add newly-kept documents to the committed store as ingest
    * partition `ingestId` — one shingle pass over the NEW documents
    * only; other ingests' files are untouched.
    *
    * `ingestId` names the batch (a date, a run id) and makes the
    * append IDEMPOTENT: the write is a dynamic partition overwrite of
    * exactly this ingest's subtree, so re-running a failed or
    * ambiguous append with the same id replaces its own partial
    * output instead of double-counting grams (doubled grams would
    * double every |∩| and flag non-duplicates). The recovery story
    * for any append failure is therefore: run the same append again.
    */
  def append(docs: DataFrame, dir: String, ingestId: String): Unit = {
    require(ingestId.nonEmpty && ingestId != "0",
      "ingestId must be a non-empty batch name other than the reserved \"0\"")
    StoreVersioning.withMaintainerLock(docs.sparkSession, dir,
        "DedupStore.append") {
      val root = StoreVersioning.requireRoot(docs.sparkSession, dir)
      requireLayout(docs.sparkSession, root)
      write(docs, root, ingestId, full = false)
    }
  }

  private def write(docs: DataFrame, root: String, ingestId: String,
      full: Boolean): Unit = {
    // a LOCAL persist, not the bounded plan-hash memo: a store build
    // runs once per corpus (per JVM at most, behind the gate's
    // build-once guard), so memoizing its shingle relation would only
    // burn memo slots — and the memo's evict-ALL-on-overflow disposal
    // means two build-side keys can flush every relation the rest of
    // the session still reads (the r3 churn class, measured as a
    // suite-wide 1.3× inflation when the build entries shared the
    // memo)
    val sh = Dedup.shingled(docs).persist()
    try {
      // a full build writes into a fresh version root (no live data
      // at the target, so the session's partitionOverwriteMode is
      // irrelevant); an append dynamically overwrites only its own
      // ingest partition (idempotent retry) — pinned explicitly so a
      // cluster-wide static default can't widen it to the whole table
      def writer(df: DataFrame) = {
        val w = df.withColumn("ingest", lit(ingestId))
          .write.mode("overwrite").partitionBy("ingest")
        if (full) w else w.option("partitionOverwriteMode", "dynamic")
      }
      writer(sh.select(col("doc_id").as("corpus_id"),
          explode(col("g")).as("shingle")))
        .parquet(gramsPath(root))
      writer(sh.select(col("doc_id").as("corpus_id"),
          size(col("g")).as("nb")))
        .parquet(sizesPath(root))
    } finally { sh.unpersist(); () }
  }

  /** Retract documents from the store WITHOUT rewriting it: parquet
    * is immutable and the gram relation is the store's bulk, so a
    * takedown (GDPR erasure, license retraction, a batch later found
    * contaminated) appends ids to a TOMBSTONE relation instead, and
    * [[dedupAgainst]] anti-joins it out of the gram relation.
    * Tombstoned docs stop matching immediately; their dead grams are
    * physically reclaimed by the next [[compact]] or [[save]].
    */
  def delete(docIds: DataFrame, dir: String): Unit =
    StoreVersioning.withMaintainerLock(docIds.sparkSession, dir,
        "DedupStore.delete") {
      val root = StoreVersioning.requireRoot(docIds.sparkSession, dir)
      val ids = StoreVersioning.requireLongIds(docIds, "corpus_id")
      ids.write.mode("append").parquet(deletesPath(root))
    }

  private def readRel(spark: SparkSession, path: String,
      ddl: String): DataFrame = StoreVersioning.readRel(spark, path, ddl)

  private def deletesIfAny(spark: SparkSession,
      root: String): Option[DataFrame] =
    StoreVersioning.deletesIfAny(spark, deletesPath(root))

  /** Rewrite the store from its own contents into a FRESH version:
    * grams and sizes minus the tombstoned docs, collapsed to one
    * ingest — dead rows reclaimed and the per-append file growth
    * re-bounded WITHOUT touching document text (no re-shingling; the
    * store is its own source). Run it on the maintenance cadence a
    * 100 TB store needs after a season of daily appends and
    * takedowns. The new version reads from the OLD committed root and
    * lands beside it, so a crashed compaction destroys nothing
    * (the old version stays the committed one) and the
    * recovery is to run compact again.
    */
  def compact(spark: SparkSession, dir: String): Unit =
      StoreVersioning.withMaintainerLock(spark, dir, "DedupStore.compact") {
    val root = StoreVersioning.requireRoot(spark, dir)
    requireLayout(spark, root)
    val v = StoreVersioning.nextVersion(spark, dir)
    val newRoot = s"$dir/$v"
    val del = deletesIfAny(spark, root)
    def live(df: DataFrame): DataFrame =
      del.fold(df)(d => df.join(d, Seq("corpus_id"), "left_anti"))
    def land(df: DataFrame, to: String): Unit =
      df.withColumn("ingest", lit("0"))
        .write.mode("overwrite").partitionBy("ingest").parquet(to)
    land(live(readRel(spark, gramsPath(root),
        "corpus_id BIGINT, shingle STRING, ingest STRING").drop("ingest")),
      gramsPath(newRoot))
    land(live(readRel(spark, sizesPath(root),
        "corpus_id BIGINT, nb INT, ingest STRING").drop("ingest")),
      sizesPath(newRoot))
    // lineage carries over verbatim (the store is its own source)
    StoreVersioning.writeMeta(spark, newRoot,
      StoreVersioning.metaOf(spark, root).toSeq.sortBy(_._1))
    StoreVersioning.commit(spark, dir, v)
  }

  /** Maintenance introspection — the one-row relation an operator (or
    * a scheduled maintenance job) reads to decide WHEN to compact,
    * instead of compacting blind on a cron: `n_gram_files` against
    * `n_ingests` is the fragmentation signal (every append lands
    * fresh files), `n_tombstoned / n_docs` the dead-row ratio
    * (tombstones cost an anti-join on every batch until a compaction
    * reclaims them). Pure introspection: aggregate scalars only (the
    * allowed k-row driver class), no corpus collect, store untouched.
    */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = StoreVersioning.requireRoot(spark, dir)
    requireLayout(spark, root)
    val meta = StoreVersioning.metaOf(spark, root)
    val grams = readRel(spark, gramsPath(root),
      "corpus_id BIGINT, shingle STRING, ingest STRING")
    val sizes = readRel(spark, sizesPath(root),
      "corpus_id BIGINT, nb INT, ingest STRING")
    val del = deletesIfAny(spark, root)
    val nDocs = sizes.count()
    val nTomb = del.fold(0L)(_.select(col("corpus_id")).distinct().count())
    val nLive = del.fold(nDocs)(d =>
      sizes.join(d, Seq("corpus_id"), "left_anti").count())
    Seq((StoreVersioning.versionOf(root),
        // partition-value inference types an all-numeric ingest as int
        sizes.select(col("ingest").cast("string")).distinct().count(),
        StoreVersioning.dataFileCount(spark, gramsPath(root)),
        grams.count(), nDocs, nTomb, nLive,
        meta.getOrElse("layout", "unknown"),
        meta.getOrElse("train_fingerprint", "unknown")))
      .toDF("version", "n_ingests", "n_gram_files", "n_grams",
        "n_docs", "n_tombstoned", "n_live_docs",
        "layout", "train_fingerprint")
  }

  /** Flag incoming documents with a verified trigram-Jaccard
    * near-duplicate already in the STORE: same inverted-index
    * candidate generation, integer cut and output columns as
    * [[Dedup.dedupAgainstCorpus]] — only the historical side reads
    * precomputed grams instead of re-shingling text. The incoming
    * side (today's batch) still shingles in-session; it's the small
    * side by construction.
    */
  def dedupAgainst(spark: SparkSession, incoming: DataFrame,
      dir: String): DataFrame =
    dedupShingled(spark, Dedup.corpusShingles(incoming), dir)

  /** [[dedupAgainst]] from an already-shingled (doc_id, g) relation —
    * the entry the STREAMING form uses: a micro-batch must not pass
    * through the plan-hash-keyed shingle memo (every batch has a
    * distinct plan; a stream would thrash the bounded cache and
    * unpersist relations the batch session still reads).
    */
  private[graft] def dedupShingled(spark: SparkSession, inc: DataFrame,
      dir: String): DataFrame = {
    val root = StoreVersioning.requireRoot(spark, dir)
    val incTok = inc.select(col("doc_id").as("inc_id"),
      explode(col("g")).as("shingle"))
    // tombstones prune at the GRAM relation (broadcast anti join on a
    // takedown-sized id set) so retracted docs never even generate
    // candidates; when no tombstone exists the path is untouched
    val deletes = deletesIfAny(spark, root)
    val corpTok0 = readRel(spark, gramsPath(root),
      "corpus_id BIGINT, shingle STRING, ingest STRING")
    val corpTok = deletes.fold(corpTok0)(del =>
      corpTok0.join(del, Seq("corpus_id"), "left_anti"))
    val sizes = readRel(spark, sizesPath(root),
      "corpus_id BIGINT, nb INT, ingest STRING")
    incTok.join(corpTok, Seq("shingle"))
      .groupBy(col("inc_id"), col("corpus_id"))
      .agg(count(lit(1)).as("inter"))
      .join(inc.select(col("doc_id").as("inc_id"), size(col("g")).as("na")),
        "inc_id")
      .join(sizes, "corpus_id")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(Dedup.dupPair(col("inter"), col("uni")))
      .select(col("inc_id"), col("corpus_id"),
        round(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
      .orderBy(col("inc_id"), col("corpus_id"))
  }
}
