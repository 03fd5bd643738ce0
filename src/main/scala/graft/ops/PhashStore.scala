package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted perceptual-fingerprint store — decode the kept corpus
  * ONCE, dedup every future payload batch against stored 64-bit
  * hashes. One lifecycle for every fingerprint modality: the
  * in-session operators ([[Dedup.imagePhashNearDup]],
  * [[Dedup.audioFpNearDup]]) are the right SHAPE for payload dedup
  * but the wrong LIFECYCLE for scheduled ingest — every run would
  * re-decode the full historical corpus, and at scale the codec (not
  * the banded join) dominates every batch. This store is the payload
  * counterpart of [[DedupStore]] (grams → fingerprints), under the
  * same [[StoreVersioning versioned root]] (rebuilds and compactions
  * commit by marker creation, never by overwriting live data):
  *
  *  - `fps/`     — the decoded (corpus_id, hash) relation: a batch
  *    run band-joins TWO pruned BIGINT columns instead of re-decoding
  *    payload bytes. Partitioned by ingest id, so appends are
  *    idempotent (see [[append]]).
  *  - `deletes/` — the tombstone relation ([[delete]]).
  *
  * After a batch is vetted, [[append]] adds the kept payloads'
  * fingerprints in place — the store grows with the corpus, no
  * re-decode, no rebuild. The banded candidate join, the exact
  * popcount cut and the pigeonhole-exactness guarantee
  * (`maxDist < nBands` ⇒ output == brute force) are the
  * [[Dedup.hammingNearDup]] contract applied two-sided, so the gate
  * rows replay the same brute-Hamming DuckDB oracle through the
  * persisted path.
  *
  * The modality enters through exactly one seam ([[fingerprint]] —
  * which decoder appends which hash column); everything else (the
  * versioned lifecycle, idempotent appends, tombstones, compaction,
  * stats, the banded store join) is shared, so [[PhashStore]] (image
  * dHash) and [[AfpStore]] (audio energy fingerprint) cannot drift
  * apart, and a future video modality is one decoder away.
  *
  * @param storeName the store's `_META` identity and lock-holder name
  * @param hashCol   the stored BIGINT fingerprint column
  * @param rowNoun   what one stored row is, for [[stats]] column names
  *                  (`n_<rowNoun>`, `n_live_<rowNoun>`)
  */
private[graft] abstract class FingerprintStore(
    val storeName: String, val hashCol: String, rowNoun: String) {

  /** The modality seam: append the nullable BIGINT fingerprint column
    * named [[hashCol]] to `docs` (null for undecodable payloads —
    * they drop at the null-hash filter downstream).
    */
  protected def fingerprint(docs: DataFrame, payloadCol: String): DataFrame

  private def fpsPath(root: String) = s"$root/fps"
  private def deletesPath(root: String) = s"$root/deletes"

  /** Physical-layout version of the fingerprint relation (v1:
    * ingest-keyed since the store's introduction).
    */
  private val Layout = 1L

  private def fpsDdl = s"corpus_id BIGINT, $hashCol BIGINT, ingest STRING"

  private def requireLayout(spark: SparkSession, root: String): Unit = {
    // ONE _META read for both checks (dedupAgainst runs per
    // streaming micro-batch; a second sidecar read would double the
    // per-batch metadata round-trips on a remote filesystem)
    val meta = StoreVersioning.metaOf(spark, root)
    // the two fingerprint stores share one physical layout, so the
    // layout check alone would let a misrouted stage read an IMAGE
    // store as audio (or vice versa) and die on a missing-column
    // analysis error — refuse by identity first, loudly
    meta.get("store").foreach(s =>
      require(s == storeName,
        s"$storeName at $root: the committed root was built by $s — " +
          "point this stage at the right store directory"))
    StoreVersioning.requireLayout(spark, root, storeName, "fps", Layout, meta)
  }

  /** The validated, decoded (corpus_id, hash) relation of a corpus:
    * payloads prune to the two needed columns BEFORE the decode,
    * undecodable rows drop at the null-hash filter, and ids ride the
    * strict integral guard ([[Dedup.hammingBase]] — shared, not
    * copied).
    */
  private def fingerprints(docs: DataFrame, idCol: String,
      payloadCol: String): DataFrame =
    Dedup.hammingBase(
        fingerprint(docs.select(col(idCol), col(payloadCol)), payloadCol),
        idCol, hashCol)
      .select(col("id").as("corpus_id"), col("h").as(hashCol))

  /** Build the store at `dir`: one decode pass over the kept corpus,
    * fingerprints landed in a FRESH version root, committed by marker
    * creation. A crashed rebuild leaves the old version untouched and
    * still committed; the recovery is to run save again.
    */
  def save(corpus: DataFrame, dir: String, idCol: String = "doc_id",
      payloadCol: String = "payload"): Unit = {
    val spark = corpus.sparkSession
    StoreVersioning.withMaintainerLock(spark, dir, s"$storeName.save") {
      val v = StoreVersioning.nextVersion(spark, dir)
      write(corpus, s"$dir/$v", "0", full = true, idCol, payloadCol)
      StoreVersioning.writeMeta(spark, s"$dir/$v", Seq(
        "store" -> storeName,
        "layout" -> Layout.toString,
        "train_fingerprint" -> StoreVersioning.trainFingerprint(corpus),
        "train_content_fingerprint" ->
          StoreVersioning.contentFingerprint(corpus)))
      StoreVersioning.commit(spark, dir, v)
    }
  }

  /** Add newly-kept payloads to the committed store as ingest
    * partition `ingestId` — one decode pass over the NEW payloads
    * only; other ingests' files are untouched. `ingestId` names the
    * batch and makes the append IDEMPOTENT: the write is a dynamic
    * partition overwrite of exactly this ingest's subtree, so
    * re-running a failed append with the same id replaces its own
    * partial output instead of double-storing fingerprints.
    */
  def append(docs: DataFrame, dir: String, ingestId: String,
      idCol: String = "doc_id", payloadCol: String = "payload"): Unit = {
    require(ingestId.nonEmpty && ingestId != "0",
      "ingestId must be a non-empty batch name other than the reserved \"0\"")
    StoreVersioning.withMaintainerLock(docs.sparkSession, dir,
        s"$storeName.append") {
      val root = StoreVersioning.requireRoot(docs.sparkSession, dir)
      requireLayout(docs.sparkSession, root)
      write(docs, root, ingestId, full = false, idCol, payloadCol)
    }
  }

  private def write(docs: DataFrame, root: String, ingestId: String,
      full: Boolean, idCol: String, payloadCol: String): Unit = {
    val w = fingerprints(docs, idCol, payloadCol)
      .withColumn("ingest", lit(ingestId))
      .write.mode("overwrite").partitionBy("ingest")
    (if (full) w else w.option("partitionOverwriteMode", "dynamic"))
      .parquet(fpsPath(root))
  }

  /** Retract payloads from the store WITHOUT rewriting it: takedown
    * ids land in a tombstone relation and [[dedupAgainst]] anti-joins
    * them out of the fingerprint relation — retraction is immediate,
    * dead rows are physically reclaimed by the next [[compact]] or
    * [[save]].
    */
  def delete(docIds: DataFrame, dir: String): Unit =
    StoreVersioning.withMaintainerLock(docIds.sparkSession, dir,
        s"$storeName.delete") {
      val root = StoreVersioning.requireRoot(docIds.sparkSession, dir)
      // identity-checked like every other verb: a takedown routed at
      // the OTHER modality's store would otherwise tombstone that
      // store's rows while the intended retraction silently never
      // happens — the exact silent-non-retraction class requireLongIds
      // exists to refuse
      requireLayout(docIds.sparkSession, root)
      val ids = StoreVersioning.requireLongIds(docIds, "corpus_id")
      ids.write.mode("append").parquet(deletesPath(root))
    }

  private def readRel(spark: SparkSession, path: String,
      ddl: String): DataFrame = StoreVersioning.readRel(spark, path, ddl)

  private def deletesIfAny(spark: SparkSession,
      root: String): Option[DataFrame] =
    StoreVersioning.deletesIfAny(spark, deletesPath(root))

  /** Rewrite the store from its own contents into a FRESH version:
    * fingerprints minus the tombstoned payloads, collapsed to one
    * ingest — dead rows reclaimed and per-append file growth
    * re-bounded WITHOUT touching payload bytes (no re-decode; the
    * store is its own source). A crashed compaction destroys nothing.
    */
  def compact(spark: SparkSession, dir: String): Unit =
      StoreVersioning.withMaintainerLock(spark, dir, s"$storeName.compact") {
    val root = StoreVersioning.requireRoot(spark, dir)
    requireLayout(spark, root)
    val v = StoreVersioning.nextVersion(spark, dir)
    val newRoot = s"$dir/$v"
    val del = deletesIfAny(spark, root)
    val live0 = readRel(spark, fpsPath(root), fpsDdl).drop("ingest")
    val live = del.fold(live0)(d => live0.join(d, Seq("corpus_id"), "left_anti"))
    live.withColumn("ingest", lit("0"))
      .write.mode("overwrite").partitionBy("ingest").parquet(fpsPath(newRoot))
    // lineage carries over verbatim (the store is its own source)
    StoreVersioning.writeMeta(spark, newRoot,
      StoreVersioning.metaOf(spark, root).toSeq.sortBy(_._1))
    StoreVersioning.commit(spark, dir, v)
  }

  /** Maintenance introspection — same contract as
    * [[DedupStore.stats]]: fragmentation and dead-row signals as one
    * audit row; aggregate scalars only, store untouched.
    */
  def stats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val root = StoreVersioning.requireRoot(spark, dir)
    requireLayout(spark, root)
    val meta = StoreVersioning.metaOf(spark, root)
    val fps = readRel(spark, fpsPath(root), fpsDdl)
    val del = deletesIfAny(spark, root)
    val nRows = fps.count()
    val nTomb = del.fold(0L)(_.select(col("corpus_id")).distinct().count())
    val nLive = del.fold(nRows)(d =>
      fps.join(d, Seq("corpus_id"), "left_anti").count())
    Seq((StoreVersioning.versionOf(root),
        fps.select(col("ingest").cast("string")).distinct().count(),
        StoreVersioning.dataFileCount(spark, fpsPath(root)),
        nRows, nTomb, nLive,
        meta.getOrElse("layout", "unknown"),
        meta.getOrElse("train_fingerprint", "unknown")))
      .toDF("version", "n_ingests", "n_fp_files",
        s"n_$rowNoun", "n_tombstoned", s"n_live_$rowNoun",
        "layout", "train_fingerprint")
  }

  /** Flag incoming payloads whose fingerprint is within Hamming
    * `maxDist` of anything already kept in the STORE: decode the
    * incoming batch ONLY, band both sides, equi-join on
    * (band_ix, band_value), exact-popcount verify — the
    * [[Dedup.hammingNearDup]] shape two-sided, with the same
    * pigeonhole guarantee (`maxDist < nBands` ⇒ output == the brute
    * cross join). Tombstones prune at the fingerprint relation so
    * retracted payloads never generate candidates.
    */
  def dedupAgainst(spark: SparkSession, incoming: DataFrame, dir: String,
      maxDist: Int = 3, nBands: Int = 4, idCol: String = "doc_id",
      payloadCol: String = "payload"): DataFrame = {
    // one copy of the banding scheme + pigeonhole bound (Dedup's):
    // a change to either lands once or the store path would silently
    // diverge from hammingNearDup's pinned contract
    Dedup.requireBands(maxDist, nBands)
    val root = StoreVersioning.requireRoot(spark, dir)
    requireLayout(spark, root)
    val inc = fingerprints(incoming, idCol, payloadCol)
      .select(col("corpus_id").as("inc_id"), col(hashCol).as("ih"))
    val stored0 = readRel(spark, fpsPath(root), fpsDdl)
    val stored = deletesIfAny(spark, root).fold(stored0)(d =>
      stored0.join(d, Seq("corpus_id"), "left_anti"))
    Dedup.bandedProjection(inc, "ih", nBands)
      .join(Dedup.bandedProjection(
          stored.select(col("corpus_id"), col(hashCol)), hashCol, nBands),
        Seq("bix", "bval"))
      .filter(bit_count(col("ih").bitwiseXOR(col(hashCol))) <= maxDist)
      .select(col("inc_id"), col("corpus_id"),
        bit_count(col("ih").bitwiseXOR(col(hashCol)))
          .cast("bigint").as("hamming"))
      .distinct()
      .orderBy(col("inc_id"), col("corpus_id"))
  }
}

/** The image instance: [[Multimodal.imagePhash]] (imageio decode →
  * 9×8 integer gray grid → dHash) feeds the shared
  * [[FingerprintStore]] lifecycle.
  */
object PhashStore extends FingerprintStore("PhashStore", "phash", "images") {
  protected def fingerprint(docs: DataFrame, payloadCol: String): DataFrame =
    Multimodal.imagePhash(docs, payloadCol)
}

/** The audio instance: [[Multimodal.audioFingerprint]] (javax.sound
  * decode → silence trim → 72-block integer energy grid → dHash)
  * feeds the SAME lifecycle — a scheduled audio-curation pipeline
  * dedups new clips against the kept corpus without re-decoding it,
  * exactly like images.
  */
object AfpStore extends FingerprintStore("AfpStore", "afp", "clips") {
  protected def fingerprint(docs: DataFrame, payloadCol: String): DataFrame =
    Multimodal.audioFingerprint(docs, payloadCol)
}
