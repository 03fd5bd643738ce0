package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.functions.RollingHash
import graft.ops.{AfpStore, Bpe, Chunking, CorpusStats, Dedup, DedupStore, Integrity, IvfIndex, IvfPqStore, Kmeans, Multimodal, PhashStore, Pq, PqStore, Profile, Quantize, Sampling, Search, Similarity, TextOps}
import graft.streaming.EventWindows

/** Training-data-pipeline extension operators (the part of the driver
  * north-star that goes beyond reference parity): deduplication,
  * similarity search, text analysis, multimodal plumbing, and windowed
  * event analytics — each a `queries` entry, DuckDB-oracled wherever
  * the computation is expressible in SQL (the MinHash-LSH and SimHash
  * paths share the brute-force oracle because their verified output
  * provably equals it on this corpus; only the approximate ANN paths
  * are rows-only — even the custom-expression rolling hash carries a
  * DuckDB fold that reproduces it bit-exactly).
  */
object Extensions {

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    Tables.table(s, d, name)

  // (storeDir below provides the scratch location for every
  // persisted-store gate row: JVM temp dir — the same class of
  // runtime scratch as shuffle spill — keyed by the fixture dir so
  // sf0.001/0.01/0.1 runs never share a store.)

  /** Gate blocklist: two terms the synthetic vocabulary contains and
    * one it never can, shared verbatim by the DuckDB oracle.
    */
  private val BlocklistTerms = Seq("spark", "dup", "quarantine")

  /** The rendered-image corpus behind the `x_dedup_image_*` gates:
    * each doc's distinct word bigrams map to bits 0..63 through an
    * integer polynomial (the exact rule the DuckDB oracles replay —
    * near-dup docs differ in a few bigrams → a few bits, distinct
    * docs disagree on ~half; measured bimodal at every SF), and the
    * bits render as a REAL grayscale PNG whose imageio decode + dHash
    * recovers them bit-for-bit (Multimodal.cellsForBits/grayCellsPng,
    * roundtrip spec-pinned) — so the gates pay the full production
    * decode path while the oracle works from replayable data.
    */
  /** The media gates' shared 64-bit derivation: each doc's distinct
    * word bigrams map to bits 0..63 through an integer polynomial —
    * near-dup docs differ in a few bigrams (a few bits), distinct
    * docs disagree on ~half, and DuckDB replays the rule as data
    * (phashBitsCte). Modality-independent: the IMAGE gates render the
    * bits as real PNGs, the AUDIO gates as real PCM WAVs — each
    * decode+fingerprint path recovers them exactly (spec-pinned
    * roundtrips), so both modalities share one oracle shape.
    */
  private def fixtureBits(s: SparkSession, d: String) = {
    import s.implicits._
    // the bigram -> bit-index polynomial lives in ONE place
    // (Multimodal.bigramBitIndex) shared with the prof harnesses
    val idx = Multimodal.bigramBitIndex(col("g"))
    // h = OR of (1 << n) over the doc's bigram indices. OR is
    // idempotent, so the per-(doc_id, n) distinct the collect_set
    // shape needed is unnecessary — one codegen'd bit_or aggregate
    // (map-side combinable) replaces distinct + collect_set + a typed
    // per-row fold: 2 shuffles → 1, no Scala closure, identical h
    // bit-for-bit (r19 opt; the DuckDB oracle rule is unchanged).
    t(s, d, "documents")
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"), explode(TextOps.ngramsOf(col("ws"), 2)).as("g"))
      .select(col("doc_id"),
        // SQL shiftleft takes a column bit count; the Scala helper
        // only accepts a literal Int, hence call_function
        call_function("shiftleft", lit(1L), idx.cast("int")).as("bit"))
      .groupBy(col("doc_id")).agg(bit_or(col("bit")).as("h"))
      .as[(Long, Long)]
  }

  private def phashRenderedDocs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    fixtureBits(s, d).map { case (id, h) =>
      (id, graft.ops.Multimodal.grayCellsPng(
        graft.ops.Multimodal.cellsForBits(h)))
    }.toDF("doc_id", "payload")
  }

  private def audioRenderedDocs(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    fixtureBits(s, d).map { case (id, h) =>
      (id, graft.ops.Multimodal.energyCellsWav(
        graft.ops.Multimodal.cellsForBits(h)))
    }.toDF("doc_id", "payload")
  }

  /** Build-once guard for the persisted-store gate rows (IVF index,
    * dedup gram store): the features' contract is build ONCE, query
    * MANY, so repeated in-JVM runs of the same gate row (the bench's
    * warm passes) measure the steady-state QUERY cost — the build
    * cost stays visible as the first pass of the bench's per-pass
    * vector, exactly like the PQ codebook fit. Verify's single pass
    * exercises the full loop.
    */
  private val builtStores =
    new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  // computeIfAbsent, not add-then-build: a build that THROWS leaves no
  // mapping (the next run retries instead of querying a half-written
  // store forever), and a concurrent second caller blocks until the
  // first build finishes instead of racing it mid-write
  private def buildStoreOnce(dir: String)(build: => Unit): Unit = {
    builtStores.computeIfAbsent(dir, _ => { build; true })
    ()
  }

  private def storeDir(d: String, tag: String): String = {
    // md5 of the fixture path, not String.hashCode: 32-bit collisions
    // across fixture dirs would silently share one mutable store.
    // (Same-fixture concurrency across JVMs is out of scope — the
    // driver runs Verify and Bench serially.)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    s"${System.getProperty("java.io.tmpdir")}/graft_store_${tag}_$md"
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- deduplication ------------------------------------------------------
    "x_dedup_exact" -> ((s, d) =>
      Dedup.exactByPrefix(t(s, d, "documents")).orderBy(col("k"))),

    "x_dedup_ngram_jaccard" -> ((s, d) =>
      Dedup.ngramJaccardBrute(t(s, d, "documents"))),

    // near-containment: |∩| >= 2/3 * min(|a|,|b|) — the asymmetric
    // subset-duplicate class (quote/copy-with-additions) Jaccard's
    // symmetric |∩|/|∪| structurally misses; integer cross-multiplied
    // cut, full hash oracle
    "x_dedup_containment" -> ((s, d) =>
      Dedup.containmentPairs(t(s, d, "documents"))),

    // the df-capped scale form: ubiquitous grams (df > 5 here) leave
    // the candidate index, survivors are exact-verified on the full
    // shingle arrays — deterministic given the cap, so fully oracled
    "x_dedup_containment_capped" -> ((s, d) =>
      Dedup.containmentPairsCapped(t(s, d, "documents"), maxGramDf = 5)),

    "x_dedup_ngram_prefix" -> ((s, d) =>
      Dedup.ngramJaccardPrefix(t(s, d, "documents"))),

    "x_dedup_minhash_lsh" -> ((s, d) =>
      Dedup.minhashLsh(t(s, d, "documents"))),

    "x_dedup_simhash" -> ((s, d) =>
      Dedup.simhashNearDup(t(s, d, "documents"))),

    // IMAGE near-dup by perceptual hash — the full production path
    // (imageio PNG decode → 9×8 gray grid → dHash → Hamming-banded
    // candidate equi-join → exact popcount verify) over a corpus of
    // REAL rendered images. The corpus derives from `documents` by a
    // DuckDB-replayable rule: each doc's distinct word bigrams map to
    // bits 0..63 through an integer polynomial (near-dup docs differ
    // in a few bigrams → a few bits; distinct docs disagree on ~half,
    // measured bimodal at every SF), and the bits render as a real
    // grayscale PNG whose decode+dHash recovers them exactly
    // (Multimodal.cellsForBits/grayCellsPng — spec-pinned roundtrip).
    // With maxDist < nBands the banding has pigeonhole-exact recall,
    // so the oracle is the brute Hamming join over the same bits.
    "x_dedup_image_phash" -> ((s, d) =>
      Dedup.imagePhashNearDup(phashRenderedDocs(s, d), "doc_id", "payload")
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          col("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))),

    // image-modality cluster collapse: the SAME min-label propagation
    // the text pairs use, but identical phashes group to one
    // representative BEFORE the banded candidate join (hammingClusters)
    // — the viral-duplicate mode costs one band row per distinct hash,
    // never an intra-group pair set; output bit-equal to the pairwise
    // closure (spec-pinned), oracle = recursive transitive closure
    // over the brute Hamming pairs, unchanged
    "x_dedup_image_clusters" -> ((s, d) =>
      Dedup.imagePhashClusters(phashRenderedDocs(s, d), "doc_id", "payload")),

    // AUDIO near-dup by energy fingerprint — the last dedup modality
    // next to text/embedding/image: real WAV decode (javax.sound) →
    // silence trim → 72-block integer energy grid → dHash bits → the
    // same exact Hamming-banded join. The corpus renders the SAME
    // bigram-polynomial bits the image gates use as real PCM WAVs
    // whose decode+fingerprint recovers them exactly (energyCellsWav
    // roundtrip, spec-pinned), so the oracle is the brute Hamming
    // join over the replayed bits — identical shape to the image gate.
    "x_dedup_audio_fp" -> ((s, d) =>
      Dedup.audioFpNearDup(audioRenderedDocs(s, d), "doc_id", "payload")
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          col("hamming"))
        .orderBy(col("doc_a"), col("doc_b"))),

    // the persisted image-fingerprint store: the kept corpus decodes
    // ONCE into (corpus_id, phash) storage (PhashStore — the DedupStore
    // lifecycle applied to the image modality); the batch run
    // band-joins two pruned BIGINT columns instead of re-decoding the
    // history. Candidate join + exact popcount cut are the
    // hammingNearDup contract two-sided (maxDist < nBands ⇒ output ==
    // the brute cross join), so the gate replays the brute Hamming
    // oracle through the persisted path
    "x_dedup_image_store" -> ((s, d) => {
      val docs = phashRenderedDocs(s, d)
      val dir = storeDir(d, "phash_full")
      buildStoreOnce(dir)(
        PhashStore.save(docs.filter(col("doc_id") % 10 =!= 0), dir))
      PhashStore.dedupAgainst(s, docs.filter(col("doc_id") % 10 === 0), dir)
    }),

    // growth path: half the kept corpus lands at save, the other half
    // through an idempotent ingest-keyed append — same output, same
    // oracle, so the append machinery is pinned hash-exact
    "x_dedup_image_store_append_check" -> ((s, d) => {
      val docs = phashRenderedDocs(s, d)
      val dir = storeDir(d, "phash_half")
      buildStoreOnce(dir) {
        val kept = docs.filter(col("doc_id") % 10 =!= 0)
        PhashStore.save(kept.filter(col("doc_id") % 2 === 0), dir)
        PhashStore.append(kept.filter(col("doc_id") % 2 =!= 0), dir, "day1")
      }
      PhashStore.dedupAgainst(s, docs.filter(col("doc_id") % 10 === 0), dir)
    }),

    // external-id-namespace batch against the FULL stored corpus: the
    // incoming ids live in a namespace the store has never seen (the
    // pq_store_external_check convention), and incoming copies of
    // stored images flag themselves at hamming 0
    "x_dedup_image_store_external_check" -> ((s, d) => {
      val docs = phashRenderedDocs(s, d)
      val dir = storeDir(d, "phash_all")
      buildStoreOnce(dir)(PhashStore.save(docs, dir))
      PhashStore.dedupAgainst(s,
        docs.filter(col("doc_id") % 10 === 7)
          .select((col("doc_id") * 1000 + 1).as("doc_id"), col("payload")),
        dir)
    }),

    // audio cluster collapse: identical fingerprints group to one
    // representative before banding (hammingClusters — the r19
    // collapse); oracle = recursive transitive closure over the brute
    // Hamming pairs
    "x_dedup_audio_clusters" -> ((s, d) =>
      Dedup.audioFpClusters(audioRenderedDocs(s, d), "doc_id", "payload")),

    // the persisted AUDIO fingerprint store — AfpStore is the same
    // FingerprintStore lifecycle as PhashStore with the audio decoder
    // at the modality seam, so the three gate rows mirror the image
    // trio: build/query split, save+append growth, and an
    // external-id-namespace batch — each replaying the brute Hamming
    // oracle through the persisted path (the bits are the image
    // gates' bigram-polynomial rule rendered as WAVs)
    "x_dedup_audio_store" -> ((s, d) => {
      val docs = audioRenderedDocs(s, d)
      val dir = storeDir(d, "afp_full")
      buildStoreOnce(dir)(
        AfpStore.save(docs.filter(col("doc_id") % 10 =!= 0), dir))
      AfpStore.dedupAgainst(s, docs.filter(col("doc_id") % 10 === 0), dir)
    }),

    "x_dedup_audio_store_append_check" -> ((s, d) => {
      val docs = audioRenderedDocs(s, d)
      val dir = storeDir(d, "afp_half")
      buildStoreOnce(dir) {
        val kept = docs.filter(col("doc_id") % 10 =!= 0)
        AfpStore.save(kept.filter(col("doc_id") % 2 === 0), dir)
        AfpStore.append(kept.filter(col("doc_id") % 2 =!= 0), dir, "day1")
      }
      AfpStore.dedupAgainst(s, docs.filter(col("doc_id") % 10 === 0), dir)
    }),

    "x_dedup_audio_store_external_check" -> ((s, d) => {
      val docs = audioRenderedDocs(s, d)
      val dir = storeDir(d, "afp_all")
      buildStoreOnce(dir)(AfpStore.save(docs, dir))
      AfpStore.dedupAgainst(s,
        docs.filter(col("doc_id") % 10 === 7)
          .select((col("doc_id") * 1000 + 1).as("doc_id"), col("payload")),
        dir)
    }),

    "x_dedup_clusters" -> ((s, d) =>
      Dedup.dupClusters(t(s, d, "documents"))),

    // canonical selection by quality: each cluster keeps its
    // highest-distinct-word-count member (ties to smaller id),
    // singletons pass through without touching the window
    "x_dedup_keep_best" -> ((s, d) =>
      Dedup.keepBestPerCluster(t(s, d, "documents"))),

    // substring-granularity dedup: per-doc count + merged-span word
    // coverage of 5-word windows that recur verbatim in OTHER docs
    "x_dedup_spans" -> ((s, d) =>
      Dedup.duplicateSpans(t(s, d, "documents"))),

    // the dedup ACTION the statistic above measures: reconstruct each
    // doc with every cross-doc duplicated window removed (ExactSubstr
    // deletion at n-gram granularity) — clean_text re-joins kept
    // tokens in original order
    "x_dedup_span_remove" -> ((s, d) =>
      Dedup.spanRemove(t(s, d, "documents"))),

    // within-doc counterpart, keep-first: windows repeating earlier
    // in the SAME doc are deleted (echo/boilerplate scrub) — a pure
    // projection, no shuffle at all
    "x_dedup_within_doc" -> ((s, d) =>
      Dedup.withinDocRemove(t(s, d, "documents"))),

    // deterministic 80/10/10 split by md5 bucket — stable under
    // retries/partitioning AND recomputable by any engine with md5,
    // which is what makes the assignment auditable (and oracled)
    "x_split_assign" -> ((s, d) =>
      Sampling.assignSplits(
          t(s, d, "documents").select(col("doc_id")),
          "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy(col("doc_id"))),

    // leakage-PROOF variant: the split key is the near-dup cluster
    // label, so dup pairs can never straddle a train/eval cut — the
    // contamination x_split_leakage measures, prevented by
    // construction
    "x_split_cluster_safe" -> ((s, d) =>
      Dedup.assignSplitsClusterSafe(t(s, d, "documents"))),

    // benchmark decontamination: corpus docs sharing ≥5 distinct
    // trigrams with the (tiny, broadcast) benchmark slice — the
    // keep-eval-out-of-training curation step, as an inverted-index
    // join, never an all-pairs scan
    "x_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.decontaminate(
        docs.filter(col("doc_id") >= 50),
        docs.filter(col("doc_id") < 50))
    }),

    // the decontamination ACTION: delete every corpus window that
    // appears verbatim in the benchmark slice — the n-gram-level
    // eval-overlap scrub (the detector above flags; this removes)
    "x_decontaminate_remove" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.decontaminateRemove(
        docs.filter(col("doc_id") >= 50),
        docs.filter(col("doc_id") < 50))
    }),

    // composed corpus-cleaning pipeline — the operators working
    // together the way a training-data pipeline uses them: repetition
    // quality gates (integer arithmetic — no float boundary), then
    // near-dup clusters keep only their canonical survivor. Fully
    // SQL-expressible, so the whole composition carries one oracle.
    "x_pipeline_corpus_clean" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val rep = TextOps.repetitionColumns(col("text")).toMap
      val gated = docs.select(col("doc_id"),
          rep("n_words").as("n_words"),
          rep("n_distinct_words").as("n_distinct_words"))
        .filter(col("n_words") >= 10 &&
          col("n_distinct_words") * 2 >= col("n_words"))
      val dupDropped = Dedup.dupClusters(docs)
        .filter(col("cluster_id") =!= col("doc_id"))
        .select(col("doc_id"))
      gated.join(dupDropped, Seq("doc_id"), "left_anti")
        .orderBy(col("doc_id"))
    }),

    // end-to-end data card: the curation funnel per (source, lang) —
    // raw docs → Gopher gates → near-dup survivors → weighted sample.
    // Every stage is ANNOTATED (a flag column), not filtered, so ONE
    // aggregation reports all four counts; the near-dup pair set rides
    // the memoized MinHash path and the whole composition carries a
    // single DuckDB oracle.
    "x_pipeline_datacard" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val keepGate = TextOps.gopherGateColumns(col("text")).toMap.apply("keep")
      val dupDropped = Dedup.dupClusters(docs)
        .filter(col("cluster_id") =!= col("doc_id"))
        .select(col("doc_id"), lit(1).as("is_dup"))
      val sampled = Sampling.bucketOf(col("doc_id")) <
        Sampling.cutFor(col("source"),
          Seq("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25), 0.1)
      docs.join(dupDropped, Seq("doc_id"), "left")
        .select(col("source"), col("lang"), keepGate.as("g"),
          (coalesce(col("is_dup"), lit(0)) === 0).as("nodup"), sampled.as("smp"))
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("g"), 1L).otherwise(0L)).as("n_gated"),
          sum(when(col("g") && col("nodup"), 1L).otherwise(0L)).as("n_deduped"),
          sum(when(col("g") && col("nodup") && col("smp"), 1L).otherwise(0L))
            .as("n_sampled"))
        .orderBy(col("source"), col("lang"))
    }),

    // curation report v2 — the third-batch composition: per source,
    // how much substring-level duplication the corpus carries (span
    // coverage share) and how the domain cap bites (kept vs raw),
    // one aggregation over the annotated doc-level relations
    "x_pipeline_curation_v2" -> ((s, d) => {
      val docs = t(s, d, "documents")
      // spans already carries n_words per doc (annotate-don't-filter:
      // one row per doc), and source+score ride ONE extra projection —
      // the report pays two corpus scans beyond the span substrate's
      // own, not four
      val spans = Dedup.duplicateSpans(docs)
        .select(col("doc_id"), col("n_words"), col("n_dup_windows"),
          col("dup_words"))
      val scored = docs.select(col("doc_id"), col("source"),
        TextOps.distinctWordCount(col("text")).as("score"))
      val kept = Sampling.capPerGroup(scored, "source", "doc_id", "score", 10)
        .select(col("doc_id"), lit(1L).as("kept"))
      scored.select(col("doc_id"), col("source"))
        .join(spans, "doc_id")
        .join(kept, Seq("doc_id"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(coalesce(col("kept"), lit(0L))).as("n_kept"),
          sum(when(col("n_dup_windows") > 0, 1L).otherwise(0L)).as("n_with_dups"),
          sum(col("dup_words")).as("dup_words"),
          sum(col("n_words").cast("long")).as("n_words"))
        .withColumn("dup_word_share",
          col("dup_words").cast("double") / col("n_words"))
        .orderBy(col("source"))
    }),

    // split-leakage audit: how many verified near-dup pairs span two
    // different train/val/test splits — the eval-contamination check a
    // pipeline runs after splitting. Reported as counts per
    // (split_a, split_b) cell over ALL near-dup pairs, so the
    // same-split diagonal anchors the report; rides the memoized
    // MinHash pair set, splits join by the auditable md5 bucket.
    "x_split_leakage" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val splits = Sampling.assignSplits(docs.select(col("doc_id")), "doc_id",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split"))
      Dedup.minhashLsh(docs).select(col("doc_a"), col("doc_b"))
        .join(splits.withColumnsRenamed(
          Map("doc_id" -> "doc_a", "split" -> "split_a")), "doc_a")
        .join(splits.withColumnsRenamed(
          Map("doc_id" -> "doc_b", "split" -> "split_b")), "doc_b")
        .groupBy(col("split_a"), col("split_b"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L))
            .as("n_leaked"))
        .orderBy(col("split_a"), col("split_b"))
    }),

    "x_dedup_embedding" -> ((s, d) =>
      Dedup.embeddingCosinePairs(t(s, d, "embeddings"))),

    "x_dedup_embedding_ann" -> ((s, d) =>
      Similarity.embeddingNearDupAnn(t(s, d, "embeddings"))),

    // PQ-accelerated near-dup (the two-lever ANN layout applied to
    // dedup): the cell join carries 16-BYTE packed codes instead of
    // 256 B vectors, pairs are SDC-prescored on codes alone, and full
    // vectors are fetched only for margin-survivors. At all-cells
    // probes + the measured covering margin the output equals the
    // exact baseline bit-for-bit, so it shares its full DuckDB oracle
    "x_dedup_embedding_pq" -> ((s, d) =>
      Pq.embeddingNearDupPq(t(s, d, "embeddings"))),

    // ---- similarity search --------------------------------------------------
    "x_knn_brute" -> ((s, d) =>
      Similarity.knnBrute(t(s, d, "embeddings"))),

    // PQ (product quantization) two-stage retrieval: 16-subspace ×
    // 32-code (5-bit) ADC prefilter to an n-scaled candidate depth
    // (max(400, n/5) — `Pq.autoCandidates`), exact cosine rerank to
    // top-5 — at this covering depth the output equals brute
    // bit-for-bit, so the memory-bound production index shape
    // (16–25× smaller resident codes) carries the FULL brute oracle
    // instead of a recall sibling
    "x_knn_pq_rerank" -> ((s, d) =>
      Pq.knnPqRerank(t(s, d, "embeddings"))),

    // persisted PQ store, build-once-query-many (kills the codebook
    // cold fit for every later job/JVM — the r13 verdict's top item):
    // codebook + packed codes + vectors land under a versioned root;
    // the query reads them back and runs the SAME prefilter/rerank
    // stages, so the whole build→persist→read→query loop shares the
    // full brute oracle at the same covering depth as x_knn_pq_rerank
    "x_knn_pq_store" -> ((s, d) => {
      val dir = storeDir(d, "pq_full")
      buildStoreOnce(dir)(PqStore.save(t(s, d, "embeddings"), dir))
      PqStore.querySelf(s, dir)
    }),

    // incremental growth: the even half BUILDS (codebook trained on
    // it), the odd half APPENDS through the STORED codebook — no
    // refit, the production contract. Queried at EXHAUSTIVE candidate
    // depth (>= store size) the ADC prefilter passes every pair, so
    // equality with brute holds whatever the codebook — the gate pins
    // the append machinery itself (stored-codebook encode, ingest
    // partition append, no vector lost or duplicated), the
    // x_knn_ivf_index_append_check convention
    "x_knn_pq_store_append_check" -> ((s, d) => {
      val dir = storeDir(d, "pq_half")
      val e = t(s, d, "embeddings")
      buildStoreOnce(dir) {
        PqStore.save(e.filter(col("vec_id") % 2 === 0), dir)
        PqStore.append(e.filter(col("vec_id") % 2 === 1), dir, "odd")
      }
      PqStore.querySelf(s, dir, candidates = e.count().toInt)
    }),

    // the COMPOSED persisted index (IVF cells bound which FILES a
    // query reads via dynamic partition pruning; PQ bounds the BYTES
    // per scanned row to m packed bytes — both levers in one storage
    // artifact, the canonical production ANN layout). Queried at
    // nProbe == nCells + exhaustive depth the result equals brute by
    // construction, so the whole build→persist→query loop carries the
    // full brute oracle; the plan spec pins both levers firing
    "x_knn_ivfpq_store" -> ((s, d) => {
      val dir = storeDir(d, "ivfpq_full")
      val e = t(s, d, "embeddings")
      buildStoreOnce(dir)(IvfPqStore.save(e, dir, nCells = 16))
      IvfPqStore.querySelf(s, dir, nProbe = 16, candidates = e.count().toInt)
    }),

    // growth path of the composition: stored-centroid assignment +
    // stored-codebook encode, idempotent ingest partitions — exact vs
    // brute at exhaustive settings whatever either quantizer learned
    "x_knn_ivfpq_store_append_check" -> ((s, d) => {
      val dir = storeDir(d, "ivfpq_half")
      val e = t(s, d, "embeddings")
      buildStoreOnce(dir) {
        IvfPqStore.save(e.filter(col("vec_id") % 2 === 0), dir, nCells = 16)
        IvfPqStore.append(e.filter(col("vec_id") % 2 === 1), dir, "odd")
      }
      IvfPqStore.querySelf(s, dir, nProbe = 16, candidates = e.count().toInt)
    }),

    // incremental embedding dedup/decontamination THROUGH the
    // persisted composition: today's batch (the first 5 vectors, an
    // external id namespace) flags every stored vector whose cosine
    // clears 0.3 — without re-reading the corpus. Gate runs at
    // nProbe == nCells + a pass-all margin, so the pair set provably
    // equals the exact brute pairs and carries a full oracle;
    // production probes/margins are the recall knobs
    "x_dedup_embedding_store" -> ((s, d) => {
      val dir = storeDir(d, "ivfpq_full")
      val e = t(s, d, "embeddings")
      buildStoreOnce(dir)(IvfPqStore.save(e, dir, nCells = 16))
      val incoming = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      IvfPqStore.dedupAgainst(s, dir, incoming,
        minCosine = 0.3, nProbe = 16, margin = 2.0)
    }),

    // external-namespace queries against the composition, exhaustive
    // settings: each relabeled query finds its stored twin at rank 1
    "x_knn_ivfpq_store_external_check" -> ((s, d) => {
      val dir = storeDir(d, "ivfpq_full")
      val e = t(s, d, "embeddings")
      buildStoreOnce(dir)(IvfPqStore.save(e, dir, nCells = 16))
      val q = e.filter(col("vec_id") >= 100 && col("vec_id") < 105)
        .select((col("vec_id") - 100).as("query_id"),
          col("embedding").as("qv"))
      IvfPqStore.query(s, dir, q, k = 5, nProbe = 16,
        candidates = e.count().toInt)
    }),

    // EXTERNAL queries against the persisted PQ store: query ids are
    // their own namespace (vec_id 100..104 relabeled 0..4 — a
    // deliberate collision with stored ids), so the stored vector
    // with the colliding id must still be a candidate and each query
    // finds ITSELF at rank 1; exhaustive depth makes the equality
    // hold by construction (the x_knn_ivf_index_external_check
    // convention)
    "x_knn_pq_store_external_check" -> ((s, d) => {
      val dir = storeDir(d, "pq_full")
      val e = t(s, d, "embeddings")
      buildStoreOnce(dir)(PqStore.save(e, dir))
      val q = e.filter(col("vec_id") >= 100 && col("vec_id") < 105)
        .select((col("vec_id") - 100).as("query_id"),
          col("embedding").as("qv"))
      PqStore.query(s, dir, q, k = 5, candidates = e.count().toInt)
    }),

    // IVF × PQ composed (the canonical FAISS-style layout) at
    // nProbe == nCells: probing every cell makes the candidate stream
    // equal the full PQ scan's, so the composition shares the brute
    // oracle and the gate pins the cell machinery + ADC + rerank
    "x_knn_pq_ivf_check" -> ((s, d) =>
      Pq.knnPqIvf(t(s, d, "embeddings"), nCells = 16, nProbe = 16)),

    // int8 quantization audit — self-dot computed via the array fold
    // AND via the packed-binary codegen expressions, side by side, so
    // the hash compare pins the native pack/dot to the formula on
    // every corpus vector
    "x_embed_quantize" -> ((s, d) =>
      Quantize.quantizeProfile(t(s, d, "embeddings"))),

    // per-DIMENSION code diagnostics (collapsed/saturated dims) —
    // integer sums are order-independent, so unlike a float-mean
    // profile this is bit-exact under any partitioning
    "x_embed_dim_profile" -> ((s, d) =>
      Quantize.dimensionProfile(t(s, d, "embeddings"))),

    // quantized dimension co-moment matrix — the whitening/OPQ-prep
    // statistic: exact integer second moments from ONE corpus scan,
    // covariance as a fixed IEEE division of exact integers
    "x_embed_dim_cov" -> ((s, d) =>
      Quantize.dimCovariance(t(s, d, "embeddings"))),

    // embedding-side curation datacard composing the round-11
    // families: per semantic cluster its size, lattice inertia,
    // norm-outlier count, label diversity, and the deterministic
    // md5-rank-1 exemplar — the per-topic health table a mixture
    // decision reads; one oracle for the whole composition
    // curation pipeline v4 — the round-13 family composed into one
    // per-doc verdict, first matching reason wins:
    //   exact       NFC-folded 3-word-prefix key has an earlier doc
    //   short       no trigrams to judge (annotate, don't vanish)
    //   boilerplate trigram novelty below 25 % (hapax share in ppm)
    //   contained   the larger id of a df-capped containment pair
    // All-integer decisions → one full DuckDB hash oracle over the
    // whole composition
    "x_pipeline_curation_v4" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("text"))
      val ntext = TextOps.nfc(col("text"))
      val key = concat_ws(" ",
        (1 to 3).map(i => try_element_at(split(ntext, " "), lit(i))): _*)
      // checkpointed (r20 opt): `keyed` feeds both sides of the
      // exactKeep join, and each side otherwise re-ran the NFC
      // normalization + split over the full text column. (doc_id, k)
      // rows only — 3 words per doc.
      val keyed = graft.ops.PlanAudit.checkpointed(
        docs.select(col("doc_id"), key.as("k")))
      val exactKeep = keyed.join(
        keyed.groupBy(col("k")).agg(min(col("doc_id")).as("keep_id")), "k")
        .select(col("doc_id"), (col("doc_id") === col("keep_id")).as("is_first"))
      // the RAW table feeds the shingle consumers (r20 opt): the
      // shingle substrate memo keys on the docs PLAN, and a
      // (doc_id, text) projection here built a second persisted
      // substrate next to the one the x_dedup_* legs already share —
      // shingling only ever reads doc_id/text, so the output is
      // unchanged
      val novelty = CorpusStats.gramNovelty(t(s, d, "documents"))
        .select(col("doc_id"), col("novelty_ppm"))
      val contained = Dedup.containmentPairsCapped(t(s, d, "documents"),
          maxGramDf = 5)
        .select(col("doc_b").as("doc_id")).distinct()
        .withColumn("is_contained", lit(true))
      docs.select(col("doc_id"))
        .join(exactKeep, "doc_id")
        .join(novelty, "doc_id")
        .join(contained, Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(!col("is_first"), "exact")
            .when(col("novelty_ppm").isNull, "short")
            .when(col("novelty_ppm") < 250000, "boilerplate")
            .when(coalesce(col("is_contained"), lit(false)), "contained")
            .as("reason"))
        .select(col("doc_id"),
          col("reason").isNull.cast("int").as("keep"), col("reason"))
        .orderBy(col("doc_id"))
    }),

    // curation pipeline v5 — v4's verdict composed with the TRAINED
    // classifier (the GPT-3-style quality-filter loop end to end:
    // train on the md5 split, score the WHOLE corpus, threshold):
    // one new precedence class after `contained` —
    //   lowscore  the doc's own-label score is negative (its tokens
    //             anti-correlate with its declared label)
    // Integer model, integer score, first-match CASE → the whole
    // composition still carries one full DuckDB hash oracle
    "x_pipeline_curation_v5" -> ((s, d) => {
      val docs = t(s, d, "documents")
        .select(col("doc_id"), col("text"), col("lang"))
      val ntext = TextOps.nfc(col("text"))
      val key = concat_ws(" ",
        (1 to 3).map(i => try_element_at(split(ntext, " "), lit(i))): _*)
      // checkpointed — the curation_v4 rationale (keyed feeds both
      // join sides)
      val keyed = graft.ops.PlanAudit.checkpointed(
        docs.select(col("doc_id"), key.as("k")))
      val exactKeep = keyed.join(
        keyed.groupBy(col("k")).agg(min(col("doc_id")).as("keep_id")), "k")
        .select(col("doc_id"), (col("doc_id") === col("keep_id")).as("is_first"))
      // raw table for the shingle consumers — the curation_v4
      // rationale (one shared substrate memo entry)
      val novelty = CorpusStats.gramNovelty(t(s, d, "documents"))
        .select(col("doc_id"), col("novelty_ppm"))
      val contained = Dedup.containmentPairsCapped(t(s, d, "documents"),
          maxGramDf = 5)
        .select(col("doc_b").as("doc_id")).distinct()
        .withColumn("is_contained", lit(true))
      val scores = graft.ops.Classify.ownLabelScore(docs)
      docs.select(col("doc_id"))
        .join(exactKeep, "doc_id")
        .join(novelty, "doc_id")
        .join(contained, Seq("doc_id"), "left")
        .join(scores, "doc_id")
        .select(col("doc_id"),
          when(!col("is_first"), "exact")
            .when(col("novelty_ppm").isNull, "short")
            .when(col("novelty_ppm") < 250000, "boilerplate")
            .when(coalesce(col("is_contained"), lit(false)), "contained")
            .when(col("score") < 0, "lowscore")
            .as("reason"),
          col("score"))
        .select(col("doc_id"),
          col("reason").isNull.cast("int").as("keep"), col("reason"),
          col("score"))
        .orderBy(col("doc_id"))
    }),

    "x_pipeline_curation_v3" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val asg = Kmeans.kmeansAssign(e)
      val outs = Quantize.embeddingOutliers(e)
        .select(col("vec_id"), col("is_outlier"))
      val ex = Kmeans.clusterSample(e, n = 1)
        .select(col("cluster"), col("vec_id").as("exemplar_id"))
      asg.join(outs, "vec_id")
        .join(e.select(col("vec_id"), col("label")), "vec_id")
        .groupBy(col("cluster"))
        .agg(count(lit(1)).as("n"),
          sum(col("dist2")).as("inertia"),
          sum(col("is_outlier").cast("long")).as("n_outliers"),
          countDistinct(col("label")).as("n_labels"))
        .join(ex, "cluster")
        .orderBy(col("cluster"))
    }),

    // norm-outlier audit on the exact lattice: vectors whose integer
    // self-dot falls in the 2%/98% type-1 quantile tails (broken /
    // truncated / blown-up embeddings) — all-integer, fully oracled
    "x_embed_outliers" -> ((s, d) =>
      Quantize.embeddingOutliers(t(s, d, "embeddings"))),

    // the 100-TB form of the audit: thresholds from the mergeable GK
    // sketch — no corpus-sized single-task window anywhere in the
    // plan. Sketch internals are engine-specific → rows-only here;
    // accuracy is hash-pinned by the _check sibling below
    "x_embed_outliers_sketch" -> ((s, d) =>
      Quantize.embeddingOutliersSketch(t(s, d, "embeddings"))),

    // accuracy gate: exact ±5-rank-point envelope values (replayable
    // integer rank lattice) with ok pinned to 1 by the oracle, so
    // sketch-threshold drift turns the driver gate red
    "x_embed_outliers_sketch_check" -> ((s, d) =>
      Quantize.embeddingOutliersSketchCheck(t(s, d, "embeddings"))),

    // deterministic Lloyd's k-means on the int8 lattice: lowest-id
    // seeds, integer distances (ties to lowest cluster), floor-mean
    // updates, fixed iterations — bit-identical under any
    // partitioning, so the full assignment table is hash-oracled
    // where the float IVF quantizer had to stay rows-only
    "x_embed_kmeans" -> ((s, d) =>
      Kmeans.kmeansAssign(t(s, d, "embeddings"))),

    // cluster x label composition + lattice inertia — the purity /
    // mixture report cluster-stratified curation quotas read
    "x_embed_kmeans_purity" -> ((s, d) =>
      Kmeans.kmeansPurity(t(s, d, "embeddings"))),

    // per-iteration training curve of the lattice fit: assigned
    // count + total inertia against each centroid trail element —
    // the fit audit (floor-mean can nudge a step; the curve shows it)
    "x_embed_kmeans_fit" -> ((s, d) =>
      Kmeans.kmeansFitReport(t(s, d, "embeddings"))),

    // per-cluster topic terms: lattice assignment × document corpus
    // (vec_id = doc_id), top-5 by in-cluster df after the integer
    // df-cap stopword cut — the label a topic cluster needs before a
    // keep/downsample/drop curation decision
    "x_embed_cluster_topics" -> ((s, d) =>
      Kmeans.clusterTopics(t(s, d, "embeddings"), t(s, d, "documents"))),

    // SemDeDup (Abbas et al. 2023) on the lattice cells: greedy
    // keep-first semantic dedup, candidates bounded per cluster,
    // integer cross-multiplied cosine cut — fully hash-oracled where
    // a float-threshold semantic dedup couldn't be
    "x_dedup_semantic" -> ((s, d) =>
      Kmeans.semanticDedup(t(s, d, "embeddings"))),

    // IVF over the deterministic lattice cells: hash-oracled ANN at
    // PRODUCTION probe counts (the float-quantizer IVF can only be
    // hash-checked in its probe-everything degenerate form) —
    // reproducibly approximate, which is what an audited retrieval
    // pipeline needs from its index
    "x_knn_ivf_lattice" -> ((s, d) =>
      Kmeans.knnIvfLattice(t(s, d, "embeddings"))),

    // n md5-ordered vectors per semantic cluster — the deterministic
    // topic-balanced draw a curation mixture starts from
    "x_sample_cluster" -> ((s, d) =>
      Kmeans.clusterSample(t(s, d, "embeddings"))),

    // per-cluster occupancy drift (the mixtureDrift contract on the
    // semantic clustering): parity split as the deterministic epoch
    // stand-in, both halves against the ONE memoized fit; the flag
    // compares cross-multiplied exact integers, so the cut is
    // hash-oracled — the batch contract the streaming trigger
    // (StreamingKmeans.streamingClusterDrift) is spec-pinned to
    "x_embed_cluster_drift" -> ((s, d) =>
      Kmeans.kmeansOccupancyDrift(t(s, d, "embeddings"))),

    // semantic decontamination: corpus vectors near ANY benchmark
    // vector (first 25 ids as the held-out set) — the paraphrase
    // leakage the n-gram x_decontaminate cannot see
    "x_decontaminate_embedding" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      Similarity.embeddingDecontaminate(
        e.filter(col("vec_id") >= 25), e.filter(col("vec_id") < 25),
        minCosine = 0.3)
    }),

    // top-k by QUANTIZED cosine over packed int8 codes — deterministic
    // rounding, so unlike the float ANN paths this carries a full
    // value oracle (DuckDB recomputes codes, integer dots, ranking)
    "x_knn_quantized" -> ((s, d) =>
      Quantize.knnQuantized(t(s, d, "embeddings"))),

    // IVF cell blocking + int8 scoring composed; nProbe == nCells
    // probes every cell, so the output provably equals knnQuantized
    // and the composition shares its full oracle (the
    // x_knn_classify_ivf_check pattern)
    "x_knn_quantized_ivf_check" -> ((s, d) =>
      Similarity.knnQuantizedIvf(t(s, d, "embeddings"),
        nCells = 16, nProbe = 16)),

    // approximate, but with a FULL value oracle: the hyperplanes are
    // deterministic literals, so DuckDB replicates bucketing +
    // multi-probe + top-k bit-exactly (see lshOracle below)
    "x_knn_lsh" -> ((s, d) =>
      Similarity.knnLsh(t(s, d, "embeddings"))),

    "x_knn_ivf" -> ((s, d) => // approximate at production probes: rows-only
      Similarity.knnIvf(t(s, d, "embeddings"))),

    // recall gate for the IVF path, queried EXHAUSTIVELY (nProbe ==
    // nCells): probing every cell scores every vector, so output ==
    // brute top-k by construction at ANY corpus and the full brute
    // oracle holds with no measured-covering assumption. r19 found
    // the round-15 nProbe=14 pin was only ever covering on
    // sf0.01/0.1 — at sf0.001 it missed 4 of 125 brute rows
    // (RecallCheck re-sweep this round: covering needs 16 there),
    // an inherited red the smaller-SF oracle run surfaced.
    // Production recall-at-probe curves stay measured by RecallCheck;
    // the GATE must be exact everywhere.
    "x_knn_ivf_recall" -> ((s, d) =>
      Similarity.knnIvf(t(s, d, "embeddings"), nProbe = 16)),

    // persisted IVF index, build-once-query-many: the index lands in
    // the JVM temp dir (runtime scratch, like shuffle spill; the
    // write is overwrite-idempotent per call), vectors PARTITIONED BY
    // cell so the probe join prunes partitions at the scan; queried
    // at the same exhaustive nProbe=16 as x_knn_ivf_recall (r19: the
    // nProbe=14 covering pin did not hold at sf0.001 — see that
    // gate's note), so the whole build→persist→read→query loop
    // shares the full brute oracle by construction
    "x_knn_ivf_index" -> ((s, d) => {
      val dir = storeDir(d, "ivf_full")
      buildStoreOnce(dir)(IvfIndex.save(t(s, d, "embeddings"), dir, nCells = 16))
      IvfIndex.querySelf(s, dir, nProbe = 16)
    }),

    // EXTERNAL queries against the same persisted index: query ids
    // are their own namespace (vec_id 100..104 relabeled 0..4 — a
    // deliberate collision with indexed ids), so the indexed vector
    // with the colliding id must still be a candidate and each query
    // finds ITSELF at rank 1 — the semantics an unconditional
    // self-exclusion filter silently broke; nProbe == nCells makes
    // the equality with the brute oracle hold by construction
    "x_knn_ivf_index_external_check" -> ((s, d) => {
      val dir = storeDir(d, "ivf_full")
      buildStoreOnce(dir)(IvfIndex.save(t(s, d, "embeddings"), dir, nCells = 16))
      val q = t(s, d, "embeddings")
        .filter(col("vec_id") >= 100 && col("vec_id") < 105)
        .select((col("vec_id") - 100).as("query_id"),
          col("embedding").as("qv"))
      IvfIndex.query(s, dir, q, k = 5, nProbe = 16)
    }),

    // incremental growth: the even half BUILDS (training the
    // quantizer on itself), the odd half APPENDS against the stored
    // centroids — no refit, the production contract. Queried at
    // nProbe == nCells every cell is probed and every indexed vector
    // scored, so equality with the brute oracle holds whatever the
    // centroids — the gate pins the append machinery itself
    // (stored-centroid assignment, partition append, no vector lost
    // or duplicated)
    "x_knn_ivf_index_append_check" -> ((s, d) => {
      val dir = storeDir(d, "ivf_half")
      val e = t(s, d, "embeddings")
      buildStoreOnce(dir) {
        IvfIndex.save(e.filter(col("vec_id") % 2 === 0), dir, nCells = 16)
        IvfIndex.append(e.filter(col("vec_id") % 2 === 1), dir, "odd")
      }
      IvfIndex.querySelf(s, dir, nProbe = 16)
    }),

    // kNN majority-vote label propagation from the first-250 seed set
    // — exact (broadcast seed, brute scoring), full DuckDB oracle
    "x_knn_classify" -> ((s, d) =>
      Similarity.knnClassify(t(s, d, "embeddings"))),

    // IVF cell-blocked classify at nProbe == nCells: probing every
    // cell scores every labeled vector, so equality with the exact
    // oracle is guaranteed BY CONSTRUCTION — the gate pins the cell
    // machinery (assignment, probe enumeration, no dup/dropped pairs,
    // vote tail), not recall. Production probe counts are a library
    // knob; on this fixture's 10 uniform random labels a vote-
    // agreement metric would measure tie-break churn, not quality
    // (RecallCheck sweep: top-k neighbor recall is the informative
    // measure, and x_knn_ivf_recall already gates it).
    "x_knn_classify_ivf_check" -> ((s, d) =>
      Similarity.knnClassifyIvf(t(s, d, "embeddings"),
        nCells = 16, nProbe = 16)),

    // same contract for the full-corpus ANN dedup path: at the PINNED
    // quantizer size, nProbe=14 is exhaustive-by-measurement on ALL
    // THREE fixture corpora (RecallCheck, round-15 fit), so the
    // (bounded region of the) ANN output equals the exact baseline
    // bit-for-bit (nCells is explicit because the production default
    // sizes cells ~√n, which would shift recall)
    "x_dedup_embedding_ann_recall" -> ((s, d) =>
      Similarity.embeddingNearDupAnn(t(s, d, "embeddings"),
        nCells = 16, nProbe = 14, boundA = 500)),

    // ---- text analysis ------------------------------------------------------
    "x_text_tokens" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        size(TextOps.words(col("text"))).as("n_words"),
        TextOps.bpeishTokenCount(col("text")).as("n_tokens"),
        col("n_chars"))
        .orderBy(col("doc_id"))),

    // Unicode NFC canonicalization (native nfc_norm expression) — the
    // normalize-before-text-keys step: decomposed accents fold to
    // their precomposed forms so dedup/shingle/fingerprint keys
    // can't split on byte-identical-looking text. The fixture corpus
    // is ASCII, so the query plants decomposed sequences (e+U+0301,
    // i+U+0308) to prove the fold; DuckDB's nfc_normalize replays it
    "x_text_normalize" -> ((s, d) => {
      val enriched = concat(col("text"), lit(" cafe\u0301 nai\u0308ve \u00e9"))
      val norm = call_function("nfc_norm", enriched)
      t(s, d, "documents").select(col("doc_id"),
          length(enriched).cast("int").as("n_pre"),
          length(norm).cast("int").as("n_post"),
          (length(enriched) - length(norm)).cast("int").as("n_folded"),
          md5(norm).as("fp_norm"))
        .orderBy(col("doc_id"))
    }),

    // the NfcNorm motivating scenario made executable: plant, per
    // sampled doc, a precomposed ("café résumé …") and a decomposed
    // ("cafe"+U+0301…) prefix-duplicate — byte-different, visually
    // identical. With `normalize = true` exact dedup folds both onto
    // one key (n_dups = 2); with the default OFF they survive apart
    // (spec-pinned in DedupSpec). DuckDB replays via nfc_normalize
    "x_dedup_exact_nfc" -> ((s, d) => {
      val base = t(s, d, "documents").select(col("doc_id"), col("text"))
      val sampled = base.filter(col("doc_id") % 7 === 0)
      val pre = sampled.select((col("doc_id") + 1000000L).as("doc_id"),
        concat(lit("caf\u00e9 r\u00e9sum\u00e9 "), col("text")).as("text"))
      val dec = sampled.select((col("doc_id") + 2000000L).as("doc_id"),
        concat(lit("cafe\u0301 re\u0301sume\u0301 "), col("text")).as("text"))
      Dedup.exactByPrefix(base.union(pre).union(dec), normalize = true)
        .orderBy(col("k"))
    }),

    "x_text_quality" -> ((s, d) => {
      val cols = TextOps.qualityColumns(col("text")).filterNot(_._1 == "n_chars")
        .map { case (n, c) => c.as(n) }
      t(s, d, "documents")
        .select(col("doc_id") +: length(col("text")).as("n_chars_calc") +: cols: _*)
        .orderBy(col("doc_id"))
    }),

    "x_text_langid" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"), col("lang"),
        TextOps.predictedLang(col("text")).as("pred"))
        .orderBy(col("doc_id"))),

    "x_text_repetition" -> ((s, d) => {
      val cols = TextOps.repetitionColumns(col("text")).map { case (n, c) => c.as(n) }
      t(s, d, "documents").select(col("doc_id") +: cols: _*).orderBy(col("doc_id"))
    }),

    // blocklist term filter (C4's badwords stage): tf hits, distinct
    // terms hit, annotate-don't-filter keep — one never-occurring term
    // in the list exercises the zero path on every doc
    "x_text_blocklist" -> ((s, d) => {
      val cols = TextOps
        .blocklistColumns(col("text"), BlocklistTerms)
        .map { case (n, c) => c.as(n) }
      t(s, d, "documents").select(col("doc_id") +: cols: _*)
        .orderBy(col("doc_id"))
    }),

    // the blocklist as a RELATION (the oversized-list form: token
    // join + per-doc re-aggregate, AQE-broadcast term side) — same
    // terms, same output contract, same oracle as the literal form
    "x_text_blocklist_rel" -> ((s, d) => {
      val sp = s; import sp.implicits._
      TextOps.blocklistJoin(
          t(s, d, "documents").select(col("doc_id"), col("text")),
          BlocklistTerms.toDF("term"))
        .orderBy(col("doc_id"))
    }),

    "x_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextOps.fingerprintMd5(col("text")).as("fp"),
        TextOps.fingerprintNormalized(col("text")).as("fp_norm"))
        .orderBy(col("doc_id"))),

    "x_fingerprint_rolling" -> ((s, d) => { // custom codegen Expression: rows-only
      RollingHash.register(s)
      t(s, d, "documents")
        .select(col("doc_id"), expr("rolling_hash(text)").as("fp"))
        .orderBy(col("doc_id"))
    }),

    // PII scrubbing: the fixture text carries no PII, so the query
    // first derives a deterministic PII-bearing variant from fixture
    // columns (both engines compute the identical construction), then
    // counts and redacts emails/phones/IPs — patterns restricted to
    // the Java-regex ∩ RE2 common subset so the oracle applies the
    // same ones
    "x_text_pii" -> ((s, d) => {
      val enriched = concat(
        substring(col("text"), 1, 40),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@mail.example or +1-555-"),
        lpad(col("doc_id").cast("string"), 4, "0"),
        lit(" from 10."), (col("doc_id") % 256).cast("string"), lit(".0.1"))
      val pii = TextOps.piiColumns(enriched).toMap
      t(s, d, "documents").select(col("doc_id"),
          pii("n_email").as("n_email"),
          pii("n_phone").as("n_phone"),
          pii("n_ip").as("n_ip"),
          md5(pii("redacted")).as("fp_redacted"))
        .orderBy(col("doc_id"))
    }),

    // Gopher-style composite quality gates — every rule an integer
    // comparison, so the booleans are bit-exact across engines
    "x_text_gopher" -> ((s, d) => {
      val gates = TextOps.gopherGateColumns(col("text")).map { case (n, c) => c.as(n) }
      t(s, d, "documents").select(col("doc_id") +: gates: _*).orderBy(col("doc_id"))
    }),

    // corpus-trained unigram frequency model applied back per doc —
    // the "train on the corpus, score the corpus" two-pass shape
    "x_text_unigram_rarity" -> ((s, d) =>
      CorpusStats.unigramRarity(t(s, d, "documents"))),

    // per-doc trigram novelty: share of the doc's distinct trigrams
    // appearing in no other document, in integer ppm — low = template/
    // boilerplate, high = fresh text; trigram-less docs report NULL
    "x_text_novelty" -> ((s, d) =>
      CorpusStats.gramNovelty(t(s, d, "documents"))),

    // per-doc keyword extraction: top-3 tokens by the integer
    // tf-over-df weight (tf·idf's cut on the lattice — the rare-token
    // reciprocal replaces the log); WindowGroupLimit prunes to ≤3
    // rows per doc before the final exchange
    "x_text_keywords" -> ((s, d) =>
      CorpusStats.docKeywords(t(s, d, "documents"))),

    // trained token-rate classifier (the fastText/logistic quality-
    // filter seam, on the integer lattice): train on the md5 split,
    // score held-out docs, argmax with deterministic ties — the
    // whole train-score loop is one plan, fully hash-oracled. The
    // synthetic corpus shares one vocabulary across langs, so
    // accuracy here is chance BY CONSTRUCTION (the fixture carries
    // no signal); ClassifySpec proves the learner reaches 100 % on a
    // separable corpus — the gate row pins determinism + oracle
    // parity at scale, the spec pins learning power
    "x_text_classify" -> ((s, d) =>
      graft.ops.Classify.tokenClassifierPredict(t(s, d, "documents"))),

    // its held-out confusion matrix — the eval table a filter
    // threshold decision reads
    "x_text_classify_confusion" -> ((s, d) =>
      graft.ops.Classify.tokenClassifierConfusion(t(s, d, "documents"))),

    // global heavy hitters: top-20 trigrams by document frequency
    "x_corpus_top_trigrams" -> ((s, d) =>
      CorpusStats.topTrigrams(t(s, d, "documents"))),

    // Misra-Gries two-pass form: bounded counters per partition, then
    // exact counts of the candidates only — self-certifying (throws
    // unless the k-th count provably exceeds the sketch debt), so it
    // shares the exact oracle bit-for-bit
    "x_corpus_top_trigrams_sketch" -> ((s, d) =>
      CorpusStats.topTrigramsSketch(t(s, d, "documents"))),

    // bigram LM novelty — corpus-trained transition probabilities in
    // exact integer ppm, the perplexity-filtering shape without a
    // float boundary
    "x_text_bigram_lm" -> ((s, d) =>
      CorpusStats.bigramLm(t(s, d, "documents"))),

    // held-out LM scoring: model trained on the src0 slice only,
    // every other doc scored against it (out-of-model bigrams → 0 ppm
    // + counted) — the clean-reference perplexity filter
    "x_text_bigram_lm_cross" -> ((s, d) =>
      CorpusStats.bigramLmCross(t(s, d, "documents"))),

    // cross-source duplication matrix over the verified near-dup
    // pairs — which sources mirror each other, before dedup picks
    // winners
    "x_dedup_source_matrix" -> ((s, d) =>
      Dedup.sourceDupMatrix(t(s, d, "documents"))),

    // rarest-first distinctive terms (df asc, tf desc) — a
    // deterministic integer proxy for tf·idf, no float idf to diverge
    "x_text_top_terms" -> ((s, d) =>
      CorpusStats.topTermsPerDoc(t(s, d, "documents"))),

    // BM25 ranked retrieval on the exact-integer ppm lattice: log-free
    // odds-ratio idf + integer-cleared tf saturation, so the top-k
    // carries a full value oracle with zero float risk; the postings
    // relation is query-term-filtered BEFORE any aggregation
    "x_search_bm25" -> ((s, d) =>
      Search.bm25TopK(t(s, d, "documents"))),

    // exact-phrase (positional) search, occurrence-counted: one
    // corpus scan with a codegen'd positional fold, then a bounded
    // TakeOrdered top-k — no shuffle carries corpus-sized data
    "x_search_phrase" -> ((s, d) =>
      Search.phraseSearch(t(s, d, "documents"), Seq("batch", "batch"))),

    // multi-query BM25: three queries scored in one corpus pass,
    // per-query top-k via a query-partitioned window
    "x_search_bm25_multi" -> ((s, d) =>
      Search.bm25TopKMulti(t(s, d, "documents"))),

    // conjunctive (AND) search: only docs containing EVERY query term
    // rank — the n_hit == |terms| filter before the top-k
    "x_search_bm25_conj" -> ((s, d) =>
      Search.bm25TopKConj(t(s, d, "documents"))),

    // BPE tokenizer training substrate: first-iteration adjacent
    // character-pair weights (the full trainer bpeMerges is pinned by
    // an in-JVM reference fold; this one-shot query carries the
    // complete oracle for the shared counting machinery)
    "x_text_bpe_pairs" -> ((s, d) =>
      Bpe.bpePairCounts(t(s, d, "documents"))),

    // ENCODE half of the tokenizer: per-doc token accounting under the
    // pinned merge table — Spark applies the left-to-right
    // non-overlapping symbol fold per distinct word; the oracle
    // replays the same merges as a replace-chain over a private-use
    // char encoding (a different formulation of the same semantics)
    "x_text_bpe_tokens" -> ((s, d) =>
      Bpe.bpeEncodeTokens(t(s, d, "documents"), Bpe.PinnedMerges)),

    // character-level near-dup: PassJoin-style chunk index + banded
    // levenshtein verify; provably equals the brute all-pairs filter
    "x_dedup_edit_distance" -> ((s, d) =>
      Dedup.editDistancePairs(t(s, d, "documents"))),

    // ANALYZE-style one-pass numeric column profile
    "x_profile_lineitem" -> ((s, d) =>
      Profile.columnProfile(t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))),

    // exact per-source length percentiles (type-1 at integer-rational
    // ranks) — the grouped form approx_percentile can't give
    // bit-exactly; mixture/truncation decisions read this table
    "x_profile_group_quantiles" -> ((s, d) =>
      Profile.quantilesByGroup(t(s, d, "documents"), "source", "n_chars")),

    // the 100 TB path for the same statistic: per-group GK sketch, no
    // per-group sort — engine-specific values, so rows-only; accuracy
    // pinned by the hash-matched check sibling below
    "x_profile_group_quantiles_sketch" -> ((s, d) =>
      Profile.quantilesByGroupSketch(t(s, d, "documents"), "source", "n_chars")),

    // exact ±5-rank-point envelope per (group, pct) with ok pinned to
    // 1 by the oracle — grouped-sketch drift turns the gate red
    "x_profile_group_quantiles_sketch_check" -> ((s, d) =>
      Profile.quantilesByGroupSketchCheck(t(s, d, "documents"), "source", "n_chars")),

    // pairwise Pearson correlations on the exact-integer moment
    // lattice (order-independent sums; the IEEE division/sqrt tail is
    // a fixed expression over exact inputs → full hash oracle)
    "x_profile_corr" -> ((s, d) =>
      Profile.corrReport(t(s, d, "lineitem"), Seq(
        "qty" -> col("l_quantity"),
        "tax_pct" -> round(col("l_tax") * 100),
        "disc_pct" -> round(col("l_discount") * 100)))),

    // rebalance the skewed lang mixture to the minority language:
    // corpus-derived integer bucket cuts, md5-deterministic keeps
    "x_mixture_rebalance" -> ((s, d) =>
      Sampling.rebalanceSummary(t(s, d, "documents"), "lang", "doc_id")),

    // DoReMi-lite mixture PLANNER: per source its actual token share
    // vs a uniform target and the integer downsampling rate landing
    // the target — the strata-sized decision table a mixture
    // rebalance reads first; one groupBy + a 1-row scalar attach
    "x_mix_plan" -> ((s, d) =>
      Sampling.mixturePlan(t(s, d, "documents"))),

    // the plan APPLIED as a per-doc annotation: keep = md5 bucket
    // under the stratum's keep rate — deterministic survival, so the
    // whole plan→apply loop is hash-oracled end to end
    "x_mix_apply" -> ((s, d) =>
      Sampling.mixtureApply(t(s, d, "documents"))),

    // stratified sample: 5 deterministic pseudo-random docs per lang
    "x_sample_stratified" -> ((s, d) =>
      Sampling.stratifiedSample(
          t(s, d, "documents").select(col("doc_id"), col("lang")),
          "lang", "doc_id", 5)
        .orderBy(col("lang"), col("rnk"))),

    // per-source quota (domain cap): keep the 10 best docs of every
    // source by distinct-word-count score; salted two-phase rank
    "x_sample_source_cap" -> ((s, d) => {
      val scored = t(s, d, "documents").select(col("doc_id"), col("source"),
        TextOps.distinctWordCount(col("text")).as("score"))
      Sampling.capPerGroup(scored, "source", "doc_id", "score", 10)
        .orderBy(col("doc_id"))
    }),

    // mixture drift: "today's batch" (doc_id ≡ 0 mod 10) vs the
    // standing corpus — per-cell share deltas, zero-filled so a
    // vanished stratum still alarms
    "x_corpus_drift" -> ((s, d) => {
      val docs = t(s, d, "documents")
      CorpusStats.mixtureDrift(
        docs.filter(col("doc_id") % 10 === 0),
        docs.filter(col("doc_id") % 10 =!= 0))
    }),

    // incremental dedup: "today's batch" (doc_id ≡ 0 mod 10) against
    // the already-kept corpus (the rest) — the daily-ingest shape
    "x_dedup_incremental" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.dedupAgainstCorpus(
        docs.filter(col("doc_id") % 10 === 0),
        docs.filter(col("doc_id") % 10 =!= 0))
    }),

    // the same batch dedup through the PERSISTED gram store: the kept
    // corpus's shingles land on storage once (here split save+append
    // to exercise the growth path too), and the batch run joins the
    // stored inverted index instead of re-shingling the history —
    // bit-identical cut and output, so it replays the same oracle
    "x_dedup_incremental_store" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val dir = storeDir(d, "dedup_grams")
      buildStoreOnce(dir) {
        val kept = docs.filter(col("doc_id") % 10 =!= 0)
        DedupStore.save(kept.filter(col("doc_id") % 2 === 0), dir)
        DedupStore.append(kept.filter(col("doc_id") % 2 =!= 0), dir, "day1")
      }
      DedupStore.dedupAgainst(s, docs.filter(col("doc_id") % 10 === 0), dir)
    }),

    // cross-table integrity audit (dbt-style relationship /
    // uniqueness / range checks) — one violation count per check,
    // passing checks visible as explicit zero rows
    "x_integrity_audit" -> ((s, d) =>
      Integrity.audit(n => t(s, d, n))),

    // fixed-width histogram over l_quantity (integral doubles 1..50)
    "x_profile_histogram" -> ((s, d) =>
      Profile.histogram(t(s, d, "lineitem"), "l_quantity", 1.0, 5.0)),

    // overlapping token-window chunking (50-token windows, stride 40)
    "x_text_chunk" -> ((s, d) =>
      Chunking.chunkDocs(t(s, d, "documents"))
        .orderBy(col("doc_id"), col("chunk_ix"))),

    // contiguous sequence packing into 512-token bins, per source shard
    "x_pack_sequences" -> ((s, d) =>
      Chunking.packSequences(t(s, d, "documents"), "source")),

    // event funnel view→click→purchase on each user's FIRST event of
    // each type; strict < drops ties identically in both engines
    "x_events_funnel" -> ((s, d) => {
      val per = t(s, d, "events").groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
      per.agg(
        sum(when(col("t_view").isNotNull, 1L).otherwise(0L)).as("n_view"),
        sum(when(col("t_view") < col("t_click"), 1L).otherwise(0L))
          .as("n_view_click"),
        sum(when(col("t_view") < col("t_click") &&
            col("t_click") < col("t_purchase"), 1L).otherwise(0L))
          .as("n_view_click_purchase"))
    }),

    // weighted mixture sampling: per-source keep rates (domain
    // reweighting) via the md5 bucket — no join, one codegen'd filter
    "x_sample_weighted" -> ((s, d) =>
      Sampling.weightedSample(
          t(s, d, "documents").select(col("doc_id"), col("source")),
          "source", "doc_id",
          Seq("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25),
          defaultRate = 0.1)
        .orderBy(col("doc_id"))),

    // corpus composition report: per (source, lang) counts + shares —
    // the data-card mixture table
    "x_corpus_mixture" -> ((s, d) =>
      CorpusStats.mixtureReport(t(s, d, "documents"))),

    // exact continuous quantiles, one output row per column
    "x_profile_quantiles" -> ((s, d) =>
      Profile.quantiles(t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice"))),

    // sketch profile (HLL distinct + approx percentiles): the
    // unbounded-domain scale path — rows-only, engine-specific sketch
    // internals; accuracy pinned against the exact profile in specs
    "x_profile_sketch" -> ((s, d) =>
      Profile.sketchProfile(t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice"))),

    // hash-matched accuracy gate for the sketch profile: per-column
    // integer pass/fail flags (HLL within 5 % of exact; each approx
    // percentile inside the exact ±5-rank-point envelope) that DuckDB
    // recomputes from the exact profile and pins to 1 — sketch drift
    // turns the driver gate red instead of hiding behind no_oracle
    "x_profile_sketch_check" -> ((s, d) =>
      Profile.sketchCheck(t(s, d, "lineitem"),
        Seq("l_quantity", "l_extendedprice"))),

    // winsorization report: exact p01/p99 clip bounds + clip counts
    "x_profile_winsorize" -> ((s, d) =>
      Profile.winsorizeReport(t(s, d, "lineitem"), "l_extendedprice")),

    // retention cohorts: users grouped by first-event day, distinct
    // active users per (cohort_day, day_offset)
    "x_events_retention" -> ((s, d) => {
      val events = t(s, d, "events")
      val cohorts = events.groupBy(col("user_id"))
        .agg(to_date(min(col("ts"))).as("cohort_day"))
      val active = events
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      active.join(cohorts, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // ---- as-of enrichment ---------------------------------------------------
    "x_asof_join" -> ((s, d) => {
      val events = t(s, d, "events").select(col("event_id"), col("user_id"), col("ts"))
      val orders = t(s, d, "orders").select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_orderdate").cast("timestamp").as("o_ts"))
      graft.ops.AsofJoin.asof(events, orders,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_ts",
          payload = Seq("o_orderkey", "o_orderdate"),
          tieBreak = Seq("o_orderkey"))
        .select(col("event_id"), col("o_orderkey").as("asof_orderkey"),
          col("o_orderdate").as("asof_orderdate"))
        .orderBy(col("event_id"))
    }),

    // same-customer order pairs placed within 7 days of each other —
    // the bucketed band join (adjacent-bucket equi-join), not a
    // per-key cartesian theta join
    "x_range_join" -> ((s, d) => {
      val base = t(s, d, "orders")
      val a = base.select(col("o_custkey").as("cust_a"),
        col("o_orderkey").as("order_a"),
        unix_date(col("o_orderdate").cast("date")).as("day_a"))
      val b = base.select(col("o_custkey").as("cust_b"),
        col("o_orderkey").as("order_b"),
        unix_date(col("o_orderdate").cast("date")).as("day_b"))
      graft.ops.RangeJoin.band(a, b, "cust_a", "cust_b", "day_a", "day_b", eps = 7L)
        .filter(col("order_a") < col("order_b"))
        .select(col("cust_a").as("cust"), col("order_a"), col("order_b"),
          (col("day_b") - col("day_a")).cast("int").as("day_diff"))
        .orderBy(col("cust"), col("order_a"), col("order_b"))
    }),

    // ---- multimodal plumbing ------------------------------------------------
    // the REAL codec chain runs in the gate (imageio → sound SPI →
    // stub): text payloads exercise the full probe path and land on
    // the deterministic stub rows the oracle replays — real
    // image/audio decode is pinned by the in-test-rendered PNG/JPEG/
    // WAV specs, which this container can generate but the synthetic
    // corpus does not carry
    "x_multimodal_meta" -> ((s, d) => {
      val withPayload = t(s, d, "documents")
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      Multimodal.withMediaMeta(withPayload, "payload",
          Multimodal.MediaIoDecoder)
        .select(col("doc_id"),
          col("media.format").as("format"),
          col("media.width").as("width"),
          col("media.height").as("height"),
          col("media.n_frames").as("n_frames"))
        .orderBy(col("doc_id"))
    }),

    // ---- skew tooling -------------------------------------------------------
    "x_skew_salted_count" -> ((s, d) =>
      graft.ops.Skew.saltedCount(t(s, d, "lineitem"), "l_returnflag", salts = 8)
        .orderBy(col("l_returnflag"))),

    // ---- windowed event analytics ------------------------------------------
    "x_events_tumbling" -> ((s, d) =>
      EventWindows.tumblingHourly(t(s, d, "events"))),

    "x_events_sliding" -> ((s, d) =>
      EventWindows.slidingTwoHour(t(s, d, "events"))),

    "x_events_sessions" -> ((s, d) =>
      EventWindows.userSessions(t(s, d, "events"))),

    // time-bounded view→click attribution pairing — the batch form of
    // the stream-stream interval join (streaming form spec-pinned
    // equal, including cross-batch pairing)
    "x_events_stream_join" -> ((s, d) =>
      EventWindows.viewClickPairs(t(s, d, "events"))),

    // the abandonment stream: LEFT-OUTER time-bounded pairing — every
    // view, null click columns when unconverted (streaming form emits
    // unmatched views once the watermark proves no in-lag click can
    // arrive; spec-pinned)
    "x_events_stream_join_outer" -> ((s, d) =>
      EventWindows.viewClickPairsOuter(t(s, d, "events")))
  )

  /** Shared DuckDB CTE fragments for the trigram-shingle family: ONE
    * definition of the shingle construction, of the candidate-pair
    * predicate (>=1 shared shingle — matching the Spark inverted
    * index — plus the integer Jaccard cut), and of the
    * transitive-closure clustering, composed into every oracle that
    * needs them. Previously five hand-synchronized copies.
    *
    * The fragments keep their `|` margin characters and are NOT
    * stripMargin'd here — each composed oracle strips the whole
    * string exactly once. Stripping twice corrupts any fragment line
    * that begins with the SQL concat operator `||` (the second strip
    * eats its first pipe).
    */
  /** The duplicate-span CTE chain shared by `x_dedup_spans` and
    * `x_pipeline_curation_v2` (positional 5-grams → cross-doc filter
    * → merged gaps-and-islands coverage per doc), so the paired
    * oracles cannot desync. `wsx` deliberately carries `source`:
    * unused by the standalone span oracle, needed by the composition.
    */
  private val spanCte =
    """wsx AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS ws,
      |    CAST(len(string_split(text, ' ')) AS INT) AS n_words
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, unnest(generate_series(1, n_words - 4)) AS i, ws
      |  FROM wsx),
      |p AS (
      |  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
      |    array_to_string(ws[i : i + 4], ' ') AS gram
      |  FROM g),
      |x AS (
      |  SELECT gram FROM p GROUP BY gram
      |  HAVING min(doc_id) <> max(doc_id)),
      |h AS (
      |  SELECT p.doc_id, p.pos,
      |    least(coalesce(lead(p.pos) OVER (PARTITION BY p.doc_id
      |      ORDER BY p.pos) - p.pos, 5), 5) AS cov
      |  FROM p JOIN x USING (gram)),
      |sp AS (
      |  SELECT doc_id, count(*) AS n_dup_windows, sum(cov) AS dup_words
      |  FROM h GROUP BY doc_id)"""

  /** The distinct-word quality score ([[graft.ops.TextOps.distinctWordCount]])
    * and the per-source cap rank, shared by `x_sample_source_cap` and
    * `x_pipeline_curation_v2`.
    */
  private val capRankCte =
    """sc AS (
      |  SELECT doc_id, source,
      |    CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS score
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, source, score,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY score DESC NULLS LAST, doc_id ASC) AS INT) AS rk
      |  FROM sc)"""

  private val shingleCte =
    """d AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
      |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
      |         || ' ' || string_split(text, ' ')[i+2])) AS g
      |  FROM documents)"""

  /** Incremental-dedup oracle (today's batch = doc_id ≡ 0 mod 10 vs
    * the kept rest) — shared by the in-session operator's gate row
    * and the persisted-store row, which replays the same computation
    * through storage.
    */
  private val dedupIncrementalSql =
    raw"""WITH $shingleCte,
      |i AS (SELECT doc_id AS inc_id, g FROM d WHERE doc_id % 10 = 0),
      |c AS (SELECT doc_id AS corpus_id, g FROM d WHERE doc_id % 10 <> 0)
      |SELECT inc_id, corpus_id,
      |  ROUND(CAST(len(list_intersect(i.g, c.g)) AS DOUBLE)
      |        / (len(i.g) + len(c.g) - len(list_intersect(i.g, c.g))), 4) AS jaccard
      |FROM i, c
      |WHERE len(list_intersect(i.g, c.g)) > 0
      |  AND len(list_intersect(i.g, c.g)) * 2
      |      >= len(i.g) + len(c.g) - len(list_intersect(i.g, c.g))
      |ORDER BY inc_id, corpus_id""".stripMargin

  /** The trained token-rate classifier's full train-score chain
    * (shared by the prediction and confusion oracles): md5-bucket
    * split at 8000/10000, per-(label, token) counts over the train
    * split, discriminative ppm weights w = rate(t|c) − rate(t|corpus),
    * held-out tf · w scores, ROW_NUMBER argmax with (score DESC,
    * label) ties. All-integer throughout — SUM(BIGINT) goes HUGEINT
    * in DuckDB, so every aggregated term is cast back before use.
    */
  private val classifyCte =
    """WITH bkt AS (
      |  SELECT doc_id, text, lang,
      |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
      |      % 10000 AS INT) AS b
      |  FROM documents),
      |traintok AS (
      |  SELECT lang AS label, unnest(string_split(text, ' ')) AS tok
      |  FROM bkt WHERE b < 8000),
      |cnt AS (SELECT label, tok, COUNT(*) AS c FROM traintok GROUP BY 1, 2),
      |tot AS (SELECT label, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
      |gcnt AS (SELECT tok, CAST(SUM(c) AS BIGINT) AS gc FROM cnt GROUP BY 1),
      |gtot AS (SELECT CAST(SUM(c) AS BIGINT) AS gn FROM cnt),
      |model AS (
      |  SELECT cnt.label, cnt.tok,
      |    (1000000 * cnt.c) // tot.n - (1000000 * gcnt.gc) // gtot.gn AS w
      |  FROM cnt JOIN tot USING (label) JOIN gcnt USING (tok) CROSS JOIN gtot),
      |ho AS (SELECT doc_id, lang, text FROM bkt WHERE b >= 8000),
      |tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM ho)
      |  GROUP BY 1, 2),
      |sc AS (
      |  SELECT tf.doc_id, m.label, CAST(SUM(tf.tf * m.w) AS BIGINT) AS score
      |  FROM tf JOIN model m USING (tok) GROUP BY 1, 2),
      |pred AS (
      |  SELECT doc_id, label AS predicted, score,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY score DESC, label) AS rn
      |  FROM sc)""".stripMargin

  /** The media gates' shared bit derivation (see fixtureBits): word
    * bigrams → integer polynomial → presence bits 0..63 — replayed by
    * the image (phash) AND audio (energy fingerprint) oracles, since
    * both renderings recover the same bits. NOT stripMargin'd here —
    * each composed oracle strips exactly once (the shingleCte
    * convention).
    */
  private val phashBitsCte =
    """ws AS (SELECT doc_id, string_split(text, ' ') AS ws
      |  FROM documents),
      |bg AS (SELECT doc_id, unnest(list_transform(range(len(ws)-1), i ->
      |    ws[CAST(i+1 AS INT)] || ' ' || ws[CAST(i+2 AS INT)])) AS g
      |  FROM ws),
      |ix AS (SELECT DISTINCT doc_id,
      |  (CAST(ascii(substr(g,1,1)) AS BIGINT)
      |   + CAST(ascii(substr(g,2,1)) AS BIGINT)*31
      |   + CAST(ascii(substr(g,3,1)) AS BIGINT)*961
      |   + CAST(ascii(substr(g,4,1)) AS BIGINT)*29791
      |   + CAST(ascii(substr(g,5,1)) AS BIGINT)*923521
      |   + CAST(ascii(substr(g,6,1)) AS BIGINT)*28629151
      |   + CAST(ascii(substr(g,7,1)) AS BIGINT)*887503681
      |   + CAST(len(g) AS BIGINT)*127) % 64 AS n
      |  FROM bg),
      |bits AS (SELECT doc_id, list_transform(range(64), n ->
      |    CASE WHEN list_contains(list(ix.n), n) THEN 1 ELSE 0 END) AS b
      |  FROM ix GROUP BY doc_id)"""

  private val pairClosureCte =
    """p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM d a JOIN d b ON a.doc_id < b.doc_id AND a.doc_id < 200
      |  WHERE len(list_intersect(a.g, b.g)) > 0
      |    AND len(list_intersect(a.g, b.g)) * 2
      |        >= len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))),
      |e AS (SELECT doc_a AS a, doc_b AS b FROM p UNION SELECT doc_b, doc_a FROM p),
      |reach(a, b) AS (
      |  SELECT a, b FROM e
      |  UNION
      |  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a)"""

  private val droppedCte =
    """dropped AS (
      |  SELECT a AS doc_id FROM reach GROUP BY a
      |  HAVING LEAST(a, MIN(b)) <> a)"""

  private val trigramCte =
    raw"""WITH $shingleCte
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  ROUND(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      |        / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))), 4) AS jaccard
      |FROM d a JOIN d b ON a.doc_id < b.doc_id AND a.doc_id < 200
      |WHERE len(list_intersect(a.g, b.g)) > 0
      |  AND len(list_intersect(a.g, b.g)) * 2
      |      >= len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))
      |ORDER BY doc_a, doc_b""".stripMargin

  private val embeddingPairsSql =
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                               CAST(b.embedding AS DOUBLE[])), 4) AS cosine
      |FROM embeddings a JOIN embeddings b
      |  ON a.vec_id < b.vec_id AND a.vec_id < 500
      |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                             CAST(b.embedding AS DOUBLE[])) >= 0.4
      |ORDER BY vec_a, vec_b""".stripMargin

  /** kNN majority-vote label propagation (`Similarity.knnClassify`):
    * knnBruteSql's cosine + ranking conventions over the first-250
    * seed set, then plurality vote with ties to the smaller label —
    * the exact order the Spark windows use.
    */
  private val knnClassifySql =
    """WITH s AS (
      |  SELECT u.vec_id, l.vec_id AS n_id, l.label,
      |    list_cosine_similarity(CAST(u.embedding AS DOUBLE[]),
      |                           CAST(l.embedding AS DOUBLE[])) AS c
      |  FROM embeddings u JOIN embeddings l
      |    ON u.vec_id >= 250 AND l.vec_id < 250),
      |r AS (SELECT vec_id, label, c,
      |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, n_id) AS rnk
      |  FROM s),
      |v AS (SELECT vec_id, label, COUNT(*) AS votes
      |  FROM r WHERE rnk <= 5 GROUP BY vec_id, label),
      |p AS (SELECT vec_id, label, votes,
      |  ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY votes DESC, label) AS pr
      |  FROM v)
      |SELECT vec_id, label AS label_pred, CAST(votes AS BIGINT) AS votes
      |FROM p WHERE pr = 1 ORDER BY vec_id""".stripMargin

  /** DuckDB replication of the int8-quantized search: codes, integer
    * dots, and ranking are all deterministic, so this is a FULL value
    * oracle — shared by `x_knn_quantized` (brute over packed codes)
    * and `x_knn_quantized_ivf_check` (the IVF composition at
    * nProbe == nCells, where probing every cell makes the candidate
    * set identical).
    */
  /** The int8-quantization CTE chain (companion scale, then codes —
    * NULL for a NULL scale, zeros for a zero vector, matching
    * [[graft.ops.Quantize.codesOf]]'s contract) shared by every
    * quantization oracle so the code formula lives in ONE place.
    * `scale`/`nd` are carried for the consumers that need them and
    * inert for the rest.
    */
  private val quantCodesCte =
    """q0 AS (
      |  SELECT vec_id, embedding,
      |    CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
      |      / 127.0 AS scale
      |  FROM embeddings),
      |c AS (
      |  SELECT vec_id, scale, len(embedding) AS nd,
      |    CASE WHEN scale IS NULL THEN NULL
      |    WHEN scale > 0 THEN
      |      list_transform(embedding,
      |        x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))
      |    ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS code
      |  FROM q0)"""

  /** CTE chain replaying [[graft.ops.Kmeans]] exactly: quantize,
    * lowest-id seeds, then per iteration an argmin assignment
    * (row_number ordered by (d2, cl) — the lowest-cluster tie-break)
    * and a floor-mean centroid update with empty-cluster carry-over.
    * Ends with `asg{iters+1}`, the final assignment against the
    * final centroids. Generated, not hand-unrolled, so k/iters stay
    * in one place with the Spark defaults. `k = 0` replays the
    * auto-k rule ([[graft.ops.Kmeans.autoK]]): √n clamped into
    * [2, 256] and ≤ n, over the same non-null code relation —
    * `round(sqrt(integer))` can never land on an exact .5, so both
    * engines' half-up rounding agrees on every corpus size.
    */
  private def kmeansCte(k: Int, iters: Int): String = {
    val seedBound =
      if (k > 0) k.toString
      else
        """(SELECT LEAST(count(*), GREATEST(2, LEAST(256,
          |    CAST(round(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT))))
          |  FROM cv)""".stripMargin
    val codes =
      s"""kq0 AS (
         |  SELECT vec_id, embedding,
         |    CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE)
         |      / 127.0 AS scale
         |  FROM embeddings),
         |cv AS (
         |  SELECT vec_id,
         |    list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)) AS code
         |  FROM kq0 WHERE scale > 0
         |  UNION ALL
         |  SELECT vec_id, list_transform(embedding, x -> CAST(0 AS BIGINT))
         |  FROM kq0 WHERE scale = 0),
         |cent0 AS (
         |  SELECT CAST(rn - 1 AS INT) AS cl, code
         |  FROM (SELECT code, row_number() OVER (ORDER BY vec_id) AS rn FROM cv)
         |  WHERE rn <= $seedBound)""".stripMargin
    def assign(i: Int, cent: String) =
      s"""a$i AS (
         |  SELECT vec_id, code, cl, d2,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY d2, cl) AS rn
         |  FROM (SELECT v.vec_id, v.code, ct.cl,
         |      CAST(list_sum(list_transform(generate_series(1, len(v.code)),
         |        j -> (v.code[j] - ct.code[j]) * (v.code[j] - ct.code[j])))
         |        AS BIGINT) AS d2
         |    FROM cv v, $cent ct)),
         |asg$i AS (SELECT vec_id, code, cl, d2 FROM a$i WHERE rn = 1)""".stripMargin
    def update(i: Int) =
      s"""upd$i AS (
         |  SELECT cl, list(m ORDER BY dim) AS code FROM (
         |    SELECT cl, dim,
         |      CAST(floor(CAST(sum(code[dim]) AS DOUBLE) / count(*)) AS BIGINT) AS m
         |    FROM asg$i, unnest(generate_series(1, len(code))) AS t(dim)
         |    GROUP BY cl, dim) GROUP BY cl),
         |cent$i AS (
         |  SELECT p.cl, COALESCE(u.code, p.code) AS code
         |  FROM cent${i - 1} p LEFT JOIN upd$i u USING (cl))""".stripMargin
    (codes +: (1 to iters).flatMap(i =>
      Seq(assign(i, s"cent${i - 1}"), update(i))) :+
      assign(iters + 1, s"cent$iters")).mkString(",\n")
  }

  private val knnQuantizedSql =
    raw"""WITH $quantCodesCte,
      |s AS (
      |  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
      |    CAST(list_sum(list_transform(range(1, len(q.code) + 1),
      |      i -> q.code[i] * e.code[i])) AS BIGINT) AS dq,
      |    CAST(list_sum(list_transform(q.code, x -> x * x)) AS BIGINT) AS sq,
      |    CAST(list_sum(list_transform(e.code, x -> x * x)) AS BIGINT) AS sn
      |  FROM c q JOIN c e ON q.vec_id < 5 AND e.vec_id <> q.vec_id),
      |r AS (SELECT query_id, neighbor_id, dq,
      |    dq / sqrt(CAST(sq AS DOUBLE)) / sqrt(CAST(sn AS DOUBLE)) AS qc,
      |    ROW_NUMBER() OVER (PARTITION BY query_id
      |      ORDER BY dq / sqrt(CAST(sq AS DOUBLE)) / sqrt(CAST(sn AS DOUBLE)) DESC,
      |        neighbor_id) AS rnk
      |  FROM s)
      |SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id,
      |  dq AS dot_q, ROUND(qc, 4) AS qcosine
      |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin

  /** One builder for every brute-kNN-shaped oracle (tie order,
    * rounding, k — the DuckDB mirror of `Similarity.topKByCosine`),
    * so the self-query and external-query variants cannot drift
    * convention by convention.
    */
  private def knnOracleSql(queryIdExpr: String, queryPred: String,
      excludeSelf: Boolean): String = {
    val self = if (excludeSelf) " AND e.vec_id <> q.vec_id" else ""
    s"""WITH s AS (
      |  SELECT $queryIdExpr AS query_id, e.vec_id AS neighbor_id,
      |    list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                           CAST(e.embedding AS DOUBLE[])) AS c
      |  FROM embeddings q JOIN embeddings e
      |    ON $queryPred$self),
      |r AS (SELECT query_id, neighbor_id, c,
      |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
      |  FROM s)
      |SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id, ROUND(c, 4) AS cosine
      |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin
  }

  private val knnBruteSql =
    knnOracleSql("q.vec_id", "q.vec_id < 5", excludeSelf = true)

  /** Blocklist oracle — same term literals as the Spark side
    * (BlocklistTerms); tf hits via list_filter, distinct hits via
    * list_intersect on the deduped token list. Shared by the literal
    * and relation forms (identical declared function).
    */
  private val blocklistSql: String = {
    val inList = BlocklistTerms.map(t => s"'$t'").mkString(", ")
    s"""SELECT doc_id,
      |  CAST(len(list_filter(string_split(text, ' '),
      |    w -> w IN ($inList))) AS BIGINT) AS n_hits,
      |  CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
      |    [$inList])) AS BIGINT) AS n_terms_hit,
      |  CAST(CASE WHEN len(list_filter(string_split(text, ' '),
      |    w -> w IN ($inList))) = 0 THEN 1 ELSE 0 END AS INT) AS keep
      |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** DuckDB replication of the FULL random-hyperplane LSH algorithm
    * (`Similarity.knnLsh`, 4 planes × 64 dims, 1-bit multi-probe):
    * the planes are deterministic pure-function values, embedded here
    * as string-cast literals ('…'::DOUBLE parses via strtod → the
    * exact same IEEE double the JVM produced). The dot-product fold is
    * spelled as list_reduce in Spark's accumulation order, so the
    * bucket signs — the only discretization — agree bit-exactly, and
    * with them the probe set, the candidate set, and the top-k.
    */
  private val lshOracleSql: String = {
    val planes = graft.ops.Similarity.lshPlanes(nPlanes = 4, dim = 64)
    def dotSql(pl: Seq[Double]): String = {
      val lits = pl.map(x => s"'$x'::DOUBLE").mkString(", ")
      s"list_reduce(list_prepend(CAST(0 AS DOUBLE), " +
        s"list_transform(generate_series(1, 64), i -> ([$lits])[i] * v[i])), " +
        "(acc, x) -> acc + x)"
    }
    val bucketExpr = planes.zipWithIndex.map { case (pl, p) =>
      s"CASE WHEN ${dotSql(pl)} >= 0 THEN ${1 << p} ELSE 0 END"
    }.mkString("\n    + ")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
       |), b AS (
       |  SELECT vec_id, v,
       |    $bucketExpr AS bucket
       |  FROM e
       |), q AS (
       |  SELECT vec_id AS query_id, v AS qv,
       |    unnest([xor(bucket, 0), xor(bucket, 1), xor(bucket, 2),
       |            xor(bucket, 4), xor(bucket, 8)]) AS bucket
       |  FROM b WHERE vec_id < 5
       |), s AS (
       |  SELECT q.query_id, n.vec_id AS neighbor_id,
       |    list_cosine_similarity(q.qv, n.v) AS c
       |  FROM q JOIN b n USING (bucket)
       |  WHERE q.query_id <> n.vec_id
       |), r AS (
       |  SELECT query_id, neighbor_id, c,
       |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id) AS rnk
       |  FROM s)
       |SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id, ROUND(c, 4) AS cosine
       |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "x_dedup_exact" ->
      """SELECT array_to_string(string_split(text, ' ')[1:3], ' ') AS k,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY 1 ORDER BY k""".stripMargin,

    // unordered source pair counts over exactly the verified near-dup
    // pair set (the trigram pair CTE re-joined to sources)
    "x_dedup_source_matrix" ->
      raw"""WITH $shingleCte,
        |p AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM d a JOIN d b ON a.doc_id < b.doc_id AND a.doc_id < 200
        |  WHERE len(list_intersect(a.g, b.g)) > 0
        |    AND len(list_intersect(a.g, b.g)) * 2
        |        >= len(a.g) + len(b.g) - len(list_intersect(a.g, b.g)))
        |SELECT least(da.source, db.source) AS source_a,
        |  greatest(da.source, db.source) AS source_b,
        |  COUNT(*) AS n_pairs
        |FROM p JOIN documents da ON p.doc_a = da.doc_id
        |       JOIN documents db ON p.doc_b = db.doc_id
        |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin,

    // the text near-dup strategies provably agree on this corpus
    "x_dedup_ngram_jaccard" -> trigramCte,

    // the capped form: candidates restricted to grams with df <= 5,
    // then the TRUE containment verified on the full arrays — the cap
    // replayed exactly, never approximated
    "x_dedup_containment_capped" ->
      raw"""WITH $shingleCte,
        |tok AS (SELECT doc_id, unnest(g) AS shingle FROM d),
        |rare AS (SELECT shingle FROM
        |  (SELECT shingle, COUNT(*) AS gdf FROM tok GROUP BY 1)
        |  WHERE gdf <= 5),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM tok a JOIN rare USING (shingle) JOIN tok b USING (shingle)
        |  WHERE a.doc_id < b.doc_id AND a.doc_id < 200)
        |SELECT c.doc_a, c.doc_b,
        |  ROUND(CAST(len(list_intersect(da.g, db.g)) AS DOUBLE)
        |        / least(len(da.g), len(db.g)), 4) AS containment
        |FROM cand c
        |JOIN d da ON da.doc_id = c.doc_a
        |JOIN d db ON db.doc_id = c.doc_b
        |WHERE len(list_intersect(da.g, db.g)) * 3
        |      >= least(len(da.g), len(db.g)) * 2
        |ORDER BY doc_a, doc_b""".stripMargin,

    // max-containment (|∩|/min) with the integer 3|∩| >= 2·min cut —
    // same shingle substrate, least() instead of the union denominator
    "x_dedup_containment" ->
      raw"""WITH $shingleCte
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  ROUND(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
        |        / least(len(a.g), len(b.g)), 4) AS containment
        |FROM d a JOIN d b ON a.doc_id < b.doc_id AND a.doc_id < 200
        |WHERE len(list_intersect(a.g, b.g)) > 0
        |  AND len(list_intersect(a.g, b.g)) * 3
        |      >= least(len(a.g), len(b.g)) * 2
        |ORDER BY doc_a, doc_b""".stripMargin,
    "x_dedup_ngram_prefix" -> trigramCte,
    "x_dedup_minhash_lsh" -> trigramCte,
    "x_dedup_simhash" -> trigramCte,

    // image phash near-dup: the banding is pigeonhole-exact
    // (maxDist 3 < 4 bands), so the oracle replays the planted bits
    // (distinct word bigrams → integer polynomial → bit 0..63 — the
    // exact rule the Spark side renders into its PNGs) and takes the
    // BRUTE Hamming-<=3 pair set the banded join must equal
    "x_dedup_image_phash" ->
      raw"""WITH $phashBitsCte
        |SELECT a.doc_id AS doc_a, bb.doc_id AS doc_b,
        |  CAST(len(list_filter(range(64), n ->
        |    a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) AS BIGINT)
        |    AS hamming
        |FROM bits a JOIN bits bb ON a.doc_id < bb.doc_id
        |WHERE len(list_filter(range(64), n ->
        |  a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    // image clusters: recursive transitive closure + min label over
    // the same brute Hamming pairs (the x_dedup_clusters shape)
    "x_dedup_image_clusters" ->
      raw"""WITH RECURSIVE $phashBitsCte,
        |p AS (
        |  SELECT a.doc_id AS doc_a, bb.doc_id AS doc_b
        |  FROM bits a JOIN bits bb ON a.doc_id < bb.doc_id
        |  WHERE len(list_filter(range(64), n ->
        |    a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) <= 3),
        |e AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a)
        |SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
        |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin,

    // audio: the SAME bit derivation and brute Hamming oracles as the
    // image gates — the fingerprint recovers identical bits through
    // the WAV render/decode roundtrip, so the replay is shared
    "x_dedup_audio_fp" ->
      raw"""WITH $phashBitsCte
        |SELECT a.doc_id AS doc_a, bb.doc_id AS doc_b,
        |  CAST(len(list_filter(range(64), n ->
        |    a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) AS BIGINT)
        |    AS hamming
        |FROM bits a JOIN bits bb ON a.doc_id < bb.doc_id
        |WHERE len(list_filter(range(64), n ->
        |  a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    "x_dedup_audio_clusters" ->
      raw"""WITH RECURSIVE $phashBitsCte,
        |p AS (
        |  SELECT a.doc_id AS doc_a, bb.doc_id AS doc_b
        |  FROM bits a JOIN bits bb ON a.doc_id < bb.doc_id
        |  WHERE len(list_filter(range(64), n ->
        |    a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) <= 3),
        |e AS (SELECT doc_a AS a, doc_b AS b FROM p
        |  UNION SELECT doc_b, doc_a FROM p),
        |reach(a, b) AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e2.b FROM reach r JOIN e e2 ON r.b = e2.a)
        |SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
        |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin,

    // the persisted fingerprint store: brute Hamming join between the
    // incoming slice and the kept slice over the replayed bits — the
    // same replay whether the store grew by save or save+append
    "x_dedup_image_store" ->
      raw"""WITH $phashBitsCte
        |SELECT a.doc_id AS inc_id, bb.doc_id AS corpus_id,
        |  CAST(len(list_filter(range(64), n ->
        |    a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) AS BIGINT)
        |    AS hamming
        |FROM bits a JOIN bits bb
        |  ON a.doc_id % 10 = 0 AND bb.doc_id % 10 != 0
        |WHERE len(list_filter(range(64), n ->
        |  a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) <= 3
        |ORDER BY inc_id, corpus_id""".stripMargin,

    "x_dedup_image_store_append_check" ->
      raw"""WITH $phashBitsCte
        |SELECT a.doc_id AS inc_id, bb.doc_id AS corpus_id,
        |  CAST(len(list_filter(range(64), n ->
        |    a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) AS BIGINT)
        |    AS hamming
        |FROM bits a JOIN bits bb
        |  ON a.doc_id % 10 = 0 AND bb.doc_id % 10 != 0
        |WHERE len(list_filter(range(64), n ->
        |  a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) <= 3
        |ORDER BY inc_id, corpus_id""".stripMargin,

    "x_dedup_image_store_external_check" ->
      raw"""WITH $phashBitsCte
        |SELECT a.doc_id * 1000 + 1 AS inc_id, bb.doc_id AS corpus_id,
        |  CAST(len(list_filter(range(64), n ->
        |    a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) AS BIGINT)
        |    AS hamming
        |FROM bits a JOIN bits bb ON a.doc_id % 10 = 7
        |WHERE len(list_filter(range(64), n ->
        |  a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) <= 3
        |ORDER BY inc_id, corpus_id""".stripMargin,

    // the AUDIO store gates replay the SAME bits (the WAV render
    // recovers them bit-for-bit, spec-pinned), so their oracles are
    // the image-store oracles verbatim — which is exactly the claim:
    // one lifecycle, one contract, two decoders
    "x_dedup_audio_store" ->
      raw"""WITH $phashBitsCte
        |SELECT a.doc_id AS inc_id, bb.doc_id AS corpus_id,
        |  CAST(len(list_filter(range(64), n ->
        |    a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) AS BIGINT)
        |    AS hamming
        |FROM bits a JOIN bits bb
        |  ON a.doc_id % 10 = 0 AND bb.doc_id % 10 != 0
        |WHERE len(list_filter(range(64), n ->
        |  a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) <= 3
        |ORDER BY inc_id, corpus_id""".stripMargin,

    "x_dedup_audio_store_append_check" ->
      raw"""WITH $phashBitsCte
        |SELECT a.doc_id AS inc_id, bb.doc_id AS corpus_id,
        |  CAST(len(list_filter(range(64), n ->
        |    a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) AS BIGINT)
        |    AS hamming
        |FROM bits a JOIN bits bb
        |  ON a.doc_id % 10 = 0 AND bb.doc_id % 10 != 0
        |WHERE len(list_filter(range(64), n ->
        |  a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) <= 3
        |ORDER BY inc_id, corpus_id""".stripMargin,

    "x_dedup_audio_store_external_check" ->
      raw"""WITH $phashBitsCte
        |SELECT a.doc_id * 1000 + 1 AS inc_id, bb.doc_id AS corpus_id,
        |  CAST(len(list_filter(range(64), n ->
        |    a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) AS BIGINT)
        |    AS hamming
        |FROM bits a JOIN bits bb ON a.doc_id % 10 = 7
        |WHERE len(list_filter(range(64), n ->
        |  a.b[CAST(n+1 AS INT)] != bb.b[CAST(n+1 AS INT)])) <= 3
        |ORDER BY inc_id, corpus_id""".stripMargin,

    // connected components of the (verified-identical) pair graph via
    // a recursive transitive closure + min label
    "x_dedup_clusters" ->
      raw"""WITH RECURSIVE $shingleCte,
        |$pairClosureCte
        |SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
        |FROM reach GROUP BY a ORDER BY doc_id""".stripMargin,

    // same recursive closure; the representative is the argmax by
    // distinct-word count (ties to smaller id), singletons label
    // themselves — COUNT(*) OVER is BIGINT in both engines
    "x_dedup_keep_best" ->
      raw"""WITH RECURSIVE $shingleCte,
        |$pairClosureCte,
        |lbl AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
        |  FROM reach GROUP BY a),
        |q AS (SELECT doc_id,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS score
        |  FROM documents),
        |c AS (SELECT q.doc_id, COALESCE(lbl.cluster_id, q.doc_id) AS cluster_id,
        |    q.score
        |  FROM q LEFT JOIN lbl USING (doc_id)),
        |r AS (SELECT cluster_id, doc_id, score,
        |    ROW_NUMBER() OVER (PARTITION BY cluster_id
        |      ORDER BY score DESC, doc_id) AS rk,
        |    COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
        |  FROM c)
        |SELECT cluster_id, doc_id, score, CAST(n_members AS BIGINT) AS n_members
        |FROM r WHERE rk = 1 ORDER BY cluster_id""".stripMargin,

    // positional 5-grams via unnest(generate_series); a gram is
    // cross-doc iff min(doc_id) <> max(doc_id); merged-span coverage
    // is the gaps-and-islands sum min(next_pos - pos, 5)
    "x_dedup_spans" ->
      raw"""WITH $spanCte
        |SELECT wsx.doc_id, wsx.n_words,
        |  CAST(coalesce(sp.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
        |  CAST(coalesce(sp.dup_words, 0) AS BIGINT) AS dup_words,
        |  CAST(coalesce(sp.dup_words, 0) AS DOUBLE) / wsx.n_words AS dup_frac
        |FROM wsx LEFT JOIN sp USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // keep-first replay: 1-based gram i flags when found among its
    // predecessors (list_position is NULL-not-0 when absent); kept
    // tokens rebuild via the NULL-mask (empty-string tokens survive)
    "x_dedup_within_doc" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id, ws, len(ws) AS n,
        |    list_transform(generate_series(1, greatest(len(ws) - 2, 0)),
        |      i -> array_to_string(ws[i : i + 2], ' ')) AS gs
        |  FROM toks),
        |f AS (SELECT doc_id, ws, n,
        |    list_distinct(flatten(list_transform(
        |      list_filter(generate_series(2, len(gs)),
        |        i -> coalesce(list_position(gs[1 : i - 1], gs[i]), 0) > 0),
        |      i -> generate_series(i, i + 2)))) AS cov
        |  FROM g),
        |k AS (SELECT doc_id, n, cov,
        |    list_filter(list_transform(generate_series(1, n),
        |      i -> CASE WHEN list_contains(cov, i) THEN NULL ELSE ws[i] END),
        |      x -> x IS NOT NULL) AS kept
        |  FROM f)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
        |  CAST(len(cov) AS BIGINT) AS n_removed,
        |  array_to_string(kept, ' ') AS clean_text
        |FROM k ORDER BY doc_id""".stripMargin,

    // removal replay: covered 1-based positions are hit-start + 1..5;
    // kept tokens re-join ordered by position (string_agg ORDER BY),
    // '' when every token was covered — matching Spark's array_join
    // over the filtered (possibly empty) words array
    "x_dedup_span_remove" ->
      raw"""WITH $spanCte,
        |cov AS (
        |  SELECT DISTINCT doc_id, pos + o AS p
        |  FROM h, unnest(generate_series(1, 5)) AS u(o)),
        |w2 AS (
        |  SELECT doc_id, ws[i] AS tok, i
        |  FROM wsx, unnest(generate_series(1, n_words)) AS t(i)),
        |kept AS (
        |  SELECT w2.doc_id, string_agg(w2.tok, ' ' ORDER BY w2.i) AS clean_text
        |  FROM w2 LEFT JOIN cov ON w2.doc_id = cov.doc_id AND w2.i = cov.p
        |  WHERE cov.p IS NULL GROUP BY w2.doc_id),
        |cg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
        |  FROM cov GROUP BY doc_id)
        |SELECT wsx.doc_id, CAST(wsx.n_words AS BIGINT) AS n_tokens,
        |  COALESCE(cg.n_removed, 0) AS n_removed,
        |  COALESCE(kept.clean_text, '') AS clean_text
        |FROM wsx LEFT JOIN cg USING (doc_id) LEFT JOIN kept USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    // the recursive closure labels clusters, singletons self-label,
    // then the shared md5-bucket CASE keys on cluster_id
    "x_split_cluster_safe" ->
      raw"""WITH RECURSIVE $shingleCte,
        |$pairClosureCte,
        |lbl AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster_id
        |  FROM reach GROUP BY a),
        |c AS (SELECT doc.doc_id,
        |    COALESCE(lbl.cluster_id, doc.doc_id) AS cluster_id
        |  FROM documents doc LEFT JOIN lbl USING (doc_id)),
        |bk AS (SELECT doc_id, cluster_id,
        |    CAST(('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 4))::INT
        |         % 10000 AS INT) AS bucket
        |  FROM c)
        |SELECT doc_id, cluster_id, bucket,
        |  CASE WHEN bucket < 8000 THEN 'train'
        |       WHEN bucket < 9000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM bk ORDER BY doc_id""".stripMargin,

    // md5 is bit-identical across engines, so the split assignment is
    // fully auditable: DuckDB recomputes bucket and label exactly
    "x_split_assign" ->
      """WITH b AS (
        |  SELECT doc_id,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
        |         % 10000 AS INT) AS bucket
        |  FROM documents)
        |SELECT doc_id, bucket,
        |  CASE WHEN bucket < 8000 THEN 'train'
        |       WHEN bucket < 9000 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,

    // removal replay: 5-gram windows of corpus docs that appear in
    // the benchmark gram set; covered = start+1..start+5; kept tokens
    // re-join ordered (the span-remove oracle pattern)
    "x_decontaminate_remove" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id, CAST(i - 1 AS INT) AS pos,
        |    array_to_string(ws[i : i + 4], ' ') AS gram
        |  FROM toks, unnest(generate_series(1, len(ws) - 4)) AS t(i)),
        |bg AS (SELECT DISTINCT gram FROM g WHERE doc_id < 50),
        |h AS (SELECT g.doc_id, g.pos FROM g JOIN bg USING (gram)
        |  WHERE g.doc_id >= 50),
        |cov AS (SELECT DISTINCT doc_id, pos + o AS p
        |  FROM h, unnest(generate_series(1, 5)) AS u(o)),
        |w2 AS (SELECT doc_id, ws[i] AS tok, i
        |  FROM toks, unnest(generate_series(1, len(ws))) AS t(i)
        |  WHERE doc_id >= 50),
        |kept AS (
        |  SELECT w2.doc_id, string_agg(w2.tok, ' ' ORDER BY w2.i) AS clean_text
        |  FROM w2 LEFT JOIN cov ON w2.doc_id = cov.doc_id AND w2.i = cov.p
        |  WHERE cov.p IS NULL GROUP BY w2.doc_id),
        |cg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed
        |  FROM cov GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.ws) AS BIGINT) AS n_tokens,
        |  COALESCE(cg.n_removed, 0) AS n_removed,
        |  COALESCE(kept.clean_text, '') AS clean_text
        |FROM toks t LEFT JOIN cg USING (doc_id) LEFT JOIN kept USING (doc_id)
        |WHERE t.doc_id >= 50
        |ORDER BY doc_id""".stripMargin,

    "x_decontaminate" ->
      raw"""WITH $shingleCte
        |SELECT c.doc_id AS doc_id, b.doc_id AS benchmark_id,
        |  len(list_intersect(c.g, b.g)) AS n_shared
        |FROM d c JOIN d b ON c.doc_id >= 50 AND b.doc_id < 50
        |WHERE len(list_intersect(c.g, b.g)) >= 5
        |ORDER BY doc_id, benchmark_id""".stripMargin,

    // the composed pipeline reuses the recursive-closure cluster logic
    // plus the integer repetition gates — one oracle for the whole flow
    "x_pipeline_corpus_clean" ->
      raw"""WITH RECURSIVE $shingleCte,
        |$pairClosureCte,
        |$droppedCte,
        |rep AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_words
        |  FROM documents)
        |SELECT doc_id, n_words, n_distinct_words FROM rep
        |WHERE n_words >= 10 AND n_distinct_words * 2 >= n_words
        |  AND doc_id NOT IN (SELECT doc_id FROM dropped)
        |ORDER BY doc_id""".stripMargin,

    // the data-card funnel composes the cluster closure, the Gopher
    // gates, and the md5 sample cut — all integer logic, one oracle
    "x_pipeline_datacard" ->
      raw"""WITH RECURSIVE $shingleCte,
        |$pairClosureCte,
        |$droppedCte,
        |s AS (
        |  SELECT doc_id, source, lang,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |    CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS INT) AS n_alpha,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS INT) AS n_punct,
        |    CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
        |      ['the','a','and','of','to','in','is','on','for'])) AS INT) AS n_stop,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
        |         % 10000 AS INT) AS bucket
        |  FROM documents),
        |f AS (
        |  SELECT source, lang,
        |    ((n_words >= 10 AND n_words <= 100000)
        |     AND (n_alpha >= n_words * 3 AND n_alpha <= n_words * 10)
        |     AND (n_punct * 10 < n_words) AND (n_stop >= 2)) AS g,
        |    (s.doc_id NOT IN (SELECT doc_id FROM dropped)) AS nodup,
        |    (bucket < CASE source WHEN 'src0' THEN 10000
        |                          WHEN 'src1' THEN 5000
        |                          WHEN 'src2' THEN 2500
        |                          ELSE 1000 END) AS smp
        |  FROM s)
        |SELECT source, lang, COUNT(*) AS n_raw,
        |  CAST(SUM(CASE WHEN g THEN 1 ELSE 0 END) AS BIGINT) AS n_gated,
        |  CAST(SUM(CASE WHEN g AND nodup THEN 1 ELSE 0 END) AS BIGINT) AS n_deduped,
        |  CAST(SUM(CASE WHEN g AND nodup AND smp THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM f GROUP BY source, lang ORDER BY source, lang""".stripMargin,

    // one oracle over the whole third-batch composition: the shared
    // span chain x the shared cap rank, aggregated per source
    "x_pipeline_curation_v2" ->
      raw"""WITH $spanCte,
        |$capRankCte,
        |k AS (SELECT doc_id, 1 AS kept FROM r WHERE rk <= 10)
        |SELECT w.source,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(coalesce(k.kept, 0)) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN coalesce(sp.n_dup_windows, 0) > 0
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_with_dups,
        |  CAST(sum(coalesce(sp.dup_words, 0)) AS BIGINT) AS dup_words,
        |  CAST(sum(w.n_words) AS BIGINT) AS n_words,
        |  CAST(sum(coalesce(sp.dup_words, 0)) AS DOUBLE)
        |    / sum(w.n_words) AS dup_word_share
        |FROM wsx w LEFT JOIN sp USING (doc_id) LEFT JOIN k USING (doc_id)
        |GROUP BY w.source ORDER BY w.source""".stripMargin,

    // the leakage audit reuses the shared pair fragment plus the
    // md5-bucket split CASE from x_split_assign
    "x_split_leakage" ->
      raw"""WITH RECURSIVE $shingleCte,
        |$pairClosureCte,
        |sp AS (
        |  SELECT doc_id,
        |    CASE WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
        |              % 10000 AS INT) < 8000 THEN 'train'
        |         WHEN CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
        |              % 10000 AS INT) < 9000 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents)
        |SELECT sa.split AS split_a, sb.split AS split_b,
        |  COUNT(*) AS n_pairs,
        |  CAST(SUM(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_leaked
        |FROM p JOIN sp sa ON p.doc_a = sa.doc_id
        |       JOIN sp sb ON p.doc_b = sb.doc_id
        |GROUP BY 1, 2 ORDER BY split_a, split_b""".stripMargin,

    "x_dedup_embedding" -> embeddingPairsSql,

    // the recall-pinning ANN gate shares the exact baseline's SQL: at
    // nProbe=14 the ANN candidates provably cover every true pair on
    // this corpus, so the outputs are identical (RecallCheck-verified)
    "x_dedup_embedding_ann_recall" -> embeddingPairsSql,

    // PQ near-dup at all-cells + covering SDC margin: every pair is
    // generated, no qualifying pair's SDC score falls below
    // minCosine - margin (PqDedupSpec measures the gap), and the
    // exact verify recomputes the baseline's cosine — identical rows
    "x_dedup_embedding_pq" -> embeddingPairsSql,

    "x_knn_brute" -> knnBruteSql,

    // PQ prefilter + exact rerank: at the covering candidate depth
    // the reranked top-k IS the brute top-k, so the oracle is brute's
    "x_knn_pq_rerank" -> knnBruteSql,

    // IVF×PQ at nProbe == nCells: candidate stream provably equals
    // the full PQ scan's, so the composition shares brute's oracle
    "x_knn_pq_ivf_check" -> knnBruteSql,

    // int8 codes recomputed element-wise: abs/list_max stay FLOAT
    // (widened to DOUBLE exactly like Spark's cast), floor(x/s + 0.5)
    // is the identical IEEE arithmetic, and all downstream columns
    // are integer folds — no float tolerance anywhere
    "x_embed_quantize" ->
      raw"""WITH $quantCodesCte
        |SELECT vec_id, scale, CAST(nd AS INT) AS n_dims,
        |  CAST(list_sum(code) AS BIGINT) AS sum_code,
        |  CAST(list_min(code) AS BIGINT) AS min_code,
        |  CAST(list_max(code) AS BIGINT) AS max_code,
        |  CAST(list_sum(list_transform(code, x -> x * x)) AS BIGINT) AS self_dot_q,
        |  CAST(list_sum(list_transform(code, x -> x * x)) AS BIGINT) AS self_dot_packed
        |FROM c ORDER BY vec_id""".stripMargin,

    // quantized ranking is integers-divided-by-√integers — the
    // division order (dot, then query norm, then neighbor norm)
    // matches the Spark column exactly
    "x_knn_quantized" -> knnQuantizedSql,

    // parallel unnests zip code values with their 1-based positions;
    // NULL-code rows (empty embeddings) are excluded, surfacing as
    // n < corpus count instead of a NULL in every dimension
    "x_embed_dim_profile" ->
      raw"""WITH $quantCodesCte,
        |e AS (
        |  SELECT unnest(code) AS v,
        |    unnest(generate_series(1, len(code))) AS i
        |  FROM c WHERE code IS NOT NULL)
        |SELECT CAST(i - 1 AS INT) AS dim,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v) AS BIGINT) AS sum_code,
        |  CAST(min(v) AS BIGINT) AS min_code,
        |  CAST(max(v) AS BIGINT) AS max_code,
        |  CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  CAST(sum(v) AS DOUBLE) / count(*) AS mean_code
        |FROM e GROUP BY i ORDER BY dim""".stripMargin,

    // list_cosine_similarity reproduces the Spark cosine at the
    // shared ROUND(...,4) (the x_dedup_embedding convention); round
    // AFTER the max, count/min are exact
    "x_decontaminate_embedding" ->
      """WITH b AS (SELECT vec_id AS b_id, embedding AS be
        |  FROM embeddings WHERE vec_id < 25),
        |c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 25),
        |j AS (SELECT c.vec_id, b.b_id,
        |    list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                           CAST(b.be AS DOUBLE[])) AS cos
        |  FROM c JOIN b ON
        |    list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |                           CAST(b.be AS DOUBLE[])) >= 0.3)
        |SELECT vec_id, COUNT(*) AS n_near,
        |  ROUND(MAX(cos), 4) AS max_cosine,
        |  MIN(b_id) AS nearest_min_id
        |FROM j GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // the co-moment matrix over the same quantization CTE: per-vector
    // positional self-join for the pair products, parallel-unnest
    // marginals, covariance as the identical fixed IEEE division
    "x_embed_dim_cov" ->
      raw"""WITH $quantCodesCte,
        |e AS (
        |  SELECT vec_id, unnest(code) AS v,
        |    unnest(generate_series(1, len(code))) AS i
        |  FROM c WHERE code IS NOT NULL),
        |m AS (SELECT i, CAST(SUM(v) AS BIGINT) AS s FROM e GROUP BY i),
        |p AS (
        |  SELECT a.i AS i, b.i AS j, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(a.v * b.v) AS BIGINT) AS s_xy
        |  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
        |  GROUP BY 1, 2)
        |SELECT CAST(p.j - 1 AS INT) AS j, CAST(p.i - 1 AS INT) AS i,
        |  p.n, ma.s AS s_x, mb.s AS s_y, p.s_xy,
        |  CAST(floor(CAST(p.n * p.s_xy - ma.s * mb.s AS DOUBLE)
        |        / CAST(p.n * p.n AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)
        |    / 10000.0 AS cov
        |FROM p JOIN m ma ON p.i = ma.i JOIN m mb ON p.j = mb.i
        |ORDER BY i, j""".stripMargin,

    // full Lloyd replay on the integer lattice: the generated CTE
    // chain ends at asg4 = final assignment vs the iteration-3
    // centroids (k=8, iters=3 — the Spark defaults)
    "x_embed_kmeans" ->
      raw"""WITH ${kmeansCte(0, 3)}
        |SELECT vec_id, cl AS cluster, d2 AS dist2
        |FROM asg4 ORDER BY vec_id""".stripMargin,

    "x_embed_kmeans_purity" ->
      raw"""WITH ${kmeansCte(0, 3)}
        |SELECT a.cl AS cluster, e.label,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(a.d2) AS BIGINT) AS sum_dist2
        |FROM asg4 a JOIN embeddings e USING (vec_id)
        |GROUP BY a.cl, e.label ORDER BY cluster, label""".stripMargin,

    // the replayed k-means assignment joined to documents on
    // vec_id = doc_id, per-cluster BIGRAM document frequency, the
    // 2*corpus_df <= n_docs stopword cut, top-5 by (df DESC, term)
    "x_embed_cluster_topics" ->
      raw"""WITH ${kmeansCte(0, 3)},
        |terms AS (
        |  SELECT a.cl AS cluster, d.doc_id,
        |    unnest(list_distinct(list_transform(
        |      generate_series(1, greatest(len(string_split(d.text, ' ')) - 1, 0)),
        |      i -> string_split(d.text, ' ')[i] || ' '
        |           || string_split(d.text, ' ')[i+1]))) AS term
        |  FROM asg4 a JOIN documents d ON d.doc_id = a.vec_id),
        |cdf AS (SELECT cluster, term, COUNT(*) AS df FROM terms GROUP BY 1, 2),
        |tot AS (SELECT term, CAST(SUM(df) AS BIGINT) AS corpus_df
        |        FROM cdf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |ranked AS (
        |  SELECT cluster, term, df,
        |    row_number() OVER (PARTITION BY cluster
        |      ORDER BY df DESC, term) AS rnk
        |  FROM cdf JOIN tot USING (term), n
        |  WHERE tot.corpus_df * 2 <= n.n_docs)
        |SELECT cluster, CAST(rnk AS INT) AS rank, term, df
        |FROM ranked WHERE rnk <= 5 ORDER BY cluster, rank""".stripMargin,

    // SemDeDup replay: final assignment -> same-cell ordered pairs
    // through the integer cosine cut (dot > 0 AND dot²·25 ≥ 4·sa·sb
    // for the 2/5 default), greedy keep-first via the earlier-dup
    // count. All-BIGINT arithmetic (dot ≤ 127²·d keeps every product
    // far under 2^63 at d = 64)
    "x_dedup_semantic" ->
      raw"""WITH ${kmeansCte(0, 3)},
        |sq AS (SELECT vec_id, cl, code,
        |    CAST(list_sum(list_transform(code, x -> x * x)) AS BIGINT) AS s
        |  FROM asg4),
        |pr AS (
        |  SELECT vb AS vec_id, CAST(count(*) AS BIGINT) AS dups FROM (
        |    SELECT b.vec_id AS vb, a.s AS sa, b.s AS sb,
        |      CAST(list_sum(list_transform(generate_series(1, len(a.code)),
        |        j -> a.code[j] * b.code[j])) AS BIGINT) AS dot
        |    FROM sq a JOIN sq b ON a.cl = b.cl AND a.vec_id < b.vec_id)
        |  WHERE dot > 0 AND dot * dot * 25 >= 4 * sa * sb
        |  GROUP BY vb)
        |SELECT q.vec_id, q.cl AS cluster,
        |  COALESCE(p.dups, 0) AS n_dups_before,
        |  CAST(CASE WHEN p.vec_id IS NULL THEN 1 ELSE 0 END AS INT) AS keep
        |FROM sq q LEFT JOIN pr p USING (vec_id)
        |ORDER BY q.vec_id""".stripMargin,

    // composition replay: iteration chain -> final assignment joined
    // with the outlier flags (selfq over the same cv codes) and the
    // per-cluster md5-rank-1 exemplar
    // the v4 composition replayed whole: NFC prefix keys, the
    // owner-carrying df aggregate (novelty), the capped containment
    // candidates + exact verify, and the first-match CASE verdict
    "x_pipeline_curation_v4" ->
      raw"""WITH $shingleCte,
        |nk AS (
        |  SELECT doc_id,
        |    array_to_string(string_split(nfc_normalize(text), ' ')[1:3], ' ') AS k
        |  FROM documents),
        |ek AS (
        |  SELECT doc_id,
        |    doc_id = MIN(doc_id) OVER (PARTITION BY k) AS is_first
        |  FROM nk),
        |tok AS (SELECT doc_id, unnest(g) AS shingle FROM d),
        |own AS (SELECT shingle, COUNT(*) AS df, MIN(doc_id) AS owner
        |        FROM tok GROUP BY 1),
        |unq AS (SELECT owner AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_unique
        |        FROM own WHERE df = 1 GROUP BY 1),
        |nov AS (
        |  SELECT s.doc_id,
        |    CASE WHEN s.n_grams > 0
        |      THEN (1000000 * COALESCE(u.n_unique, 0)) // s.n_grams END AS ppm
        |  FROM (SELECT doc_id, len(g) AS n_grams FROM d) s
        |  LEFT JOIN unq u USING (doc_id)),
        |rare AS (SELECT shingle FROM own WHERE df <= 5),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM tok a JOIN rare USING (shingle) JOIN tok b USING (shingle)
        |  WHERE a.doc_id < b.doc_id AND a.doc_id < 200),
        |cont AS (
        |  SELECT DISTINCT c.doc_b AS doc_id
        |  FROM cand c JOIN d da ON da.doc_id = c.doc_a
        |  JOIN d db ON db.doc_id = c.doc_b
        |  WHERE len(list_intersect(da.g, db.g)) * 3
        |        >= least(len(da.g), len(db.g)) * 2),
        |ver AS (
        |  SELECT ek.doc_id,
        |    CASE WHEN NOT ek.is_first THEN 'exact'
        |         WHEN nov.ppm IS NULL THEN 'short'
        |         WHEN nov.ppm < 250000 THEN 'boilerplate'
        |         WHEN cont.doc_id IS NOT NULL THEN 'contained'
        |    END AS reason
        |  FROM ek JOIN nov USING (doc_id) LEFT JOIN cont USING (doc_id))
        |SELECT doc_id,
        |  CAST(CASE WHEN reason IS NULL THEN 1 ELSE 0 END AS INT) AS keep,
        |  reason
        |FROM ver ORDER BY doc_id""".stripMargin,

    // v5 = the v4 composition + the trained-classifier own-label
    // score (model CTEs shared verbatim with x_text_classify) as the
    // final precedence class; `vtok` renames v4's `tok` CTE clear of
    // the classifier's column names
    "x_pipeline_curation_v5" ->
      raw"""WITH $shingleCte,
        |${classifyCte.stripPrefix("WITH ")},
        |nk AS (
        |  SELECT doc_id,
        |    array_to_string(string_split(nfc_normalize(text), ' ')[1:3], ' ') AS k
        |  FROM documents),
        |ek AS (
        |  SELECT doc_id,
        |    doc_id = MIN(doc_id) OVER (PARTITION BY k) AS is_first
        |  FROM nk),
        |vtok AS (SELECT doc_id, unnest(g) AS shingle FROM d),
        |vown AS (SELECT shingle, COUNT(*) AS df, MIN(doc_id) AS owner
        |        FROM vtok GROUP BY 1),
        |unq AS (SELECT owner AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_unique
        |        FROM vown WHERE df = 1 GROUP BY 1),
        |nov AS (
        |  SELECT s.doc_id,
        |    CASE WHEN s.n_grams > 0
        |      THEN (1000000 * COALESCE(u.n_unique, 0)) // s.n_grams END AS ppm
        |  FROM (SELECT doc_id, len(g) AS n_grams FROM d) s
        |  LEFT JOIN unq u USING (doc_id)),
        |rare AS (SELECT shingle FROM vown WHERE df <= 5),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM vtok a JOIN rare USING (shingle) JOIN vtok b USING (shingle)
        |  WHERE a.doc_id < b.doc_id AND a.doc_id < 200),
        |cont AS (
        |  SELECT DISTINCT c.doc_b AS doc_id
        |  FROM cand c JOIN d da ON da.doc_id = c.doc_a
        |  JOIN d db ON db.doc_id = c.doc_b
        |  WHERE len(list_intersect(da.g, db.g)) * 3
        |        >= least(len(da.g), len(db.g)) * 2),
        |dtf AS (
        |  SELECT doc_id, lang, tok, COUNT(*) AS tfc
        |  FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
        |        FROM documents)
        |  GROUP BY 1, 2, 3),
        |osc AS (
        |  SELECT dt.doc_id, CAST(SUM(dt.tfc * m.w) AS BIGINT) AS score
        |  FROM dtf dt JOIN model m ON m.tok = dt.tok AND m.label = dt.lang
        |  GROUP BY 1),
        |ver AS (
        |  SELECT ek.doc_id,
        |    CASE WHEN NOT ek.is_first THEN 'exact'
        |         WHEN nov.ppm IS NULL THEN 'short'
        |         WHEN nov.ppm < 250000 THEN 'boilerplate'
        |         WHEN cont.doc_id IS NOT NULL THEN 'contained'
        |         WHEN COALESCE(osc.score, 0) < 0 THEN 'lowscore'
        |    END AS reason,
        |    CAST(COALESCE(osc.score, 0) AS BIGINT) AS score
        |  FROM ek JOIN nov USING (doc_id) LEFT JOIN cont USING (doc_id)
        |  LEFT JOIN osc USING (doc_id))
        |SELECT doc_id,
        |  CAST(CASE WHEN reason IS NULL THEN 1 ELSE 0 END AS INT) AS keep,
        |  reason, score
        |FROM ver ORDER BY doc_id""".stripMargin,

    "x_pipeline_curation_v3" ->
      raw"""WITH ${kmeansCte(0, 3)},
        |so AS (SELECT vec_id,
        |    CAST(list_sum(list_transform(code, x -> x * x)) AS BIGINT) AS selfq
        |  FROM cv),
        |r2 AS (SELECT vec_id, selfq,
        |    row_number() OVER (ORDER BY selfq) AS rk,
        |    count(*) OVER () AS nn FROM so),
        |t2 AS (SELECT
        |    max(CASE WHEN rk = (1 * nn + 50 - 1) // 50 THEN selfq END) AS lo_val,
        |    max(CASE WHEN rk = (49 * nn + 50 - 1) // 50 THEN selfq END) AS hi_val
        |  FROM r2),
        |fl AS (SELECT so.vec_id,
        |    CASE WHEN so.selfq < t2.lo_val OR so.selfq > t2.hi_val
        |      THEN 1 ELSE 0 END AS o
        |  FROM so, t2),
        |ex AS (SELECT cl, vec_id AS exemplar_id FROM (
        |    SELECT cl, vec_id, row_number() OVER (PARTITION BY cl
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
        |    FROM asg4) WHERE rk = 1),
        |agg AS (
        |  SELECT a.cl AS cluster, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(a.d2) AS BIGINT) AS inertia,
        |    CAST(sum(fl.o) AS BIGINT) AS n_outliers,
        |    CAST(count(DISTINCT e.label) AS BIGINT) AS n_labels
        |  FROM asg4 a JOIN fl ON fl.vec_id = a.vec_id
        |  JOIN embeddings e ON e.vec_id = a.vec_id
        |  GROUP BY a.cl)
        |SELECT agg.cluster, agg.n, agg.inertia, agg.n_outliers,
        |  agg.n_labels, ex.exemplar_id
        |FROM agg JOIN ex ON ex.cl = agg.cluster
        |ORDER BY cluster""".stripMargin,

    // type-1 rank selection replayed with the shared integer-ceil
    // rank formula; value-at-rank is tie-stable, so no tiebreak col
    "x_embed_outliers" ->
      raw"""WITH $quantCodesCte,
        |s AS (SELECT vec_id,
        |    CAST(list_sum(list_transform(code, x -> x * x)) AS BIGINT) AS selfq
        |  FROM c WHERE code IS NOT NULL),
        |r AS (SELECT vec_id, selfq,
        |    row_number() OVER (ORDER BY selfq) AS rk,
        |    count(*) OVER () AS n FROM s),
        |t AS (SELECT
        |    max(CASE WHEN rk = (1 * n + 50 - 1) // 50 THEN selfq END) AS lo_val,
        |    max(CASE WHEN rk = (49 * n + 50 - 1) // 50 THEN selfq END) AS hi_val
        |  FROM r)
        |SELECT s.vec_id, s.selfq, t.lo_val, t.hi_val,
        |  CAST(CASE WHEN s.selfq < t.lo_val OR s.selfq > t.hi_val
        |    THEN 1 ELSE 0 END AS INT) AS is_outlier
        |FROM s, t ORDER BY vec_id""".stripMargin,

    // outlier-sketch accuracy gate: the same ±5-rank-point envelope
    // lattice as the grouped-quantile sketch check, over the selfq
    // relation derived from the shared code formula; ok pinned to 1
    "x_embed_outliers_sketch_check" ->
      raw"""WITH $quantCodesCte,
        |s AS (SELECT vec_id,
        |    CAST(list_sum(list_transform(code, x -> x * x)) AS BIGINT) AS selfq
        |  FROM c WHERE code IS NOT NULL),
        |r AS (SELECT 'all' AS grp, selfq AS value,
        |    CAST(ROW_NUMBER() OVER (ORDER BY selfq ASC) AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS n FROM s),
        |q(num, den, pct) AS (VALUES (1, 50, 2), (49, 50, 98)),
        |f AS (SELECT grp, n, rk, value, num, den, pct FROM r CROSS JOIN q),
        |lo AS (SELECT grp, pct, n, value AS exact_lo FROM f
        |  WHERE rk = GREATEST(
        |    ((20 * num - den) * n + 20 * den - 1) // (20 * den), 1)),
        |hi AS (SELECT grp, pct, value AS exact_hi FROM f
        |  WHERE rk = LEAST(
        |    ((20 * num + den) * n + 20 * den - 1) // (20 * den), n))
        |SELECT lo.grp AS grp, lo.pct AS pct, n, exact_lo, exact_hi,
        |  CAST(1 AS INT) AS ok
        |FROM lo JOIN hi ON lo.grp = hi.grp AND lo.pct = hi.pct
        |ORDER BY grp, pct""".stripMargin,

    // training-curve replay: one aggregate per asg{i} of the shared
    // iteration chain
    "x_embed_kmeans_fit" ->
      raw"""WITH ${kmeansCte(0, 3)}
        |${(1 to 4).map(i =>
             s"SELECT CAST($i AS INT) AS iter, " +
             s"(SELECT CAST(count(*) AS INT) FROM cent0) AS k, " +
             s"CAST(count(*) AS BIGINT) AS n, " +
             s"CAST(sum(d2) AS BIGINT) AS inertia FROM asg$i")
             .mkString("\n|UNION ALL\n|")}
        |ORDER BY iter""".stripMargin,

    // probe the 3 nearest final centroids (integer distance, ties to
    // the lowest cell), score cell members with the shared quantized
    // cosine (query-norm first), rank desc with neighbor_id ties
    "x_knn_ivf_lattice" ->
      raw"""WITH ${kmeansCte(0, 3)},
        |sq AS (SELECT vec_id, code, cl,
        |    CAST(list_sum(list_transform(code, x -> x * x)) AS BIGINT) AS selfq
        |  FROM asg4),
        |qr AS (
        |  SELECT q.vec_id AS query_id, q.code AS qcode, q.selfq AS qself, ct.cl,
        |    row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |      list_sum(list_transform(generate_series(1, len(q.code)),
        |        j -> (q.code[j] - ct.code[j]) * (q.code[j] - ct.code[j]))),
        |      ct.cl) AS rn
        |  FROM sq q, cent3 ct WHERE q.vec_id < 5),
        |pr AS (SELECT query_id, qcode, qself, cl FROM qr WHERE rn <= 3),
        |s AS (
        |  SELECT p.query_id, a.vec_id AS neighbor_id,
        |    CAST(list_sum(list_transform(generate_series(1, len(a.code)),
        |      j -> p.qcode[j] * a.code[j])) AS BIGINT) AS dq,
        |    p.qself AS sq2, a.selfq AS sn
        |  FROM pr p JOIN sq a ON a.cl = p.cl AND a.vec_id <> p.query_id),
        |r AS (SELECT query_id, neighbor_id, dq,
        |    dq / sqrt(CAST(sq2 AS DOUBLE)) / sqrt(CAST(sn AS DOUBLE)) AS qc,
        |    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY
        |      dq / sqrt(CAST(sq2 AS DOUBLE)) / sqrt(CAST(sn AS DOUBLE)) DESC,
        |      neighbor_id) AS rnk
        |  FROM s)
        |SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id,
        |  dq AS dot_q, ROUND(qc, 4) AS qcosine
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,

    // drift replay: parity halves of the final assignment, full outer
    // on cluster, shares as fixed-order divisions of exact integers,
    // flag via HUGEINT cross-multiplication == Spark's DECIMAL(38,0)
    "x_embed_cluster_drift" ->
      raw"""WITH ${kmeansCte(0, 3)},
        |b AS (SELECT cl, CAST(count(*) AS BIGINT) AS n_base
        |  FROM asg4 WHERE vec_id % 2 = 0 GROUP BY cl),
        |cr AS (SELECT cl, CAST(count(*) AS BIGINT) AS n_cur
        |  FROM asg4 WHERE vec_id % 2 <> 0 GROUP BY cl),
        |j AS (SELECT COALESCE(b.cl, cr.cl) AS cluster,
        |    CAST(COALESCE(n_base, 0) AS BIGINT) AS n_base,
        |    CAST(COALESCE(n_cur, 0) AS BIGINT) AS n_cur
        |  FROM b FULL JOIN cr ON b.cl = cr.cl),
        |t AS (SELECT CAST(SUM(n_base) AS BIGINT) AS tb,
        |    CAST(SUM(n_cur) AS BIGINT) AS tc FROM j)
        |SELECT cluster, n_base, n_cur,
        |  CASE WHEN tb > 0
        |    THEN ROUND(CAST(n_base AS DOUBLE) / tb, 4) END AS share_base,
        |  CASE WHEN tc > 0
        |    THEN ROUND(CAST(n_cur AS DOUBLE) / tc, 4) END AS share_cur,
        |  CASE WHEN tb > 0 AND tc > 0 THEN ROUND(
        |    CAST(n_cur AS DOUBLE) / tc - CAST(n_base AS DOUBLE) / tb, 4)
        |    END AS delta_share,
        |  CAST(CASE WHEN
        |      abs(CAST(n_cur AS HUGEINT) * tb - CAST(n_base AS HUGEINT) * tc)
        |        * 10 > CAST(1 AS HUGEINT) * tb * tc
        |    THEN 1 ELSE 0 END AS INT) AS drift
        |FROM j, t ORDER BY cluster""".stripMargin,

    // replay: same per-cluster md5 rank as the stratified-sample
    // oracle, over the lattice assignment
    "x_sample_cluster" ->
      raw"""WITH ${kmeansCte(0, 3)},
        |rk AS (
        |  SELECT cl AS cluster, vec_id,
        |    CAST(row_number() OVER (PARTITION BY cl
        |      ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS INT) AS rnk
        |  FROM asg4)
        |SELECT cluster, rnk, vec_id FROM rk
        |WHERE rnk <= 3 ORDER BY cluster, rnk""".stripMargin,

    // nProbe == nCells probes every cell — the IVF+int8 composition
    // provably equals knnQuantized and shares its oracle
    "x_knn_quantized_ivf_check" -> knnQuantizedSql,

    // same cosine + ranking conventions as knnBruteSql; vote ties
    // break on the smaller label, mirroring the Spark window order
    "x_knn_classify" -> knnClassifySql,

    // nProbe == nCells scores every labeled vector — exact by
    // construction, so the IVF machinery shares the classify oracle
    "x_knn_classify_ivf_check" -> knnClassifySql,

    // IVF at nProbe == nCells returns brute top-k by construction
    // (r19: was nProbe=14, whose measured covering didn't hold at
    // sf0.001) — shared SQL pins the IVF machinery
    "x_knn_ivf_recall" -> knnBruteSql,

    // the persisted index is built from the SAME quantizer/assignment
    // as the in-session IVF path and queried at the same exhaustive
    // nProbe=16, so build→persist→read→query shares the brute oracle
    // end to end
    "x_knn_ivf_index" -> knnBruteSql,

    // nProbe == nCells scores every indexed vector — exact by
    // construction, pinning the build+append machinery (stored-
    // centroid assignment, partition append, no lost/dup vectors)
    "x_knn_ivf_index_append_check" -> knnBruteSql,

    // external-namespace queries: no self-exclusion, so each query
    // (an indexed vector under a relabeled id) finds itself at rank 1
    // with cosine 1.0; exhaustive probe makes the replication exact
    "x_knn_ivf_index_external_check" ->
      knnOracleSql("q.vec_id - 100", "q.vec_id >= 100 AND q.vec_id < 105",
        excludeSelf = false),

    // the persisted PQ store queries through the stored codebook +
    // codes at the covering depth (main row) / exhaustive depth
    // (append row) — both equal brute, sharing its oracle
    "x_knn_pq_store" -> knnBruteSql,
    "x_knn_pq_store_append_check" -> knnBruteSql,
    // the IVF×PQ composition at nProbe == nCells + exhaustive depth
    // is brute by construction — full oracle for the composed store
    "x_knn_ivfpq_store" -> knnBruteSql,
    "x_knn_ivfpq_store_append_check" -> knnBruteSql,
    "x_knn_ivfpq_store_external_check" ->
      knnOracleSql("q.vec_id - 100", "q.vec_id >= 100 AND q.vec_id < 105",
        excludeSelf = false),

    // pass-all margin + all-cells probes => the exact pair set:
    // replayed as a plain threshold join over the same parquet
    "x_dedup_embedding_store" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        |  FROM embeddings WHERE vec_id < 5),
        |j AS (SELECT q.query_id, c.vec_id AS corpus_id,
        |    list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
        |                           CAST(c.embedding AS DOUBLE[])) AS cos
        |  FROM q JOIN embeddings c ON
        |    list_cosine_similarity(CAST(q.qe AS DOUBLE[]),
        |                           CAST(c.embedding AS DOUBLE[])) >= 0.3)
        |SELECT query_id, corpus_id, ROUND(cos, 4) AS cosine
        |FROM j ORDER BY query_id, corpus_id""".stripMargin,
    "x_knn_pq_store_external_check" ->
      knnOracleSql("q.vec_id - 100", "q.vec_id >= 100 AND q.vec_id < 105",
        excludeSelf = false),

    // full algorithm replication: deterministic hyperplane literals →
    // DuckDB recomputes bucketing, multi-probe and top-k bit-exactly
    "x_knn_lsh" -> lshOracleSql,

    "x_text_tokens" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_tokens,
        |  n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    // same enrichment built from code points (chr = DuckDB's code-point
    // constructor; the Spark side embeds the identical chars as \u
    // literals), then DuckDB's own NFC replays the fold
    "x_text_normalize" ->
      """WITH e AS (
        |  SELECT doc_id,
        |    text || ' cafe' || chr(769) || ' nai' || chr(776) || 've ' || chr(233) AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(length(t) AS INT) AS n_pre,
        |  CAST(length(nfc_normalize(t)) AS INT) AS n_post,
        |  CAST(length(t) - length(nfc_normalize(t)) AS INT) AS n_folded,
        |  md5(nfc_normalize(t)) AS fp_norm
        |FROM e ORDER BY doc_id""".stripMargin,

    // the same planted pre/decomposed prefix-duplicates (chr() builds
    // the code points), keyed over nfc_normalize — DuckDB's fold must
    // land both variants on one key exactly like the Spark side's
    "x_dedup_exact_nfc" ->
      """WITH c AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |    'caf' || chr(233) || ' r' || chr(233) || 'sum' || chr(233) || ' ' || text
        |  FROM documents WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |    'cafe' || chr(769) || ' re' || chr(769) || 'sume' || chr(769) || ' ' || text
        |  FROM documents WHERE doc_id % 7 = 0)
        |SELECT array_to_string(string_split(nfc_normalize(text), ' ')[1:3], ' ') AS k,
        |  MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM c GROUP BY 1 ORDER BY k""".stripMargin,

    "x_text_quality" ->
      """SELECT doc_id,
        |  CAST(length(text) AS INT) AS n_chars_calc,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |  ROUND(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
        |        / greatest(length(text), 1), 4) AS punct_ratio,
        |  ROUND(CAST(len(list_filter(string_split(text, ' '),
        |          x -> x IN ('the','a','and','of','to','in','is','on','for'))) AS DOUBLE)
        |        / greatest(len(string_split(text, ' ')), 1), 4) AS stopword_ratio,
        |  ROUND(CAST(length(text) AS DOUBLE)
        |        / greatest(len(string_split(text, ' ')), 1), 4) AS mean_word_len
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x_text_langid" ->
      """WITH s AS (SELECT doc_id, lang,
        |  len(regexp_extract_all(text, '\b(the|and|of|to|is|was|for|with)\b')) AS s_en,
        |  len(regexp_extract_all(text, '\b(der|die|das|und|ist|nicht|ein|mit)\b')) AS s_de,
        |  len(regexp_extract_all(text, '\b(le|la|les|et|est|dans|pour|une)\b')) AS s_fr,
        |  len(regexp_extract_all(text, '\b(el|los|las|es|en|por|para|una)\b')) AS s_es,
        |  len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS s_zh
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE
        |    WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
        |    WHEN s_de > 0 AND s_de >= s_en AND s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
        |    WHEN s_fr > 0 AND s_fr >= s_en AND s_fr >= s_de AND s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
        |    WHEN s_es > 0 AND s_es >= s_en AND s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
        |    WHEN s_zh > 0 AND s_zh >= s_en AND s_zh >= s_de AND s_zh >= s_fr AND s_zh >= s_es THEN 'zh'
        |    ELSE 'und' END AS pred
        |FROM s ORDER BY doc_id""".stripMargin,

    "x_text_repetition" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct_words,
        |  CAST(list_max(list_transform(list_distinct(string_split(text, ' ')),
        |    x -> len(list_filter(string_split(text, ' '), y -> y = x)))) AS INT)
        |    AS top_word_count
        |FROM documents ORDER BY doc_id""".stripMargin,

    // same term literals as the Spark side (BlocklistTerms); tf hits
    // via list_filter, distinct hits via list_intersect on the
    // deduped token list
    "x_text_blocklist" -> blocklistSql,

    // the relation form computes the SAME function of (documents,
    // terms) — one oracle text serves both gate rows
    "x_text_blocklist_rel" -> blocklistSql,

    "x_fingerprint" ->
      """SELECT doc_id, md5(text) AS fp,
        |  md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp_norm
        |FROM documents ORDER BY doc_id""".stripMargin,

    // the same 64-bit wrapping polynomial as RollingHash, folded in
    // DuckDB over the UTF-8 bytes (signed, like JVM bytes) via hex +
    // list_reduce in HUGEINT with an explicit mod-2^64 — bit-exact
    // against the codegen Expression
    "x_fingerprint_rolling" ->
      """WITH hx AS (
        |  SELECT doc_id, hex(encode(text)) AS h FROM documents
        |), bytes AS (
        |  SELECT doc_id,
        |    list_transform(generate_series(1, length(h) // 2),
        |      i -> CASE WHEN ('0x' || substr(h, 2*i - 1, 2))::INT >= 128
        |                THEN (('0x' || substr(h, 2*i - 1, 2))::INT - 256)::HUGEINT
        |                ELSE ('0x' || substr(h, 2*i - 1, 2))::INT::HUGEINT END) AS bs
        |  FROM hx
        |), folded AS (
        |  SELECT doc_id,
        |    list_reduce(list_prepend(0::HUGEINT, bs),
        |      (acc, b) -> (((acc * 1000003::HUGEINT + b)
        |        % 18446744073709551616::HUGEINT)
        |        + 18446744073709551616::HUGEINT) % 18446744073709551616::HUGEINT) AS m
        |  FROM bytes)
        |SELECT doc_id,
        |  CAST(CASE WHEN m >= 9223372036854775808::HUGEINT
        |            THEN m - 18446744073709551616::HUGEINT ELSE m END AS BIGINT) AS fp
        |FROM folded ORDER BY doc_id""".stripMargin,

    // identical PII construction + identical patterns (Java-regex ∩
    // RE2 subset); regexp_replace needs the 'g' flag in DuckDB
    "x_text_pii" ->
      """WITH e AS (
        |  SELECT doc_id,
        |    substr(text, 1, 40) || ' contact user' || CAST(doc_id AS VARCHAR)
        |      || '@mail.example or +1-555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0')
        |      || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.1' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
        |  CAST(len(regexp_extract_all(t,
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phone,
        |  CAST(len(regexp_extract_all(t,
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ip,
        |  md5(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'))
        |    AS fp_redacted
        |FROM e ORDER BY doc_id""".stripMargin,

    "x_text_gopher" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_words,
        |    CAST(length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS INT) AS n_alpha,
        |    CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS INT) AS n_punct,
        |    CAST(len(list_intersect(list_distinct(string_split(text, ' ')),
        |      ['the','a','and','of','to','in','is','on','for'])) AS INT) AS n_stop
        |  FROM documents)
        |SELECT doc_id,
        |  (n_words >= 10 AND n_words <= 100000) AS r_word_count,
        |  (n_alpha >= n_words * 3 AND n_alpha <= n_words * 10) AS r_mean_word_len,
        |  (n_punct * 10 < n_words) AS r_symbol_ratio,
        |  (n_stop >= 2) AS r_stopwords,
        |  ((n_words >= 10 AND n_words <= 100000)
        |   AND (n_alpha >= n_words * 3 AND n_alpha <= n_words * 10)
        |   AND (n_punct * 10 < n_words) AND (n_stop >= 2)) AS keep
        |FROM s ORDER BY doc_id""".stripMargin,

    // SUM(BIGINT) is HUGEINT in DuckDB — cast every aggregate back
    "x_text_unigram_rarity" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        |f AS (SELECT w, COUNT(*) AS freq FROM t GROUP BY w)
        |SELECT t.doc_id, COUNT(*) AS n_tokens,
        |  CAST(SUM(f.freq) AS BIGINT) AS sum_freq,
        |  CAST(MIN(f.freq) AS BIGINT) AS min_freq,
        |  CAST(SUM(CASE WHEN f.freq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
        |FROM t JOIN f USING (w)
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    // per-doc keywords: tf·(1e6 // df) weights, ROW_NUMBER ties
    // (weight DESC, tok), rk cast to INT to match Spark row_number
    "x_text_keywords" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |dfr AS (SELECT tok, COUNT(*) AS df
        |  FROM (SELECT DISTINCT doc_id, tok FROM tok) GROUP BY 1),
        |w AS (
        |  SELECT tf.doc_id, tf.tok,
        |    CAST(tf.tf * (1000000 // dfr.df) AS BIGINT) AS weight,
        |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |      ORDER BY tf.tf * (1000000 // dfr.df) DESC, tf.tok) AS rk
        |  FROM tf JOIN dfr USING (tok))
        |SELECT doc_id, CAST(rk AS INT) AS rk, tok, weight
        |FROM w WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin,

    // trained token-rate classifier: the whole train-score loop
    // replayed as one CTE chain — md5 split, ppm rate-difference
    // weights (// on positives = Spark div; the subtraction can go
    // negative but both operands of each // are non-negative), argmax
    // via ROW_NUMBER with the same (score DESC, label) tie order,
    // out-of-vocabulary docs LEFT-join to '?' / 0
    "x_text_classify" -> (classifyCte +
      raw"""
        |SELECT h.doc_id, h.lang AS label,
        |  COALESCE(p.predicted, '?') AS predicted,
        |  CAST(COALESCE(p.score, 0) AS BIGINT) AS score
        |FROM ho h LEFT JOIN (SELECT * FROM pred WHERE rn = 1) p USING (doc_id)
        |ORDER BY h.doc_id""".stripMargin),

    "x_text_classify_confusion" -> (classifyCte +
      raw"""
        |SELECT label, predicted, COUNT(*) AS n FROM (
        |  SELECT h.lang AS label, COALESCE(p.predicted, '?') AS predicted
        |  FROM ho h LEFT JOIN (SELECT * FROM pred WHERE rn = 1) p USING (doc_id))
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // trigram hapax share per doc in integer ppm (// = DuckDB integer
    // division = Spark's div); trigram-less docs LEFT-join to 0/0/NULL
    "x_text_novelty" ->
      raw"""WITH $shingleCte,
        |tok AS (SELECT doc_id, unnest(g) AS shingle FROM d),
        |dfr AS (SELECT shingle, COUNT(*) AS df FROM tok GROUP BY 1),
        |per AS (
        |  SELECT tok.doc_id, COUNT(*) AS n_grams,
        |    CAST(SUM(CASE WHEN dfr.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique
        |  FROM tok JOIN dfr USING (shingle) GROUP BY 1)
        |SELECT doc.doc_id,
        |  COALESCE(per.n_grams, 0) AS n_grams,
        |  COALESCE(per.n_unique, 0) AS n_unique,
        |  CASE WHEN per.n_grams IS NOT NULL
        |    THEN (1000000 * per.n_unique) // per.n_grams END AS novelty_ppm
        |FROM documents doc LEFT JOIN per ON doc.doc_id = per.doc_id
        |ORDER BY doc.doc_id""".stripMargin,

    // DuckDB `//` and Spark `div` are both exact integer division
    // (operands positive here, so floor == truncate); range(1, n) is
    // end-exclusive = bigram start positions 1..n-1, matching Spark's
    // sequence(1, n-1)
    // held-out variant: model CTEs aggregate the src0 slice only,
    // scored docs LEFT-join it; COALESCE mirrors Spark's when(seen)
    // lattice exactly (0 ppm for out-of-model bigrams)
    "x_text_bigram_lm_cross" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
        |  FROM documents),
        |b AS (SELECT doc_id, source,
        |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
        |  FROM w),
        |tr AS (SELECT bg, COUNT(*) AS tf FROM b
        |  WHERE source = 'src0' GROUP BY bg),
        |c AS (SELECT bg, CAST(SUM(tf) AS BIGINT) AS cbg FROM tr GROUP BY bg),
        |c1 AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(SUM(tf) AS BIGINT) AS cw1
        |  FROM tr GROUP BY 1),
        |t AS (SELECT doc_id, bg, COUNT(*) AS tf FROM b
        |  WHERE source <> 'src0' GROUP BY doc_id, bg),
        |j AS (SELECT t.doc_id, t.tf, c.cbg,
        |    CASE WHEN c.cbg IS NOT NULL
        |      THEN (1000000 * c.cbg) // c1.cw1 ELSE 0 END AS cond
        |  FROM t LEFT JOIN c USING (bg)
        |         LEFT JOIN c1 ON split_part(t.bg, ' ', 1) = c1.w1)
        |SELECT doc_id,
        |  CAST(SUM(tf) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(tf * cond) AS BIGINT) AS sum_cond_ppm,
        |  CAST(COALESCE(MIN(CASE WHEN cbg IS NOT NULL THEN cond END), 0)
        |    AS BIGINT) AS min_seen_cond_ppm,
        |  CAST(SUM(CASE WHEN cbg IS NULL THEN tf ELSE 0 END) AS BIGINT) AS n_oov
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "x_text_bigram_lm" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |b AS (SELECT doc_id,
        |    unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])) AS bg
        |  FROM w),
        |t AS (SELECT doc_id, bg, COUNT(*) AS tf FROM b GROUP BY doc_id, bg),
        |c AS (SELECT bg, CAST(SUM(tf) AS BIGINT) AS cbg FROM t GROUP BY bg),
        |c1 AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(SUM(tf) AS BIGINT) AS cw1
        |  FROM t GROUP BY 1)
        |SELECT t.doc_id,
        |  CAST(SUM(t.tf) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(t.tf * ((1000000 * c.cbg) // c1.cw1)) AS BIGINT) AS sum_cond_ppm,
        |  CAST(MIN((1000000 * c.cbg) // c1.cw1) AS BIGINT) AS min_cond_ppm,
        |  CAST(SUM(CASE WHEN c.cbg = 1 THEN t.tf ELSE 0 END) AS BIGINT) AS n_novel
        |FROM t JOIN c USING (bg) JOIN c1 ON split_part(t.bg, ' ', 1) = c1.w1
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,

    // the same integer-ppm lattice as the Spark side, literally: all
    // divisions are `//` over positive BIGINTs (floor == truncate ==
    // Spark `div`), the idf is the log-free odds ratio, and the only
    // HUGEINT (DuckDB's SUM) casts back — so the top-k scores compare
    // bit-for-bit
    "x_search_bm25" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM toks),
        |stats AS (SELECT COUNT(*) AS nn, CAST(SUM(dl) AS BIGINT) AS tt FROM dl),
        |tf AS (SELECT doc_id, w AS term, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(ws) AS w FROM toks)
        |  WHERE w IN ('spark', 'merge', 'hash') GROUP BY doc_id, w),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |sc AS (SELECT tf.doc_id, tf.tf, dfreq.df, dl.dl, stats.nn,
        |    (1000000 * dl.dl * stats.nn) // stats.tt AS nd_ppm
        |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
        |ts AS (SELECT doc_id, dl,
        |    ((1000000 * (2 * nn - 2 * df + 1)) // (2 * df + 1))
        |      * ((44000000 * tf * 1000000)
        |         // (20000000 * tf + 6000000 + 18 * nd_ppm))
        |      // 1000000 AS term_score
        |  FROM sc),
        |agg AS (SELECT doc_id, CAST(SUM(term_score) AS BIGINT) AS score,
        |    COUNT(*) AS n_hit, MAX(dl) AS n_tokens
        |  FROM ts GROUP BY doc_id),
        |r AS (SELECT doc_id, score, n_hit, n_tokens,
        |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk FROM agg)
        |SELECT CAST(rnk AS INT) AS rank, doc_id, score, n_hit, n_tokens
        |FROM r WHERE rnk <= 10 ORDER BY rank""".stripMargin,

    // the disjunctive lattice + a HAVING on the distinct-term count
    "x_search_bm25_conj" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM toks),
        |stats AS (SELECT COUNT(*) AS nn, CAST(SUM(dl) AS BIGINT) AS tt FROM dl),
        |tf AS (SELECT doc_id, w AS term, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(ws) AS w FROM toks)
        |  WHERE w IN ('spark', 'merge', 'hash') GROUP BY doc_id, w),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |sc AS (SELECT tf.doc_id, tf.tf, dfreq.df, dl.dl, stats.nn,
        |    (1000000 * dl.dl * stats.nn) // stats.tt AS nd_ppm
        |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
        |ts AS (SELECT doc_id, dl,
        |    ((1000000 * (2 * nn - 2 * df + 1)) // (2 * df + 1))
        |      * ((44000000 * tf * 1000000)
        |         // (20000000 * tf + 6000000 + 18 * nd_ppm))
        |      // 1000000 AS term_score
        |  FROM sc),
        |agg AS (SELECT doc_id, CAST(SUM(term_score) AS BIGINT) AS score,
        |    COUNT(*) AS n_hit, MAX(dl) AS n_tokens
        |  FROM ts GROUP BY doc_id HAVING COUNT(*) = 3),
        |r AS (SELECT doc_id, score, n_hit, n_tokens,
        |    ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk FROM agg)
        |SELECT CAST(rnk AS INT) AS rank, doc_id, score, n_hit, n_tokens
        |FROM r WHERE rnk <= 10 ORDER BY rank""".stripMargin,

    // first-iteration BPE pair weights: per-word char pairs (overlaps
    // included, the classic count) weighted by corpus word frequency;
    // parallel unnest of equal-length lists zips positionally
    "x_text_bpe_pairs" ->
      """WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        |v AS (SELECT word, COUNT(*) AS freq FROM w
        |  WHERE length(word) > 0 GROUP BY word),
        |p AS (SELECT freq,
        |    unnest(list_transform(generate_series(1, length(word) - 1),
        |      i -> substr(word, i, 1))) AS l_sym,
        |    unnest(list_transform(generate_series(1, length(word) - 1),
        |      i -> substr(word, i + 1, 1))) AS r_sym
        |  FROM v WHERE length(word) >= 2),
        |agg AS (SELECT l_sym, r_sym, CAST(SUM(freq) AS BIGINT) AS weight
        |  FROM p GROUP BY 1, 2),
        |r AS (SELECT l_sym, r_sym, weight,
        |    ROW_NUMBER() OVER (ORDER BY weight DESC, l_sym, r_sym) AS rnk
        |  FROM agg)
        |SELECT CAST(rnk AS INT) AS rank, l_sym, r_sym, weight
        |FROM r WHERE rnk <= 20 ORDER BY rank""".stripMargin,

    // BPE encode under the pinned merge table. Each merge output is a
    // single private-use char (chr 57344+rank), so applying merge k is
    // one left-to-right non-overlapping replace over the partially
    // encoded word — exactly the symbol-fold semantics of the Spark
    // side, reached by entirely different machinery. Later merges
    // reference earlier outputs via their chars (th+e, an+d).
    "x_text_bpe_tokens" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
        |  FROM documents),
        |nw AS (SELECT doc_id, word FROM w WHERE length(word) > 0),
        |enc AS (SELECT doc_id, length(word) AS nc, length(
        |    replace(replace(replace(replace(replace(replace(replace(replace(
        |      word,
        |      'th', chr(57344)),
        |      chr(57344) || 'e', chr(57345)),
        |      'in', chr(57346)),
        |      'an', chr(57347)),
        |      chr(57347) || 'd', chr(57348)),
        |      'er', chr(57349)),
        |      'on', chr(57350)),
        |      're', chr(57351))) AS nt
        |  FROM nw)
        |SELECT doc_id, COUNT(*) AS n_words,
        |  CAST(SUM(nc) AS BIGINT) AS n_chars,
        |  CAST(SUM(nt) AS BIGINT) AS n_tokens
        |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same lattice as the single-query oracle with the query relation
    // as a VALUES CTE; df is global, the top-k window partitions by
    // query
    "x_search_bm25_multi" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |q(query_id, term) AS (VALUES
        |  (1, 'spark'), (1, 'merge'), (1, 'hash'),
        |  (2, 'window'), (2, 'scan'),
        |  (3, 'join'), (3, 'filter'), (3, 'sort')),
        |dl AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM toks),
        |stats AS (SELECT COUNT(*) AS nn, CAST(SUM(dl) AS BIGINT) AS tt FROM dl),
        |tf AS (SELECT doc_id, w AS term, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(ws) AS w FROM toks)
        |  WHERE w IN (SELECT term FROM q) GROUP BY doc_id, w),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |sc AS (SELECT q.query_id, tf.doc_id, tf.tf, dfreq.df, dl.dl, stats.nn,
        |    (1000000 * dl.dl * stats.nn) // stats.tt AS nd_ppm
        |  FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id)
        |       CROSS JOIN stats JOIN q ON tf.term = q.term),
        |ts AS (SELECT query_id, doc_id,
        |    ((1000000 * (2 * nn - 2 * df + 1)) // (2 * df + 1))
        |      * ((44000000 * tf * 1000000)
        |         // (20000000 * tf + 6000000 + 18 * nd_ppm))
        |      // 1000000 AS term_score
        |  FROM sc),
        |agg AS (SELECT query_id, doc_id,
        |    CAST(SUM(term_score) AS BIGINT) AS score, COUNT(*) AS n_hit
        |  FROM ts GROUP BY query_id, doc_id),
        |r AS (SELECT query_id, doc_id, score, n_hit,
        |    ROW_NUMBER() OVER (PARTITION BY query_id
        |      ORDER BY score DESC, doc_id) AS rnk FROM agg)
        |SELECT CAST(query_id AS BIGINT) AS query_id, CAST(rnk AS INT) AS rank,
        |  doc_id, score, n_hit
        |FROM r WHERE rnk <= 5 ORDER BY query_id, rank""".stripMargin,

    // brute all-pairs reference the chunk-index path provably equals
    // (pigeonhole completeness); banded levenshtein values agree with
    // the unbanded oracle on kept pairs by definition
    "x_dedup_edit_distance" ->
      """WITH s AS (SELECT doc_id, substr(text, 1, 40) AS s FROM documents
        |  WHERE length(substr(text, 1, 40)) >= 1)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.s, b.s) AS INT) AS dist
        |FROM s a JOIN s b ON a.doc_id < b.doc_id AND a.doc_id < 200
        |WHERE levenshtein(a.s, b.s) <= 3
        |ORDER BY doc_a, doc_b""".stripMargin,

    // positional containment: range(1, len) is end-exclusive = start
    // positions 1..len-1, matching Spark's sequence(1, size-1) for a
    // 2-token phrase; list indexing is 1-based in both engines
    "x_search_phrase" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(list_filter(range(1, len(ws)), i ->
        |      ws[i] = 'batch' AND ws[i+1] = 'batch')) AS BIGINT) AS n_occur
        |  FROM toks WHERE len(ws) >= 2),
        |r AS (SELECT doc_id, n_occur,
        |    ROW_NUMBER() OVER (ORDER BY n_occur DESC, doc_id) AS rnk
        |  FROM m WHERE n_occur > 0)
        |SELECT CAST(rnk AS INT) AS rank, doc_id, n_occur
        |FROM r WHERE rnk <= 10 ORDER BY rank""".stripMargin,

    // ROW_NUMBER is BIGINT in DuckDB, INT in Spark — cast; COUNT(*)
    // is BIGINT in both
    "x_text_top_terms" ->
      """WITH tf AS (
        |  SELECT doc_id, w AS term, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY doc_id, w),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |r AS (
        |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY tf.doc_id
        |      ORDER BY df.df ASC, tf.tf DESC, tf.term ASC) AS INT) AS rnk
        |  FROM tf JOIN df USING (term))
        |SELECT doc_id, rnk, term, tf, df FROM r
        |WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    // identical integer rank lattice: ceil via (num·n + den−1) // den,
    // both sides pure BIGINT; ROW_NUMBER/ COUNT windows match
    "x_profile_group_quantiles" ->
      """WITH r AS (SELECT source AS grp, n_chars AS value,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars ASC) AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM documents WHERE n_chars IS NOT NULL),
        |q(num, den, pct) AS (VALUES (1, 2, 50), (9, 10, 90), (99, 100, 99))
        |SELECT grp, pct, n, CAST(rk AS INT) AS rank, value
        |FROM r CROSS JOIN q
        |WHERE rk = (num * n + den - 1) // den
        |ORDER BY grp, pct""".stripMargin,

    // grouped-sketch accuracy gate: exact type-1 envelope values at
    // the p ± 1/20 clamp ranks (same integer-rational rank lattice as
    // the exact query) with every ok flag pinned to 1 — the Spark
    // side computes ok from the real approx-vs-envelope comparison,
    // so sketch drift hash-mismatches here instead of hiding behind
    // the sketch row's rows-only check
    "x_profile_group_quantiles_sketch_check" ->
      """WITH r AS (SELECT source AS grp, n_chars AS value,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_chars ASC) AS BIGINT) AS rk,
        |    CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
        |  FROM documents WHERE n_chars IS NOT NULL),
        |q(num, den, pct) AS (VALUES (1, 2, 50), (9, 10, 90), (99, 100, 99)),
        |f AS (SELECT grp, n, rk, value, num, den, pct FROM r CROSS JOIN q),
        |lo AS (SELECT grp, pct, n, value AS exact_lo FROM f
        |  WHERE rk = GREATEST(
        |    ((20 * num - den) * n + 20 * den - 1) // (20 * den), 1)),
        |hi AS (SELECT grp, pct, value AS exact_hi FROM f
        |  WHERE rk = LEAST(
        |    ((20 * num + den) * n + 20 * den - 1) // (20 * den), n))
        |SELECT lo.grp AS grp, lo.pct AS pct, n, exact_lo, exact_hi,
        |  CAST(1 AS INT) AS ok
        |FROM lo JOIN hi ON lo.grp = hi.grp AND lo.pct = hi.pct
        |ORDER BY grp, pct""".stripMargin,

    // identical moment lattice: every sum CAST back from HUGEINT to
    // BIGINT BEFORE the products so both engines multiply the same
    // 64-bit values; DuckDB round() and Spark round() agree half-up
    // for the positive tax/discount scalings
    "x_profile_corr" ->
      """WITH t AS (SELECT
        |    CAST(l_quantity AS BIGINT) AS qty,
        |    CAST(round(l_tax * 100) AS BIGINT) AS tax_pct,
        |    CAST(round(l_discount * 100) AS BIGINT) AS disc_pct
        |  FROM lineitem),
        |a AS (SELECT COUNT(*) AS n,
        |    CAST(SUM(qty) AS BIGINT) AS s_qty,
        |    CAST(SUM(tax_pct) AS BIGINT) AS s_tax,
        |    CAST(SUM(disc_pct) AS BIGINT) AS s_disc,
        |    CAST(SUM(qty * qty) AS BIGINT) AS s2_qty,
        |    CAST(SUM(tax_pct * tax_pct) AS BIGINT) AS s2_tax,
        |    CAST(SUM(disc_pct * disc_pct) AS BIGINT) AS s2_disc,
        |    CAST(SUM(qty * tax_pct) AS BIGINT) AS sp_qt,
        |    CAST(SUM(qty * disc_pct) AS BIGINT) AS sp_qd,
        |    CAST(SUM(tax_pct * disc_pct) AS BIGINT) AS sp_td
        |  FROM t),
        |p AS (
        |  SELECT 'qty~tax_pct' AS pair, n, n * sp_qt - s_qty * s_tax AS num,
        |    n * s2_qty - s_qty * s_qty AS den_x,
        |    n * s2_tax - s_tax * s_tax AS den_y FROM a
        |  UNION ALL
        |  SELECT 'qty~disc_pct', n, n * sp_qd - s_qty * s_disc,
        |    n * s2_qty - s_qty * s_qty, n * s2_disc - s_disc * s_disc FROM a
        |  UNION ALL
        |  SELECT 'tax_pct~disc_pct', n, n * sp_td - s_tax * s_disc,
        |    n * s2_tax - s_tax * s_tax, n * s2_disc - s_disc * s_disc FROM a)
        |SELECT pair, n, CAST(num AS BIGINT) AS num,
        |  CAST(den_x AS BIGINT) AS den_x, CAST(den_y AS BIGINT) AS den_y,
        |  CASE WHEN den_x > 0 AND den_y > 0 THEN
        |    ROUND(CAST(num AS DOUBLE) / sqrt(CAST(den_x AS DOUBLE))
        |          / sqrt(CAST(den_y AS DOUBLE)), 4) END AS corr
        |FROM p ORDER BY pair""".stripMargin,

    // SUM over a CASE is HUGEINT in DuckDB — cast back to BIGINT;
    // min/max carry data values unchanged, so DOUBLE compares exactly
    "x_profile_lineitem" ->
      """WITH a AS (SELECT
        |  COUNT(*) AS n,
        |  CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS qn,
        |  COUNT(DISTINCT l_quantity) AS qd,
        |  CAST(MIN(l_quantity) AS DOUBLE) AS qmin, CAST(MAX(l_quantity) AS DOUBLE) AS qmax,
        |  CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS en,
        |  COUNT(DISTINCT l_extendedprice) AS ed,
        |  CAST(MIN(l_extendedprice) AS DOUBLE) AS emin, CAST(MAX(l_extendedprice) AS DOUBLE) AS emax,
        |  CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS dn,
        |  COUNT(DISTINCT l_discount) AS dd,
        |  CAST(MIN(l_discount) AS DOUBLE) AS dmin, CAST(MAX(l_discount) AS DOUBLE) AS dmax,
        |  CAST(SUM(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |  COUNT(DISTINCT l_tax) AS td,
        |  CAST(MIN(l_tax) AS DOUBLE) AS tmin, CAST(MAX(l_tax) AS DOUBLE) AS tmax
        |FROM lineitem)
        |SELECT 'l_discount' AS "column", n AS n_rows, dn AS n_null,
        |  dd AS n_distinct, dmin AS min_v, dmax AS max_v FROM a
        |UNION ALL SELECT 'l_extendedprice', n, en, ed, emin, emax FROM a
        |UNION ALL SELECT 'l_quantity', n, qn, qd, qmin, qmax FROM a
        |UNION ALL SELECT 'l_tax', n, tn, td, tmin, tmax FROM a
        |ORDER BY "column"""".stripMargin,

    "x_sample_stratified" ->
      """SELECT doc_id, lang, CAST(ROW_NUMBER() OVER (PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS INT) AS rnk
        |FROM documents
        |QUALIFY rnk <= 5 ORDER BY lang, rnk""".stripMargin,

    // the salt phase is provably output-invariant, so the oracle is
    // just the single global window the two-phase rank computes
    "x_sample_source_cap" ->
      raw"""WITH $capRankCte
        |SELECT doc_id, source, score, rk AS rank_in_group
        |FROM r WHERE rk <= 10 ORDER BY doc_id""".stripMargin,

    // full-outer on the cell keys with explicit zero fills — the
    // share divisions happen once per side, exactly as Spark's
    "x_corpus_drift" ->
      """WITH cur AS (
        |  SELECT source, lang, count(*) AS n
        |  FROM documents WHERE doc_id % 10 = 0 GROUP BY source, lang),
        |prv AS (
        |  SELECT source, lang, count(*) AS n
        |  FROM documents WHERE doc_id % 10 <> 0 GROUP BY source, lang),
        |a AS (
        |  SELECT source, lang, CAST(n AS BIGINT) AS n_cur,
        |    CAST(n AS DOUBLE) / (SELECT CAST(sum(n) AS BIGINT) FROM cur)
        |      AS share_cur
        |  FROM cur),
        |b AS (
        |  SELECT source, lang, CAST(n AS BIGINT) AS n_prev,
        |    CAST(n AS DOUBLE) / (SELECT CAST(sum(n) AS BIGINT) FROM prv)
        |      AS share_prev
        |  FROM prv)
        |SELECT coalesce(a.source, b.source) AS source,
        |  coalesce(a.lang, b.lang) AS lang,
        |  coalesce(a.n_cur, 0) AS n_cur,
        |  coalesce(a.share_cur, 0.0) AS share_cur,
        |  coalesce(b.n_prev, 0) AS n_prev,
        |  coalesce(b.share_prev, 0.0) AS share_prev,
        |  coalesce(a.share_cur, 0.0) - coalesce(b.share_prev, 0.0)
        |    AS delta_share
        |FROM a FULL OUTER JOIN b USING (source, lang)
        |ORDER BY source, lang""".stripMargin,

    // same trigram construction as the self-dedup family; the oracle
    // pays the small cross product the Spark side never does
    "x_dedup_incremental" -> dedupIncrementalSql,

    // the persisted gram store replays the exact in-session
    // incremental dedup (shared candidate join + integer cut), so the
    // build→persist→append→batch-dedup loop shares its oracle
    "x_dedup_incremental_store" -> dedupIncrementalSql,

    // NOT EXISTS mirrors left-anti NULL semantics exactly (a NULL fk
    // matches nothing on either engine and counts as a violation)
    "x_integrity_audit" ->
      """SELECT 'customer_orphan_nation' AS "check",
        |  CAST(count(*) AS BIGINT) AS n_violations
        |FROM customer c WHERE NOT EXISTS
        |  (SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
        |UNION ALL
        |SELECT 'lineitem_nonpositive_qty', CAST(count(*) AS BIGINT)
        |FROM lineitem WHERE l_quantity <= 0
        |UNION ALL
        |SELECT 'lineitem_negative_price', CAST(count(*) AS BIGINT)
        |FROM lineitem WHERE l_extendedprice < 0
        |UNION ALL
        |SELECT 'lineitem_orphan_orders', CAST(count(*) AS BIGINT)
        |FROM lineitem l WHERE NOT EXISTS
        |  (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |UNION ALL
        |SELECT 'lineitem_unique_line',
        |  CAST(count(*) - count(DISTINCT (l_orderkey, l_linenumber)) AS BIGINT)
        |FROM lineitem
        |UNION ALL
        |SELECT 'orders_discount_range', CAST(count(*) AS BIGINT)
        |FROM lineitem WHERE l_discount < 0 OR l_discount > 1
        |UNION ALL
        |SELECT 'orders_orphan_customer', CAST(count(*) AS BIGINT)
        |FROM orders o WHERE NOT EXISTS
        |  (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        |UNION ALL
        |SELECT 'orders_unique_key',
        |  CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'supplier_orphan_nation', CAST(count(*) AS BIGINT)
        |FROM supplier s WHERE NOT EXISTS
        |  (SELECT 1 FROM nation n WHERE n.n_nationkey = s.s_nationkey)
        |ORDER BY "check"""".stripMargin,

    "x_profile_histogram" ->
      """SELECT CAST(FLOOR((l_quantity - 1.0) / 5.0) AS BIGINT) AS bucket,
        |  CAST(1.0 + CAST(FLOOR((l_quantity - 1.0) / 5.0) AS BIGINT) * 5.0 AS DOUBLE) AS lo,
        |  CAST(1.0 + (CAST(FLOOR((l_quantity - 1.0) / 5.0) AS BIGINT) + 1) * 5.0 AS DOUBLE) AS hi,
        |  COUNT(*) AS n
        |FROM lineitem WHERE l_quantity IS NOT NULL
        |GROUP BY 1 ORDER BY bucket""".stripMargin,

    // integer division is // in DuckDB (/ returns DOUBLE); list
    // slicing clamps out-of-range on both engines; the series bound is
    // ⌈(n−50)/40⌉ clamped at 0 — no trailing window fully contained
    // in its predecessor
    "x_text_chunk" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS w,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, w, n,
        |    unnest(generate_series(0, greatest(n - 50 + 39, 0) // 40)) AS ix
        |  FROM d)
        |SELECT doc_id, CAST(ix AS INT) AS chunk_ix,
        |  CAST(least(n - ix * 40, 50) AS INT) AS n_tokens,
        |  md5(array_to_string(w[ix * 40 + 1 : ix * 40 + 50], ' ')) AS fp_chunk
        |FROM c ORDER BY doc_id, chunk_ix""".stripMargin,

    // windowed SUM is HUGEINT in DuckDB — cast before the bin divide
    "x_pack_sequences" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      - n_tokens, 0) AS BIGINT) AS start_tok
        |  FROM t)
        |SELECT source, start_tok // 512 AS bin, COUNT(*) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
        |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
        |FROM r GROUP BY source, bin ORDER BY source, bin""".stripMargin,

    "x_events_funnel" ->
      """WITH per AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM events GROUP BY user_id)
        |SELECT
        |  CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(SUM(CASE WHEN t_view < t_click THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click,
        |  CAST(SUM(CASE WHEN t_view < t_click AND t_click < t_purchase
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_view_click_purchase
        |FROM per""".stripMargin,

    // same md5-bucket convention as the sampling oracles; the cuts
    // are exact integer division, so no float boundary anywhere
    "x_mixture_rebalance" ->
      """WITH n AS (SELECT lang AS stratum, CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY 1),
        |m AS (SELECT stratum, n_docs, MIN(n_docs) OVER () AS mn FROM n),
        |cuts AS (SELECT stratum, n_docs,
        |  CAST((mn * 10000) // n_docs AS INT) AS cut FROM m),
        |b AS (SELECT doc_id, lang AS stratum,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
        |         % 10000 AS INT) AS bucket
        |  FROM documents)
        |SELECT b.stratum, cuts.n_docs, cuts.cut,
        |  CAST(SUM(CASE WHEN b.bucket < cuts.cut THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM b JOIN cuts USING (stratum)
        |GROUP BY b.stratum, cuts.n_docs, cuts.cut
        |ORDER BY stratum""".stripMargin,

    // mixture planner: all-integer ppm shares and keep rates;
    // SUM(BIGINT)→HUGEINT cast back before the // arithmetic
    "x_mix_plan" ->
      """WITH per AS (
        |  SELECT source AS stratum,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS all_toks,
        |  COUNT(*) AS k FROM per),
        |p AS (
        |  SELECT stratum, toks,
        |    (1000000 * toks) // all_toks AS actual_ppm,
        |    1000000 // k AS target_ppm
        |  FROM per CROSS JOIN tot)
        |SELECT stratum, toks, actual_ppm, target_ppm,
        |  CASE WHEN actual_ppm <= target_ppm THEN 1000000
        |       ELSE (1000000 * target_ppm) // actual_ppm END AS keep_rate_ppm
        |FROM p ORDER BY stratum""".stripMargin,

    // the plan applied through the shared md5-bucket survival idiom
    "x_mix_apply" ->
      """WITH per AS (
        |  SELECT source AS stratum,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY 1),
        |tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS all_toks,
        |  COUNT(*) AS k FROM per),
        |plan AS (
        |  SELECT stratum AS source,
        |    CASE WHEN (1000000 * toks) // all_toks <= 1000000 // k THEN 1000000
        |         ELSE (1000000 * (1000000 // k)) // ((1000000 * toks) // all_toks)
        |    END AS keep_rate_ppm
        |  FROM per CROSS JOIN tot)
        |SELECT d.doc_id, d.source, plan.keep_rate_ppm,
        |  CAST(CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4))::INT
        |         % 10000 AS BIGINT) * 100 < plan.keep_rate_ppm
        |       THEN 1 ELSE 0 END AS INT) AS keep
        |FROM documents d JOIN plan USING (source)
        |ORDER BY d.doc_id""".stripMargin,

    // same md5-bucket scheme as x_split_assign, with the cut chosen
    // per source — DuckDB recomputes the survivor set exactly
    "x_sample_weighted" ->
      """WITH b AS (
        |  SELECT doc_id, source,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT
        |         % 10000 AS INT) AS bucket
        |  FROM documents)
        |SELECT doc_id, source, bucket FROM b
        |WHERE bucket < CASE source WHEN 'src0' THEN 10000
        |                           WHEN 'src1' THEN 5000
        |                           WHEN 'src2' THEN 2500
        |                           ELSE 1000 END
        |ORDER BY doc_id""".stripMargin,

    // shares are IEEE double divisions of identical integer counts —
    // bit-exact; SUM(BIGINT) needs the HUGEINT→BIGINT cast back
    "x_corpus_mixture" ->
      """WITH c AS (
        |  SELECT source, lang, COUNT(*) AS n_docs,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_words,
        |    CAST(SUM(n_chars) AS BIGINT) AS n_chars
        |  FROM documents GROUP BY source, lang)
        |SELECT source, lang, n_docs, n_words, n_chars,
        |  CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS DOUBLE) AS doc_share,
        |  CAST(n_words AS DOUBLE) / CAST(SUM(n_words) OVER () AS DOUBLE) AS word_share
        |FROM c ORDER BY source, lang""".stripMargin,

    // quantile_cont performs the same lower + (upper−lower)·frac IEEE
    // interpolation as Spark's exact percentile — doubles compare raw
    "x_profile_quantiles" ->
      """WITH q AS (
        |  SELECT quantile_cont(l_quantity, [0.5, 0.9, 0.99]) AS qq,
        |    quantile_cont(l_extendedprice, [0.5, 0.9, 0.99]) AS qe
        |  FROM lineitem)
        |SELECT 'l_extendedprice' AS "column",
        |  qe[1] AS p50, qe[2] AS p90, qe[3] AS p99 FROM q
        |UNION ALL SELECT 'l_quantity', qq[1], qq[2], qq[3] FROM q
        |ORDER BY "column"""".stripMargin,

    // the sketch-accuracy contract: DuckDB recomputes the exact
    // distinct counts and asserts the flags are all-pass — if a Spark
    // sketch drifts past its contract the flag flips to 0 and the
    // hash compare goes red
    "x_profile_sketch_check" ->
      """WITH a AS (
        |  SELECT COUNT(DISTINCT l_quantity) AS qd,
        |    COUNT(DISTINCT l_extendedprice) AS ed
        |  FROM lineitem)
        |SELECT 'l_extendedprice' AS "column", ed AS n_distinct,
        |  CAST(1 AS INT) AS ok_distinct, CAST(1 AS INT) AS ok_p50,
        |  CAST(1 AS INT) AS ok_p90, CAST(1 AS INT) AS ok_p99 FROM a
        |UNION ALL SELECT 'l_quantity', qd, 1, 1, 1, 1 FROM a
        |ORDER BY "column"""".stripMargin,

    "x_profile_winsorize" ->
      """WITH cuts AS (
        |  SELECT quantile_cont(l_extendedprice, 0.01) AS cut_lo,
        |    quantile_cont(l_extendedprice, 0.99) AS cut_hi
        |  FROM lineitem)
        |SELECT 'l_extendedprice' AS "column", cut_lo, cut_hi,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN l_extendedprice < cut_lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
        |  CAST(SUM(CASE WHEN l_extendedprice > cut_hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
        |  CAST(MIN(l_extendedprice) AS DOUBLE) AS raw_min,
        |  CAST(MAX(l_extendedprice) AS DOUBLE) AS raw_max
        |FROM lineitem, cuts
        |GROUP BY cut_lo, cut_hi""".stripMargin,

    // datediff is INT in Spark, BIGINT in DuckDB — cast to match
    "x_events_retention" ->
      """WITH cohorts AS (
        |  SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
        |  FROM events GROUP BY user_id),
        |active AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
        |SELECT cohort_day,
        |  CAST(date_diff('day', cohort_day, day) AS INT) AS day_offset,
        |  COUNT(DISTINCT a.user_id) AS n_users
        |FROM active a JOIN cohorts c USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,

    "x_corpus_top_trigrams" ->
      raw"""WITH $shingleCte,
        |t AS (SELECT unnest(g) AS shingle FROM d)
        |SELECT shingle, COUNT(*) AS df FROM t
        |GROUP BY shingle ORDER BY df DESC, shingle LIMIT 20""".stripMargin,

    // the sketch path certifies exactness (or throws), so its oracle
    // IS the exact top-k — same SQL, bit-for-bit
    "x_corpus_top_trigrams_sketch" ->
      raw"""WITH $shingleCte,
        |t AS (SELECT unnest(g) AS shingle FROM d)
        |SELECT shingle, COUNT(*) AS df FROM t
        |GROUP BY shingle ORDER BY df DESC, shingle LIMIT 20""".stripMargin,

    // as-of semantics spelled out as a top-1 window (rather than
    // DuckDB's native ASOF JOIN) so the time-tie break on orderkey is
    // explicit and the payload deterministic
    "x_asof_join" ->
      """WITH j AS (
        |  SELECT e.event_id, o.o_orderkey, o.o_orderdate,
        |    ROW_NUMBER() OVER (PARTITION BY e.event_id
        |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rk
        |  FROM events e
        |  LEFT JOIN orders o
        |    ON e.user_id = o.o_custkey AND CAST(o.o_orderdate AS TIMESTAMP) <= e.ts)
        |SELECT event_id, o_orderkey AS asof_orderkey, o_orderdate AS asof_orderdate
        |FROM j WHERE rk = 1 ORDER BY event_id""".stripMargin,

    "x_range_join" ->
      """SELECT a.o_custkey AS cust, a.o_orderkey AS order_a,
        |  b.o_orderkey AS order_b,
        |  CAST(date_diff('day', a.o_orderdate, b.o_orderdate) AS INT) AS day_diff
        |FROM orders a JOIN orders b
        |  ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
        |WHERE ABS(date_diff('day', a.o_orderdate, b.o_orderdate)) <= 7
        |ORDER BY cust, order_a, order_b""".stripMargin,

    "x_multimodal_meta" ->
      """SELECT doc_id, 'stub' AS format,
        |  CAST(octet_length(encode(text)) % 640 AS INT) AS width,
        |  CAST((octet_length(encode(text)) // 2) % 480 AS INT) AS height,
        |  CAST(ord(text[1]) & 15 AS INT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    "x_skew_salted_count" ->
      "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY 1 ORDER BY l_returnflag",

    // inclusive bounds both ends; epoch_us on both engines reads the
    // stored microseconds exactly (the fixture carries no sub-µs
    // nanos), so lag_us is exact integer arithmetic
    "x_events_stream_join" ->
      """WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
        |  FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id, event_id AS click_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click')
        |SELECT v.user_id AS user_id, view_id, click_id,
        |  CAST(epoch_us(click_ts) - epoch_us(view_ts) AS BIGINT) AS lag_us
        |FROM v JOIN c ON v.user_id = c.user_id
        |WHERE click_ts >= view_ts
        |  AND click_ts <= view_ts + INTERVAL 30 MINUTE
        |ORDER BY v.user_id, view_id, click_id""".stripMargin,

    // the time bound lives in the JOIN condition (a WHERE would turn
    // the left join inner); null sort keys pinned via coalesce — Spark
    // orders nulls first ASC, DuckDB last
    "x_events_stream_join_outer" ->
      """WITH v AS (SELECT user_id, event_id AS view_id, ts AS view_ts
        |  FROM events WHERE event_type = 'view'),
        |c AS (SELECT user_id AS c_user_id, event_id AS click_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click')
        |SELECT v.user_id AS user_id, view_id, click_id,
        |  CAST(epoch_us(click_ts) - epoch_us(view_ts) AS BIGINT) AS lag_us
        |FROM v LEFT JOIN c ON v.user_id = c.c_user_id
        |  AND click_ts >= view_ts
        |  AND click_ts <= view_ts + INTERVAL 30 MINUTE
        |ORDER BY v.user_id, view_id, COALESCE(click_id, -1)""".stripMargin,

    "x_events_tumbling" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "x_events_sliding" ->
      """WITH w AS (
        |  SELECT unnest([date_trunc('hour', ts),
        |                 date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
        |         event_type
        |  FROM events)
        |SELECT window_start, event_type, COUNT(*) AS n
        |FROM w GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "x_events_sessions" ->
      """WITH g AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms,
        |    CASE WHEN lag(epoch_ms(ts)) OVER
        |           (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) IS NULL
        |         OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER
        |           (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) > 1800000
        |         THEN 1 ELSE 0 END AS new_session
        |  FROM events),
        |s AS (SELECT user_id,
        |  SUM(new_session) OVER
        |    (PARTITION BY user_id ORDER BY ms, event_id) AS session_ix
        |  FROM g),
        |t AS (SELECT user_id, session_ix, COUNT(*) AS n_events
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id, COUNT(*) AS n_sessions,
        |  CAST(MAX(n_events) AS BIGINT) AS max_session_events
        |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin
  )
}
