package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level statistics that feed training-data curation: a
  * unigram frequency model trained on the corpus and applied back to
  * every document, and global n-gram heavy hitters.
  *
  * Both are two-phase "train on the corpus, score the corpus"
  * pipelines: an aggregation builds the model, a second pass applies
  * it — the distributed shape (partial-agg model build, broadcast or
  * shuffle join apply) that a 100 TB corpus needs, with no driver
  * materialization anywhere.
  */
object CorpusStats {

  /** Per-document rarity profile against the corpus's own unigram
    * frequency table: token count, summed corpus frequency of the
    * doc's tokens, the rarest token's frequency, and the hapax count
    * (tokens occurring exactly once corpus-wide — mutated/misspelled
    * vocabulary surfaces here). All integers, so the oracle compare
    * has no float boundary.
    *
    * Everything derives from ONE `(doc_id, term, tf)` aggregate: the
    * corpus frequency is Σtf over docs, and the per-doc profile folds
    * back as n_tokens = Σtf, sum_freq = Σtf·freq, n_hapax = Σtf·[freq=1],
    * shrinking the apply-side join input from token-count rows to
    * distinct-(doc, term) rows.
    *
    * The ONE corpus-sized shuffle happens up front, on the compact
    * doc rows keyed by doc_id: hashpartitioning(doc_id) satisfies the
    * (doc_id, term) clustering the tf aggregation requires AND the
    * doc_id clustering of the final fold, and the broadcast vocab
    * join preserves it — so the exploded/aggregated term relation is
    * never re-shuffled (measured 2× at sf0.1; the saving is a
    * corpus-proportional shuffle at 100 TB). Both consumers of `tf`
    * share that one exchange (ReusedExchange): the scan and shuffle
    * run once, and each branch re-runs only the codegen'd tokenize on
    * its partition-local rows — deliberately cheaper than the
    * alternative that tokenizes once but pays a second term-relation
    * shuffle. The explicit hash repartition also parallelizes a
    * single-row-group fixture scan, which is why no [[Spread]] is
    * needed here.
    *
    * The vocab side carries NO broadcast hint: AQE's runtime
    * size-gated conversion broadcasts it when the materialized
    * aggregate is under the broadcast budget (the Heaps'-law common
    * case) and keeps the shuffle join when a pathological corpus
    * (random IDs, base64 blobs) grows vocabulary linearly — the
    * operator self-defends instead of OOMing the driver at 100 TB.
    * Plan-shape pinned by `CorpusStatsPlanSpec`.
    */
  def unigramRarity(docs: DataFrame): DataFrame = {
    val tf = docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy(col("w")).agg(sum(col("tf")).as("freq"))
    tf.join(vocab, "w")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("freq")).as("sum_freq"),
        min(col("freq")).as("min_freq"),
        sum(when(col("freq") === 1, col("tf")).otherwise(0L)).as("n_hapax"))
      .orderBy(col("doc_id"))
  }

  /** Per-document top-k distinctive terms, ranked rarest-first: a
    * term is more distinctive when its corpus document frequency is
    * LOWER, ties broken by higher in-document term frequency, then by
    * the term itself. This is a deterministic integer-ordered PROXY
    * for tf·idf, not equivalent to it — idf is monotone in df, so the
    * orderings agree at equal tf, but a rare low-tf term can outrank
    * a common high-tf term that tf·idf would prefer. The trade is
    * deliberate: rarest-first is the ordering that surfaces
    * vocabulary unique to a document (the curation use case here),
    * and the all-integer rank carries zero cross-engine float risk.
    *
    * Shape: docs shuffle ONCE, compact and keyed by doc_id (the same
    * up-front partitioning as [[unigramRarity]] — it satisfies the tf
    * aggregation's clustering, the per-doc window's, and parallelizes
    * a single-row-group scan); df derives from the tf relation (a
    * term appears once per containing doc there, and both consumers
    * of tf share the shuffle via ReusedExchange); the
    * vocabulary-sized df table joins back — size-gated by AQE's
    * runtime conversion, broadcast in the Heaps'-law common case,
    * shuffle join when a pathological corpus grows vocab linearly —
    * and the broadcast join preserves the doc_id partitioning, so the
    * window top-k sorts within partitions without re-shuffling the
    * term relation. No partition exceeds one document's vocabulary.
    */
  def topTermsPerDoc(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("df").asc, col("tf").desc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("rnk"), col("term"), col("tf"), col("df"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  /** Corpus composition report: per (source, lang) document count,
    * token and char totals, and each cell's share of the corpus — the
    * mixture table a training run reports next to its data card, and
    * the input to reweighting decisions ([[Sampling.weightedSample]]).
    *
    * Input schema: `source`, `lang`, `text` columns are required;
    * `n_chars` is used when present (a precomputed char count, as the
    * documents fixture carries) and derived as `length(text)` when
    * absent, so a generic docs frame profiles without preparation.
    *
    * One aggregation pass builds the cells; the share divides by a
    * window total over the (tiny, cell-count-sized) aggregate — the
    * corpus-sized relation is touched once. Shares are IEEE double
    * divisions of exact integer counts, so both engines produce the
    * identical bits.
    */
  def mixtureReport(docs: DataFrame): DataFrame = {
    val withChars =
      if (docs.columns.contains("n_chars")) docs
      else docs.withColumn("n_chars", length(col("text")).cast("long"))
    val cells = withChars.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(TextOps.words(col("text")))).as("n_words"),
        sum(col("n_chars")).as("n_chars"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy()
    cells
      .withColumn("doc_share",
        col("n_docs").cast("double") / sum(col("n_docs")).over(w))
      .withColumn("word_share",
        col("n_words").cast("double") / sum(col("n_words")).over(w))
      .orderBy(col("source"), col("lang"))
  }

  /** Bigram language-model novelty profile: train a bigram LM on the
    * corpus (counts, no smoothing), score every document against it.
    * The perplexity-filtering shape of CCNet/Gopher-style curation —
    * a document whose word transitions are improbable under the
    * corpus's own statistics is boilerplate-mutated, shuffled, or
    * out-of-domain — reduced to integer arithmetic so the oracle
    * compare has no float boundary:
    *
    *   cond_ppm(w1,w2) = (1e6 · C(w1,w2)) div C(w1·)
    *
    * is the conditional probability P(w2|w1) in parts-per-million,
    * computed by exact integer division (C(w1·) counts w1 as a bigram
    * LEFT context, so Σ_w2 cond ≈ 1e6 per context). Per document:
    * positional bigram count, Σ tf·cond_ppm (mean transition
    * probability = sum/n, divided client-side), the rarest
    * transition, and the count of corpus-unique bigrams (novel word
    * joins live here). Documents under two tokens have no bigrams and
    * drop out, mirroring the SQL oracle's inner unnest.
    *
    * Shape — identical substrate to [[unigramRarity]], one level up:
    * ONE corpus shuffle up front on compact doc rows keyed by doc_id
    * (satisfies the (doc_id, bigram) tf clustering AND the final
    * per-doc fold; the explode stays inline over the transform so
    * Generate fuses with the projection). Both model tables — bigram
    * counts and left-context counts — derive from the same tf
    * aggregate (ReusedExchange) and join back size-gated by AQE:
    * broadcast in the Heaps'-law common case, shuffle join when a
    * pathological corpus grows bigram vocabulary linearly. At 100 TB
    * the model tables are the only relations smaller than the corpus,
    * and nothing else moves twice.
    */
  /** Cross-corpus bigram LM scoring — train the transition model on a
    * REFERENCE slice (`source = trainSource`), score every OTHER
    * document against it: the held-out perplexity-filter shape
    * ("score the crawl against a clean-corpus LM", where
    * [[bigramLm]] is the self-trained novelty variant). Per scored
    * doc: bigram count, Σ tf·cond_ppm with out-of-model bigrams
    * contributing 0, the rarest SEEN transition (0 when every bigram
    * is unseen), and the tf-weighted out-of-model count — all exact
    * integers, so the full value oracle holds.
    *
    * Shape: the scored side is the same one-shuffle doc_id-keyed tf
    * substrate as [[bigramLm]]; the model tables aggregate the train
    * slice only and join back LEFT (seen-ness is data, not a filter),
    * AQE-size-gated. A seen bigram's left context is necessarily in
    * the model, so the ppm division never sees a missing cw1.
    */
  def bigramLmCross(docs: DataFrame, trainSource: String = "src0"): DataFrame = {
    // both slices derive from the ONE memoized persisted bigram-tf
    // substrate (a source tag joined on): the per-slice tfOf form
    // tokenized and exploded the corpus once per slice, and the LM
    // family's three consumers shared nothing
    val tagged = corpusBigramTf(docs)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val train = tagged.filter(col("source") === trainSource).drop("source")
    val scoreTf = tagged.filter(col("source") =!= trainSource).drop("source")
    val cbg = train.groupBy(col("bg")).agg(sum(col("tf")).as("cbg"))
    val cw1 = train.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("tf")).as("cw1"))
    val seen = col("cbg").isNotNull
    val cond = when(seen, expr("(1000000 * cbg) div cw1")).otherwise(lit(0L))
    scoreTf.join(cbg, Seq("bg"), "left")
      .join(cw1, substring_index(col("bg"), " ", 1) === col("w1"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * cond).as("sum_cond_ppm"),
        coalesce(min(when(seen, cond)), lit(0L)).as("min_seen_cond_ppm"),
        sum(when(seen, lit(0L)).otherwise(col("tf"))).as("n_oov"))
      .orderBy(col("doc_id"))
  }

  /** The memoized PERSISTED per-(doc, bigram) tf relation — the
    * bigram analogue of [[Dedup.corpusShingles]], and for the same
    * measured reason: [[bigramLm]]'s plan reads the tf relation
    * THREE times (tf itself, the cbg and cw1 model aggregates), and
    * un-persisted each branch re-ran the whole tokenize + explode +
    * groupBy over the corpus (three parquet scans in the physical
    * plan, zero exchange reuse). Persisted, the corpus is exploded
    * once and the model aggregates read cached partitions. Bounded
    * cache, evict-all unpersists on overflow.
    */
  private val bigramTfCache =
    new BoundedMemo[(Int, Int), DataFrame](capacity = 4,
      onOverflow = _.unpersist())

  /** Unpersist and drop all memoized bigram-tf relations. */
  def clearBigramTfCache(): Unit = bigramTfCache.clear()

  private def bigramTfKey(docs: DataFrame): (Int, Int) =
    (docs.queryExecution.analyzed.semanticHash(),
      java.util.Arrays.hashCode(docs.inputFiles.asInstanceOf[Array[AnyRef]]))

  private[ops] def corpusBigramTf(docs: DataFrame): DataFrame =
    bigramTfCache.getOrElseUpdate(bigramTfKey(docs)) {
      // project the split once, THEN build bigrams over the column —
      // the inline form re-tokenizes inside every element_at of the
      // lambda (see TextOps.ngramsOf), measured 4.5× slower at sf0.1
      val ws = col("ws")
      val bigrams = when(size(ws) >= 2,
        transform(sequence(lit(1), size(ws) - 1),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1))))
        .otherwise(array().cast("array<string>"))
      docs.repartition(col("doc_id"))
        .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
        .select(col("doc_id"), explode(bigrams).as("bg"))
        .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("tf"))
        .persist()
    }

  def bigramLm(docs: DataFrame): DataFrame = {
    val tf = corpusBigramTf(docs)
    val cbg = tf.groupBy(col("bg")).agg(sum(col("tf")).as("cbg"))
    val cw1 = tf.groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("tf")).as("cw1"))
    val cond = expr("(1000000 * cbg) div cw1")
    tf.join(cbg, "bg")
      .join(cw1, substring_index(col("bg"), " ", 1) === col("w1"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("tf") * cond).as("sum_cond_ppm"),
        min(cond).as("min_cond_ppm"),
        sum(when(col("cbg") === 1, col("tf")).otherwise(0L)).as("n_novel"))
      .orderBy(col("doc_id"))
  }

  /** Global top-k trigram shingles by document frequency (ties broken
    * by the shingle itself, so top-k is total-ordered). The plan is
    * partial-agg counts then `TakeOrderedAndProject` — the global
    * sort never materializes, only k rows travel to the final stage.
    * If a dedup/decontamination query already built the memoized
    * shingle substrate for this corpus, the aggregation reads the
    * persisted relation; standalone it stays a streaming one-pass
    * explode+agg, never persisting a corpus-sized relation just for
    * a top-k (the substrate's storage cost belongs to the consumers
    * that traverse it repeatedly).
    */
  /** Composition drift between an incoming batch and the standing
    * corpus — the ingest-monitoring check that catches a scraper
    * suddenly over-delivering one domain or language before it skews
    * the mixture: per (source, lang) cell, counts and document
    * shares on both sides plus the share delta. Shares are exact
    * integer counts divided once at the end (IEEE-deterministic, the
    * [[mixtureReport]] convention), so the report carries a full
    * value oracle. A cell present on only one side still reports
    * (zero-filled), because a VANISHED stratum is exactly the drift
    * worth alarming on.
    *
    * Scale shape: two cell-sized aggregations (partial-agg to the
    * source×lang cell count per partition), windows only over the
    * aggregate, one full-outer join of two tiny relations — the
    * corpora themselves never shuffle.
    */
  def mixtureDrift(cur: DataFrame, prev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    def shares(df: DataFrame, nCol: String, sCol: String) =
      df.groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as(nCol))
        .withColumn(sCol, col(nCol).cast("double") / sum(col(nCol)).over(w))
    shares(cur, "n_cur", "share_cur")
      .join(shares(prev, "n_prev", "share_prev"),
        Seq("source", "lang"), "full")
      .na.fill(0L, Seq("n_cur", "n_prev"))
      .na.fill(0.0, Seq("share_cur", "share_prev"))
      .withColumn("delta_share", col("share_cur") - col("share_prev"))
      .orderBy(col("source"), col("lang"))
  }

  /** The exploded trigram-occurrence relation both top-k paths
    * aggregate over — rides the memoized shingle substrate when a
    * dedup query already built it; standalone it keeps the explode
    * INLINE over the ngrams expression (projecting the array first
    * and exploding in a second select defeats the
    * Project-into-Generate fusion, measured 4.5× slower at sf0.1).
    * One definition so the exact path and the sketch path can never
    * desync on the substrate.
    */
  private def trigramTokens(docs: DataFrame): DataFrame =
    Dedup.corpusShinglesIfCached(docs)
      .map(_.select(explode(col("g")).as("shingle")))
      .getOrElse(Spread(docs)
        .select(TextOps.words(col("text")).as("ws"))
        .select(explode(TextOps.ngramsOf(col("ws"), 3)).as("shingle")))

  def topTrigrams(docs: DataFrame, k: Int = 20): DataFrame =
    trigramTokens(docs)
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("shingle"))
      .limit(k)

  /** Per-document n-gram NOVELTY: the share of a doc's distinct
    * trigrams that appear in NO other document — low novelty flags
    * boilerplate/templated docs (their grams are everywhere), high
    * novelty flags genuinely fresh text; both are standard curation
    * cut signals. All-integer: `novelty_ppm = (1e6 · n_unique) div
    * n_grams` (hapax-at-document-granularity over the trigram df
    * relation), so the whole output is hash-oracle-able. Docs with
    * fewer than 3 words have no trigrams and report 0/0 with a NULL
    * ppm rather than vanishing — annotate-don't-filter.
    *
    * Shape: ONE shuffle of the exploded gram relation. The naive
    * form (gram→df aggregate, then join the token relation back to
    * count uniques per doc) shuffles the corpus-sized token relation
    * twice — but a df=1 gram has exactly ONE owning document, so
    * `min(doc_id)` inside the same df aggregate carries the owner
    * for free and the join-back disappears: uniques-per-doc is then
    * a vocabulary-sized aggregate, and n_grams is a pure `size(g)`
    * projection off the memoized shingle substrate (shared with the
    * dedup family). Measured 3.4× at sf0.1 over the join-back form;
    * at 100 TB it is one gram shuffle instead of two plus a
    * vocab join. Nothing is collected.
    */
  def gramNovelty(docs: DataFrame): DataFrame = {
    // BOTH branches below read the shingle relation, so the memoized
    // PERSISTED substrate (not the opportunistic if-cached form) is
    // load-bearing: un-persisted, the sizes branch re-runs the whole
    // tokenize+shingle transform just to take size(g) — measured 3×
    // the entire operator
    val sh = Dedup.corpusShingles(docs)
    val sizes = sh.select(col("doc_id"), size(col("g")).cast("long").as("n_grams"))
    val uniq = sh.select(col("doc_id"), explode(col("g")).as("shingle"))
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"), min(col("doc_id")).as("owner"))
      .filter(col("df") === 1)
      .groupBy(col("owner"))
      .agg(count(lit(1)).as("n_unique"))
      .select(col("owner").as("doc_id"), col("n_unique"))
    sizes.join(uniq, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_unique"), lit(0L)).as("n_unique"))
      .withColumn("novelty_ppm",
        when(col("n_grams") > 0, expr("(1000000 * n_unique) div n_grams")))
      .orderBy(col("doc_id"))
  }

  /** Per-document KEYWORDS: top-k tokens by the integer tf-over-df
    * weight `tf · (1e6 div df)` — the datacard/topic-label signal at
    * document granularity (tf·idf's job, on the integer lattice: the
    * rare-token reciprocal replaces the log so every weight and
    * every rank is bit-replayable; the ordering it induces is the
    * same "frequent here, rare everywhere" cut). Ties break (weight
    * DESC, token ASC); docs with fewer than k distinct tokens emit
    * fewer rows rather than padding.
    *
    * Shape: ONE shuffle of the token relation into per-doc tf, a
    * vocabulary-sized df aggregate off the same relation joined back
    * (broadcast at any real vocabulary), and the top-k window
    * compiles to WindowGroupLimit — per-partition rank pruning, so
    * only ≤k rows per doc survive to the final exchange. Nothing
    * corpus-sized in one task.
    */
  def docKeywords(docs: DataFrame, k: Int = 3): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val tok = docs.repartition(col("doc_id"))
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"), explode(col("ws")).as("tok"))
    // checkpoint the per-doc tf relation (r20 opt): it feeds both the
    // vocabulary df aggregate and the weighted join-back, and each
    // instance otherwise re-ran the tokenize → explode → shuffle pass
    // over the corpus. The materialized relation is the distinct
    // (doc, token) set — the same bytes its one shuffle already moved.
    val tf = PlanAudit.checkpointed(
      tok.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val weighted = tf.join(df, "tok")
      .select(col("doc_id"), col("tok"),
        expr("tf * (1000000 div df)").as("weight"))
    val rk = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("weight").desc, col("tok").asc)
    weighted
      .withColumn("rk", row_number().over(rk))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("rk"), col("tok"), col("weight"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** [[topTrigrams]] via a Misra-Gries sketch — the scale path for a
    * corpus whose n-gram VOCABULARY is too large to shuffle: the
    * exact form's partial aggregation still emits one row per
    * distinct shingle per partition, while the sketch pass emits at
    * most `capacity` counters per partition regardless of vocabulary
    * ([[graft.functions.Sketches.FreqItems]], mergeable per Agarwal
    * et al. 2012). A second pass exact-counts only the ≤ `capacity`
    * surviving candidates (broadcast semi-join — the corpus shuffles
    * nothing but candidate matches), so the OUTPUT is exact and
    * shares [[topTrigrams]]'s oracle bit-for-bit.
    *
    * Self-certifying, not trust-me (the "provable exact config over
    * measured agreement" rule): Misra-Gries guarantees any item
    * absent from the candidates has true count ≤ debt (the sketch's
    * accumulated decrement mass), so if the k-th exact candidate
    * count exceeds the debt, the true top-k is provably inside the
    * candidate set — and this operator REQUIREs exactly that,
    * failing with a raise-the-capacity error instead of silently
    * returning plausible-but-unproven heavy hitters. Eager like the
    * dedup builders: the gate needs the counts, so construction runs
    * the job and the returned plan is the pinned result. The only
    * driver materialization is the candidate list (≤ `capacity`
    * strings — bounded like the ANN centroid table) and the k result
    * rows.
    *
    * Sizing: total debt ≤ n/(capacity+1) (n = total gram
    * occurrences), so certification needs capacity ≳ n / c_k where
    * c_k is the k-th heavy hitter's count. Real web corpora have
    * enormous c_k (boilerplate) and certify easily; a near-uniform
    * corpus is the adversarial case and wants capacity near its
    * vocabulary (at which point debt is 0 and the result is exact by
    * construction). The 32k default certifies the sf0.1 fixture with
    * debt 0 at ~1 MB of counter state per partition.
    */
  def topTrigramsSketch(docs: DataFrame, k: Int = 20,
      capacity: Int = 32768): DataFrame = {
    require(capacity >= k,
      s"topTrigramsSketch needs capacity >= k ($capacity < $k): the sketch " +
        "cannot even retain k candidates")
    val spark = docs.sparkSession
    val mg = trigramTokens(docs)
      .select(graft.functions.Sketches.freqItems(col("shingle"), capacity).as("mg"))
      .select(col("mg.items").as("items"), col("mg.debt").as("debt"))
      .head()
    val debt = mg.getAs[Long]("debt")
    val cands = spark.createDataset(mg.getSeq[String](0).toList)(
      org.apache.spark.sql.Encoders.STRING).toDF("shingle")
    val exact = trigramTokens(docs).join(broadcast(cands), "shingle")
      .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("shingle"))
      .limit(k)
    val pinned = PlanAudit.checkpointed(exact)
    val rows = pinned.orderBy(col("df").asc).select(col("df")).head(k)
    // debt > 0 implies the vocabulary exceeds capacity >= k, so the
    // TRUE top-k has k rows — a shorter result means the sketch
    // dropped hitters and must refuse, even if the surviving counts
    // all clear the debt (the truncated-result hole: comparing the
    // min of FEWER than k rows against the debt certifies nothing
    // about the ranks the sketch lost)
    require(debt == 0L ||
        (rows.length == k && rows.head.getLong(0) > debt),
      s"topTrigramsSketch cannot certify exactness: " +
        s"${rows.length} candidate rows (k=$k), k-th count " +
        s"${rows.headOption.map(_.getLong(0)).getOrElse(0L)}, sketch debt " +
        s"$debt — raise capacity (currently $capacity)")
    pinned
  }
}
