package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table: tokenization,
  * n-gram shingling, quality scoring, language ID, fingerprinting.
  * All pure column expressions — codegen-friendly, no UDFs, scale
  * linearly with the corpus.
  */
object TextOps {

  /** Unicode NFC canonicalization (native `nfc_norm` expression) —
    * the opt-in pre-step for every text-KEYED operation: a decomposed
    * "é" (e + U+0301) and the precomposed U+00E9 are byte-different,
    * so without it a verbatim duplicate survives exact dedup and a
    * shingle/fingerprint key splits in two. Default OFF on the key
    * operators (`normalize = false`) so established oracles and
    * already-keyed corpora are untouched; a curation pipeline over
    * wild text turns it on at the first text-keyed step.
    */
  def nfc(text: Column): Column = call_function("nfc_norm", text)

  /** Whitespace word tokens; `normalize = true` folds the text to NFC
    * first (see [[nfc]]) so tokens can't split on decomposed accents.
    */
  def words(text: Column, normalize: Boolean = false): Column =
    split(if (normalize) nfc(text) else text, " ")

  /** Distinct word n-gram shingles over an ALREADY-MATERIALIZED words
    * array column (1-based element_at, guarded for short docs —
    * Spark's sequence(1, 0) would count DOWN).
    *
    * The words array must be a projected column, not the inline
    * `split(...)` expression: Catalyst inlines a Column alias at every
    * reference, and common-subexpression elimination does not reach
    * through higher-order-function lambdas — so shingling an inline
    * split re-tokenizes the document inside EVERY `element_at` of the
    * transform, turning an O(words) expression into O(n · words²) per
    * document. Projecting the split first (CollapseProject keeps a
    * non-cheap multi-referenced alias materialized) measured 1.8× on
    * the trigram substrate at sf0.1 — the gap widens with document
    * length, so at 100 TB it is the difference between one tokenize
    * pass and hundreds per document.
    */
  def ngramsOf(ws: Column, n: Int): Column =
    array_distinct(positionalNgramsOf(ws, n))

  /** [[ngramsOf]] over raw text, for one-shot/non-hot callers: pays
    * the inline-split re-evaluation described there — hot paths must
    * project `words(text)` and call [[ngramsOf]] instead.
    */
  def ngrams(text: Column, n: Int): Column = ngramsOf(words(text), n)

  /** Positional (non-distinct) word n-grams: element `i` (0-based) is
    * the n-gram starting at word `i`, so `posexplode` over the result
    * recovers (position, gram) pairs — the substrate for window-level
    * duplicate-span detection, where WHERE a gram occurs matters as
    * much as whether it does. [[ngramsOf]] is exactly the
    * `array_distinct` of this, so the expression body (and the
    * projected-words contract plus short-doc guard documented there)
    * has ONE source of truth.
    */
  def positionalNgramsOf(ws: Column, n: Int): Column = {
    val count = size(ws) - (n - 1)
    when(count >= 1,
      transform(sequence(lit(1), greatest(count, lit(1))),
        i => concat_ws(" ", (0 until n).map(k => element_at(ws, i + k)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Distinct-word count — the deterministic quality score the
    * canonical-selection and quota operators rank by (shared so the
    * Spark sites and their DuckDB `len(list_distinct(...))` oracles
    * can only desync in one place).
    */
  def distinctWordCount(text: Column): Column =
    size(array_distinct(words(text)))

  /** BPE-ish token count: alpha runs, digit runs, and single
    * non-alphanumeric marks — a deterministic stand-in for a real
    * subword tokenizer's token count.
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Quality signals + a composite score (weights are arbitrary but
    * fixed): length, punctuation ratio, stopword ratio, mean word
    * length.
    */
  val Stopwords = Seq("the", "a", "and", "of", "to", "in", "is", "on", "for")

  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val nChars = length(text)
    val w = words(text)
    val nWords = size(w)
    val punct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
    val stop = size(filter(w, x => x.isin(Stopwords.map(lit): _*)))
    Seq(
      "n_chars" -> nChars,
      "n_words" -> nWords,
      "punct_ratio" -> round(punct.cast("double") / greatest(nChars, lit(1)), 4),
      "stopword_ratio" -> round(stop.cast("double") / greatest(nWords, lit(1)), 4),
      "mean_word_len" -> round(nChars.cast("double") / greatest(nWords, lit(1)), 4))
  }

  /** Repetition signals (the Gopher-style quality filters): distinct
    * word count and the highest single-word occurrence count. Emitted
    * as integers — the ratios (repeated-word fraction, top-word
    * fraction) divide out of these without a float-rounding boundary
    * in the oracle compare.
    */
  def repetitionColumns(text: Column): Seq[(String, Column)] = {
    val w = words(text)
    val topCount = array_max(transform(array_distinct(w),
      x => size(filter(w, y => y === x))))
    Seq(
      "n_words" -> size(w),
      "n_distinct_words" -> size(array_distinct(w)),
      "top_word_count" -> topCount)
  }

  /** Language-ID by stopword/character profile: count hits of a few
    * high-frequency marker words per language (plus CJK characters for
    * zh) and take the argmax with a fixed tie-break order.
    */
  val LangMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|is|was|for|with)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht|ein|mit)\\b",
    "fr" -> "\\b(le|la|les|et|est|dans|pour|une)\\b",
    "es" -> "\\b(el|los|las|es|en|por|para|una)\\b",
    "zh" -> "[\\u4e00-\\u9fff]")

  def langScores(text: Column): Seq[(String, Column)] =
    LangMarkers.map { case (lang, pat) =>
      lang -> size(regexp_extract_all(text, lit(pat), lit(0)))
    }

  def predictedLang(text: Column): Column = {
    val scores = langScores(text)
    // argmax with first-listed language winning ties — the same CASE
    // cascade is expressible in the DuckDB oracle
    scores.foldRight(lit("und")) { case ((lang, score), acc) =>
      val isMax = scores.filter(_._1 != lang)
        .map { case (_, other) => score >= other }
        .reduce(_ && _)
      when(score > 0 && isMax, lang).otherwise(acc)
    }
  }

  /** Document fingerprints: md5 of the raw text and of a normalized
    * form (lowercase, collapsed whitespace). `normalize = true`
    * NFC-folds first ([[nfc]]) so byte-different decomposed accents
    * can't fingerprint apart; default off keeps existing oracles.
    */
  def fingerprintMd5(text: Column, normalize: Boolean = false): Column =
    md5(if (normalize) nfc(text) else text)
  def fingerprintNormalized(text: Column, normalize: Boolean = false): Column =
    md5(regexp_replace(lower(if (normalize) nfc(text) else text), "\\s+", " "))

  /** PII patterns (emails, phone numbers, IPv4 addresses) — kept to
    * the syntax subset Java regex and RE2 interpret identically, so
    * the DuckDB oracle applies the very same patterns. Redaction
    * order is fixed (email → phone → ip): a pattern never matches
    * inside an earlier placeholder, so the composition is
    * deterministic.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  /** Per-pattern match counts plus the fully-redacted text. Pure
    * regexp column expressions: codegen'd, linear, no shuffle — the
    * shape that streams through 100 TB untouched.
    */
  def piiColumns(text: Column): Seq[(String, Column)] = {
    val counts = PiiPatterns.map { case (name, pat, _) =>
      s"n_$name" -> size(regexp_extract_all(text, lit(pat), lit(0)))
    }
    val redacted = PiiPatterns.foldLeft(text) { case (acc, (_, pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }
    counts :+ ("redacted" -> redacted)
  }

  /** Gopher-style quality gates, each spelled in integer arithmetic
    * (cross-multiplied instead of ratio-vs-float-threshold) so the
    * cut is bit-exact across engines:
    *   - word count within [minWords, maxWords]
    *   - mean word length within [3, 10] chars
    *     (3·n_words ≤ n_alpha_chars ≤ 10·n_words)
    *   - symbol-to-word ratio < 10 %  (10·n_punct < n_words)
    *   - at least 2 distinct stopwords present
    * plus the composite `keep`. Linear column expressions only.
    */
  def gopherGateColumns(text: Column, minWords: Int = 10,
      maxWords: Int = 100000): Seq[(String, Column)] = {
    val w = words(text)
    val nWords = size(w)
    val nAlpha = length(regexp_replace(text, "[^A-Za-z0-9]", ""))
    val nPunct = size(regexp_extract_all(text, lit("[^A-Za-z0-9\\s]"), lit(0)))
    val nStop = size(array_intersect(array_distinct(w),
      array(Stopwords.map(lit): _*)))
    val gates = Seq(
      "r_word_count" -> (nWords >= minWords && nWords <= maxWords),
      "r_mean_word_len" -> (nAlpha >= nWords * 3 && nAlpha <= nWords * 10),
      "r_symbol_ratio" -> (nPunct * 10 < nWords),
      "r_stopwords" -> (nStop >= 2))
    gates :+ ("keep" -> gates.map(_._2).reduce(_ && _))
  }

  /** Blocklist term filter (C4's badwords stage, generalized to a
    * caller-supplied term list): per document, the token-frequency
    * count of blocklisted terms, the distinct terms hit, and the
    * annotate-don't-filter keep flag (no hits). Pure in-row codegen
    * columns over the words array — the blocklist travels as array
    * literals, so at any corpus scale this is scan-bound with zero
    * joins; a blocklist too large for a literal (tens of thousands of
    * terms) belongs in the broadcast-join form the classifier model
    * table already demonstrates.
    */
  def blocklistColumns(text: Column,
      terms: Seq[String]): Seq[(String, Column)] = {
    require(terms.nonEmpty, "blocklist must not be empty")
    val ws = words(text)
    val blocked = array(terms.map(lit): _*)
    // one hit-count tree shared by n_hits and keep (HOF filters don't
    // whole-stage-codegen, so a duplicated tree is evaluated twice)
    val hits = size(filter(ws, w => array_contains(blocked, w)))
    Seq(
      "n_hits" -> hits.cast("bigint"),
      "n_terms_hit" -> size(array_intersect(array_distinct(ws), blocked))
        .cast("bigint"),
      "keep" -> hits.equalTo(0).cast("int"))
  }

  /** [[blocklistColumns]] with the blocklist as a RELATION — the form
    * for term lists too large to travel as plan literals (tens of
    * thousands of badwords): the token relation joins the term table
    * and re-aggregates per doc. No broadcast hint — the term side is
    * small by construction and AQE broadcasts it from measured sizes
    * (the classifier model-table shape), so a pathological list
    * degrades to a partitioned join instead of a driver OOM.
    * Zero-hit docs ride a left join back in (total over `docs`), and
    * the columns, types and values equal the literal form exactly —
    * spec-pinned, and the gate row shares the literal form's oracle.
    */
  def blocklistJoin(docs: DataFrame, terms: DataFrame): DataFrame = {
    // duplicate terms in the relation must not double-count tf hits
    val t = terms.select(col(terms.columns.head).as("w")).distinct()
    val tok = docs.select(col("doc_id"),
      explode(words(col("text"))).as("w"))
    val hits = tok.join(t, "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("h"), countDistinct(col("w")).as("th"))
    docs.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("h"), lit(0L)).as("n_hits"),
        coalesce(col("th"), lit(0L)).as("n_terms_hit"),
        coalesce(col("h"), lit(0L)).equalTo(0).cast("int").as("keep"))
  }
}
