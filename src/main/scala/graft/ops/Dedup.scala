package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Sketches

/** Near-duplicate detection over the `documents` table.
  *
  * Five strategies, one contract: emit duplicate pairs
  * `(doc_a, doc_b, jaccard)` with doc_a < doc_b (and, for the sketch
  * paths, identical output to the brute-force baseline so the DuckDB
  * oracle can hash-match them).
  *
  * Scale design: the brute-force paths bound the left side of the
  * pair join (a "find duplicates of this slice" query — O(slice ×
  * corpus)); MinHash-LSH is the full-corpus path: shuffle cost is one
  * 64-long signature per doc, candidates come from band buckets, and
  * only candidates pay the exact-Jaccard verification.
  */
object Dedup {

  /** Jaccard threshold τ = 0.5, compared in integer arithmetic
    * (2·|∩| ≥ |∪|) so the cut is bit-exact across engines. Shared
    * with [[DedupStore]] so the persisted-store path can never drift
    * from the in-session cut.
    */
  private[ops] def dupPair(inter: org.apache.spark.sql.Column,
      uni: org.apache.spark.sql.Column) = inter * 2 >= uni

  /** Exact dedup by content key (hash-groupBy): one survivor per key.
    * The fixture has no full-text duplicates, so the key is the
    * 3-word prefix — same shape, collisions exist. `normalize = true`
    * NFC-folds the text before keying ([[TextOps.nfc]]): a verbatim
    * duplicate whose accents arrive decomposed (e + U+0301 vs U+00E9)
    * is byte-different and survives the default key — with the fold
    * on it collapses onto the same key. Default off: established
    * oracles and already-canonical corpora are untouched.
    */
  def exactByPrefix(docs: DataFrame, prefixWords: Int = 3,
      normalize: Boolean = false): DataFrame = {
    // try_element_at: docs shorter than prefixWords yield nulls (which
    // concat_ws skips) instead of ANSI INVALID_ARRAY_INDEX errors
    val text =
      if (normalize) TextOps.nfc(col("text")) else col("text")
    val key = concat_ws(" ",
      (1 to prefixWords).map(i => try_element_at(split(text, " "), lit(i))): _*)
    docs.select(col("doc_id"), key.as("k"))
      .groupBy(col("k"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
  }

  /** Per-doc distinct trigram shingle sets. The input is spread
    * first: shingling inflates each row ~300×, so a sub-parallel scan
    * (a small file with one row group = one partition) would pin the
    * whole explode+aggregate pipeline on a single task.
    */
  private[graft] def shingled(docs: DataFrame): DataFrame =
    Spread(docs)
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"), TextOps.ngramsOf(col("ws"), 3).as("g"))

  /** Shingle relations memoized across dedup calls, keyed by the
    * semantic hash of the docs plan: a dedup pipeline computes several
    * signals (MinHash, SimHash, prefix join, clustering) over ONE
    * corpus, and all of them consume the same exploded-trigram
    * relation — shingling the corpus once per strategy would be 5
    * corpus scans where 1 suffices. The cache is a [[BoundedMemo]]
    * (8 entries, unpersist-all on overflow); like the quantizer memo
    * the key is plan hash + scanned-file listing, so only an in-place
    * rewrite that keeps every file name needs [[clearShingleCache]].
    */
  private val shingleCache =
    new BoundedMemo[(Int, Int), DataFrame](capacity = 8,
      onOverflow = _.unpersist())

  /** Unpersist and drop all memoized shingle relations. */
  def clearShingleCache(): Unit = shingleCache.clear()

  private def shingleKey(docs: DataFrame): (Int, Int) =
    (docs.queryExecution.analyzed.semanticHash(),
      java.util.Arrays.hashCode(docs.inputFiles.asInstanceOf[Array[AnyRef]]))

  /** The ALREADY-memoized shingle relation for a corpus, if some
    * shingle consumer in this session built one — exposed so sibling
    * operators (e.g. [[CorpusStats.topTrigrams]]) can opportunistically
    * reuse the persisted substrate without forcing a session that
    * never runs a dedup query to pay its storage cost.
    */
  private[ops] def corpusShinglesIfCached(docs: DataFrame): Option[DataFrame] =
    shingleCache.get(shingleKey(docs))

  /** The memoized persisted substrate, building it if absent — for
    * sibling operators that READ the relation more than once (e.g.
    * [[CorpusStats.gramNovelty]]'s sizes + vocab branches): without
    * the persist each branch re-runs the tokenize+shingle transform
    * per pass.
    */
  private[ops] def corpusShingles(docs: DataFrame): DataFrame =
    cachedShingles(docs)

  /** The memoized, persisted shingle relation for a corpus — the
    * shared substrate of every shingle consumer (sketches, prefix
    * join, decontamination). Builds and persists on first use;
    * bounded cache, evict-all on overflow.
    */
  private def cachedShingles(docs: DataFrame): DataFrame =
    shingleCache.getOrElseUpdate(shingleKey(docs))(shingled(docs).persist())

  /** Run `build` over the corpus's cached shingle relation and eagerly
    * materialize the (small) result. The sketch dedup queries each
    * traverse the shingle relation 2-3× (signature path + both sides
    * of verification); the persist makes that one corpus scan.
    * `localCheckpoint` pins the few result rows so the returned plan
    * never depends on the cached shingles' lifetime.
    *
    * Consequence: the sketch dedup builders are EAGER — constructing
    * the DataFrame runs the job, and the returned plan is a
    * checkpointed-RDD scan (so `explain` shows the materialized
    * result, not the dedup pipeline; use the spec assertions / this
    * scaladoc for the plan shape).
    */
  private def withShingles(docs: DataFrame)(build: DataFrame => DataFrame): DataFrame =
    PlanAudit.checkpointed(build(cachedShingles(docs)))

  /** Exact-Jaccard verification of a (small) candidate pair set: join
    * the candidates with per-doc shingle arrays and intersect per pair.
    * Candidates are few, so the per-pair set intersection beats
    * re-exploding the whole corpus into a token join (measured: the
    * token-join variant cost +4s per sketch query at sf0.1).
    */
  private def verifyPairs(candidates: DataFrame, sh: DataFrame): DataFrame = {
    val ga = sh.select(col("doc_id").as("doc_a"), col("g").as("ga"))
    val gb = sh.select(col("doc_id").as("doc_b"), col("g").as("gb"))
    candidates.join(ga, "doc_a").join(gb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        size(array_intersect(col("ga"), col("gb"))).as("inter"),
        (size(col("ga")) + size(col("gb"))
          - size(array_intersect(col("ga"), col("gb")))).as("uni"))
      .filter(dupPair(col("inter"), col("uni")))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Exact trigram-Jaccard near-dup pairs via an inverted-index join:
    * explode shingles, equi-join on the shingle, count shared shingles
    * per pair. Pairs sharing nothing never materialize, so cost is
    * O(Σ shared shingles), not O(n²) — the shape that survives a
    * corpus 1000× larger (same result as the cartesian baseline; the
    * DuckDB oracle still computes it the O(n²) way).
    */
  def ngramJaccardBrute(docs: DataFrame, leftMax: Long = 200): DataFrame = {
    // memoized like the MinHash pair set (r20 opt): the brute pair
    // relation is the measured τ = 1/2 scale path, and a dedup
    // pipeline consumes it repeatedly ([[sourceDupMatrix]] rides it
    // verbatim) — the (-1, -1) band geometry marks the brute entry in
    // the shared pair cache.
    val key = (docs.queryExecution.analyzed.semanticHash(),
      java.util.Arrays.hashCode(docs.inputFiles.asInstanceOf[Array[AnyRef]]),
      leftMax, -1, -1)
    pairCache.getOrElseUpdate(key)(ngramJaccardBruteUncached(docs, leftMax))
  }

  private def ngramJaccardBruteUncached(docs: DataFrame,
      leftMax: Long): DataFrame =
    withShingles(docs) { sh =>
    val sizes = sh.select(col("doc_id"), size(col("g")).as("n"))
    val tokens = sh.select(col("doc_id"), explode(col("g")).as("shingle"))
    val inter = tokens.filter(col("doc_id") < leftMax)
      .withColumnRenamed("doc_id", "doc_a")
      .join(tokens.withColumnRenamed("doc_id", "doc_b"),
        Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(dupPair(col("inter"), col("uni")))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
    }

  /** Near-CONTAINMENT dedup pairs: |G_a ∩ G_b| ≥ num/den ·
    * min(|G_a|, |G_b|) on distinct trigram shingle sets — the
    * asymmetric duplicate class Jaccard structurally misses. A short
    * document quoted whole inside a much longer one has Jaccard
    * |∩|/|∪| ≈ |short|/|long| → 0, but containment-of-the-smaller
    * = 1.0: quotes, copies-with-additions, and template-plus-payload
    * duplicates all live here (max-containment — |∩|/min — is the
    * standard symmetric form, avoiding a per-direction pair
    * explosion while catching exactly the subset-duplicate case).
    * The cut is all-integer cross-multiplied (den·|∩| ≥ num·min), so
    * the output carries a full DuckDB hash oracle; the reported
    * `containment` column is the display ROUND of an exact rational.
    *
    * Shape: the same inverted-index token join as
    * [[ngramJaccardBrute]] (shared-gram candidates, grouped
    * intersection counts, per-doc sizes joined back) over the
    * memoized persisted shingle substrate — one corpus explode
    * feeds the whole dedup family. The PPJoin prefix filter does NOT
    * apply here (its completeness bound is Jaccard-specific: a pair
    * can reach containment τ while sharing none of either side's
    * rare-token prefix when the small doc is all common grams), so
    * the scale path is the inverted index with the standard df-cap
    * mitigation (drop ubiquitous grams up front), not a prefix
    * variant.
    */
  def containmentPairs(docs: DataFrame, num: Int = 2, den: Int = 3,
      leftMax: Long = 200): DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      s"containment threshold must be a rational in (0, 1]: $num/$den")
    withShingles(docs) { sh =>
      val sizes = sh.select(col("doc_id"), size(col("g")).as("n"))
      val tokens = sh.select(col("doc_id"), explode(col("g")).as("shingle"))
      val inter = tokens.filter(col("doc_id") < leftMax)
        .withColumnRenamed("doc_id", "doc_a")
        .join(tokens.withColumnRenamed("doc_id", "doc_b"), Seq("shingle"))
        .filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .filter(col("inter") * den >= least(col("na"), col("nb")) * num)
        .select(col("doc_a"), col("doc_b"),
          round(col("inter").cast("double")
            / least(col("na"), col("nb")), 4).as("containment"))
        .orderBy(col("doc_a"), col("doc_b"))
    }
  }

  /** [[containmentPairs]] with the df-cap mitigation its scaladoc
    * names — the scale form for a boilerplate-heavy corpus, where the
    * exact inverted index's postings for ubiquitous grams (a licence
    * header in half the corpus) explode quadratically in the gram
    * join. Grams with corpus document frequency above `maxGramDf`
    * are dropped from the CANDIDATE index only; every surviving
    * candidate is then verified with an exact `array_intersect` over
    * the full shingle arrays, so each reported pair carries its TRUE
    * containment value. The knowing loss is candidate recall: a pair
    * whose shared grams are ALL ubiquitous is never generated — at a
    * 2/3 containment threshold such a pair is boilerplate-only
    * similarity, which is usually exactly what a curation pipeline
    * wants deduplicated by a boilerplate rule, not a containment one.
    * Deterministic given the cap, so the output still carries a full
    * DuckDB hash oracle (the cap is replayed, not approximated).
    */
  def containmentPairsCapped(docs: DataFrame, num: Int = 2, den: Int = 3,
      leftMax: Long = 200, maxGramDf: Long = 1000): DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      s"containment threshold must be a rational in (0, 1]: $num/$den")
    require(maxGramDf > 0, s"maxGramDf must be positive, got $maxGramDf")
    withShingles(docs) { sh =>
      val tokens = sh.select(col("doc_id"), explode(col("g")).as("shingle"))
      val rare = tokens.groupBy(col("shingle"))
        .agg(count(lit(1)).as("gdf"))
        .filter(col("gdf") <= maxGramDf)
        .select(col("shingle"))
      // checkpointed (r20 opt): the capped index feeds both candidate
      // join sides, and each side otherwise re-ran the token explode
      // AND the df-cap join. The materialized relation is the capped
      // token index — the same bytes the candidate join shuffles.
      val indexed = PlanAudit.checkpointed(tokens.join(rare, "shingle"))
      val cand = indexed.filter(col("doc_id") < leftMax)
        .withColumnRenamed("doc_id", "doc_a")
        .join(indexed.withColumnRenamed("doc_id", "doc_b"), Seq("shingle"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b")).distinct()
      val ga = sh.select(col("doc_id").as("doc_a"), col("g").as("ga"))
      val gb = sh.select(col("doc_id").as("doc_b"), col("g").as("gb"))
      cand.join(ga, "doc_a").join(gb, "doc_b")
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("ga"), col("gb"))).as("inter"),
          least(size(col("ga")), size(col("gb"))).as("mn"))
        .filter(col("inter") * den >= col("mn") * num)
        .select(col("doc_a"), col("doc_b"),
          round(col("inter").cast("double") / col("mn"), 4).as("containment"))
        .orderBy(col("doc_a"), col("doc_b"))
    }
  }

  /** Exact trigram-Jaccard pairs via prefix filtering (the PPJoin
    * family's prefix filter): tokens get a global total order by
    * ascending document frequency (ties by token). For a pair with
    * J ≥ τ the overlap is o ≥ ⌈τ·max(n_x, n_y)⌉ ≥ ⌈τ·n⌉ per side, and
    * the SMALLEST common token under the global order sits within each
    * side's first n − ⌈τ·n⌉ + 1 tokens (at least o−1 common tokens
    * follow it on each side) — so joining only those probe prefixes is
    * complete for ANY size combination, and frequent shingles rarely
    * reach a prefix. τ is fixed at the family-wide 1/2 because the
    * exact verification ([[verifyPairs]]) applies the shared integer
    * 2·|∩| ≥ |∪| cut; the output therefore equals
    * [[ngramJaccardBrute]] and shares its oracle.
    *
    * MEASURED STANDING (PROF round-13 addendum 2): at this τ the
    * prefix spans HALF of each doc's tokens, so ubiquitous
    * (boilerplate) grams still land in probe prefixes, and the
    * per-candidate array verify costs more per pair than brute's
    * grouped count — brute has won at every measured scale (2.05 vs
    * 9.33 s at 30×) and skew (12.8 vs 104 s on a 30 %-boilerplate
    * corpus). This operator stays as the PPJoin technique
    * demonstration and the high-τ building block (where prefix ≈ the
    * rare tokens); the τ = 1/2 scale path is [[ngramJaccardBrute]],
    * with the df-cap treatment ([[containmentPairsCapped]]'s shape)
    * as the boilerplate answer.
    */
  def ngramJaccardPrefix(docs: DataFrame, leftMax: Long = 200): DataFrame =
    withShingles(docs)(sh => verifyPairs(prefixCandidates(sh, leftMax), sh))

  /** Character-level near-dup via banded edit distance over a fixed
    * key prefix — the modality the token/vector families can't see
    * (single-character mutations, OCR noise, template drift), with a
    * PassJoin-style substring-shift index so candidate generation is
    * collision-driven, never all-pairs:
    *
    *  - key = the first `prefixLen` chars; FULL keys (docs at least
    *    `prefixLen` long — the overwhelming mass of a web corpus) go
    *    through the chunk index below, and the SHORT tail (keys of
    *    1..prefixLen−1 chars) through per-length-band buckets: band =
    *    ⌊len/d⌋, so |len(a)−len(b)| ≤ d confines each short doc's
    *    partners to its own ±1 band, and every band-bucket join has a
    *    short side — the tail's candidate volume is O(|tail| × band
    *    occupancy), never corpus²;
    *  - PROBE side (bounded to doc_id < boundA, the family's shared
    *    a-side convention): the key splits into d+1 equal chunks —
    *    by pigeonhole, two keys within edit distance d agree EXACTLY
    *    on at least one chunk, displaced by at most d;
    *  - PRIMARY side (every doc): for each chunk index, the
    *    substrings starting within ±d of the chunk's home position —
    *    (2d+1)·(d+1) short keys per doc;
    *  - candidates join on (chunk index, content) — an equi-join on
    *    short strings whose volume is collision-driven (random text
    *    almost never collides; near-dups always do) — then verify
    *    with the banded `levenshtein(a, b, d)` (early-exit DP) and
    *    keep distance ≤ d.
    *
    * Completeness: the pigeonhole lemma guarantees every full×full
    * pair surfaces from the least-id member's chunks; a pair with a
    * short member has |len diff| ≤ d or it can't be within distance
    * d at all, so the band buckets surface it (short probes also
    * reach into the full-key band for the boundary lengths
    * prefixLen−d..prefixLen−1). The output therefore EQUALS the
    * brute all-pairs filter and shares its full DuckDB oracle
    * (the provable-exactness-gate pattern). All-integer distance.
    */
  def editDistancePairs(docs: DataFrame, prefixLen: Int = 40,
      maxDist: Int = 3, boundA: Long = 200): DataFrame = {
    val nChunks = maxDist + 1
    require(prefixLen % nChunks == 0,
      s"prefixLen $prefixLen must split into ${nChunks} equal chunks")
    require(maxDist >= 1, s"maxDist $maxDist must be >= 1")
    val cw = prefixLen / nChunks
    val allKeys = docs
      .select(col("doc_id"), substring(col("text"), 1, prefixLen).as("s"))
      .filter(length(col("s")) >= 1)
    val keys = allKeys.filter(length(col("s")) === prefixLen)
    // the index relations carry IDS AND CHUNK KEYS ONLY — the
    // byte-minimal convention (the PQ survivor-fetch pattern): the
    // 40-char keys would otherwise replicate 4×/(2d+1)(d+1)× through
    // the candidate join's shuffle, and they re-attach once per
    // DISTINCT pair below instead
    val probes = keys.filter(col("doc_id") < boundA)
      .select(col("doc_id").as("a_id"),
        explode(array((0 until nChunks).map(i =>
          struct(lit(i).as("ci"),
            substring(col("s"), i * cw + 1, cw).as("ck"))): _*)).as("c"))
      .select(col("a_id"), col("c.ci").as("ci"), col("c.ck").as("ck"))
    // primary windows: every substring starting within ±d of each
    // home position. No pre-join distinct — coincident windows only
    // duplicate CANDIDATES, which the pair-level distinct collapses;
    // a window-side distinct would pay a full extra shuffle of the
    // (2d+1)(d+1)-wide index to save join input it cannot dominate
    val windows = keys
      .select(col("doc_id").as("b_id"),
        explode(array((for {
          i <- 0 until nChunks
          st <- math.max(0, i * cw - maxDist) to
            math.min(i * cw + maxDist, prefixLen - cw)
        } yield struct(lit(i).as("ci"),
          substring(col("s"), st + 1, cw).as("ck"))): _*)).as("c"))
      .select(col("b_id"), col("c.ci").as("ci"), col("c.ck").as("ck"))
    val chunkCand = probes.join(windows, Seq("ci", "ck"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"))
    // short-tail band buckets: every candidate leg pairs a probe side
    // (id < boundA) against a side that is ALL short keys, or is all
    // keys while the probe itself is short — so no leg is full×full
    // and the chunk index stays the only full-corpus path. Relations
    // carry (id, len, band) only — the byte-minimal convention again.
    val banded = allKeys
      .select(col("doc_id"), length(col("s")).as("len"),
        (length(col("s")) / maxDist).cast("int").as("band"))
    val shortB = banded.filter(col("len") < prefixLen)
    // probe emits its own band ±1; |len(a)−len(b)| ≤ d then implies
    // the partner's band is among them
    def probeBands(df: DataFrame) = df
      .select(col("doc_id").as("a_id"), col("len").as("la"),
        explode(array(col("band") - 1, col("band"), col("band") + 1))
          .as("band"))
    val bandCand =
      probeBands(banded.filter(col("doc_id") < boundA))
        .join(shortB.select(col("doc_id").as("b_id"),
          col("len").as("lb"), col("band")), Seq("band"))
      .unionByName(
        probeBands(shortB.filter(col("doc_id") < boundA))
          .join(banded.filter(col("len") === prefixLen)
            .select(col("doc_id").as("b_id"), col("len").as("lb"),
              col("band")), Seq("band")))
      .filter(col("a_id") =!= col("b_id") &&
        abs(col("la") - col("lb")) <= maxDist)
      .select(col("a_id"), col("b_id"))
    val cand = chunkCand.unionByName(bandCand)
      .select(least(col("a_id"), col("b_id")).as("doc_a"),
        greatest(col("a_id"), col("b_id")).as("doc_b"))
      .distinct()
    // verify on distinct pairs: keys re-attach via two AQE-gated
    // joins (the doc_a side prunes to < boundA rows)
    val ka = allKeys.filter(col("doc_id") < boundA)
      .select(col("doc_id").as("doc_a"), col("s").as("s1"))
    val kb = allKeys.select(col("doc_id").as("doc_b"), col("s").as("s2"))
    cand.join(kb, Seq("doc_b")).join(ka, Seq("doc_a"))
      .withColumn("dist", levenshtein(col("s1"), col("s2"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("doc_a"), col("doc_b"), col("dist"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Cross-source duplication matrix: for every unordered pair of
    * sources, how many verified near-dup document pairs cross (or
    * stay inside) it — the curation report that surfaces mirror
    * sites, content farms, and scrape overlap BEFORE dedup decides
    * who wins. Rides the BRUTE inverted-index pair relation — the
    * measured τ = 1/2 scale path (PROF round-13 addendum 2: brute
    * beats the prefix filter at every scale AND under boilerplate
    * skew; the pair sets are spec-pinned equal, so this is a free
    * plan swap) and the memoized verified-pair substrate (computing
    * the matrix after a dedup run re-verifies nothing) — then two
    * joins against the 2-column (doc_id, source) projection,
    * AQE-size-gated like every model-table join here; the aggregate
    * is source²-sized. All-integer output.
    */
  def sourceDupMatrix(docs: DataFrame): DataFrame = {
    val pairs = ngramJaccardBrute(docs).select(col("doc_a"), col("doc_b"))
    val src = docs.select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** The prefix-filter candidate stage, pre-checkpoint — exposed so
    * plan-shape specs can pin its physical form (no Window node, the
    * pair join is a hash equi-join on the shingle).
    */
  private[graft] def prefixCandidates(sh: DataFrame, leftMax: Long): DataFrame = {
    val tokens = sh.select(col("doc_id"), explode(col("g")).as("shingle"))
    val freq = tokens.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    // per-doc df-ordered prefix in ONE aggregation: collect (df,
    // shingle), array_sort gives the ascending-df order, slice keeps
    // the first n − ⌈τ·n⌉ + 1 — replaces the row_number window (an
    // extra full sort-shuffle of the token relation) and the separate
    // doc-size join; per-doc arrays are bounded by document length,
    // so the collect never exceeds one document's shingle set
    // NOT checkpointed (r20 measured, rejected): materializing the
    // prefix relation for both self-join sides LOST 1.5× (2.1 → 3.2 s
    // at sf0.1) — the probe side's doc_id < leftMax filter pushes
    // through the groupBy to the scan, so the "duplicate" subtree is
    // really one full pass plus one leftMax-pruned pass, and a
    // checkpoint replaces the cheap pruned pass with a full
    // string-heavy materialization.
    val prefixes = tokens.join(freq, "shingle")
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("df"), col("shingle"))).as("ts"))
      .select(col("doc_id"),
        explode(slice(array_sort(col("ts")), lit(1),
          (size(col("ts")) - ceil(size(col("ts")) * 0.5) + 1).cast("int")))
          .as("t"))
      .select(col("doc_id"), col("t.shingle").as("shingle"))
    prefixes.filter(col("doc_id") < leftMax)
      .withColumnRenamed("doc_id", "doc_a")
      .join(prefixes.withColumnRenamed("doc_id", "doc_b"), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** MinHash + LSH banding: the full-corpus scale path.
    *
    * shingles → (h1,h2) base hashes → 64-long signature (partial-agg
    * Aggregator) → 32 bands of 2 → bucket self-join for candidates →
    * exact-Jaccard verification of candidates only. 32×2 banding keeps
    * recall ≈ 1 down to the τ=0.5 cut (P(miss | j=0.5) = (1-0.25)³² ≈
    * 1e-4), so the verified output equals the brute-force baseline and
    * shares its oracle; false bucket collisions only cost verification
    * work.
    */
  /** Verified MinHash pair sets memoized like the shingle relation:
    * a dedup pipeline consumes the SAME pair set several times (the
    * pair listing itself, clustering, the composed corpus-clean flow),
    * and the result is an eagerly-checkpointed handful of rows — so a
    * repeat call returns the pinned result instead of re-running the
    * signature+verify pass. Same staleness key as the other memos
    * (plan hash + scanned-file fingerprint); bounded — overflow drops
    * references only (checkpoint blocks reclaimed by the context
    * cleaner once callers release theirs; eager unpersist would kill
    * results callers still hold).
    */
  private val pairCache =
    new BoundedMemo[(Int, Int, Long, Int, Int), DataFrame](capacity = 8)

  /** Memoized CLUSTER label sets ([[dupClusters]]), keyed like the
    * pair sets plus the left bound: a dedup pipeline consumes the
    * same cluster relation several times (keep-best, cluster-safe
    * splits, the composed pipelines), and the result is a small
    * eagerly-checkpointed relation — the [[pairCache]] contract.
    */
  private val clusterCache =
    new BoundedMemo[(Int, Int, Long), DataFrame](capacity = 8)

  /** Unpersist and drop all memoized pair AND cluster sets.
    * DESTRUCTIVE: the cached results are eagerly checkpointed
    * (lineage truncated), so unpersisting kills any previously
    * RETURNED DataFrame too — call only when no caller still holds
    * one (staleness resets, test harness isolation). Capacity
    * overflow deliberately does NOT take this path: it drops
    * references only, and the context cleaner reclaims the
    * checkpoint blocks once callers release theirs.
    */
  def clearPairCache(): Unit = {
    pairCache.clear(dropCheckpoint)
    clusterCache.clear(dropCheckpoint)
  }

  def minhashLsh(docs: DataFrame, leftMax: Long = 200,
      bands: Int = 32, rowsPerBand: Int = 2): DataFrame = {
    val key = (docs.queryExecution.analyzed.semanticHash(),
      java.util.Arrays.hashCode(docs.inputFiles.asInstanceOf[Array[AnyRef]]),
      leftMax, bands, rowsPerBand)
    // new-key overflow drops references WITHOUT unpersisting (the
    // memo's default no-op disposal — see clearPairCache for why)
    pairCache.getOrElseUpdate(key)(
      withShingles(docs)(sh =>
        verifyPairs(minhashCandidates(sh, leftMax, bands, rowsPerBand), sh)))
  }

  /** The MinHash banding candidate stage, pre-checkpoint — exposed for
    * plan-shape specs (the bucket self-join must be a hash equi-join).
    */
  private[graft] def minhashCandidates(sh: DataFrame, leftMax: Long,
      bands: Int, rowsPerBand: Int): DataFrame = {
    val sigLen = bands * rowsPerBand
    val tokens = sh.select(col("doc_id"), explode(col("g")).as("shingle"))
    // signature as 64 built-in min(xxhash64(shingle, k)) aggregates:
    // fully codegen'd with map-side partial aggregation — measured
    // faster than the equivalent udaf Aggregator (which remains in
    // Sketches as the general-purpose API)
    val mins = (0 until sigLen).map(k =>
      min(xxhash64(col("shingle"), lit(k))).as(s"m$k"))
    val sigs = tokens.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until sigLen).map(k => col(s"m$k")): _*).as("sig"))

    // band hash = xxhash64 over the band's slice (overflow-safe under
    // ANSI mode, which Spark 4 enables by default). Checkpointed (r20
    // opt): `banded` feeds BOTH sides of the bucket self-join below,
    // and with no cross-side common-subexpression reuse each side
    // otherwise re-ran the full signature pass (64 min-aggregates
    // over the exploded token relation). The materialized relation is
    // bands rows per doc — corpus-linear, 16 B/row.
    val banded = PlanAudit.checkpointed(sigs.select(col("doc_id"), posexplode(
      transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(concat_ws(",",
          transform(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            x => x.cast("string")))))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bucket")))

    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
      .filter(col("doc_a") < leftMax)
  }

  /** SimHash near-dup via pigeonhole chunk blocking + multi-probe —
    * no pair scan anywhere.
    *
    * Signature: `nSigs` independent 64-bit simhashes over the trigram
    * hashes (512 bits total by default), split into
    * `nSigs·64/chunkBits` chunks (32×16-bit). Candidates are pairs
    * whose signatures agree within Hamming ≤ 1 on ≥1 chunk: the query
    * side additionally emits the 16 one-bit flips of each chunk
    * (multi-probe), and matching is an equi-join on
    * (chunk_ix, chunk_value) — the same shuffle shape as the MinHash
    * band join, no nested loop. Pigeonhole guarantees recall for
    * full-width Hamming < nChunks·2; probabilistically, a true pair
    * at per-bit disagreement p has per-chunk catch rate
    * (1−p)^16 + 16p(1−p)^15, so worst observed fixture pairs
    * (d=12/64, p≈0.19) are caught with P ≈ 1−(0.83)^32 ≈ 0.998 while
    * only ~17·32/2^16 ≈ 0.8% of random pairs collide — verified
    * against the brute oracle at sf0.001/0.01/0.1. A full-width
    * Hamming prefilter (8 xor+popcounts) cuts false collisions
    * before exact-Jaccard verification, which keeps the brute-force
    * oracle contract. Widening recall at scale = raise `nSigs`:
    * chunk count grows linearly, miss probability falls
    * geometrically.
    */
  def simhashNearDup(docs: DataFrame, leftMax: Long = 200,
      maxHamming: Int = 160, nSigs: Int = 8, chunkBits: Int = 16): DataFrame =
    withShingles(docs)(sh =>
      verifyPairs(simhashCandidates(sh, leftMax, maxHamming, nSigs, chunkBits), sh))

  /** The SimHash chunk-blocking candidate stage, pre-checkpoint —
    * exposed for plan-shape specs (multi-probe matching must be an
    * equi-join on (chunk_ix, chunk_value), never a nested loop).
    */
  private[graft] def simhashCandidates(sh: DataFrame, leftMax: Long,
      maxHamming: Int, nSigs: Int, chunkBits: Int): DataFrame = {
    val perSig = 64 / chunkBits
    val nChunks = nSigs * perSig
    val sigCols = (0 until nSigs).map(k =>
      Sketches.simhash(xxhash64(col("shingle"), lit(k))).as(s"sig$k"))
    val sigs = sh.select(col("doc_id"), explode(col("g")).as("shingle"))
      .groupBy(col("doc_id"))
      .agg(sigCols.head, sigCols.tail: _*)
      .select(col("doc_id"),
        array((0 until nSigs).map(k => col(s"sig$k")): _*).as("sig"))

    val mask = if (chunkBits == 64) -1L else (1L << chunkBits) - 1
    val chunkCols = array((0 until nChunks).map { i =>
      shiftrightunsigned(element_at(col("sig"), i / perSig + 1),
        (i % perSig) * chunkBits).bitwiseAND(lit(mask))
    }: _*)
    // checkpointed (r20 opt): `exploded` feeds the probe (a) and
    // primary (b) sides of the chunk equi-join below, and each side
    // otherwise re-ran the full nSigs×64-bit signature pass over the
    // exploded token relation. nChunks rows per doc, sig array + one
    // chunk value each — corpus-linear.
    val exploded = PlanAudit.checkpointed(
      sigs.select(col("doc_id"), col("sig"), posexplode(chunkCols))
        .withColumnsRenamed(Map("pos" -> "cix", "col" -> "cval")))

    // query side probes its chunk value plus every 1-bit flip of it
    val probes = array(col("cval") +:
      (0 until chunkBits).map(b => col("cval").bitwiseXOR(lit(1L << b))): _*)
    val a = exploded.filter(col("doc_id") < leftMax)
      .select(col("doc_id").as("doc_a"), col("sig").as("sa"),
        col("cix"), explode(probes).as("cval"))
    val b = exploded.select(col("doc_id").as("doc_b"), col("sig").as("sb"),
      col("cix"), col("cval"))
    val hamming = (0 until nSigs).map(i =>
      bit_count(element_at(col("sa"), i + 1)
        .bitwiseXOR(element_at(col("sb"), i + 1)))).reduce(_ + _)
    a.join(b, Seq("cix", "cval"))
      .filter(col("doc_a") < col("doc_b") && hamming <= maxHamming)
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** Collapse near-dup pairs into clusters with a canonical survivor —
    * the step a dedup pipeline runs after pair generation, so "A≈B,
    * B≈C" keeps one document, not two.
    *
    * Connected components via iterative min-label propagation: every
    * node starts labeled with its own id; each round every node takes
    * the minimum label in its neighborhood; stop when a round changes
    * nothing. Rounds are plain shuffle joins and the round count is
    * the component diameter — near-dup clusters are almost cliques,
    * so 2-3 rounds in practice — the standard large-graph CC shape
    * (no driver-side graph). Labels localCheckpoint per round so the
    * iterative plan doesn't snowball. Pairs come from
    * [[minhashLsh]], the full-corpus path, whose verified output
    * equals the brute baseline — so the clusters are exactly the
    * brute-force clusters and the DuckDB oracle can recompute them
    * with a recursive transitive closure.
    */
  /** Free the cached blocks behind an eager localCheckpoint once the
    * iteration has superseded it. Dataset.unpersist() only talks to
    * the CacheManager, which never saw a checkpoint — the blocks
    * belong to the LogicalRDD's underlying RDD, so unpersist that.
    * Without this, every CC round leaks its round-snapshot into
    * executor storage for the rest of the session: invisible at
    * fixture scale, unbounded at 100 TB (and measurably noisy even
    * locally — the leaked blocks' eviction churn bled 5-7 s into
    * whatever query ran next in the bench loop).
    */
  private def dropCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Near-dup clusters over the corpus — [[clusterLabelsOf]]'s
    * min-label propagation, but with identical shingle SETS collapsed
    * to one representative BEFORE the banded candidate stage.
    *
    * Why: identical documents have identical MinHash signatures, so
    * every member of an n-copy group collides in every band and the
    * bucket self-join emits the full O(n²) intra-group pair set — the
    * viral-duplicate cliff (10M re-posts of one boilerplate page →
    * 10¹³ candidate rows) even though the CLUSTER output is linear in
    * n. The collapse groups docs by their sorted distinct-trigram set
    * (md5 of the joined sorted array — the same 128-bit content-key
    * class as the md5 split assignment), elects the min-id member as
    * the group's representative, runs candidate generation + exact
    * verification over representatives ONLY, propagates labels on the
    * rep graph, then broadcast-expands members onto their rep's
    * label. Identical sets are Jaccard-1 duplicates by definition, so
    * the expansion is EXACT, not approximate:
    *
    *  - cross-group: every cross pair between two identical-set
    *    groups has the rep pair's exact Jaccard, and a member pair is
    *    emitted by the pairwise path iff min(id) < leftMax ⇔
    *    min(rep_a, rep_b) < leftMax — the same condition that emits
    *    the rep pair;
    *  - intra-group: the pairwise path emits an intra pair iff the
    *    group has ≥2 members AND its min id (= the rep) < leftMax —
    *    exactly the expansion's inclusion filter for label-less reps;
    *  - labels: every member id ≥ its rep, so the min label of a rep
    *    component IS the min doc id of the member component.
    *
    * Output is therefore bit-equal to
    * `clusterLabelsOf(minhashLsh(docs, leftMax))` (spec-pinned), and
    * the DuckDB transitive-closure oracle is unchanged. Memoized and
    * checkpointed like the pair sets — downstream consumers
    * (keep-best, cluster-safe splits, the composed pipelines) reuse
    * the materialized labels.
    */
  def dupClusters(docs: DataFrame, leftMax: Long = 200): DataFrame = {
    val (ph, fh) = shingleKey(docs)
    clusterCache.getOrElseUpdate((ph, fh, leftMax))(
      PlanAudit.checkpointed(
        dupClustersCollapsed(cachedShingles(docs), leftMax)))
  }

  /** Per-doc identical-set keys: (doc_id, k) where `k` is the 128-bit
    * content key of the doc's sorted distinct-shingle set. The JSON
    * rendering of the sorted array is INJECTIVE on string arrays
    * (every element is quoted and escaped, including any separator
    * byte a gram could smuggle), so distinct sets can never collide
    * on the key short of an md5 collision — a separator-joined concat
    * would let crafted grams alias across element boundaries. Empty
    * shingle sets are excluded — they generate no candidates on the
    * pairwise path, so they must not group with each other here.
    */
  private[graft] def shingleSetKeyed(sh: DataFrame): DataFrame =
    sh.filter(size(col("g")) >= 1)
      .select(col("doc_id"),
        md5(to_json(array_sort(col("g")))).as("k"))

  /** The collapsed cluster pipeline over a shingle relation — see
    * [[dupClusters]] for the exactness argument. Pre-checkpoint, so
    * plan specs can pin the shape (the candidate stage's input is the
    * rep-filtered shingle relation, never raw members).
    */
  private[graft] def dupClustersCollapsed(sh: DataFrame,
      leftMax: Long): DataFrame = {
    // distinct: a duplicated (doc_id, text) ROW must not inflate its
    // group's member count (the pairwise path's signature aggregate
    // collapses per doc_id, so a lone duplicated doc emits NOTHING
    // there — n_members must count docs, not rows)
    val keyed = shingleSetKeyed(sh).distinct()
    // one doc_id must carry ONE shingle set (the hammingClusters
    // id→hash-function precondition, text form): a doc_id with two
    // DIFFERENT texts is one node on the pairwise path but two
    // identical-set group entries here — component split +
    // double-labeling. Refuse loudly.
    val multiSet = keyed.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nk")).filter(col("nk") > 1)
      .select(col("doc_id")).head(3)
    require(multiSet.isEmpty,
      s"dupClusters: doc_id(s) ${multiSet.map(_.get(0)).mkString(", ")} " +
        "carry more than one distinct shingle set — the collapsed cluster " +
        "path requires one text per doc_id (fix the ingest, or use " +
        "clusterLabelsOf(minhashLsh(...)) which is exact over any input)")
    val groups = keyed.groupBy(col("k"))
      .agg(min(col("doc_id")).as("rep"), count(lit(1)).as("n_members"))
    val shReps = sh.join(groups.select(col("rep").as("doc_id")),
      Seq("doc_id"), "left_semi")
    val repPairs = verifyPairs(minhashCandidates(shReps, leftMax, 32, 2),
      shReps).select(col("doc_a"), col("doc_b"))
    val repLabels = clusterLabelsOf(repPairs)
    keyed.join(groups, Seq("k"))
      .join(repLabels.select(col("doc_id").as("rep"), col("cluster_id")),
        Seq("rep"), "left")
      .filter(col("cluster_id").isNotNull ||
        (col("n_members") >= 2 && col("rep") < leftMax))
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("rep")).as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** Connected components over an ARBITRARY near-dup pair relation
    * (doc_a, doc_b) — the propagation loop [[dupClusters]] runs over
    * the text pairs, factored so every pair-producing modality
    * (MinHash text pairs, image phash pairs, embedding pairs mapped
    * to ids) collapses to survivors through the one audited
    * implementation. Emits (doc_id, cluster_id) for every doc that
    * appears in a pair; singletons are absent (they label themselves
    * — the keep-best operator left-joins them back in).
    */
  def clusterLabelsOf(pairs: DataFrame): DataFrame =
    clusterLabelsOf(pairs, MaxDriverEdges)

  /** Edge ceiling for the driver union-find fast path of
    * [[clusterLabelsOf]]: up to this many pair rows (two longs each —
    * ~48 MB as collected JVM rows at the bound) are BOUNDED driver
    * model state, the `maxRerankCandidates` class — the pair set is
    * the near-dup graph's edge list, already the product of banded
    * candidate pruning and exact verification, never the corpus. Past
    * the ceiling the distributed min-label loop runs unchanged
    * (automatic degrade, not a refusal — the 100 TB regime where even
    * the verified edge list is corpus-sized). Why the fast path
    * exists: each propagation round is one whole Spark job over a
    * 32-partition shuffle, so at any edge count a driver can hold,
    * the loop is pure scheduler overhead — measured 1.8-2.1 s of the
    * 2.2 s warm media-cluster legs at sf0.1 (ProfClusters) for a
    * 47-cluster graph a union-find labels in microseconds.
    */
  private[graft] val MaxDriverEdges: Int = 1 << 21

  private[graft] def clusterLabelsOf(pairs: DataFrame,
      maxDriverEdges: Int): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val narrow = pairs.select(col("doc_a"), col("doc_b"))
    val longIds = narrow.schema.fields.forall(_.dataType == LongType)
    // ONE bounded job decides the regime AND feeds the fast path:
    // head(n+1) either returns the COMPLETE edge list (≤ n rows) or
    // proves the bound is exceeded (n+1 rows → distributed loop).
    val probe = if (longIds) narrow.head(maxDriverEdges + 1) else Array.empty[org.apache.spark.sql.Row]
    if (longIds && probe.length <= maxDriverEdges)
      driverUnionFind(pairs.sparkSession, probe)
    else clusterLabelsDistributed(pairs)
  }

  /** Exact connected components over a driver-resident edge list —
    * path-halving union-find, components labeled by their MIN member
    * id: precisely the fixed point the distributed min-label loop
    * converges to, so the two regimes are output-identical (spec-
    * pinned on chain/clique/random graphs). Emits (doc_id,
    * cluster_id) for every id appearing in any pair, doc_id-ordered —
    * [[clusterLabelsOf]]'s exact contract.
    */
  private def driverUnionFind(spark: org.apache.spark.sql.SparkSession,
      edges: Array[org.apache.spark.sql.Row]): DataFrame = {
    val parent = new java.util.HashMap[Long, Long](edges.length * 2)
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrDefault(x, x)
      while (p != x) {
        val gp = parent.getOrDefault(p, p)
        parent.put(x, gp) // path halving
        x = gp
        p = parent.getOrDefault(x, x)
      }
      x
    }
    edges.foreach { r =>
      val (a, b) = (find(r.getLong(0)), find(r.getLong(1)))
      if (a != b) { if (a < b) parent.put(b, a) else parent.put(a, b) }
    }
    val nodeSet = new java.util.TreeSet[java.lang.Long]()
    edges.foreach { r => nodeSet.add(r.getLong(0)); nodeSet.add(r.getLong(1)); () }
    val nodes = nodeSet.iterator()
    // two passes: min member per root (union-by-min keeps roots
    // minimal already, but deriving the label explicitly keeps the
    // labeling independent of the union order)
    val minOfRoot = new java.util.HashMap[Long, Long]()
    val nodeArr = new Array[Long](nodeSet.size)
    var i = 0
    while (nodes.hasNext) { nodeArr(i) = nodes.next().longValue; i += 1 }
    nodeArr.foreach { n =>
      val r = find(n)
      if (n < minOfRoot.getOrDefault(r, Long.MaxValue)) minOfRoot.put(r, n)
    }
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](nodeArr.length)
    nodeArr.foreach { n =>
      rows.add(org.apache.spark.sql.Row(n, minOfRoot.get(find(n)).longValue))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cluster_id",
        org.apache.spark.sql.types.LongType, nullable = false)))
    spark.createDataFrame(rows, schema).orderBy(col("doc_id"))
  }

  /** The distributed min-label propagation loop — the past-the-bound
    * regime of [[clusterLabelsOf]] (and the measurement of record for
    * the 100 TB scale claims; the driver fast path above must equal
    * it bit-for-bit).
    */
  private[graft] def clusterLabelsDistributed(pairs: DataFrame): DataFrame = {
    val edges = PlanAudit.checkpointed(pairs
      .union(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b"))))
    // round 0 fused into the node extraction: every node starts at
    // min(own id, min neighbor id) rather than its own id — one
    // aggregation replaces the distinct + a full propagation round,
    // and clique-shaped near-dup clusters converge immediately
    // (leaving a single confirmation round)
    var labels = PlanAudit.checkpointed(edges.groupBy(col("doc_a"))
      .agg(min(col("doc_b")).as("mn"))
      .select(col("doc_a").as("doc_id"),
        least(col("doc_a"), col("mn")).as("lbl")))
    var changed = 1L
    val superseded = scala.collection.mutable.ArrayBuffer[DataFrame](edges)
    while (changed > 0) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .groupBy(col("doc_a").as("doc_id"))
        .agg(min(col("lbl")).as("nlbl"))
      // the moved-count rides the checkpoint's own materialization
      // job as an observed aggregate: one job per round, not a
      // checkpoint job plus a count job (the count job was pure
      // fixed overhead — the checkpointed rows were already in
      // memory). Dataset.checkpoint runs through withAction, so the
      // observation completes when the execution-end event is
      // delivered — measured ~10 ms after the checkpoint returns
      // (async listener bus); the bounded wait covers delivery and
      // the explicit-count fallback keeps the loop correct even if
      // the event is ever dropped (bus overflow).
      val obs = org.apache.spark.sql.Observation()
      val next = labels.join(neighborMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"),
          (col("nlbl") < col("lbl")).as("moved"))
        .observe(obs, count(when(col("moved"), true)).as("moved_n"))
      val materialized = PlanAudit.checkpointed(next)
      // 1 s, not 10: normal delivery is ~10 ms after the checkpoint
      // returns; if the execution-end event is ever dropped, the
      // explicit count below is cheap (the rows are already
      // materialized), so a long grace period only adds worst-case
      // stall per round (ADVICE r19)
      changed =
        try scala.concurrent.Await.result(obs.future,
          scala.concurrent.duration.Duration(1, "seconds")).getLong(0)
        catch {
          case _: java.util.concurrent.TimeoutException =>
            materialized.filter(col("moved")).count()
        }
      superseded += labels // this round's snapshot, replaced below
      labels = materialized.select(col("doc_id"), col("lbl"))
    }
    // drop every superseded snapshot AFTER the loop: storage stays
    // bounded by the round count within one query (small — rounds =
    // component diameter), and the block-removal RPCs don't interleave
    // with the propagation jobs (measured ~+0.9s when dropped mid-loop)
    superseded.foreach(dropCheckpoint)
    labels.select(col("doc_id"), col("lbl").as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** WITHIN-document repeated-span removal, keep-first: a `w`-word
    * window that already occurred verbatim EARLIER in the same
    * document is deleted (boilerplate echoes, stutter loops, copy-
    * paste artifacts). [[TextOps]]' repetition columns measure this
    * signal; this is the action — and the within-doc counterpart of
    * [[spanRemove]], whose windows must recur in OTHER docs. Pure
    * per-row expression work: no join, no shuffle, no state — the
    * operator is a projection and scales as a scan, the best
    * possible 100 TB shape.
    *
    * Per-doc cost is O(g·log g) via an in-row sort: the (gram,
    * 1-based index) structs sort lexicographically, so every
    * repeat of a gram lands adjacent to — and, index-ascending,
    * AFTER — its first occurrence, and "gram seen earlier" becomes
    * one predecessor compare per sorted position. Exactly the
    * keep-first semantics of the naive prefix probe this replaced,
    * which string-compared each gram against ALL its predecessors —
    * O(g²·w) token compares, ~10¹⁰ for one 100k-token book, stalling
    * that row's partition (the r11-flagged long-doc tail). A sort
    * beats the also-considered rolling-hash prefilter here: the
    * prefilter still walks O(g²) hash prefixes and needs a collision
    * caveat, while the sort is asymptotically smaller and exact with
    * no hash in the semantics at all. Annotate-don't-filter: every
    * doc emits, zeros when echo-free.
    */
  def withinDocRemove(docs: DataFrame, w: Int = 3): DataFrame =
    Spread(docs)
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .withColumn("gs", TextOps.positionalNgramsOf(col("ws"), w))
      // (gram, 1-based index) structs in gram-then-index order; the
      // 2-arg transform lambda supplies the index, so `gs` is
      // referenced exactly once
      .withColumn("srt", array_sort(transform(col("gs"),
        (g, i) => struct(g.as("g"), (i + 1).as("i")))))
      // adjacent compare via zip_with(tail, whole): sorted position
      // p+1 repeats position p's gram ⇔ index srt[p+1].i is NOT its
      // gram's first occurrence. CRITICAL: `srt` appears only at TOP
      // level (zip_with/slice operands), never inside a lambda body —
      // an `element_at(srt, p)` probe inside filter/transform lambdas
      // gets the alias INLINED into the lambda and re-sorts the whole
      // array PER POSITION (HOF lambdas see no common-subexpression
      // reuse; measured ~100× on the 500-doc fixture). Top-level
      // references cost at worst one extra sort per row.
      .withColumn("cov", array_distinct(flatten(transform(
        filter(
          zip_with(
            slice(col("srt"), lit(2), greatest(size(col("srt")) - 1, lit(0))),
            col("srt"),
            (cur, prev) => when(
              cur.getField("g") === prev.getField("g"),
              cur.getField("i"))),
          x => x.isNotNull),
        i => sequence(i, i + (w - 1))))))
      .select(col("doc_id"), size(col("ws")).cast("bigint").as("n_tokens"),
        size(col("cov")).cast("bigint").as("n_removed"),
        array_join(filter(col("ws"),
          (tok, i0) => !array_contains(col("cov"), i0 + 1)), " ")
          .as("clean_text"))
      .orderBy(col("doc_id"))

  /** Leakage-proof split assignment: every document draws its
    * train/val/test split from its near-dup CLUSTER label's md5
    * bucket (singletons from their own id), so two near-duplicate
    * documents can never land on opposite sides of a train/eval cut —
    * the contamination `x_split_leakage` MEASURES is prevented by
    * construction here (per-doc bucketing splits a dup pair with
    * probability 2·p·(1−p)). Rides the memoized MinHash pair
    * substrate and label propagation; the bucket/label rule is
    * byte-identical to [[Sampling.assignSplits]], so the assignment
    * stays engine-auditable.
    */
  def assignSplitsClusterSafe(docs: DataFrame,
      weights: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)): DataFrame = {
    val cl = dupClusters(docs)
    val withCl = docs.select(col("doc_id"))
      .join(cl, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    Sampling.assignSplits(withCl, "cluster_id", weights)
      .select(col("doc_id"), col("cluster_id"), col("bucket"), col("split"))
      .orderBy(col("doc_id"))
  }

  /** Canonical-representative selection by QUALITY, not by min id:
    * each near-dup cluster keeps its highest-scoring member (distinct
    * word count — an integer quality proxy; boilerplate-trimmed or
    * truncated variants lose to the fullest copy), ties to the
    * smaller doc_id. The "which duplicate do we train on" step —
    * min-id keeps whichever copy happened to be crawled first; this
    * keeps the best one.
    *
    * Scale shape: the corpus never shuffles. The cluster label
    * relation is pair-graph-sized (only docs that near-dup anything;
    * it is already checkpointed by [[dupClusters]], so its two
    * consumers here don't recompute it) — the argmax window runs over
    * the clustered SUBSET only, and singleton docs pass through as
    * their own representative with a literal n_members=1, paying one
    * column-pruned scan and an anti join against the small label set.
    */
  def keepBestPerCluster(docs: DataFrame, leftMax: Long = 200): DataFrame = {
    val clusters = dupClusters(docs, leftMax)
    val scored = docs.select(col("doc_id"),
      TextOps.distinctWordCount(col("text")).as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("score").desc, col("doc_id"))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
    val best = scored.join(clusters, "doc_id")
      .withColumn("rk", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(wc))
      .filter(col("rk") === 1)
      .select(col("cluster_id"), col("doc_id"), col("score"), col("n_members"))
    val singles = scored
      .join(clusters.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id").as("cluster_id"), col("doc_id"), col("score"),
        lit(1L).as("n_members"))
    best.unionByName(singles).orderBy(col("cluster_id"))
  }

  /** Benchmark decontamination: flag corpus documents sharing at least
    * `minShared` distinct n-gram shingles with any benchmark document
    * — the pre-training curation step that keeps eval data out of the
    * training set. Same inverted-index shape as the Jaccard paths
    * (shingle equi-join, count per pair — contamination never pays an
    * all-pairs scan). The benchmark join carries NO broadcast hint:
    * a typical benchmark suite is tiny and AQE's runtime conversion
    * broadcasts its exploded shingles while the corpus streams, but a
    * LARGE held-out set (the shingles explode a benchmark's token
    * count ×shingle-width) falls back to a partitioned shingle join
    * instead of OOMing the driver — the same size-gating self-defense
    * as the PQ near-dup survivor fetch and the CorpusStats vocab
    * joins. The integer threshold keeps the cut bit-exact across
    * engines.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
      minShared: Int = 5): DataFrame = {
    val c = cachedShingles(corpus)
      .select(col("doc_id"), explode(col("g")).as("shingle"))
    val b = cachedShingles(benchmark)
      .select(col("doc_id").as("benchmark_id"), explode(col("g")).as("shingle"))
    c.join(b, Seq("shingle"))
      .groupBy(col("doc_id"), col("benchmark_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("doc_id"), col("benchmark_id"))
  }

  /** Incremental dedup: flag incoming documents with a verified
    * trigram-Jaccard near-duplicate already in the existing corpus —
    * the daily-ingest shape ("dedupe today's crawl against everything
    * kept so far") that a one-shot self-join can't express. Same
    * inverted-index candidate generation as the self-dedup paths (a
    * pair materializes only if the sides share a shingle), the same
    * integer 2·|∩| ≥ |∪| cut, and both sides ride the memoized
    * shingle substrate. At 100 TB the historical side's exploded
    * shingles shuffle-partition by shingle; nothing is quadratic and
    * neither side is collected or broadcast.
    */
  def dedupAgainstCorpus(incoming: DataFrame, corpus: DataFrame): DataFrame = {
    val inc = cachedShingles(incoming)
    val corp = cachedShingles(corpus)
    val incTok = inc.select(col("doc_id").as("inc_id"), explode(col("g")).as("shingle"))
    val corpTok = corp.select(col("doc_id").as("corpus_id"), explode(col("g")).as("shingle"))
    incTok.join(corpTok, Seq("shingle"))
      .groupBy(col("inc_id"), col("corpus_id"))
      .agg(count(lit(1)).as("inter"))
      .join(inc.select(col("doc_id").as("inc_id"), size(col("g")).as("na")), "inc_id")
      .join(corp.select(col("doc_id").as("corpus_id"), size(col("g")).as("nb")), "corpus_id")
      .withColumn("uni", col("na") + col("nb") - col("inter"))
      .filter(dupPair(col("inter"), col("uni")))
      .select(col("inc_id"), col("corpus_id"),
        round(col("inter").cast("double") / col("uni"), 4).as("jaccard"))
      .orderBy(col("inc_id"), col("corpus_id"))
  }

  /** Window-level duplicate-span coverage: for every document, how
    * many of its `w`-word windows also occur verbatim in ANOTHER
    * document, and how many words those windows cover once the
    * overlapping hits are merged into maximal spans (the
    * gaps-and-islands sum `Σ min(next_pos - pos, w)`). This is the
    * substring-granularity complement of the whole-document paths
    * above — the reference's dedup stops at the document level
    * (`/root/reference/src/pipeline/mod.rs` has no analog); the
    * design follows the exact-substring corpus-dedup idea of Lee et
    * al., "Deduplicating Training Data Makes Language Models Better"
    * (ACL 2022), re-expressed as positional n-grams instead of a
    * suffix array so it stays a pure shuffle pipeline. Within-doc
    * repetition is deliberately excluded (that signal is
    * [[TextOps.repetitionColumns]]' job): a gram counts only when its
    * min and max doc_id differ.
    *
    * Scale shape: the positional-gram relation is `Σ n_words` rows —
    * linear in corpus tokens — and the corpus is scanned and exploded
    * exactly ONCE for it: the cross-doc test (`min(doc_id) ≠
    * max(doc_id)` per gram) is fused INTO the gram partition as a
    * whole-partition window, so the hit filter runs where the gram
    * rows already live instead of aggregating to a dup-gram set and
    * joining the explosion back against itself (which re-scans and
    * re-explodes the corpus — column pruning makes the two exchange
    * subtrees differ, so Catalyst cannot reuse one exchange for
    * both). The per-doc merge is then a window + aggregate over
    * `doc_id` partitioning — one more shuffle of the (doc_id, pos)
    * hits only. Nothing is quadratic, collected, or broadcast;
    * annotate-don't-filter: every document gets a row, zeros when
    * clean.
    */
  def duplicateSpans(docs: DataFrame, w: Int = 5): DataFrame = {
    val hits = dupWindowHits(docs, w)
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = hits
      .withColumn("cov",
        least(coalesce(lead(col("pos"), 1).over(byDoc) - col("pos"), lit(w)), lit(w)))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_windows"), sum(col("cov")).as("dup_words"))
    docs.select(col("doc_id"), size(TextOps.words(col("text"))).as("n_words"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
        coalesce(col("dup_words"), lit(0L)).as("dup_words"))
      .withColumn("dup_frac", col("dup_words").cast("double") / col("n_words"))
      .orderBy(col("doc_id"))
  }

  /** The (doc_id, 0-based window start) relation of `w`-word windows
    * that recur verbatim in ANOTHER document — the shared substrate
    * of [[duplicateSpans]] (the statistic) and [[spanRemove]] (the
    * action). The cross-doc test is fused into the gram partition as
    * a whole-partition window; see [[duplicateSpans]] for why that
    * beats aggregate-then-self-join here.
    *
    * Skew-audited (r12, 100× corpus): 5-word shingles are near-unique
    * — 23.8M distinct keys over 25.1M gram rows, TOP occupancy 4 — so
    * the gram window has no concentrated key, and the
    * aggregate-then-join reshape (map-side combine + AQE-splittable
    * join, the standard skew defense) measured 1.8× SLOWER because it
    * pays the corpus explode twice (PROF_SF1.md round-12 addendum).
    * If a future corpus carries verbatim boilerplate at key counts
    * that DO concentrate (an occupancy audit like `Prof <dir>
    * spanskew` shows top-gram rows rivalling a partition), salt the
    * gram key two-phase rather than reshaping to the measured-slower
    * join.
    */
  private[graft] def dupWindowHits(docs: DataFrame, w: Int): DataFrame = {
    val grams = Spread(docs)
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"),
        posexplode(TextOps.positionalNgramsOf(col("ws"), w)).as(Seq("pos", "gram")))
    val byGram = org.apache.spark.sql.expressions.Window
      .partitionBy(col("gram"))
    grams
      .withColumn("mn", min(col("doc_id")).over(byGram))
      .withColumn("mx", max(col("doc_id")).over(byGram))
      .filter(col("mn") =!= col("mx"))
      .select(col("doc_id"), col("pos"))
  }

  /** The dedup ACTION the span statistic above only measures:
    * reconstruct each document with every cross-document duplicated
    * `w`-word window removed — Lee et al.'s ExactSubstr deletion
    * step (the reference has no analog; its pipeline stops at
    * whole-rows) at n-gram granularity. Kept tokens preserve their
    * original order; removing a span never splices two previously
    * distant tokens into a NEW duplicated window, so one pass is a
    * fixed point (grams of the cleaned text that were not already
    * duplicated stay non-duplicated — deletion only shortens docs).
    *
    * Scale shape: rides [[dupWindowHits]] (one corpus explode +
    * whole-partition window), then per-doc covered positions explode
    * ×w on HIT rows only, a (doc_id, pos)-distinct, and one
    * `collect_list` of covered positions per doc — bounded by doc
    * length, the same per-doc-array contract as the prefix-filter
    * aggregation. Reconstruction is a pure per-row expression
    * (`filter` + `array_join`), no further shuffle. The membership
    * probe is O(|covered|) per token via `array_contains`; a
    * boolean-mask native expression is the constant-factor upgrade
    * if profile ever shows heavily-duplicated long docs dominating.
    * Annotate-don't-filter: every doc emits a row; `n_removed = 0`
    * rows carry their canonically re-joined (single-space) text.
    */
  def spanRemove(docs: DataFrame, w: Int = 5): DataFrame =
    removeCovered(
      Spread(docs).select(col("doc_id"), TextOps.words(col("text")).as("ws")),
      dupWindowHits(docs, w), w)

  /** Shared removal tail of [[spanRemove]] and
    * [[decontaminateRemove]]: given the token relation and the
    * (doc_id, 0-based window start) hit relation, delete every
    * covered token and re-join the survivors. Covered positions
    * explode ×w on HIT rows only, collapse through a
    * (doc_id, pos)-distinct, and gather into one per-doc sorted
    * array (bounded by doc length); reconstruction is a pure per-row
    * expression. `array_contains` makes the membership probe
    * O(|covered|) per token — a boolean-mask native expression is
    * the upgrade if heavily-duplicated long docs ever dominate a
    * profile.
    */
  private[graft] def removeCovered(toks: DataFrame, hits: DataFrame,
      w: Int): DataFrame = {
    val covArr = hits
      // 1-based covered token positions: window at 0-based pos covers
      // tokens pos+1 .. pos+w
      .select(col("doc_id"),
        explode(sequence(col("pos") + 1, col("pos") + w)).as("p"))
      .distinct()
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("p"))).as("cov"))
    toks
      .join(covArr, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("ws")).cast("bigint").as("n_tokens"),
        coalesce(size(col("cov")), lit(0)).cast("bigint").as("n_removed"),
        array_join(filter(col("ws"),
          (tok, i) => !array_contains(
            coalesce(col("cov"), array().cast("array<int>")), i + 1)),
          " ").as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** Decontamination ACTION: delete from every corpus document each
    * `w`-word window that appears VERBATIM anywhere in the benchmark
    * set — the surgical alternative to dropping whole flagged docs
    * ([[decontaminate]] is the detector; this is the scalpel, the
    * n-gram-level eval-overlap scrub of open-corpus pipelines). The
    * benchmark gram set stays un-hinted like the detector's join:
    * AQE broadcasts a normal benchmark's grams, a pathologically
    * large held-out set degrades to a partitioned equi-join instead
    * of OOMing the driver. Same removal semantics, covered-position
    * algebra, and reconstruction expression as [[spanRemove]].
    */
  def decontaminateRemove(corpus: DataFrame, benchmark: DataFrame,
      w: Int = 5): DataFrame = {
    def grams(df: DataFrame) = Spread(df)
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"),
        posexplode(TextOps.positionalNgramsOf(col("ws"), w))
          .as(Seq("pos", "gram")))
    val benchGrams = grams(benchmark).select(col("gram")).distinct()
    val hits = grams(corpus).join(benchGrams, Seq("gram"))
      .select(col("doc_id"), col("pos"))
    removeCovered(
      Spread(corpus).select(col("doc_id"), TextOps.words(col("text")).as("ws")),
      hits, w)
  }

  /** Embedding-cosine near-dup pairs over `embeddings` (float arrays
    * cast to double; sequential fold keeps the dot product
    * bit-deterministic). Left side bounded like the text paths.
    *
    * This is the exact O(leftMax·N) baseline — the oracle anchor for
    * [[Similarity.embeddingNearDupAnn]], which is the full-corpus
    * path. The bound is ENFORCED, not conventional: a caller asking
    * for an unbounded left side gets an error pointing at the ANN
    * operator instead of silently buying a corpus-sized nested loop.
    */
  def embeddingCosinePairs(embeddings: DataFrame, minCosine: Double = 0.4,
      leftMax: Long = 500): DataFrame = {
    require(leftMax <= 10000L,
      s"embeddingCosinePairs is the bounded exact baseline (leftMax <= 10000, " +
        s"got $leftMax); use Similarity.embeddingNearDupAnn for full-corpus near-dup")
    val e = Similarity.withNorm(embeddings)
    val a = e.filter(col("vec_id") < leftMax)
      .select(col("vec_id").as("vec_a"), col("v").as("va"), col("norm").as("na"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("norm").as("nb"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        Similarity.cosineWithNorms(col("va"), col("vb"), col("na"), col("nb")).as("cos"))
      .filter(col("cos") >= minCosine)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** All id pairs whose 64-bit fingerprints agree within Hamming
    * `maxDist` — the EXACT banded form: the hash splits into `nBands`
    * contiguous bands and candidates come from an equi-join on
    * (band_ix, band_value), so with `maxDist < nBands` the pigeonhole
    * principle guarantees every true pair shares at least one intact
    * band — full recall by construction, not probabilistically (the
    * [[simhashNearDup]] chunk-block shape, minus the multi-probe it
    * needs for its wider radius). The verify is the exact popcount of
    * the XOR, so output == the brute-force pair set, which is what
    * lets the gate's oracle replay it as data.
    *
    * Scale: collision-driven — shuffle carries one (band, hash) row
    * per band per id, pairs materialize only inside matching band
    * buckets, never all-pairs. Exact-duplicate clusters (hamming 0)
    * produce their quadratic pair set because that IS the requested
    * output; pipelines that only need survivors should use
    * [[hammingClusters]], which collapses identical hashes to one
    * representative BEFORE banding and never materializes the
    * intra-group pairs. Null fingerprints (e.g. undecodable images
    * upstream) are dropped, annotate-don't-fail.
    */
  def hammingNearDup(fps: DataFrame, idCol: String, hashCol: String,
      maxDist: Int = 3, nBands: Int = 4): DataFrame = {
    // validate the banding params BEFORE paying the decode below
    requireBands(maxDist, nBands)
    // the banded join references the (id, h) relation on BOTH sides;
    // left lazy, Catalyst plans the upstream subtree into each side —
    // for the media callers that is the ENTIRE decode pipeline run
    // twice (the r19 x_dedup_audio_fp plan carried two complete
    // fixture→render→fingerprint legs, one under the broadcast).
    // Checkpoint the 16-byte-per-row projection once: every payload
    // decodes exactly once, both join sides read the materialized
    // relation. The null-id raise_error fires at this materialization
    // instead of at the caller's first action — same error, earlier.
    hammingBandPairs(PlanAudit.checkpointed(hammingBase(fps, idCol, hashCol)),
      maxDist, nBands)
  }

  /** The validated (id, h) projection [[hammingNearDup]] and
    * [[hammingClusters]] share: integral-typed ids (strict — see the
    * require), null ids raise in-row, null fingerprints drop
    * (annotate-don't-fail for undecodable payloads upstream).
    */
  private[graft] def hammingBase(fps: DataFrame, idCol: String,
      hashCol: String): DataFrame = {
    // the id must ALREADY be integral: a silent cast of e.g. string
    // ids would null every one under non-ANSI SQL, and the id_a <
    // id_b predicate would then quietly report "no near-duplicates"
    // (the StoreVersioning.requireLongIds precedent — a malformed
    // call must error, not not-find)
    val idType = fps.schema(idCol).dataType
    require(Set[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType)(idType),
      s"hammingNearDup id column '$idCol' must be an integral type, got " +
        s"$idType — map your ids to longs first (a silent cast would " +
        "null them out and report zero pairs)")
    fps.select(
        // a NULL id passes the type guard but would void every one
        // of its pairs at the id_a < id_b predicate — raise in-row
        // (no extra pass; upstream may be an expensive decode) so a
        // malformed relation errors instead of not-finding
        when(col(idCol).isNotNull, col(idCol).cast("long"))
          .otherwise(raise_error(lit(
            s"hammingNearDup: null id in '$idCol' — a null id would " +
              "silently drop every pair it participates in"))).as("id"),
        col(hashCol).as("h"))
      .filter(col("h").isNotNull)
  }

  /** The pigeonhole-exactness preconditions every Hamming-banded
    * consumer shares — ONE copy, so the bound can never drift between
    * the in-session joins and the persisted-store path.
    */
  private[graft] def requireBands(maxDist: Int, nBands: Int): Unit = {
    require(nBands > 0 && 64 % nBands == 0,
      s"nBands must divide 64, got $nBands")
    require(maxDist >= 0 && maxDist < nBands,
      s"pigeonhole recall (output == brute force) requires maxDist < nBands, " +
        s"got maxDist=$maxDist nBands=$nBands")
  }

  /** One (…, bix, bval) row per contiguous band of `hashCol` — the
    * shared banding projection of [[hammingBandPairs]] and
    * [[PhashStore.dedupAgainst]]: a change to the banding scheme
    * lands once or the store path silently diverges from the
    * in-session contract.
    */
  private[graft] def bandedProjection(df: DataFrame, hashCol: String,
      nBands: Int): DataFrame = {
    val bandBits = 64 / nBands
    val mask = if (bandBits == 64) -1L else (1L << bandBits) - 1
    df.select(df.columns.toIndexedSeq.map(col) :+ posexplode(
        array((0 until nBands).map { b =>
          shiftrightunsigned(col(hashCol), b * bandBits).bitwiseAND(lit(mask))
        }: _*)): _*)
      .withColumnsRenamed(Map("pos" -> "bix", "col" -> "bval"))
  }

  /** The banded pair join over a validated (id, h) relation — the
    * candidate + exact-popcount-verify stage of [[hammingNearDup]],
    * factored so the cluster path can run it over hash-group
    * REPRESENTATIVES instead of raw members.
    */
  private[graft] def hammingBandPairs(base: DataFrame, maxDist: Int,
      nBands: Int): DataFrame = {
    requireBands(maxDist, nBands)
    val ex = bandedProjection(base, "h", nBands)
    val a = ex.select(col("id").as("id_a"), col("h").as("ha"),
      col("bix"), col("bval"))
    val b = ex.select(col("id").as("id_b"), col("h").as("hb"),
      col("bix"), col("bval"))
    a.join(b, Seq("bix", "bval"))
      .filter(col("id_a") < col("id_b"))
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= maxDist)
      .select(col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("bigint").as("hamming"))
      .distinct()
  }

  /** One (rep, h, n_members) row per DISTINCT fingerprint: min-id
    * representative + member count — the collapse [[hammingClusters]]
    * bands instead of raw rows.
    */
  private[graft] def hammingGroups(base: DataFrame): DataFrame =
    base.groupBy(col("h"))
      .agg(min(col("id")).as("rep"), count(lit(1)).as("n_members"))

  /** Cluster labels over a 64-bit fingerprint relation — the
    * [[clusterLabelsOf]] collapse of [[hammingNearDup]]'s pairs, but
    * with identical fingerprints grouped to one REPRESENTATIVE before
    * the banded candidate join.
    *
    * Why not `clusterLabelsOf(hammingNearDup(...))`: every member of
    * an identical-hash group shares all `nBands` band values, so the
    * band self-join emits the group's full O(n²) pair set — correct
    * when pairs ARE the requested output ([[hammingNearDup]]'s
    * contract), a scale cliff when only clusters are needed (10M
    * re-encoded copies of one viral image → 10¹³ candidate rows for a
    * cluster output linear in n). Here the band join sees one row per
    * DISTINCT hash; members broadcast-expand onto their rep's label
    * afterwards. Exactness: identical hashes are Hamming-0 duplicates
    * (always ≤ maxDist), every cross pair between two hash groups has
    * exactly the rep pair's distance, and member ids ≥ their group's
    * min-id rep — so labels, membership, and the min-label convention
    * all match the pairwise path bit-for-bit (spec-pinned), and the
    * brute-force transitive-closure oracle is unchanged. Groups with
    * ≥2 members but no rep pair are intra-group cliques: they emit
    * with the rep as their label, exactly as the pairwise closure
    * labels them.
    */
  def hammingClusters(fps: DataFrame, idCol: String, hashCol: String,
      maxDist: Int = 3, nBands: Int = 4): DataFrame = {
    // distinct: a duplicated (id, hash) ROW must neither inflate its
    // group's member count (a lone duplicated image is NOT a
    // 2-member cluster — the pairwise path's id_a < id_b emits no
    // pair for it) nor double-emit the doc's label row.
    // Checkpointed (r19): base feeds the multi-hash guard, the group
    // aggregate, and the final member expansion — three jobs that
    // each re-ran the decode+distinct subtree (the caller's payload
    // persist only amortized the decode, not the shuffle). One
    // materialization of the tiny (id, h) relation; every consumer
    // reads it.
    val base = PlanAudit.checkpointed(
      hammingBase(fps, idCol, hashCol).distinct())
    // one id must map to ONE hash: the collapse's exactness argument
    // treats id→hash as a function. An id carrying two different
    // hashes is one graph NODE on the pairwise path (its two
    // neighborhoods merge into one component) but lands in two
    // separate hash groups here — silently splitting the component
    // and double-labeling the doc. Refuse loudly; the pairwise
    // clusterLabelsOf(hammingNearDup(...)) is total over such input.
    val multiHash = base.groupBy(col("id"))
      .agg(count(lit(1)).as("nh")).filter(col("nh") > 1)
      .select(col("id")).head(3)
    require(multiHash.isEmpty,
      s"hammingClusters: id(s) ${multiHash.map(_.getLong(0)).mkString(", ")} " +
        "carry more than one distinct fingerprint — the collapsed cluster " +
        "path requires one hash per id (fix the ingest, or use " +
        "clusterLabelsOf(hammingNearDup(...)) which is exact over any input)")
    // checkpointed: groups feeds BOTH sides of the rep band join and
    // the final member expansion — without materialization the
    // aggregate runs three times (r19; one row per distinct hash, so
    // the relation is small by construction)
    val groups = PlanAudit.checkpointed(hammingGroups(base))
    val repPairs = hammingBandPairs(
      groups.select(col("rep").as("id"), col("h")), maxDist, nBands)
    val repLabels = clusterLabelsOf(
      repPairs.select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
    base.join(groups, Seq("h"))
      .join(repLabels.select(col("doc_id").as("rep"), col("cluster_id")),
        Seq("rep"), "left")
      .filter(col("cluster_id").isNotNull || col("n_members") >= 2)
      .select(col("id").as("doc_id"),
        coalesce(col("cluster_id"), col("rep")).as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** Image near-duplicate pairs by perceptual hash: dHash every
    * payload ([[Multimodal.imagePhash]] — imageio decode, 9×8 gray
    * grid, adjacent-cell bits) and run the exact Hamming-banded pair
    * join. The missing dedup modality next to the text and embedding
    * families: re-encoded/lightly-retouched copies of an image land
    * within a few bits while distinct images disagree on ~half, so
    * `maxDist` defaults conservative. Non-image rows drop out at the
    * null-hash filter, so a mixed corpus needs no pre-filtering.
    */
  def imagePhashNearDup(docs: DataFrame, idCol: String, payloadCol: String,
      maxDist: Int = 3, nBands: Int = 4): DataFrame =
    hammingNearDup(Multimodal.imagePhash(docs, payloadCol), idCol, "phash",
      maxDist, nBands)

  /** AUDIO near-duplicate pairs by energy fingerprint: decode every
    * payload ([[Multimodal.audioFingerprint]] — javax.sound decode,
    * silence trim, 72-block integer energy grid, dHash-packed) and
    * run the exact Hamming-banded pair join — the last dedup modality
    * next to text, embeddings, and images, riding the SAME
    * [[hammingNearDup]] substrate. Re-encoded (amplitude-scaled,
    * resampled/stretched) and silence-padded copies land within a few
    * bits while distinct clips disagree on ~half; non-audio rows drop
    * out at the null-fingerprint filter, so a mixed corpus needs no
    * pre-filtering.
    */
  def audioFpNearDup(docs: DataFrame, idCol: String, payloadCol: String,
      maxDist: Int = 3, nBands: Int = 4): DataFrame =
    hammingNearDup(Multimodal.audioFingerprint(docs, payloadCol), idCol,
      "afp", maxDist, nBands)

  /** [[audioFpNearDup]]'s cluster form — [[hammingClusters]] over the
    * audio fingerprints, decode-once like [[imagePhashClusters]]:
    * identical-fingerprint groups (re-uploads of one clip) collapse
    * to a representative before the banded join.
    */
  def audioFpClusters(docs: DataFrame, idCol: String, payloadCol: String,
      maxDist: Int = 3, nBands: Int = 4): DataFrame =
    // decode-once now lives INSIDE hammingClusters (the (id, h) base
    // is checkpointed before any consumer), so the former payload
    // persist here would only cache decoded bytes nobody re-reads
    PlanAudit.checkpointed(
      hammingClusters(Multimodal.audioFingerprint(docs, payloadCol),
        idCol, "afp", maxDist, nBands))

  /** [[imagePhashNearDup]]'s cluster form: decode + dHash every
    * payload, then [[hammingClusters]] — identical-phash groups (the
    * re-encoded-copy mode that dominates scraped image corpora)
    * collapse to one representative before the banded join, so a
    * viral image's 10M copies cost one band row, not 10¹³ candidate
    * pairs. Output: (doc_id, cluster_id) for every image in a
    * duplicate group; non-image rows drop at the null-hash filter.
    */
  def imagePhashClusters(docs: DataFrame, idCol: String, payloadCol: String,
      maxDist: Int = 3, nBands: Int = 4): DataFrame =
    // decode-once lives INSIDE hammingClusters (the (id, h) base is
    // checkpointed before the guard/group/expansion consumers), so
    // the former payload persist here would only cache decoded bytes
    // nobody re-reads; the small cluster output still checkpoints
    // eagerly for downstream reuse
    PlanAudit.checkpointed(
      hammingClusters(Multimodal.imagePhash(docs, payloadCol),
        idCol, "phash", maxDist, nBands))
}
