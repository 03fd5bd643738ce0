package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Term-based ranked retrieval over the documents corpus — the
  * search half of a curation stack (find contaminated/near-query
  * docs, audit what a crawl actually contains, spot-check a mixture
  * by keyword). Complements the embedding ANN family: ANN answers
  * "what is semantically near this vector", search answers "what
  * contains these terms, ranked".
  *
  * Both queries are "model on the corpus, score the matches"
  * pipelines like [[CorpusStats.unigramRarity]], with one structural
  * advantage: the query-term filter lands BEFORE any aggregation, so
  * the relations that shuffle are bounded by the MATCHING postings
  * (docs containing a query term), never the corpus. At 100 TB the
  * only corpus-sized work is the codegen'd tokenize+explode scan;
  * everything downstream is match-sized, and the final top-k is
  * `TakeOrderedAndProject` (only k rows reach the driver stage).
  *
  * Scoring is BM25 on an exact-integer lattice (the
  * [[CorpusStats.bigramLm]] ppm convention) so the driver gate gets a
  * full value oracle with zero float risk:
  *  - k1 = 1.2 and b = 0.75 are carried as the rationals 6/5 and 3/4
  *    and cleared to integers, never as doubles;
  *  - the doc-length norm is `nd_ppm = (1e6·dl·N) div T` (doc length
  *    in ppm of the corpus mean avgdl = T/N);
  *  - the tf saturation is
  *    `tfnorm_ppm = (44e6·tf·1e6) div (2e7·tf + 6e6 + 18·nd_ppm)` —
  *    the exact integer clearing of tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl))
  *    scaled to ppm;
  *  - idf is the LOG-FREE exact-rational Robertson odds ratio
  *    `idf_ppm = (1e6·(2N−2df+1)) div (2df+1)` — the same deliberate
  *    integer-proxy trade as [[CorpusStats.topTermsPerDoc]]: `ln` is
  *    the one op whose last ulp differs across engines, and the odds
  *    ratio is monotone in df exactly like log-idf, so per-term
  *    ordering is preserved and the score is bit-exact everywhere;
  *  - `term_score = (idf_ppm·tfnorm_ppm) div 1e6`, summed per doc as
  *    BIGINT (order-independent — no IEEE sum-order hazard).
  *
  * Overflow headroom (BIGINT lattice): `44e12·tf` caps tf at ~2·10^5
  * per (doc, term) — an order past any Gopher-surviving document —
  * and `idf_ppm·tfnorm_ppm` caps N at ~4·10^6 docs for a df=1 term;
  * past that scale rare-term idf saturates the lattice and the ppm
  * scale drops to per-mille (one constant), which this fixture-scale
  * default doesn't pre-pessimize.
  */
object Search {

  /** A NON-FOLDABLE all-zero window partition key. `partitionBy(lit)`
    * does not survive the optimizer (EliminateWindowPartitions drops
    * foldable keys), and arithmetic disguises like `x*0` get
    * constant-folded too — both restore the empty partitionSpec and
    * its "No Partition Defined" WARN. `pmod(hash(c), 1)` is opaque to
    * every simplification rule yet still maps each row — null
    * included (hash(null) is defined) — to the one partition the
    * post-limit k-row rank window means to use.
    */
  private[ops] def onePartKey(c: org.apache.spark.sql.Column):
      org.apache.spark.sql.Column =
    pmod(hash(c), lit(1))


  /** Default query terms — mid-frequency vocabulary present at every
    * fixture SF, so df spreads across the terms.
    */
  val defaultTerms: Seq[String] = Seq("spark", "merge", "hash")

  /** BM25 top-k: (rank, doc_id, score_ppm-summed, n_hit, n_tokens).
    * Matching is disjunctive (any query term); `n_hit` counts the
    * distinct query terms present, so conjunctive (AND) search is the
    * `n_hit = |terms|` filter over this same relation.
    */
  def bm25TopK(docs: DataFrame, terms: Seq[String] = defaultTerms,
      k: Int = 10): DataFrame = {
    // global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    // k rows cross stages, never a full sort; rank attaches AFTER the
    // limit so its window sees only k rows. The constant partition key
    // is semantically the no-partition window (one k-row partition)
    // without Spark's "No Partition Defined" WARN on every run.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(onePartKey(col("doc_id")))
      .orderBy(col("score").desc, col("doc_id"))
    bm25Scored(docs, terms)
      .orderBy(col("score").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("doc_id"), col("score"),
        col("n_hit"), col("n_tokens"))
      .orderBy(col("rank"))
  }

  /** ONE definition of the integer lattice (scaladoc derivation
    * above) — the single edit site if the ppm scale ever changes;
    * the three DuckDB oracle strings in Extensions must mirror it.
    */
  private val ndPpmE = "(1000000 * dl * nn) div tt"
  private val tfnormPpmE =
    "(44000000 * tf * 1000000) div (20000000 * tf + 6000000 + 18 * nd_ppm)"
  private val idfPpmE = "(1000000 * (2 * nn - 2 * df + 1)) div (2 * df + 1)"
  private val termScoreE = "(idf_ppm * tfnorm_ppm) div 1000000"

  /** The shared scoring core: (query_id, doc_id, score, n_hit,
    * n_tokens) for a batch of queries — every public form derives
    * from this one relation. The postings prune to the UNION of all
    * query terms before any aggregation; the (query_id, term)
    * relation fans matches out per query (tiny broadcast); df stays
    * global (a term's document frequency does not depend on who
    * asked).
    */
  private def scoredByQuery(docs: DataFrame,
      queries: Seq[(Long, Seq[String])]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // per-pair distinct: a repeated term inside one query must not
    // double its postings
    val qterms = queries
      .flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
      .toDF("query_id", "term")
    val allTerms = queries.flatMap(_._2).distinct
    val toks = docs.repartition(col("doc_id"))
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
    // per-doc length and the two corpus scalars derive from the same
    // compact (doc_id, dl) relation; stats is a 1-row broadcast
    val dl = toks.select(col("doc_id"), size(col("ws")).cast("long").as("dl"))
    val stats = dl.agg(count(lit(1)).as("nn"), sum(col("dl")).as("tt"))
    // the postings: query-term filter BEFORE the group-by — only
    // matching (doc, term) rows ever aggregate or shuffle
    val tf = toks.select(col("doc_id"), explode(col("ws")).as("term"))
      .filter(col("term").isin(allTerms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    tf
      .join(dfreq, "term") // |terms|-row model table, AQE-broadcast
      .join(dl, "doc_id")  // doc_id-keyed like tf: no re-shuffle
      .crossJoin(broadcast(stats))
      .join(broadcast(qterms), "term")
      .withColumn("nd_ppm", expr(ndPpmE))
      .withColumn("tfnorm_ppm", expr(tfnormPpmE))
      .withColumn("idf_ppm", expr(idfPpmE))
      .withColumn("term_score", expr(termScoreE))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("term_score")).as("score"),
        count(lit(1)).as("n_hit"),
        max(col("dl")).as("n_tokens"))
  }

  /** The disjunctive scoring relation (doc_id, score, n_hit,
    * n_tokens) both single-query top-k forms rank over — the shared
    * core with a one-query batch.
    */
  private def bm25Scored(docs: DataFrame, terms: Seq[String]): DataFrame =
    scoredByQuery(docs, Seq(0L -> terms)).drop("query_id")

  /** Conjunctive (AND) BM25: only documents containing EVERY query
    * term rank — the `n_hit = |terms|` filter over the disjunctive
    * scoring relation, applied BEFORE the top-k so excluded docs
    * never reach the ordering. Same lattice, same oracle shape.
    */
  def bm25TopKConj(docs: DataFrame, terms: Seq[String] = defaultTerms,
      k: Int = 10): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(onePartKey(col("doc_id")))
      .orderBy(col("score").desc, col("doc_id"))
    bm25Scored(docs, terms)
      .filter(col("n_hit") === terms.distinct.size)
      .orderBy(col("score").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("doc_id"), col("score"),
        col("n_hit"), col("n_tokens"))
      .orderBy(col("rank"))
  }

  /** Multi-query BM25 — N queries scored in ONE corpus pass, the
    * realistic retrieval shape (per-query invocation would re-scan
    * the corpus N times). Same integer lattice as [[bm25TopK]]; the
    * postings prune to the UNION of all query terms before any
    * aggregation, the (query_id, term) relation fans matches out per
    * query (a tiny broadcast), df stays global (a term's document
    * frequency does not depend on who asked), and the top-k window
    * partitions BY QUERY — per-group top-k, never a global sort, so
    * the reduction parallelizes across queries at any corpus size.
    * Output: (query_id, rank, doc_id, score, n_hit).
    */
  val defaultQueries: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("spark", "merge", "hash"),
    2L -> Seq("window", "scan"),
    3L -> Seq("join", "filter", "sort"))

  def bm25TopKMulti(docs: DataFrame,
      queries: Seq[(Long, Seq[String])] = defaultQueries,
      k: Int = 5): DataFrame = {
    require(queries.nonEmpty, "need at least one query")
    // an empty term list would silently vanish from the output (no
    // postings rows) — indistinguishable from "no matches"; fail fast
    require(queries.forall(_._2.nonEmpty),
      s"every query needs at least one term: " +
        queries.filter(_._2.isEmpty).map(_._1).mkString(","))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("doc_id"))
    scoredByQuery(docs, queries)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("score"), col("n_hit"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Exact-phrase search: docs containing the token sequence
    * `phrase`, ranked by occurrence count — (rank, doc_id, n_occur).
    * Positional containment, not bag-of-words: occurrence i requires
    * ws[i+j] == phrase[j] for all j. The per-doc count runs inside
    * the tokenize projection via the native codegen `phrase_count`
    * expression (the HOF fold is CodegenFallback — it would break the
    * scan's codegen span; [[phraseCountHof]] keeps it as the spec's
    * bit-equality oracle) — no explode, no shuffle except the final
    * bounded `TakeOrderedAndProject`; at 100 TB this is one
    * corpus-sized scan and nothing else.
    */
  def phraseSearch(docs: DataFrame, phrase: Seq[String], k: Int = 10): DataFrame = {
    require(phrase.nonEmpty, "phrase search needs at least one token")
    val nOccur = call_function("phrase_count", col("ws"),
      typedLit(phrase.toIndexedSeq))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(onePartKey(col("doc_id")))
      .orderBy(col("n_occur").desc, col("doc_id"))
    docs.select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"), nOccur.as("n_occur"))
      .filter(col("n_occur") > 0)
      .orderBy(col("n_occur").desc, col("doc_id")).limit(k)
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("doc_id"), col("n_occur"))
      .orderBy(col("rank"))
  }

  /** The interpreted-HOF reference form of `phrase_count` — kept
    * solely as the spec's bit-equality oracle (the `Pq.codesOfHof`
    * convention). `eqNullSafe` gives the same null-element match
    * semantics the expression implements, and a NULL words array
    * yields NULL (the expression's null contract — without the
    * explicit branch, `when`'s null condition would fall through to
    * `otherwise(0)` and the parity pin would break on null-text docs).
    */
  private[ops] def phraseCountHof(ws: org.apache.spark.sql.Column,
      phrase: Seq[String]): org.apache.spark.sql.Column = {
    val matchAt = (i: org.apache.spark.sql.Column) =>
      phrase.zipWithIndex.map { case (t, j) =>
        element_at(ws, i + j).eqNullSafe(lit(t))
      }.reduce(_ && _)
    when(ws.isNull, lit(null).cast("bigint"))
      .when(size(ws) >= phrase.length,
        aggregate(sequence(lit(1), size(ws) - (phrase.length - 1)),
          lit(0L), (acc, i) => acc + when(matchAt(i), 1L).otherwise(0L)))
      .otherwise(0L)
  }
}
