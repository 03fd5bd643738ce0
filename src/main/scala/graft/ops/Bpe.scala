package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING over the corpus — the
  * "learn the merge table" step of building a tokenizer from the
  * data it will tokenize (Sennrich-style: repeatedly merge the
  * highest-weight adjacent symbol pair).
  *
  * Scale shape: the corpus is touched EXACTLY once, by the word-freq
  * aggregation ([[wordVocab]] — map-side combined, Heaps-law-sized
  * output). Every iterative step below runs on that vocabulary
  * relation: pair counting is a vocab-sized explode+agg whose top-1
  * is `TakeOrderedAndProject`, the per-iteration argmax is a 1-row
  * driver fetch (model state, the KMeans `clusterCenters`
  * convention — never a corpus collect), and the merge application
  * is a per-word fold. Lineage is truncated per iteration
  * (`localCheckpoint`, the [[Dedup.dupClusters]] per-round hygiene)
  * so n merges never build an n-deep HOF plan.
  *
  * Determinism: weight ties break lexicographically (left asc, right
  * asc) — pinned in the reference fold, the SQL oracle of the
  * first-iteration query, and here.
  */
object Bpe {

  /** (word, freq) over the corpus — the single corpus-sized pass. */
  private[ops] def wordVocab(docs: DataFrame): DataFrame =
    docs.select(explode(TextOps.words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** The vocab with each word split into its character symbols —
    * explicit substring indexing (split-on-empty-regex has trailing
    * empty-string edge cases the oracle side would have to mirror).
    */
  private def symbolized(docs: DataFrame): DataFrame =
    wordVocab(docs).select(col("freq"),
      expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        .as("syms"))

  /** Adjacent pair weights over a symbolized vocab: every adjacent
    * (syms(i), syms(i+1)) occurrence contributes the word's corpus
    * frequency — the classic BPE count (overlaps included: "aaa"
    * yields (a,a) twice).
    */
  private[ops] def pairCounts(sym: DataFrame): DataFrame = {
    val syms = col("syms")
    val pairs = when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).as("l"),
          element_at(syms, i + 1).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
    sym.select(col("freq"), explode(pairs).as("p"))
      .groupBy(col("p.l").as("l_sym"), col("p.r").as("r_sym"))
      .agg(sum(col("freq")).as("weight"))
  }

  /** Apply one merge (l, r) → l+r left-to-right non-overlapping: a
    * fold whose accumulator carries the previous unconsumed symbol.
    */
  private[ops] def applyMerge(syms: Column, l: String, r: String): Column = {
    val outT = "array<string>"
    val init = struct(array().cast(outT).as("out"),
      lit(null).cast("string").as("carry"))
    val folded = aggregate(syms, init, (acc, s) => {
      val out = acc.getField("out")
      val carry = acc.getField("carry")
      when(carry.isNull, struct(out.as("out"), s.as("carry")))
        .when(carry === lit(l) && s === lit(r),
          struct(concat(out, array(lit(l + r))).as("out"),
            lit(null).cast("string").as("carry")))
        .otherwise(struct(concat(out, array(carry)).as("out"), s.as("carry")))
    })
    when(folded.getField("carry").isNull, folded.getField("out"))
      .otherwise(concat(folded.getField("out"),
        array(folded.getField("carry"))))
  }

  /** Train `nMerges` BPE merges; returns one row per learned merge:
    * (rank, l_sym, r_sym, merged, weight), rank in learning order.
    */
  def bpeMerges(docs: DataFrame, nMerges: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var sym = symbolized(docs).localCheckpoint(true)
    val learned = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, String, Long)]
    var done = false
    for (i <- 1 to nMerges if !done) {
      val top = pairCounts(sym)
        .orderBy(col("weight").desc, col("l_sym"), col("r_sym"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (l, r, w) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        learned += ((i, l, r, l + r, w))
        sym = sym.select(col("freq"),
            applyMerge(col("syms"), l, r).as("syms"))
          .localCheckpoint(true)
      }
    }
    learned.toSeq.toDF("rank", "l_sym", "r_sym", "merged", "weight")
      .orderBy(col("rank"))
  }

  /** One compiled pass applying a whole merge table to one word:
    * code-point symbolization (the `substring(word, i, 1)` slicing —
    * whole code points, never surrogate halves), then per merge in
    * rank order the same left-to-right non-overlapping scan
    * [[applyMerge]] implements as a HOF fold.
    *
    * JVM code rather than a chained column expression on purpose: the
    * merge table is model state of ARBITRARY depth, and nesting
    * [[applyMerge]] n-deep explodes Catalyst — each fold references
    * its input ~4×, Project collapse inlines every reference, and the
    * expression tree grows ~4ⁿ (an 8-merge chain already hangs the
    * optimizer for minutes). The trainer never hits this because it
    * localCheckpoints between single-merge passes.
    */
  private[ops] def applyMergeTable(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    var syms: Array[String] = {
      val cps = word.codePoints().toArray
      cps.map(cp => new String(Character.toChars(cp)))
    }
    merges.foreach { case (l, r) =>
      val b = Array.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
          b += (l + r); j += 2
        } else { b += syms(j); j += 1 }
      }
      syms = b.result()
    }
    syms.toSeq
  }

  /** ENCODE half of the tokenizer story: apply a merge table in rank
    * order to each word, returning `(word, toks array<string>)`.
    *
    * Runs on the DISTINCT-word relation deliberately: encoding cost
    * is vocabulary-sized (Heaps' law), never corpus-sized — the
    * corpus pays only the occurrence→vocab join in
    * [[bpeEncodeTokens]]. The per-word fold is the native
    * `bpe_encode` expression ([[graft.functions.BpeEncode]]) with the
    * merge table riding in as two array literals (model state in the
    * plan, the k-means-centroid convention) — this was the library's
    * last `udf()`; [[applyMergeTable]] remains as the spec's
    * independent bit-equality reference fold.
    */
  private[ops] def encodeVocab(words: DataFrame,
      merges: Seq[(String, String)]): DataFrame =
    words.select(col("word"),
      call_function("bpe_encode", col("word"),
        typedLit(merges.map(_._1)), typedLit(merges.map(_._2))).as("toks"))

  /** Per-document token accounting under a FIXED merge table — the
    * consumer-facing "what does this tokenizer cost me" statistic
    * (sequence packing and mixture budgeting read token counts):
    * `(doc_id, n_words, n_chars, n_tokens)`, all exact integers, so
    * the full hash oracle holds. `n_chars − n_tokens` is the number
    * of merge operations that fired.
    *
    * Scale shape: one corpus pass explodes occurrences; the fold runs
    * once per DISTINCT word ([[encodeVocab]]); occurrences join the
    * encoded vocab on `word` (vocab-sized build side — AQE broadcasts
    * it) and aggregate per doc with map-side combine. Nothing
    * iterative, nothing collected.
    */
  def bpeEncodeTokens(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    val occ = docs
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("word"))
      .filter(length(col("word")) > 0)
    val enc = encodeVocab(occ.select(col("word")).distinct(), merges)
      .select(col("word"), size(col("toks")).cast("long").as("n_toks"))
    occ.join(enc, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word")).cast("long")).as("n_chars"),
        sum(col("n_toks")).as("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** The pinned English-ish merge table of the driver-gate encode
    * query — FIXED model state, applied in rank order (later merges
    * consume earlier merges' output symbols: th+e, an+d). The DuckDB
    * oracle replays it as a chain of `replace` calls over a
    * private-use-char symbol encoding — a genuinely different
    * formulation of the same left-to-right non-overlapping semantics,
    * so a hash match cross-checks the fold itself.
    */
  val PinnedMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n",
    "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e")

  /** The driver-gate query: FIRST-iteration adjacent character-pair
    * weights, top-k — one-shot and fully SQL-expressible, so it
    * carries the complete DuckDB oracle while [[bpeMerges]] (the
    * iterative trainer over the same counting substrate) is pinned by
    * an independent in-JVM reference fold in the spec.
    */
  def bpePairCounts(docs: DataFrame, k: Int = 20): DataFrame = {
    val sym = symbolized(docs)
    // non-foldable zero partition key == the no-partition k-row
    // window, minus Spark's "No Partition Defined" WARN (the
    // Search.onePartKey convention — a lit() key would be optimized
    // away by EliminateWindowPartitions)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(Search.onePartKey(col("weight")))
      .orderBy(col("weight").desc, col("l_sym"), col("r_sym"))
    pairCounts(sym)
      .orderBy(col("weight").desc, col("l_sym"), col("r_sym")).limit(k)
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("l_sym"), col("r_sym"), col("weight"))
      .orderBy(col("rank"))
  }
}
