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

  /** The driver-gate query: FIRST-iteration adjacent character-pair
    * weights, top-k — one-shot and fully SQL-expressible, so it
    * carries the complete DuckDB oracle while [[bpeMerges]] (the
    * iterative trainer over the same counting substrate) is pinned by
    * an independent in-JVM reference fold in the spec.
    */
  def bpePairCounts(docs: DataFrame, k: Int = 20): DataFrame = {
    val sym = symbolized(docs)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("weight").desc, col("l_sym"), col("r_sym"))
    pairCounts(sym)
      .orderBy(col("weight").desc, col("l_sym"), col("r_sym")).limit(k)
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("l_sym"), col("r_sym"), col("weight"))
      .orderBy(col("rank"))
  }
}
