package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking and sequence packing — the two reshaping steps
  * between a cleaned corpus and a training batch: long documents are
  * split into overlapping token windows, and short documents are
  * packed head-to-tail into fixed-budget context windows.
  *
  * Both are expressed as pure column transforms (explode / window
  * aggregation): linear, shuffle-once, no driver involvement — the
  * shapes that survive a 100 TB corpus.
  */
object Chunking {

  /** Split every document into token windows of `chunkTokens` with
    * `stride` tokens between window starts (overlap = chunkTokens −
    * stride). Emits one row per (doc, chunk): chunk index, its token
    * count, and the chunk text's md5 (portable fingerprint). A doc
    * with fewer tokens than one window yields exactly one chunk.
    *
    * Chunk count per doc is 1 when n ≤ chunkTokens, else
    * ⌈(n−chunkTokens)/stride⌉+1 — every token is covered and the
    * final partial window is kept, but never a trailing window that
    * is entirely contained in its predecessor (a ⌊(n−1)/stride⌋+1
    * count would emit one for n mod stride in (0, chunkTokens−stride],
    * silently duplicating training data). posexplode over a
    * `sequence` literal: the expansion happens executor-side inside
    * codegen, no shuffle beyond the final sort.
    */
  def chunkDocs(docs: DataFrame, chunkTokens: Int = 50,
      stride: Int = 40): DataFrame = {
    require(stride >= 1 && chunkTokens >= stride,
      "need 1 <= stride <= chunkTokens")
    val w = TextOps.words(col("text"))
    val n = size(w)
    // ⌈(n−chunkTokens)/stride⌉ via (n−chunkTokens+stride−1)/stride;
    // greatest clamps the n ≤ chunkTokens case to a single chunk
    // (sequence(0, x) with x<0 would count DOWN in Spark)
    val nChunks = (greatest(n - chunkTokens + stride - 1, lit(0)) / stride)
      .cast("int") + 1
    docs
      .select(col("doc_id"), w.as("w"), n.as("n"),
        posexplode(sequence(lit(0), nChunks - 1)).as(Seq("chunk_ix", "s")))
      .select(col("doc_id"), col("chunk_ix"),
        least(col("n") - col("s") * stride, lit(chunkTokens)).as("n_tokens"),
        md5(array_join(slice(col("w"), col("s") * stride + 1, lit(chunkTokens)), " "))
          .as("fp_chunk"))
  }

  /** Pack documents into fixed token-budget bins ("sequence packing"
    * before training): within each `shardCol` group, documents are
    * laid head-to-tail in id order and a document's bin is the bin
    * its FIRST token lands in (contiguous packing — deterministic,
    * retry-stable, and reproducible by any engine with a running
    * sum; greedy first-fit would serialize on a single scanner).
    *
    * The running sum windows PER SHARD: shards (source, split, date
    * bucket, …) are numerous at production scale, so no window
    * partition ever holds the whole corpus — deliberately NOT a
    * global ordering, which would funnel 100 TB through one
    * partition. Docs longer than `budget` take bins alone (their
    * overflow shifts later starts, like a real packer's padding).
    */
  def packSequences(docs: DataFrame, shardCol: String,
      budget: Int = 512): DataFrame = {
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(shardCol)).orderBy(col("doc_id"))
    val packed = docs
      .select(col(shardCol), col("doc_id"),
        size(TextOps.words(col("text"))).as("n_tokens"))
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(win) - col("n_tokens"), lit(0L)))
      .withColumn("bin", (col("start_tok") / budget).cast("bigint"))
    packed
      .groupBy(col(shardCol), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col(shardCol), col("bin"))
  }
}
