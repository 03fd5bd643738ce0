package graft.ops

/** Isolates the x_dedup_embedding timing question: does the shingle
  * cache (populated by the text-dedup family that precedes it in the
  * bench loop) slow the embedding pair join down, or was the r3 bench
  * delta host noise? Run: `runMain graft.ops.ProfEmbedding [sfDir]`.
  */
object ProfEmbedding {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    graft.engine.Tables.names.foreach(n =>
      graft.engine.Tables.table(spark, dir, n).count())
    val docs = graft.engine.Tables.table(spark, dir, "documents")
    val emb = graft.engine.Tables.table(spark, dir, "embeddings")

    def time(name: String)(f: => Long): Unit = {
      def once = { val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9 }
      val a = once; val b = once
      println(f"PROFEMB $name min=${math.min(a, b)}%.3f (runs $a%.3f / $b%.3f)")
    }

    (1 to 6).foreach(i =>
      time(s"embedding_plain_$i")(Dedup.embeddingCosinePairs(emb).count()))
    // populate the shingle cache exactly like the bench order does
    // (clusters runs immediately before embedding alphabetically)
    Dedup.dupClusters(docs).count()
    time("embedding_with_shingle_cache")(Dedup.embeddingCosinePairs(emb).count())
    Dedup.clearShingleCache()
    time("embedding_after_evict")(Dedup.embeddingCosinePairs(emb).count())
    spark.stop()
  }
}
