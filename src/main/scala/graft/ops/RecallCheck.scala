package graft.ops

import org.apache.spark.sql.functions._

/** Verifies that the approximate similarity paths are EXACT on a given
  * fixture — the precondition for sharing the brute-force DuckDB
  * oracles (the same contract the MinHash/SimHash dedup paths already
  * carry: approximate-by-design, provably exhaustive at these
  * parameters on this corpus).
  *
  * Run: `runMain graft.ops.RecallCheck [sfDir ...]`.
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local()
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    dirs.foreach { dir =>
      val emb = graft.engine.Tables.table(spark, dir, "embeddings")
      def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
        df.collect().map(_.mkString("|")).toSet

      val brute = rows(Similarity.knnBrute(emb))
      (2 to 16 by 2).foreach { np =>
        val ivf = rows(Similarity.knnIvf(emb, nProbe = np))
        println(s"RECALL $dir ivf(nProbe=$np)==brute: ${ivf == brute} " +
          s"(${(brute -- ivf).size} missed, ${(ivf -- brute).size} extra)")
      }
      (1 to 4).foreach { mpb =>
        val lsh = rows(Similarity.knnLsh(emb, multiProbeBits = mpb))
        println(s"RECALL $dir lsh(mpb=$mpb)==brute: ${lsh == brute} " +
          s"(${(brute -- lsh).size} missed, ${(lsh -- brute).size} extra)")
      }

      val classifyExact = rows(Similarity.knnClassify(emb))
      (2 to 16 by 2).foreach { np =>
        val ivfCls = rows(Similarity.knnClassifyIvf(emb, nProbe = np))
        println(s"RECALL $dir classifyIvf(nProbe=$np)==exact: ${ivfCls == classifyExact} " +
          s"(${(classifyExact -- ivfCls).size} diff, ${(ivfCls -- classifyExact).size} extra)")
      }

      val brutePairs = rows(Dedup.embeddingCosinePairs(emb))
      (2 to 16 by 2).foreach { np =>
        val annPairs = rows(
          Similarity.embeddingNearDupAnn(emb, nCells = 16, nProbe = np)
            .filter(col("vec_a") < 500))
        println(s"RECALL $dir ann(nProbe=$np,vec_a<500)==brutePairs: ${annPairs == brutePairs} " +
          s"(${(brutePairs -- annPairs).size} missed, ${(annPairs -- brutePairs).size} extra)")
      }
    }
    spark.stop()
  }
}
