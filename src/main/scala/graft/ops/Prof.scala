package graft.ops

import org.apache.spark.sql.functions._

/** Dedup-family perf harness: times each strategy (min-of-2) at an
  * arbitrary SF and cross-checks prefix==brute and clusters==union-find
  * at that SF — the sf0.1-scale complement to the sf0.001 spec
  * assertions. Run: `runMain graft.ops.Prof /root/testdata/sf0.1`.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = graft.engine.Sessions.local()
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    graft.engine.Tables.names.foreach(n =>
      graft.engine.Tables.table(spark, dir, n).count())
    val docs = graft.engine.Tables.table(spark, dir, "documents")

    def q(name: String)(f: => Long): Unit = {
      def once = { val t0 = System.nanoTime; f; (System.nanoTime - t0) / 1e9 }
      val t = math.min(once, once)
      println(f"PROF $name $t%.2f s")
    }
    q("ngram_prefix")(Dedup.ngramJaccardPrefix(docs).count())
    q("ngram_brute")(Dedup.ngramJaccardBrute(docs).count())
    q("minhash")(Dedup.minhashLsh(docs).count())
    q("simhash")(Dedup.simhashNearDup(docs).count())
    q("clusters")(Dedup.dupClusters(docs).count())

    val bruteP = Dedup.ngramJaccardBrute(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val prefP = Dedup.ngramJaccardPrefix(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"PROF prefix==brute: ${bruteP == prefP} (${bruteP.size} pairs)")

    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    bruteP.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = bruteP.flatMap(p => Set(p._1, p._2))
      .map(x => (x, find(x))).toMap
    val got = Dedup.dupClusters(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    println(s"PROF clusters==unionfind: ${expect == got} (${got.size} nodes)")
    spark.stop()
  }
}
