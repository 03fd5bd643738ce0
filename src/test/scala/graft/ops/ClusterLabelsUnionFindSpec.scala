package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-20 size-gated driver union-find fast path of
  * [[Dedup.clusterLabelsOf]]: at any edge count the driver can hold
  * (the bounded `MaxDriverEdges` gate), the propagation loop is pure
  * scheduler overhead, so the labels come from a one-collect
  * union-find instead — and this spec pins the ONE property that
  * makes the substitution legal: the two regimes are output-identical
  * on every graph shape that distinguishes CC algorithms (chains the
  * round-0 fusion can't finish in one step, cliques, forests,
  * cross-linked components, duplicate and self-referential edges).
  */
class ClusterLabelsUnionFindSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def labelsOf(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private def pairsDf(pairs: Seq[(Long, Long)]) = {
    val sp = spark; import sp.implicits._
    pairs.toDF("doc_a", "doc_b")
  }

  private def assertRegimesAgree(pairs: Seq[(Long, Long)]): Unit = {
    val df = pairsDf(pairs)
    val fast = labelsOf(Dedup.clusterLabelsOf(df, Dedup.MaxDriverEdges))
    val dist = labelsOf(Dedup.clusterLabelsDistributed(df))
    assert(fast == dist,
      s"driver union-find diverges from the distributed loop:\n" +
        s"  fast=$fast\n  dist=$dist")
  }

  test("long chain (multi-round propagation shape)") {
    // 0-1-2-...-19 as adjacent pairs, plus a reversed chain 40..31 —
    // the shape where min-label needs ~diameter rounds
    assertRegimesAgree(
      (0L until 19L).map(i => (i, i + 1)) ++
        (31L until 40L).map(i => (i + 1, i)))
  }

  test("cliques, forests, cross-links, duplicate edges") {
    val clique = for (a <- 100L to 104L; b <- (a + 1) to 104L) yield (a, b)
    val crossLinked = Seq((200L, 201L), (202L, 203L), (201L, 202L))
    val dupEdges = Seq((300L, 301L), (301L, 300L), (300L, 301L))
    val selfEdge = Seq((400L, 400L))
    assertRegimesAgree(clique ++ crossLinked ++ dupEdges ++ selfEdge)
  }

  test("empty pair set yields empty labels in both regimes") {
    assertRegimesAgree(Seq.empty)
  }

  test("over-bound edge lists take the distributed loop (same output)") {
    // a tiny bound forces the degrade path through the public gate
    val pairs = pairsDf(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    val viaGate = labelsOf(Dedup.clusterLabelsOf(pairs, maxDriverEdges = 2))
    val dist = labelsOf(Dedup.clusterLabelsDistributed(pairs))
    assert(viaGate == dist)
  }

  test("non-long id types fall back to the distributed loop unchanged") {
    val sp = spark; import sp.implicits._
    val intPairs = Seq((1, 2), (2, 3)).toDF("doc_a", "doc_b")
    val viaGate = labelsOf(Dedup.clusterLabelsOf(intPairs)
      .select(col("doc_id").cast("long"), col("cluster_id").cast("long")))
    assert(viaGate == Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }
}
