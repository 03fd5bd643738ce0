package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ChunkingSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("chunkDocs covers every token with the configured overlap") {
    val words = (1 to 95).map(i => s"w$i")
    val docs = Seq((1L, words.mkString(" ")), (2L, "tiny doc")).toDF("doc_id", "text")
    val rs = Chunking.chunkDocs(docs, chunkTokens = 50, stride = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val d1 = rs.filter(_._1 == 1L).sortBy(_._2)
    // 95 tokens, stride 40 → starts 0/40/80 → sizes 50/50/15
    assert(d1.map(c => (c._2, c._3)).toSeq == Seq((0, 50), (1, 50), (2, 15)))
    assert(d1(0)._4 == md5Hex(words.slice(0, 50).mkString(" ")))
    assert(d1(1)._4 == md5Hex(words.slice(40, 90).mkString(" ")))
    assert(d1(2)._4 == md5Hex(words.slice(80, 95).mkString(" ")))
    // short doc: exactly one chunk holding the whole text
    val d2 = rs.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, 0, 2, md5Hex("tiny doc"))))
  }

  test("chunkDocs never emits a chunk contained in its predecessor") {
    // n = chunkTokens exactly, and n in (stride, chunkTokens): both
    // must yield ONE chunk; n just past chunkTokens yields two with
    // the second NOT a sub-window of the first
    val mk = (id: Long, n: Int) => (id, (1 to n).map(i => s"w$i").mkString(" "))
    val docs = Seq(mk(1L, 50), mk(2L, 90), mk(3L, 51)).toDF("doc_id", "text")
    val rs = Chunking.chunkDocs(docs, chunkTokens = 50, stride = 40)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(rs.count(_._1 == 1L) == 1)              // 50 tokens → 1 chunk
    // 90 tokens: starts 0, 40 → sizes 50, 50; a third start at 80
    // would cover 81..90 ⊂ 41..90
    assert(rs.filter(_._1 == 2L).map(c => (c._2, c._3)).sorted.toSeq
      == Seq((0, 50), (1, 50)))
    assert(rs.filter(_._1 == 3L).map(c => (c._2, c._3)).sorted.toSeq
      == Seq((0, 50), (1, 11)))                    // 51 → 1..50, 41..51
  }

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("packSequences fills bins contiguously per shard") {
    // shard A: 300+300+300 tokens → starts 0/300/600 → bins 0/0/1
    val doc = (n: Int) => (1 to n).map(_ => "t").mkString(" ")
    val docs = Seq(
      (1L, "A", doc(300)), (2L, "A", doc(300)), (3L, "A", doc(300)),
      (4L, "B", doc(700)), (5L, "B", doc(100)))
      .toDF("doc_id", "source", "text")
    val rs = Chunking.packSequences(docs, "source", budget = 512)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(rs(("A", 0L)) == ((2L, 600L, 1L, 2L)))   // docs 1,2 start in bin 0
    assert(rs(("A", 1L)) == ((1L, 300L, 3L, 3L)))
    // B: doc 4 (700 tokens) starts at 0 → bin 0 alone; doc 5 starts at
    // 700 → bin 1 (the oversized doc shifts later starts)
    assert(rs(("B", 0L)) == ((1L, 700L, 4L, 4L)))
    assert(rs(("B", 1L)) == ((1L, 100L, 5L, 5L)))
    // token conservation: bin totals sum to corpus totals
    assert(rs.values.map(_._2).sum == 300 * 3 + 700 + 100)
  }

  test("packSequences is partition-independent") {
    val docs = graft.engine.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
    def out(df: org.apache.spark.sql.DataFrame) =
      Chunking.packSequences(df, "source").collect().toSeq
    assert(out(docs) == out(docs.repartition(11).sortWithinPartitions(desc("doc_id"))))
  }
}
