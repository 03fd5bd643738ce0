package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The BPE trainer pinned against an independent plain-Scala
  * reference (classic Sennrich loop over a collected word-frequency
  * table) — covering pair counting (overlaps included), the
  * deterministic tie-break, and left-to-right non-overlapping merge
  * application across iterations. The one-shot pair-count query
  * additionally carries the full DuckDB oracle via the driver gate.
  */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  /** Classic BPE reference: n merges over (symbols, freq) rows. */
  private def refMerges(vocab: Seq[(String, Long)],
      n: Int): Seq[(Int, String, String, String, Long)] = {
    var rows: Seq[(Vector[String], Long)] =
      vocab.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, String, Long)]
    for (i <- 1 to n) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      rows.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + f
        }
      }
      if (counts.nonEmpty && out.size == i - 1) {
        val ((l, r), w) = counts.toSeq
          .sortBy { case ((l, r), w) => (-w, l, r) }.head
        out += ((i, l, r, l + r, w))
        rows = rows.map { case (syms, f) =>
          val b = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
              b += (l + r); j += 2
            } else { b += syms(j); j += 1 }
          }
          (b.result(), f)
        }
      }
    }
    out.toSeq
  }

  test("bpeMerges equals the classic reference loop on the fixture") {
    val docs = graft.engine.Tables.table(
      spark, "/root/testdata/sf0.001", "documents")
    val vocab = Bpe.wordVocab(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = refMerges(vocab, 10)
    val got = Bpe.bpeMerges(docs, 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(want.size == 10, s"fixture must sustain 10 merges, got $want")
    assert(got == want, s"got $got\nwant $want")
  }

  test("merge application is left-to-right non-overlapping") {
    import spark.implicits._
    // "aaaa" with merge (a,a): positions 1-2 and 3-4 merge, not 2-3
    val df = Seq((Seq("a", "a", "a", "a"), 1L), (Seq("a", "a", "a"), 1L),
      (Seq("b", "a", "a"), 1L)).toDF("syms", "freq")
    val got = df.select(Bpe.applyMerge(col("syms"), "a", "a").as("m"))
      .collect().map(_.getSeq[String](0).toList).toSet
    assert(got == Set(List("aa", "aa"), List("aa", "a"), List("b", "aa")),
      s"got $got")
  }

  test("pair weights count overlapping occurrences times word frequency") {
    import spark.implicits._
    val docs = Seq((1L, "aaa aaa ab"), (2L, "ab")).toDF("doc_id", "text")
    // vocab: aaa freq 2 (pairs (a,a) x2 each), ab freq 2 (pair (a,b))
    val got = Bpe.bpePairCounts(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(got == Seq((1, "a", "a", 4L), (2, "a", "b", 2L)), s"got $got")
  }
}
