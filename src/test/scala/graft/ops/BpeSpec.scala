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

  /** Code-point lexicographic compare — matches Spark's UTF8String
    * (UTF-8 binary) ordering, which diverges from Java's
    * `String.compareTo` (UTF-16 code-unit order) when supplementary
    * characters mix with U+E000..U+FFFF.
    */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0
    var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i)
      val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca)
      j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** Code-point symbolization — Spark's `substring(word, i, 1)` slices
    * whole code points, so the reference must not split a
    * supplementary char into surrogate halves.
    */
  private def codePointSyms(w: String): Vector[String] =
    w.codePoints().toArray.toVector
      .map(cp => new String(Character.toChars(cp)))

  /** Classic BPE reference: n merges over (symbols, freq) rows. */
  private def refMerges(vocab: Seq[(String, Long)],
      n: Int): Seq[(Int, String, String, String, Long)] = {
    var rows: Seq[(Vector[String], Long)] =
      vocab.map { case (w, f) => (codePointSyms(w), f) }
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
        // max weight, ties broken by CODE-POINT order on (l, r) — the
        // UTF8String ordering the trainer's orderBy actually uses
        def beats(y: ((String, String), Long), x: ((String, String), Long)): Boolean = {
          if (y._2 != x._2) return y._2 > x._2
          val cl = cpCompare(y._1._1, x._1._1)
          if (cl != 0) cl < 0 else cpCompare(y._1._2, x._1._2) < 0
        }
        val ((l, r), w) = counts.toSeq.reduceLeft { (x, y) =>
          if (beats(y, x)) y else x
        }
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

  test("trainer matches the reference beyond ASCII: supplementary + private-use tie-break") {
    import spark.implicits._
    // symbols: 😀 (U+1F600, supplementary) and  (U+E000, private use).
    // Java compareTo orders "😀" BEFORE "" (surrogate
    // D83D < E000); code-point order says U+1F600 > U+E000 — equal-
    // weight ties between pairs led by these symbols flip between the
    // two orderings, and a UTF-16 reference would learn the wrong
    // merge first. Equal weights by construction: each word once.
    val g = new String(Character.toChars(0x1F600))
    val p = ""
    val docs = Seq((1L, s"$g$g $p$p"), (2L, s"$g$g $p$p"))
      .toDF("doc_id", "text")
    val vocab = Bpe.wordVocab(docs).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = refMerges(vocab, 2)
    val got = Bpe.bpeMerges(docs, 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got == want, s"got $got\nwant $want")
    // the first merge must be the private-use pair: U+E000 < U+1F600
    // in code points even though "" > surrogate in UTF-16
    assert(got.head._2 == p, s"expected code-point tie-break, got $got")
  }

  /** Reference encode: apply merges in rank order, each a left-to-
    * right non-overlapping pass.
    */
  private def refEncode(word: String,
      merges: Seq[(String, String)]): Vector[String] =
    merges.foldLeft(codePointSyms(word)) { case (syms, (l, r)) =>
      val b = Vector.newBuilder[String]
      var j = 0
      while (j < syms.length) {
        if (j + 1 < syms.length && syms(j) == l && syms(j + 1) == r) {
          b += (l + r); j += 2
        } else { b += syms(j); j += 1 }
      }
      b.result()
    }

  test("encodeVocab(train output) round-trips the trainer's own fixture") {
    import spark.implicits._
    // the classic Sennrich-style corpus: train, then encode the same
    // words with the learned table — tokens must match the reference
    // fold applying the same merges
    val docs = Seq(
      (1L, "low low low low low lower lower"),
      (2L, "newest newest newest newest newest newest"),
      (3L, "widest widest widest")).toDF("doc_id", "text")
    val merges = Bpe.bpeMerges(docs, 6).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.size == 6)
    val words = Seq("low", "lower", "newest", "widest").toDF("word")
    val got = Bpe.encodeVocab(words, merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    got.foreach { case (w, toks) =>
      assert(toks == refEncode(w, merges), s"word $w: got $toks")
      assert(toks.mkString == w, "tokens must concatenate back to the word")
    }
  }

  test("bpeEncodeTokens: per-doc integer accounting under the pinned table") {
    import spark.implicits._
    // hand-traced under PinnedMerges (th, th+e, in, an, an+d, er, on, re):
    //   the→[the]=1  thin→[th,in]=2  cat→[c,a,t]=3
    //   and→[and]=1  other→[o,the,r]=3
    val docs = Seq((1L, "the thin cat"), (2L, "and other"))
      .toDF("doc_id", "text")
    val got = Bpe.bpeEncodeTokens(docs, Bpe.PinnedMerges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == Seq((1L, 3L, 10L, 6L), (2L, 2L, 8L, 4L)), s"got $got")
  }

  test("native bpe_encode equals the Scala reference fold on randomized unicode words") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    // includes a combining-free non-ASCII char, CJK, and an astral
    // (surrogate-pair) code point — the split must be code-point-wise
    val cps = "abcdeé日本𝄞".codePoints().toArray
    val words = (1 to 200).map { _ =>
      new String((0 until rnd.nextInt(12))
        .flatMap(_ => Character.toChars(cps(rnd.nextInt(cps.length))).toSeq)
        .toArray)
    }.distinct
    val merges = Seq("a" -> "b", "ab" -> "c", "é" -> "日", "a" -> "a")
    val got = Bpe.encodeVocab(words.toDF("word"), merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    words.foreach { w =>
      assert(got(w) == Bpe.applyMergeTable(w, merges).toVector,
        s"word '$w'")
    }
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
