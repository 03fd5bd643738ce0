package graft.ops

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Ranked-retrieval operators: the BM25 integer lattice is pinned by
  * an independent in-JVM reference fold (exact Long arithmetic, the
  * property-oracle pattern the rolling-hash and PQ expressions use),
  * phrase counting by hand-countable fixtures including the
  * overlapping-occurrence edge, and the plan shape by the absence of
  * any corpus-sized global sort — top-k must be TakeOrdered.
  */
class SearchSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def docsOf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** Independent reference BM25 on the same integer lattice: plain
    * Long arithmetic over collected token lists — no Spark, no SQL.
    */
  private def refBm25(corpus: Seq[(Long, String)], terms: Seq[String],
      k: Int): Seq[(Int, Long, Long, Long, Long)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
    val nn = toks.size.toLong
    val tt = toks.map(_._2.size.toLong).sum
    val dfm = terms.map(t =>
      t -> toks.count(_._2.contains(t)).toLong).toMap
    val scored = toks.flatMap { case (id, ws) =>
      val dl = ws.size.toLong
      val ndPpm = 1000000L * dl * nn / tt
      val hits = terms.filter(ws.contains)
      if (hits.isEmpty) None
      else {
        val score = hits.map { t =>
          val tf = ws.count(_ == t).toLong
          val tfnormPpm = 44000000L * tf * 1000000L /
            (20000000L * tf + 6000000L + 18L * ndPpm)
          val idfPpm = 1000000L * (2 * nn - 2 * dfm(t) + 1) / (2 * dfm(t) + 1)
          idfPpm * tfnormPpm / 1000000L
        }.sum
        Some((id, score, hits.size.toLong, dl))
      }
    }
    scored.sortBy { case (id, score, _, _) => (-score, id) }.take(k)
      .zipWithIndex
      .map { case ((id, s, h, dl), i) => (i + 1, id, s, h, dl) }
  }

  test("bm25TopK matches the independent integer-lattice fold") {
    val corpus = Seq(
      1L -> "spark spark spark merge join filter scan scan",
      2L -> "merge merge hash hash hash hash scan scan scan scan scan scan",
      3L -> "join filter scan order sort window agg key",
      4L -> "spark hash",
      5L -> "merge filter spark merge merge merge merge merge merge merge")
    val terms = Seq("spark", "merge", "hash")
    val got = Search.bm25TopK(docsOf(corpus: _*), terms, k = 3)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == refBm25(corpus, terms, 3), s"got $got")
  }

  test("bm25TopK on the fixture: every hit doc, rarer terms outweigh common") {
    val docs = graft.engine.Tables.table(
      spark, "/root/testdata/sf0.001", "documents")
    val rows = Search.bm25TopK(docs, k = 500).collect()
    assert(rows.nonEmpty)
    // ranking is a total order: rank dense from 1, scores non-increasing
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    val scores = rows.map(_.getLong(2)).toSeq
    assert(scores == scores.sorted(Ordering[Long].reverse))
    // a query term absent from a doc cannot contribute: n_hit <= |terms|
    assert(rows.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= 3))
  }

  test("phraseSearch counts overlapping occurrences positionally") {
    val corpus = docsOf(
      1L -> "a a a b",        // "a a" occurs at 1 and 2 (overlap)
      2L -> "a b a b a",      // never adjacent: 0
      3L -> "x a a y a a z",  // two disjoint occurrences
      4L -> "a",              // shorter than the phrase
      5L -> "b b b")          // no 'a' at all
    val got = Search.phraseSearch(corpus, Seq("a", "a"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1, 1L, 2L), (2, 3L, 2L)), s"got $got")
  }

  test("three-token phrases and rank ties break by doc_id") {
    val corpus = docsOf(
      1L -> "q w e q w e",
      2L -> "q w e r t y",
      3L -> "q w q w q e")
    val got = Search.phraseSearch(corpus, Seq("q", "w", "e"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1, 1L, 2L), (2, 2L, 1L)), s"got $got")
  }

  test("bm25TopKConj keeps only all-terms documents, scores unchanged") {
    val corpus = Seq(
      1L -> "spark spark spark merge join filter scan scan",
      2L -> "merge merge hash hash hash hash scan scan scan scan scan scan",
      4L -> "spark hash",
      6L -> "spark merge hash spark",
      7L -> "hash merge spark hash hash")
    val terms = Seq("spark", "merge", "hash")
    val got = Search.bm25TopKConj(docsOf(corpus: _*), terms, k = 10)
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val want = refBm25(corpus, terms, corpus.size)
      .filter { case (_, _, _, hits, _) => hits == 3 }
      .zipWithIndex
      .map { case ((_, id, s, h, dl), i) => (i + 1, id, s, h, dl) }
    assert(want.size == 2, s"fixture must have exactly docs 6,7 qualify: $want")
    assert(got == want, s"got $got")
  }

  test("bm25TopKMulti slices match the single-query reference fold") {
    val corpus = Seq(
      1L -> "spark spark spark merge join filter scan scan",
      2L -> "merge merge hash hash hash hash scan scan scan scan scan scan",
      3L -> "join filter scan order sort window agg key",
      4L -> "spark hash",
      5L -> "merge filter spark merge merge merge merge merge merge merge")
    val terms = Seq("spark", "merge", "hash")
    val got = Search.bm25TopKMulti(docsOf(corpus: _*),
        Seq(7L -> terms), k = 3)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val want = refBm25(corpus, terms, 3)
      .map { case (rk, id, s, h, _) => (7L, rk, id, s, h) }
    assert(got == want, s"got $got")
  }

  test("editDistancePairs equals an independent brute levenshtein filter") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val base = "abcdefghijklmnopqrstuvwxyz0123456789ABCD" // 40 chars
    assert(base.length == 40)
    val corpus = Seq(
      1L -> base,
      2L -> (base.take(4) + "XY" + base.drop(6)),       // 2 substitutions
      3L -> (base.take(5) + base.drop(6) + "Z"),        // deletion + append (shifts chunks)
      4L -> base.reverse)                               // unrelated
      .map { case (id, t) => (id, t + " tail words beyond the key prefix") } ++ Seq(
      5L -> "short text",                    // short tail: band buckets
      6L -> "short t3xt",                    // short near-dup of 5 (1 sub)
      7L -> base.take(38),                   // short×full boundary: 2 dels from 1
      8L -> "zqvkrw 9f",                     // short unrelated (same band as 5/6)
      9L -> "x")                             // 1-char: alone in band 0
    import spark.implicits._
    val docs = corpus.toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val keys = corpus.map { case (id, t) => (id, t.take(40)) }
      .filter(_._2.nonEmpty)
    val want = (for {
      (a, sa) <- keys; (b, sb) <- keys
      if a < b && lev(sa, sb) <= 3
    } yield (a, b, lev(sa, sb))).toSet
    assert(want.nonEmpty, "fixture must contain edit-distance pairs")
    assert(want.exists { case (a, b, _) => Set(a, b) == Set(5L, 6L) },
      "fixture must contain a short-tail near-dup pair")
    assert(want.exists { case (a, b, _) => Set(a, b) == Set(1L, 7L) },
      "fixture must contain a short-x-full boundary pair")
    assert(got == want, s"got $got want $want")
  }

  test("native phrase_count equals the HOF fold on the fixture corpus") {
    import org.apache.spark.sql.functions._
    val docs = graft.engine.Tables.table(
      spark, "/root/testdata/sf0.001", "documents")
    val phrase = Seq("batch", "batch")
    val both = docs
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .select(col("doc_id"),
        call_function("phrase_count", col("ws"),
          typedLit(phrase.toIndexedSeq)).as("native"),
        Search.phraseCountHof(col("ws"), phrase).as("hof"))
    // null-SAFE inequality: a plain =!= is SQL-null on rows where one
    // side is null — exactly the rows where the forms could diverge
    assert(both.filter(!(col("native") <=> col("hof"))).count() == 0)
    assert(both.filter(col("native") > 0).count() > 0,
      "fixture must contain the phrase somewhere")
  }

  test("multi-query and edit-distance plans: equi-joins only, no cartesian") {
    val docs = graft.engine.Tables.table(
      spark, "/root/testdata/sf0.001", "documents")
    for (df <- Seq(Search.bm25TopKMulti(docs),
        Dedup.editDistancePairs(docs))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("CartesianProduct"), plan)
      // the only permitted nested-loop is the deliberate 1-row
      // corpus-stats scalar attach (crossJoin(broadcast(stats))) —
      // every BNLJ line must be that broadcast Cross form
      val bnlj = plan.linesIterator
        .filter(_.contains("BroadcastNestedLoopJoin")).toSeq
      assert(bnlj.forall(_.contains("Cross")), plan)
    }
  }

  test("top-k is TakeOrdered, never a corpus-wide global sort") {
    val docs = graft.engine.Tables.table(
      spark, "/root/testdata/sf0.001", "documents")
    for (df <- Seq(Search.bm25TopK(docs),
        Search.phraseSearch(docs, Seq("batch", "batch")))) {
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(plan.contains("TakeOrderedAndProject"), plan)
    }
  }
}
