package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the PII / quality-gate / corpus-statistics
  * operators on hand-computed fixtures (the driver oracle only proves
  * cross-engine agreement; these prove the numbers mean what the
  * scaladoc says).
  */
class CorpusStatsSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("piiColumns counts and redacts emails, phones, IPs") {
    val text = "mail a@b.com and c.d+x@e.org, call +1-555-1234, " +
      "host 10.0.0.1 then 192.168.1.255 end"
    val cols = TextOps.piiColumns(lit(text)).map { case (n, c) => c.as(n) }
    val r = Seq(1).toDF("i").select(cols: _*).head()
    assert(r.getAs[Int]("n_email") == 2)
    assert(r.getAs[Int]("n_phone") == 1)
    assert(r.getAs[Int]("n_ip") == 2)
    assert(r.getAs[String]("redacted") ==
      "mail <EMAIL> and <EMAIL>, call <PHONE>, host <IP> then <IP> end")
  }

  test("piiColumns leaves clean text untouched") {
    val text = "no personal data here, just words and 42 numbers"
    val cols = TextOps.piiColumns(lit(text)).map { case (n, c) => c.as(n) }
    val r = Seq(1).toDF("i").select(cols: _*).head()
    assert(r.getAs[Int]("n_email") + r.getAs[Int]("n_phone") +
      r.getAs[Int]("n_ip") == 0)
    assert(r.getAs[String]("redacted") == text)
  }

  test("gopher gates fail the right rule for the right document") {
    val good = "the cats and the dogs sat on the mats for hours in the warm sun today"
    val docs = Seq(
      ("good", good),
      ("short", "the cat and dog"),                       // < 10 words
      ("longwords", good + " " + Seq.fill(30)("extraordinarily").mkString(" ")),
      ("symbols", "the $$$ cat !!! and ### dog *** on a mat in sun ..."),
      ("nostop", "cat dog mat sun hours words letters things stuff items"))
      .toDF("id", "text")
    val gates = TextOps.gopherGateColumns(col("text")).map { case (n, c) => c.as(n) }
    val rs = docs.select(col("id") +: gates: _*).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rs("good").getAs[Boolean]("keep"))
    assert(!rs("short").getAs[Boolean]("r_word_count"))
    assert(!rs("longwords").getAs[Boolean]("r_mean_word_len"))
    assert(!rs("symbols").getAs[Boolean]("r_symbol_ratio"))
    assert(!rs("nostop").getAs[Boolean]("r_stopwords"))
    assert(Seq("short", "longwords", "symbols", "nostop")
      .forall(k => !rs(k).getAs[Boolean]("keep")))
  }

  test("blocklistColumns counts tf hits, distinct hits, and keeps clean docs") {
    val docs = Seq(
      ("clean", "the cat sat on the mat"),
      ("onehit", "the bad cat sat"),
      ("multi", "bad cat bad dog worse mat"),
      ("empty", ""))
      .toDF("id", "text")
    val cols = TextOps.blocklistColumns(col("text"), Seq("bad", "worse", "never"))
      .map { case (n, c) => c.as(n) }
    val rs = docs.select(col("id") +: cols: _*).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rs("clean").getAs[Long]("n_hits") == 0
      && rs("clean").getAs[Int]("keep") == 1)
    assert(rs("onehit").getAs[Long]("n_hits") == 1
      && rs("onehit").getAs[Long]("n_terms_hit") == 1
      && rs("onehit").getAs[Int]("keep") == 0)
    assert(rs("multi").getAs[Long]("n_hits") == 3
      && rs("multi").getAs[Long]("n_terms_hit") == 2
      && rs("multi").getAs[Int]("keep") == 0)
    assert(rs("empty").getAs[Int]("keep") == 1)
  }

  test("blocklistJoin (relation form) equals blocklistColumns exactly") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the bad cat sat"),
      (3L, "bad cat bad dog worse mat"),
      (4L, ""))
      .toDF("doc_id", "text")
    val terms = Seq("bad", "worse", "never")
    val litCols = TextOps.blocklistColumns(col("text"), terms)
      .map { case (n, c) => c.as(n) }
    val want = docs.select(col("doc_id") +: litCols: _*)
      .orderBy(col("doc_id")).collect().toSeq
    // duplicate rows in the term relation must not double-count tf
    val got = TextOps.blocklistJoin(docs, (terms ++ terms).toDF("term"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(got == want,
      s"relation form must equal literal form row-for-row:\n$got\n$want")
    // and on the real fixture corpus
    val fixture = graft.engine.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("text"))
    val fixTerms = Seq("spark", "dup", "quarantine")
    val wantF = fixture.select(col("doc_id") +:
        TextOps.blocklistColumns(col("text"), fixTerms)
          .map { case (n, c) => c.as(n) }: _*)
      .orderBy(col("doc_id")).collect().toSeq
    val gotF = TextOps.blocklistJoin(fixture, fixTerms.toDF("term"))
      .orderBy(col("doc_id")).collect().toSeq
    assert(wantF.exists(_.getAs[Long]("n_hits") > 0),
      "fixture must contain blocklisted terms")
    assert(gotF == wantF)
  }

  test("unigramRarity matches hand-computed corpus frequencies") {
    // corpus freqs: the=3, cat=2, dog=1, sat=1
    val docs = Seq((1L, "the cat sat"), (2L, "the the cat dog")).toDF("doc_id", "text")
    val rs = CorpusStats.unigramRarity(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = rs(1L)
    assert(d1.getAs[Long]("n_tokens") == 3)
    assert(d1.getAs[Long]("sum_freq") == 3 + 2 + 1) // the+cat+sat
    assert(d1.getAs[Long]("min_freq") == 1)         // sat
    assert(d1.getAs[Long]("n_hapax") == 1)          // sat
    val d2 = rs(2L)
    assert(d2.getAs[Long]("n_tokens") == 4)
    assert(d2.getAs[Long]("sum_freq") == 3 + 3 + 2 + 1)
    assert(d2.getAs[Long]("n_hapax") == 1)          // dog
  }

  test("bigramLm matches hand-computed conditional ppm") {
    // positional bigrams — doc 1: (a b)x2, (b a); doc 2: (a b), (b c)
    // corpus counts: C(a b)=3, C(b a)=1, C(b c)=1
    // left contexts:  C(a·)=3, C(b·)=2
    // cond_ppm: a b → 1e6·3 div 3 = 1000000; b a, b c → 1e6 div 2 = 500000
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    val rs = CorpusStats.bigramLm(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rs.keySet == Set(1L, 2L)) // a one-token doc has no bigrams
    val d1 = rs(1L)
    assert(d1.getAs[Long]("n_bigrams") == 3)
    assert(d1.getAs[Long]("sum_cond_ppm") == 2 * 1000000L + 500000L)
    assert(d1.getAs[Long]("min_cond_ppm") == 500000L)
    assert(d1.getAs[Long]("n_novel") == 1) // "b a" is corpus-unique
    val d2 = rs(2L)
    assert(d2.getAs[Long]("n_bigrams") == 2)
    assert(d2.getAs[Long]("sum_cond_ppm") == 1000000L + 500000L)
    assert(d2.getAs[Long]("n_novel") == 1) // "b c"
  }

  test("bigramLmCross trains on src0 only and zeroes out-of-model bigrams") {
    // train (src0): "a b a b" → C(a b)=2, C(b a)=1; contexts C(a·)=2, C(b·)=1
    // scored doc 2: "a b c" — (a b) seen: 1e6·2 div 2 = 1000000; (b c) OOV
    // scored doc 3: "x y" — everything OOV
    val docs = Seq(
      (1L, "a b a b", "src0"),
      (2L, "a b c", "src1"),
      (3L, "x y", "src2"))
      .toDF("doc_id", "text", "source")
    val rs = CorpusStats.bigramLmCross(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rs.keySet == Set(2L, 3L), "train docs must not be scored")
    val d2 = rs(2L)
    assert(d2.getAs[Long]("n_bigrams") == 2)
    assert(d2.getAs[Long]("sum_cond_ppm") == 1000000L)
    assert(d2.getAs[Long]("min_seen_cond_ppm") == 1000000L)
    assert(d2.getAs[Long]("n_oov") == 1)
    val d3 = rs(3L)
    assert(d3.getAs[Long]("n_bigrams") == 1)
    assert(d3.getAs[Long]("sum_cond_ppm") == 0L)
    assert(d3.getAs[Long]("min_seen_cond_ppm") == 0L)
    assert(d3.getAs[Long]("n_oov") == 1)
  }

  test("sourceDupMatrix counts verified pairs per unordered source pair") {
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base, "srcA"),
      (2L, base + " tail", "srcB"), // near-dup of 1
      (3L, base, "srcA"),           // exact dup of 1 (and near-dup of 2)
      (4L, (1 to 30).map(i => s"z$i").mkString(" "), "srcB")) // unrelated
      .toDF("doc_id", "text", "source")
    val got = Dedup.sourceDupMatrix(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("srcA", "srcA", 1L), ("srcA", "srcB", 2L)), s"got $got")
  }

  test("mixtureReport cells partition the corpus and shares sum to 1") {
    val docs = graft.engine.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
    val rs = CorpusStats.mixtureReport(docs).collect()
    assert(rs.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val docShare = rs.map(_.getAs[Double]("doc_share")).sum
    val wordShare = rs.map(_.getAs[Double]("word_share")).sum
    assert(math.abs(docShare - 1.0) < 1e-9 && math.abs(wordShare - 1.0) < 1e-9)
    // a cell's counts equal a direct filtered aggregate
    val r0 = rs.filter(r => r.getString(0) == "src0" && r.getString(1) == "en")
    assert(r0.head.getAs[Long]("n_docs") ==
      docs.filter(col("source") === "src0" && col("lang") === "en").count())
  }

  test("mixtureReport derives n_chars from text when the column is absent") {
    val docs = Seq(
      ("src0", "en", "abc"), ("src0", "en", "de"), ("src1", "fr", "fghi"))
      .toDF("source", "lang", "text")
    val rs = CorpusStats.mixtureReport(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rs(("src0", "en")).getAs[Long]("n_chars") == 5)
    assert(rs(("src1", "fr")).getAs[Long]("n_chars") == 4)
  }

  test("topTermsPerDoc ranks by df asc then tf desc then term") {
    // corpus df: the=2, cat=2, rare=1, dog=1, mat=1
    val docs = Seq(
      (1L, "rare the the cat"),
      (2L, "the cat dog mat dog"))
      .toDF("doc_id", "text")
    val rs = CorpusStats.topTermsPerDoc(docs, 2).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3), r.getLong(4)))
    // doc 1: rare(df1,tf1) then the(df2,tf2)… cat(df2,tf1) → the wins tf
    // doc 2: dog(df1,tf2) then mat(df1,tf1)
    assert(rs.toSeq == Seq(
      (1L, 1, "rare", 1L, 1L), (1L, 2, "the", 2L, 2L),
      (2L, 1, "dog", 2L, 1L), (2L, 2, "mat", 1L, 1L)))
  }

  test("topTrigrams ranks by document frequency with shingle tie-break") {
    val docs = Seq(
      (1L, "a b c d"),   // shingles: "a b c", "b c d"
      (2L, "a b c"),     // "a b c"
      (3L, "b c d e"))   // "b c d", "c d e"
      .toDF("doc_id", "text")
    val rs = CorpusStats.topTrigrams(docs, 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rs.toSeq == Seq(("a b c", 2L), ("b c d", 2L)))
  }
}
