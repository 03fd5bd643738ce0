package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The round-19 identical-fingerprint collapse: cluster paths band
  * hash-group REPRESENTATIVES, never raw members, so an n-copy
  * duplicate group costs one band row instead of O(n²) candidate
  * pairs — while the OUTPUT stays bit-equal to the pairwise closure
  * (which is what the DuckDB transitive-closure oracles replay).
  */
class DedupClusterCollapseSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def clustersOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  // ---- hamming / image path ----

  private def fpFixture = {
    val sp = spark; import sp.implicits._
    // a 40-copy identical-hash clique, a hash 1 bit away from it, a
    // second independent pair, and isolated hashes far from everything
    val viral = (100L to 139L).map(i => (i, 0x0F0F0F0F0F0F0F0FL))
    val near = Seq((200L, 0x0F0F0F0F0F0F0F0EL)) // hamming 1 from viral
    val pair = Seq((300L, 0x1234567812345678L), (301L, 0x1234567812345679L))
    val loners = Seq((400L, -1L), (401L, 0x00000000FFFFFFFFL))
    (viral ++ near ++ pair ++ loners).toDF("doc_id", "phash")
  }

  test("hammingClusters equals the pairwise closure on a viral-clique fixture") {
    val fps = fpFixture
    val legacy = Dedup.clusterLabelsOf(
      Dedup.hammingNearDup(fps, "doc_id", "phash")
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
    val collapsed = Dedup.hammingClusters(fps, "doc_id", "phash")
    val l = clustersOf(legacy)
    val c = clustersOf(collapsed)
    assert(l.nonEmpty && l.exists(_._1 == 200L),
      "fixture must connect the near hash into the viral cluster")
    assert(c == l, s"collapsed path diverges: only-collapsed=${c -- l}, " +
      s"only-legacy=${l -- c}")
  }

  test("the cluster path's band join sees one row per distinct hash: " +
      "rep pairs are linear where raw pairs are quadratic") {
    val fps = fpFixture
    // raw pair set: the 41-member clique (40 identical + 1 near)
    // pairs quadratically — C(41,2) = 820, plus the independent pair
    val rawPairs = Dedup.hammingNearDup(fps, "doc_id", "phash").count()
    assert(rawPairs == 821L, s"expected 821 raw pairs, got $rawPairs")
    // rep-level pairs: one per adjacent DISTINCT-hash pair
    val base = Dedup.hammingBase(fps, "doc_id", "phash")
    val repPairs = Dedup.hammingBandPairs(
      Dedup.hammingGroups(base).select(col("rep").as("id"), col("h")),
      maxDist = 3, nBands = 4)
    assert(repPairs.count() == 2L,
      "rep pairs must be (viral-rep, near) and the independent pair — " +
        "intra-group pairs must never materialize")
  }

  test("rep-pair plan: the band explode is fed by the hash-group " +
      "aggregate, and the candidate join stays a hash equi-join") {
    // the cluster path checkpoints its label stage eagerly, so the
    // pin targets the pre-checkpoint rep-pair stage it assembles
    val base = Dedup.hammingBase(fpFixture, "doc_id", "phash")
    val plan = Dedup.hammingBandPairs(
        Dedup.hammingGroups(base).select(col("rep").as("id"), col("h")),
        maxDist = 3, nBands = 4)
      .queryExecution.executedPlan.toString
    val gen = plan.indexOf("Generate posexplode")
    // the group-by-h aggregate specifically — the pair-level distinct
    // is also a HashAggregate (keys=[id_a, ...]) but sits at the top
    val agg = plan.indexOf("HashAggregate(keys=[h#")
    assert(gen >= 0 && agg >= 0, s"expected explode + hash-group agg:\n$plan")
    // top-down print: the explode must sit ABOVE the hash-group
    // aggregate — banding consumes representatives, not members
    assert(gen < agg,
      s"band explode is not fed by the hash-group aggregate:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"band join degenerated from an equi-join:\n$plan")
  }

  // ---- text / minhash path ----

  test("dupClusters equals the legacy pairwise closure on the corpus") {
    val docs = graft.engine.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
    val legacy = Dedup.clusterLabelsOf(
      Dedup.minhashLsh(docs).select(col("doc_a"), col("doc_b")))
    val collapsed = Dedup.dupClusters(docs)
    val l = clustersOf(legacy)
    val c = clustersOf(collapsed)
    assert(l.nonEmpty, "fixture corpus must contain near-dup clusters")
    assert(c == l, s"collapsed path diverges: only-collapsed=${c -- l}, " +
      s"only-legacy=${l -- c}")
  }

  test("dupClusters handles every leftMax edge the pairwise path encodes") {
    val sp = spark; import sp.implicits._
    // DISJOINT vocabularies per group — each mode must be connected
    // only by its own construction, never by shared filler words
    def doc(v: String, last: String = "") =
      (0 until 11).map(i => s"$v$i").mkString(" ") +
        (if (last.isEmpty) s" ${v}11" else s" $last")
    val docs = (
      // identical group fully under leftMax: all cluster to min id
      (10L to 19L).map(i => (i, doc("a"))) ++
      // identical group STRADDLING leftMax (rep 150 < 200 < members)
      Seq((150L, doc("s")), (250L, doc("s")), (260L, doc("s"))) ++
      // identical group fully ABOVE leftMax: the pairwise path emits
      // nothing for it (no pair has doc_a < 200), so neither may we
      (300L to 305L).map(i => (i, doc("x"))) ++
      // a non-identical near-dup pair crossing leftMax (8 of 10
      // trigrams shared -> jaccard 8/12 over the threshold)
      Seq((20L, doc("y", "tail1")), (400L, doc("y", "tail2"))) ++
      // background singletons
      (500L to 520L).map(i =>
        (i, (0 until 12).map(j => s"bg${i}x$j").mkString(" ")))
    ).toDF("doc_id", "text")
    val legacy = Dedup.clusterLabelsOf(
      Dedup.minhashLsh(docs).select(col("doc_a"), col("doc_b")))
    val collapsed = Dedup.dupClusters(docs)
    val l = clustersOf(legacy)
    val c = clustersOf(collapsed)
    assert(l.exists(_._1 == 250L) && l.exists(_._2 == 10L),
      s"fixture must exercise the straddle and clique modes: $l")
    assert(!l.exists(p => p._1 >= 300L && p._1 <= 305L),
      "pairwise path must NOT emit the above-leftMax clique")
    assert(c == l, s"collapsed path diverges: only-collapsed=${c -- l}, " +
      s"only-legacy=${l -- c}")
  }

  // ---- fixed by the round-19 self-review ----

  test("the identical-set key is injective: gram content cannot mimic " +
      "the element separator") {
    val sp = spark; import sp.implicits._
    // under the old NUL-joined concat_ws key these two DIFFERENT
    // trigram sets rendered the same joined string (words may contain
    // NUL — TextOps.words splits on whitespace only), so two docs with
    // real Jaccard 0 collapsed as an unverified "identical" cluster
    val sh = Seq(
      (1L, Seq("a b x", "y\u0000z c d")),
      (2L, Seq("a b x\u0000y", "z c d")),
      // and a genuine identical set, order-shuffled, must still key
      (3L, Seq("p q r", "s t u")),
      (4L, Seq("s t u", "p q r"))
    ).toDF("doc_id", "g")
    val keys = Dedup.shingleSetKeyed(sh).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(keys(1L) != keys(2L),
      "distinct gram sets must never share the 128-bit set key")
    assert(keys(3L) == keys(4L),
      "identical sets must key equal regardless of element order")
  }

  test("a duplicated (id, hash) row fabricates no phantom cluster and " +
      "no double-emitted label") {
    val sp = spark; import sp.implicits._
    val fps = Seq(
      // a lone doc whose row landed twice (ingest glitch): the
      // pairwise path emits nothing for it (id_a < id_b), so the
      // collapsed path must not count it as a 2-member group
      (600L, 0x5A5A5A5A5A5A5A5AL), (600L, 0x5A5A5A5A5A5A5A5AL),
      // a real pair where one member is also duplicated: one label
      // row per doc, not two
      (700L, 0x0123456789ABCDEFL), (700L, 0x0123456789ABCDEFL),
      (701L, 0x0123456789ABCDEEL)
    ).toDF("doc_id", "phash")
    val legacy = Dedup.clusterLabelsOf(
      Dedup.hammingNearDup(fps, "doc_id", "phash")
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b")))
    val collapsed = Dedup.hammingClusters(fps, "doc_id", "phash")
    assert(clustersOf(collapsed) == Set((700L, 700L), (701L, 700L)))
    assert(clustersOf(collapsed) == clustersOf(legacy))
    assert(collapsed.count() == 2L, "labels must emit once per doc")
  }

  test("an id carrying two DIFFERENT hashes refuses loudly: the collapse " +
      "treats id->hash as a function where the pairwise path treats the " +
      "id as one graph node") {
    val sp = spark; import sp.implicits._
    // 600 bridges two far-apart hash neighborhoods: the pairwise path
    // merges {599, 600, 900} into ONE component through node 600; the
    // collapsed path would split it into two groups and double-label
    // 600 — exactness is unprovable, so the operator must refuse
    val fps = Seq(
      (599L, 0x0F0F0F0F0F0F0F0FL), (600L, 0x0F0F0F0F0F0F0F0FL),
      (600L, -1L), (900L, -1L)
    ).toDF("doc_id", "phash")
    val e = intercept[IllegalArgumentException](
      Dedup.hammingClusters(fps, "doc_id", "phash").count())
    assert(e.getMessage.contains("600") &&
      e.getMessage.contains("more than one distinct fingerprint"),
      s"refusal must name the offending id: ${e.getMessage}")
  }

  test("a doc_id carrying two DIFFERENT texts refuses loudly on the " +
      "collapsed text path") {
    val sp = spark; import sp.implicits._
    val docs = (Seq(
      (700L, (0 until 12).map(i => s"va$i").mkString(" ")),
      (700L, (0 until 12).map(i => s"vb$i").mkString(" "))) ++
      (710L to 730L).map(i =>
        (i, (0 until 12).map(j => s"bg${i}q$j").mkString(" "))))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      Dedup.dupClusters(docs).count())
    assert(e.getMessage.contains("700") &&
      e.getMessage.contains("more than one distinct shingle set"),
      s"refusal must name the offending doc_id: ${e.getMessage}")
  }

  test("a duplicated (doc_id, text) row fabricates no phantom text cluster") {
    val sp = spark; import sp.implicits._
    val lone = (0 until 12).map(i => s"solo$i").mkString(" ")
    val docs = (Seq((900L, lone), (900L, lone)) ++
      (910L to 930L).map(i =>
        (i, (0 until 12).map(j => s"bg${i}w$j").mkString(" "))))
      .toDF("doc_id", "text")
    assert(Dedup.dupClusters(docs).count() == 0L,
      "a lone duplicated ROW is not a 2-member cluster — the pairwise " +
        "path emits nothing for it")
  }

  test("the text candidate stage sees one representative per identical " +
      "shingle set") {
    val sp = spark; import sp.implicits._
    val words = (0 until 12).map(i => s"v$i").mkString(" ")
    val docs = ((30L to 69L).map(i => (i, words)) ++
      Seq((80L, (0 until 12).map(j => s"z$j").mkString(" "))))
      .toDF("doc_id", "text")
    val sh = Dedup.shingled(docs)
    // raw candidates: the 40-doc identical clique collides in every
    // band -> C(40,2) pairs
    val raw = Dedup.minhashCandidates(sh, 200, 32, 2).count()
    assert(raw == 780L, s"expected 780 raw candidates, got $raw")
    // collapsed: reps only -> no intra-group candidates at all
    val keyed = Dedup.shingleSetKeyed(sh)
    val groups = keyed.groupBy(col("k"))
      .agg(min(col("doc_id")).as("rep"))
    val shReps = sh.join(groups.select(col("rep").as("doc_id")),
      Seq("doc_id"), "left_semi")
    assert(Dedup.minhashCandidates(shReps, 200, 32, 2).count() == 0L,
      "rep-level candidate stage must not pair identical-set members")
  }
}
