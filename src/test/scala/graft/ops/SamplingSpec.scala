package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  private lazy val docs = graft.engine.Tables
    .table(spark, "/root/testdata/sf0.001", "documents").select("doc_id")

  test("split assignment is deterministic and partition-independent") {
    val w = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    def assign(df: org.apache.spark.sql.DataFrame) =
      Sampling.assignSplits(df, "doc_id", w)
        .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val a = assign(docs)
    val b = assign(docs.repartition(7).sortWithinPartitions(desc("doc_id")))
    assert(a == b, "assignment depends on partitioning/order")
    // ~weighted over 500 docs (md5 uniformity; loose tolerance)
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.06, s"train ${frac("train")}")
    assert(frac.keySet == Set("train", "val", "test"))
  }

  test("weightedSample keeps ~the per-stratum rate and nests across rates") {
    val all = graft.engine.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("source"))
    def keep(rates: Seq[(String, Double)], dflt: Double) =
      Sampling.weightedSample(all, "source", "doc_id", rates, dflt)
        .collect().map(r => (r.getLong(0), r.getString(1)))
    val kept = keep(Seq("src0" -> 1.0, "src1" -> 0.5), 0.1)
    val bySource = kept.groupBy(_._2).view.mapValues(_.size).toMap
    val totals = all.collect().map(_.getString(1))
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(bySource("src0") == totals("src0"), "rate 1.0 keeps everything")
    assert(math.abs(bySource("src1").toDouble / totals("src1") - 0.5) < 0.25)
    // nesting: the same row set survives any rate increase (md5 cut)
    val wider = keep(Seq("src0" -> 1.0, "src1" -> 0.8), 0.2).toSet
    assert(kept.toSet.subsetOf(wider))
    // determinism under re-partitioning
    val shuffled = Sampling.weightedSample(
        all.repartition(7).sortWithinPartitions(desc("doc_id")),
        "source", "doc_id", Seq("src0" -> 1.0, "src1" -> 0.5), 0.1)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSet == shuffled.toSet)
  }

  test("rebalanceToMin derives minority-anchored integer cuts and keeps by bucket") {
    val sp = spark; import sp.implicits._
    // strata: a has 4 rows, b has 2 → mn=2; cut_a = 20000 div 4 = 5000,
    // cut_b = 20000 div 2 = 10000 (minority keeps everything)
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (5L, "b"), (6L, "b"))
      .toDF("doc_id", "stratum")
    val rs = Sampling.rebalanceToMin(df, "stratum", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("cut"), r.getAs[Int]("bucket"), r.getAs[Boolean]("keep"))).toMap
    assert(rs.size == 6, "annotates, never filters")
    assert(rs(1L)._1 == 5000 && rs(5L)._1 == 10000)
    // keep is exactly the bucket compare, and minority keeps all
    rs.values.foreach { case (cut, b, keep) => assert(keep == (b < cut)) }
    assert(rs(5L)._3 && rs(6L)._3)
    // summary agrees with a recount of the annotated rows
    val sum = Sampling.rebalanceSummary(df, "stratum", "doc_id").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getInt(2), r.getLong(3))).toMap
    assert(sum("a")._1 == 4 && sum("a")._2 == 5000)
    assert(sum("b") == ((2L, 10000, 2L)))
    assert(sum("a")._3 == rs.collect { case (id, (_, _, true)) => id }
      .count(id => id <= 4))
  }

  test("rebalanceToMin annotates NULL-stratum rows instead of dropping them") {
    val sp = spark; import sp.implicits._
    // undetected language = NULL stratum: a real stratum with a count
    // row, not a row to silently lose in the join back
    val df = Seq((1L, Option("a")), (2L, Option("a")), (3L, Option.empty[String]))
      .toDF("doc_id", "stratum")
    val rs = Sampling.rebalanceToMin(df, "stratum", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Int]("cut"))).toMap
    assert(rs.size == 3, "every row annotated, NULL stratum included")
    // NULL is the minority stratum (1 doc) → cut 10000; "a" halves
    assert(rs(3L) == ((1L, 10000)))
    assert(rs(1L) == ((2L, 5000)))
  }

  test("deterministic samples nest: smaller fraction is a subset of larger") {
    def ids(f: Double) = Sampling.deterministicSample(docs, "doc_id", f)
      .collect().map(_.getLong(0)).toSet
    val s10 = ids(0.1)
    val s30 = ids(0.3)
    assert(s10.subsetOf(s30))
    assert(math.abs(s30.size / 500.0 - 0.3) < 0.06, s"got ${s30.size}/500")
    assert(ids(0.0).isEmpty && ids(1.0).size == 500)
  }

  test("mixturePlan: over-represented strata get sub-1e6 keep rates, under stay whole") {
    val sp = spark; import sp.implicits._
    // three strata: tokens 60 / 30 / 10 out of 100; uniform target is
    // 333333 ppm, so only the 60%-stratum must downsample:
    // keep = 1e6 * 333333 // 600000 = 555555
    val docs = (
      (1L to 6L).map(i => (i, Seq.fill(10)("t").mkString(" "), "big")) ++
      (7L to 9L).map(i => (i, Seq.fill(10)("t").mkString(" "), "mid")) ++
      Seq((10L, Seq.fill(10)("t").mkString(" "), "small"))
    ).toDF("doc_id", "text", "source")
    val plan = Sampling.mixturePlan(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(plan("big") == ((60L, 600000L, 333333L, 555555L)))
    assert(plan("mid") == ((30L, 300000L, 333333L, 1000000L)))
    assert(plan("small") == ((10L, 100000L, 333333L, 1000000L)))
  }

  test("mixtureApply: keeps are exactly the md5 buckets under the stratum rate") {
    val sp = spark; import sp.implicits._
    val docs = (
      (1L to 6L).map(i => (i, Seq.fill(10)("t").mkString(" "), "big")) ++
      (7L to 9L).map(i => (i, Seq.fill(10)("t").mkString(" "), "mid")) ++
      Seq((10L, Seq.fill(10)("t").mkString(" "), "small"))
    ).toDF("doc_id", "text", "source")
    val buckets = docs
      .select(col("doc_id"), Sampling.bucketOf(col("doc_id")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Sampling.mixtureApply(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getInt(3)))).toMap
    assert(got.size == 10, "every doc annotated, none dropped")
    got.foreach { case (id, (rate, keep)) =>
      val expected = if (buckets(id).toLong * 100L < rate) 1 else 0
      assert(keep == expected, s"doc $id bucket ${buckets(id)} rate $rate")
    }
    // the under-target strata keep everything by construction
    assert((7L to 10L).forall(got(_)._2 == 1))
  }

  test("docKeywords: tf-over-df ordering, deterministic ties, short docs emit fewer rows") {
    val sp = spark; import sp.implicits._
    // doc 1: 'rare' appears twice and only here (df=1, w=2e6);
    // 'common' everywhere (df=3, w=333333); tie between 'aa' and 'ab'
    // (both tf=1, df=1 -> w=1e6) breaks alphabetically
    val docs = Seq(
      (1L, "rare rare common aa ab"),
      (2L, "common x"),
      (3L, "common y")).toDF("doc_id", "text")
    val got = CorpusStats.docKeywords(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3)))
    assert(got.filter(_._1 == 1L).toSeq == Seq(
      (1L, 1, "rare", 2000000L), (1L, 2, "aa", 1000000L), (1L, 3, "ab", 1000000L)))
    // doc 2 has only 2 distinct tokens -> 2 rows, no padding
    assert(got.count(_._1 == 2L) == 2)
    assert(got.filter(_._1 == 2L).map(_._3).toSet == Set("common", "x"))
  }
}
