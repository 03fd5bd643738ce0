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
}
