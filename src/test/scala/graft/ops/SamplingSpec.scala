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
