package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("columnProfile computes null/distinct/min/max per column") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, null), (2.0, 30.0), (null, 30.0))
      .toDF("a", "b")
    val rs = Profile.columnProfile(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = rs("a")
    assert(a.getAs[Long]("n_rows") == 4 && a.getAs[Long]("n_null") == 1)
    assert(a.getAs[Long]("n_distinct") == 2)
    assert(a.getAs[Double]("min_v") == 1.0 && a.getAs[Double]("max_v") == 2.0)
    val b = rs("b")
    assert(b.getAs[Long]("n_null") == 1 && b.getAs[Long]("n_distinct") == 2)
    assert(b.getAs[Double]("min_v") == 10.0 && b.getAs[Double]("max_v") == 30.0)
  }

  test("columnProfile is one pass: a single scan in the plan") {
    val docs = graft.engine.Tables
      .table(spark, "/root/testdata/sf0.001", "lineitem")
    val plan = Profile.columnProfile(docs, Seq("l_quantity", "l_tax"))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 parquet scan, got $scans:\n$plan")
  }

  test("quantiles interpolates the exact continuous percentile") {
    // 1..10: p50 = 5.5 (rank 4.5), p90 = 9.1 (rank 8.1)
    val df = (1 to 10).map(_.toDouble).toDF("v")
    val rs = Profile.quantiles(df, Seq("v"), Seq(0.5, 0.9)).collect()
    assert(rs.length == 1 && rs.head.getString(0) == "v")
    assert(rs.head.getAs[Double]("p50") == 5.5)
    assert(math.abs(rs.head.getAs[Double]("p90") - 9.1) < 1e-12)
  }

  test("quantiles is one aggregation pass over a single scan") {
    val li = graft.engine.Tables
      .table(spark, "/root/testdata/sf0.001", "lineitem")
    val plan = Profile.quantiles(li, Seq("l_quantity", "l_extendedprice"))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected 1 parquet scan, got $scans:\n$plan")
  }

  test("percentile labels keep fractional digits without collisions") {
    assert(Profile.pLabel(0.5) == "p50" && Profile.pLabel(0.99) == "p99")
    assert(Profile.pLabel(0.999) == "p99_9")
    assert(Profile.pLabel(0.001) == "p0_1")
    assert(Profile.pLabel(1.0) == "p100")
    // distinct ps map to distinct labels
    val ps = Seq(0.001, 0.004, 0.5, 0.99, 0.999, 1.0)
    assert(ps.map(Profile.pLabel).distinct.size == ps.size)
    // decimal-space scaling: 0.29 * 100 in double arithmetic is
    // 28.999999999999996 — the label must still read p29
    assert(Profile.pLabel(0.29) == "p29")
    assert(Profile.pLabel(0.125) == "p12_5")
  }

  test("winsorizeReport on empty input returns zero rows, like the oracle") {
    val empty = spark.emptyDataset[Double].toDF("v")
    assert(Profile.winsorizeReport(empty, "v").count() == 0)
  }

  test("winsorizeReport computes exact cuts and clip counts") {
    // 1..100: p01 rank 0.99 → 1.99, p99 rank 98.01 → 99.01
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val r = Profile.winsorizeReport(df, "v").head()
    assert(math.abs(r.getAs[Double]("cut_lo") - 1.99) < 1e-12)
    assert(math.abs(r.getAs[Double]("cut_hi") - 99.01) < 1e-12)
    assert(r.getAs[Long]("n_clip_lo") == 1 && r.getAs[Long]("n_clip_hi") == 1)
    assert(r.getAs[Long]("n_rows") == 100)
    assert(r.getAs[Double]("raw_min") == 1.0 && r.getAs[Double]("raw_max") == 100.0)
  }

  test("sketchProfile tracks the exact profile within sketch accuracy") {
    val li = graft.engine.Tables
      .table(spark, "/root/testdata/sf0.001", "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice")
    val sk = Profile.sketchProfile(li, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    val exactQ = Profile.quantiles(li, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    val exactP = Profile.columnProfile(li, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    cols.foreach { c =>
      val nd = sk(c).getAs[Long]("approx_distinct").toDouble
      val ndExact = exactP(c).getAs[Long]("n_distinct").toDouble
      assert(math.abs(nd - ndExact) / ndExact < 0.05,
        s"$c approx_distinct $nd vs $ndExact")
      Seq("p50", "p90", "p99").foreach { p =>
        val a = sk(c).getAs[Double](s"approx_$p")
        val e = exactQ(c).getAs[Double](p)
        assert(math.abs(a - e) / math.max(math.abs(e), 1.0) < 0.05,
          s"$c $p approx $a vs exact $e")
      }
    }
  }

  test("sketchCheck emits all-pass flags and the exact distinct count") {
    val li = graft.engine.Tables
      .table(spark, "/root/testdata/sf0.001", "lineitem")
    val cols = Seq("l_quantity", "l_extendedprice")
    val rs = Profile.sketchCheck(li, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Profile.columnProfile(li, cols).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_distinct")).toMap
    cols.foreach { c =>
      assert(rs(c).getAs[Long]("n_distinct") == exact(c))
      Seq("ok_distinct", "ok_p50", "ok_p90", "ok_p99").foreach { f =>
        assert(rs(c).getAs[Int](f) == 1, s"$c.$f not passing")
      }
    }
  }

  test("histogram buckets integral values on exact edges") {
    val df = Seq(1.0, 1.0, 5.0, 6.0, 10.0, 11.0, 50.0).toDF("v")
    val rs = Profile.histogram(df, "v", 1.0, 5.0).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    // [1,6): 1,1,5 → 3; [6,11): 6,10 → 2; [11,16): 11 → 1; [46,51): 50
    assert(rs.toSeq == Seq(
      (0L, 1.0, 6.0, 3L), (1L, 6.0, 11.0, 2L), (2L, 11.0, 16.0, 1L),
      (9L, 46.0, 51.0, 1L)))
  }

  test("stratifiedSample is deterministic and partition-independent") {
    val docs = graft.engine.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), col("lang"))
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.stratifiedSample(df, "lang", "doc_id", 5)
        .collect().map(r => (r.getString(1), r.getInt(2), r.getLong(0))).toSet
    val a = ids(docs)
    val b = ids(docs.repartition(13).sortWithinPartitions(desc("doc_id")))
    assert(a == b, "sample depends on partitioning/order")
    val perLang = a.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perLang.values.forall(_ == 5), s"per-stratum counts: $perLang")
  }

  test("corrReport: perfect, anti, and undefined correlations") {
    // y = 2x+1 (corr 1), z = -x (corr -1), w constant (undefined)
    val df = Seq((1L, 3L, -1L, 5L), (2L, 5L, -2L, 5L),
      (3L, 7L, -3L, 5L), (4L, 9L, -4L, 5L)).toDF("x", "y", "z", "w")
    val rs = Profile.corrReport(df, Seq(
        "x" -> col("x"), "y" -> col("y"), "z" -> col("z"), "w" -> col("w")))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rs("x~y").getAs[Double]("corr") == 1.0)
    assert(rs("x~z").getAs[Double]("corr") == -1.0)
    assert(rs("x~w").isNullAt(rs("x~w").fieldIndex("corr")),
      "constant column must yield NULL corr, not NaN")
    // the exact-integer moments behind the floats
    val xy = rs("x~y")
    assert(xy.getAs[Long]("n") == 4)
    // n*sxy - sx*sy = 4*(3+10+21+36) - 10*24 = 280 - 240 = 40
    assert(xy.getAs[Long]("num") == 40L)
    // n*sx2 - sx^2 = 4*30 - 100 = 20
    assert(xy.getAs[Long]("den_x") == 20L)
  }

  test("quantilesByGroup selects exact type-1 ranks per group") {
    val df = ((1 to 10).map(v => ("a", v.toLong)) :+ ("b", 7L))
      .toDF("src", "v")
    val got = Profile.quantilesByGroup(df, "src", "v")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getInt(3),
        r.getLong(4))).toSeq
    // group a (n=10): p50 -> rank ceil(5)=5 value 5; p90 -> rank 9;
    // p99 -> rank ceil(9.9)=10. group b (n=1): every pct -> rank 1.
    assert(got == Seq(
      ("a", 50, 10L, 5, 5L), ("a", 90, 10L, 9, 9L), ("a", 99, 10L, 10, 10L),
      ("b", 50, 1L, 1, 7L), ("b", 90, 1L, 1, 7L), ("b", 99, 1L, 1, 7L)),
      s"got $got")
  }

  test("grouped sketch stays inside the exact ±5-rank envelope (check all-green)") {
    val docs = graft.engine.Tables.table(
      spark, "/root/testdata/sf0.001", "documents")
    val chk = Profile.quantilesByGroupSketchCheck(docs, "source", "n_chars")
      .collect()
    assert(chk.nonEmpty)
    chk.foreach { r =>
      assert(r.getAs[Int]("ok") == 1,
        s"sketch outside envelope: grp=${r.get(0)} pct=${r.get(1)} " +
          s"lo=${r.get(3)} hi=${r.get(4)}")
      assert(r.getAs[Long]("exact_lo") <= r.getAs[Long]("exact_hi"))
    }
    // sketch rows pair 1:1 with the exact query's (grp, pct) grid and
    // agree on the group counts
    val exact = Profile.quantilesByGroup(docs, "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getAs[Long]("n")).toMap
    val sk = Profile.quantilesByGroupSketch(docs, "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getAs[Long]("n")).toMap
    assert(sk == exact.map { case (k, n) => k -> n })
  }

  test("grouped sketch check: envelope ranks clamp into [1, n] on tiny groups") {
    // n=1 groups force both envelope ranks to clamp (lo<1, hi>n)
    val df = Seq(("a", 5L), ("b", 9L)).toDF("src", "v")
    val got = Profile.quantilesByGroupSketchCheck(df, "src", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toSeq
    assert(got == Seq(
      ("a", 50, 1L, 5L, 5L, 1), ("a", 90, 1L, 5L, 5L, 1), ("a", 99, 1L, 5L, 5L, 1),
      ("b", 50, 1L, 9L, 9L, 1), ("b", 90, 1L, 9L, 9L, 1), ("b", 99, 1L, 9L, 9L, 1)),
      s"got $got")
  }
}
