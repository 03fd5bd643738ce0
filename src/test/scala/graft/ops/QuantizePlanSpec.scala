package graft.ops

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the quantized search path: the corpus side
  * must stay partitioned (only the tiny packed query set broadcasts),
  * and nothing may introduce a shuffle join — at 100 TB a sort-merge
  * join here would shuffle the whole packed corpus for a 5-row
  * build side.
  */
class QuantizePlanSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("knnQuantized broadcasts the packed queries, never shuffle-joins the corpus") {
    val emb = graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = finalPlan(Quantize.knnQuantized(emb))
    // the theta join (query_id != neighbor_id) over a broadcast build
    // side plans as a BroadcastNestedLoopJoin — the intended shape:
    // Q packed rows move, the corpus scan stays put
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"expected the broadcast query join:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"quantized search must not shuffle-join the corpus:\n$plan")
    // exactly one exchange moves corpus-derived rows: the query_id
    // hash partitioning for the top-k window
    val ex = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("ReusedExchange"))
    assert(ex == 1, s"expected 1 hash exchange (window), got $ex:\n$plan")
  }

  test("quantizeProfile is a pure projection: no joins, no aggregates") {
    val emb = graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = finalPlan(Quantize.quantizeProfile(emb))
    assert(!plan.contains("Join"), s"profile must not join:\n$plan")
    assert(!plan.contains("HashAggregate"), s"profile must not aggregate:\n$plan")
  }

  test("dimCovariance: exact moments on a hand-quantized fixture") {
    import spark.implicits._
    // scale = 1/127 for both -> codes [127,127] and [127,-127]
    val emb = Seq((1L, Seq(1.0f, 1.0f)), (2L, Seq(1.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val rs = Quantize.dimCovariance(emb).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r)).toMap
    assert(rs.keySet == Set((0, 0), (0, 1), (1, 1)))
    val c00 = rs((0, 0))
    assert(c00.getAs[Long]("n") == 2 && c00.getAs[Long]("s_x") == 254L)
    assert(c00.getAs[Long]("s_xy") == 2 * 127L * 127L)
    assert(c00.getAs[Double]("cov") == 0.0) // constant dimension
    val c01 = rs((0, 1))
    assert(c01.getAs[Long]("s_xy") == 0L && c01.getAs[Double]("cov") == 0.0)
    val c11 = rs((1, 1))
    assert(c11.getAs[Long]("s_x") == 0L)
    assert(c11.getAs[Long]("s_xy") == 2 * 127L * 127L)
    assert(c11.getAs[Double]("cov") == 127.0 * 127.0)
  }

  test("dimCovariance moment aggregate matches a driver-side fold, incl. mixed dims") {
    import spark.implicits._
    // mixed dimensions (3/5/7) across many partitions: exercises the
    // buffer-growth and cross-partition merge paths of DimMoments
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 400).map { id =>
      val d = Seq(3, 5, 7)(id % 3)
      (id.toLong, Seq.fill(d)(rnd.nextFloat() * 2f - 1f))
    }
    val emb = vecs.toDF("vec_id", "embedding").repartition(16)
    val got = Quantize.dimCovariance(emb).collect()
      .map(r => ((r.getInt(0), r.getInt(1)),
        (r.getAs[Long]("n"), r.getAs[Long]("s_x"), r.getAs[Long]("s_y"),
          r.getAs[Long]("s_xy"), r.getAs[Double]("cov")))).toMap
    // independent reference: quantize + fold in plain Scala
    val codes = vecs.map { case (_, v) =>
      val scale = v.map(x => math.abs(x.toDouble)).max / 127.0
      v.map(x => if (scale > 0) math.floor(x.toDouble / scale + 0.5).toLong else 0L)
    }
    val maxD = codes.map(_.length).max
    val want = (for {
      i <- 0 until maxD
      j <- i until maxD
      rows = codes.filter(_.length > j)
      if rows.nonEmpty
    } yield {
      val n = rows.size.toLong
      val sx = codes.filter(_.length > i).map(_(i)).sum
      val sy = codes.filter(_.length > j).map(_(j)).sum
      val sxy = rows.map(c => c(i) * c(j)).sum
      val cov = BigDecimal((n * sxy - sx * sy).toDouble / (n * n).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (i, j) -> ((n, sx, sy, sxy, cov))
    }).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, w) => assert(got(k) == w, s"cell $k") }
  }

  test("dimCovariance plan: no explode, no corpus-sized shuffle rows") {
    val emb = graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = finalPlan(Quantize.dimCovariance(emb))
    // the aggregate must be the object-hash buffer form; the only
    // explode allowed is the post-aggregate one over the 1-row cells
    // array (i.e. downstream of the aggregate, never of the scan)
    assert(plan.contains("ObjectHashAggregate"),
      s"expected ObjectHashAggregate partial buffers:\n$plan")
    val genIx = plan.indexOf("Generate explode")
    val aggIx = plan.indexOf("ObjectHashAggregate")
    assert(genIx >= 0 && genIx < aggIx,
      s"explode must sit ABOVE the aggregate (cells pivot), not over the corpus:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"moment pivot must not join any more:\n$plan")
  }
}
