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
}
