package graft.ops

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape pins for the PQ retrieval paths (the QuantizePlanSpec
  * contract extended to two stages): the corpus side must stay
  * partitioned everywhere — stage 1 broadcasts only the per-query
  * ADC tables, stage 2 broadcasts only the candidate-id list and the
  * query vectors — and no stage may shuffle-join the corpus. At
  * 100 TB a sort-merge join in either stage would shuffle the whole
  * code index (stage 1) or the whole vector table (stage 2) for a
  * build side of at most Q·candidates rows.
  */
class PqPlanSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  private def emb =
    graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")

  test("knnPqRerank never shuffle-joins the corpus in either stage") {
    try {
      val plan = finalPlan(Pq.knnPqRerank(emb))
      // stage 1's theta join over the broadcast query tables plans as
      // BroadcastNestedLoopJoin (the knnBrute shape); stage 2's
      // candidate and query joins are broadcast hash joins
      assert(plan.contains("BroadcastNestedLoopJoin"),
        s"expected the broadcast ADC-table join:\n$plan")
      assert(plan.contains("BroadcastHashJoin"),
        s"expected broadcast candidate/query joins in the rerank:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"PQ retrieval must not shuffle-join the corpus:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"no unconstrained cartesian anywhere:\n$plan")
    } finally Pq.clearCodebookCache()
  }

  test("knnPqRerank PQ-encodes the corpus exactly once (shared subtree, pruned rerank branch)") {
    try {
      val df = Pq.knnPqRerank(emb)
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      val n = "pq_encode\\(".r.findAllIn(plan).size
      assert(n == 1,
        s"expected ONE pq_encode over the corpus (stage 1) — the rerank " +
          s"branch must prune codes out — but the plan evaluates it $n times:\n$plan")
    } finally Pq.clearCodebookCache()
  }

  test("the exactness-gate rerank refuses an un-broadcastable Q x depth candidate set") {
    val e = intercept[IllegalArgumentException] {
      Pq.knnPqRerank(emb, nQueries = 5, candidates = 1000001)
    }
    assert(e.getMessage.contains("knnPqIvf"),
      s"the error must point at the scale path: ${e.getMessage}")
    val e2 = intercept[IllegalArgumentException] {
      Pq.knnPqIvf(emb, nQueries = 5, candidates = 1000001)
    }
    assert(e2.getMessage.contains("knnPqIvf"))
  }

  test("knnPqIvf keeps the cell join broadcast and adds no corpus shuffle join") {
    try {
      val plan = finalPlan(Pq.knnPqIvf(emb, nCells = 16, nProbe = 4))
      // the cell equi-join against the (query × probe) build side must
      // be a broadcast hash join — the corpus codes stay put
      assert(plan.contains("BroadcastHashJoin"),
        s"expected the broadcast cell join:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"IVF×PQ must not shuffle-join the corpus:\n$plan")
      assert(!plan.contains("CartesianProduct"),
        s"no unconstrained cartesian (centroid scoring broadcasts):\n$plan")
    } finally {
      Pq.clearCodebookCache()
      Similarity.clearQuantizerCache()
    }
  }
}
