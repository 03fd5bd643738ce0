package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, HyperLogLogPlusPlus, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.scalatest.funsuite.AnyFunSuite

/** Regression net for the round-7 sketchCheck OOM class, generalized
  * over EVERY driver query: `count(DISTINCT)` rewrites through Expand
  * with a partial aggregate KEYED BY the distinct values, so any
  * heap-buffered aggregate function sharing that `agg()` (exact
  * percentile's value→count map, approx percentile's
  * QuantileSummaries, HLL++'s register block) is instantiated once
  * per distinct VALUE instead of once per partition — memory scales
  * with the column's distinct count and OOMs on unbounded domains.
  * The fix pattern is two passes recombined by a 1×1 cross join
  * (`Profile.sketchCheck`); this spec keeps the mix from coming back
  * anywhere in the query surface.
  */
class AggregateMixSpec extends AnyFunSuite {
  private val spark = graft.SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def heapBuffered(
      ae: AggregateExpression): Boolean = ae.aggregateFunction match {
    case _: TypedImperativeAggregate[_] => true // percentile family etc.
    case _: HyperLogLogPlusPlus => true // fixed- but LARGE-buffer registers
    case _ => false
  }

  private def mixedAggregates(df: DataFrame): Seq[Aggregate] =
    df.queryExecution.optimizedPlan.collect {
      case a: Aggregate =>
        val aggExprs = a.aggregateExpressions.flatMap(_.collect {
          case ae: AggregateExpression => ae
        })
        (a, aggExprs.exists(_.isDistinct) && aggExprs.exists(heapBuffered))
    }.collect { case (a, true) => a }

  test("the detector flags the known-bad shape") {
    import org.apache.spark.sql.functions._
    val bad = graft.engine.Tables.table(spark, dir, "lineitem")
      .agg(countDistinct(col("l_extendedprice")),
        percentile(col("l_quantity"), lit(0.5)))
    assert(mixedAggregates(bad).nonEmpty)
    val alsoBad = graft.engine.Tables.table(spark, dir, "lineitem")
      .agg(countDistinct(col("l_extendedprice")),
        approx_count_distinct(col("l_quantity")))
    assert(mixedAggregates(alsoBad).nonEmpty)
  }

  test("no driver query mixes count(DISTINCT) with a heap-buffered aggregate") {
    // the eager (checkpointing) dedup builders return checkpoint
    // scans, which trivially contain no Aggregate — so their INTERNAL
    // pipelines are audited via the PlanAudit seam, which hands every
    // pre-checkpoint DataFrame to the sink while its lineage is still
    // the full pipeline. Clear the memo caches FIRST so the builders
    // actually run (a pair-cache hit from an earlier suite would skip
    // the build and record nothing).
    try {
      graft.ops.Dedup.clearPairCache()
      graft.ops.Dedup.clearShingleCache()
      graft.ops.Similarity.clearQuantizerCache()
      var auditedOffenders = List.empty[String]
      var preCheckpointPlans = 0
      val offenders = graft.SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val bad = graft.ops.PlanAudit.withSink({ pre =>
            preCheckpointPlans += 1
            if (mixedAggregates(pre).nonEmpty)
              auditedOffenders ::= s"$name (pre-checkpoint)"
          })(mixedAggregates(fn(spark, dir)).nonEmpty)
          if (bad) Some(name) else None
      } ++ auditedOffenders.reverse
      assert(offenders.isEmpty,
        s"queries mixing distinct + buffered aggregates in one Aggregate: $offenders")
      // the seam must have fired, or the checkpointed family was
      // silently skipped and this net is vacuous for it
      assert(preCheckpointPlans > 0,
        "PlanAudit sink never fired: checkpointed builders were not audited")
    } finally {
      graft.ops.Dedup.clearPairCache()
      graft.ops.Dedup.clearShingleCache()
      graft.ops.Similarity.clearQuantizerCache()
    }
  }
}
