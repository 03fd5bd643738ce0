package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Every native expression must actually run COMPILED. Spark's
  * whole-stage codegen catches janino compile errors and silently
  * falls back to interpreted execution (`spark.sql.codegen.fallback`
  * defaults true), so a template bug — e.g. a `||` continuation line
  * eaten by strip-margin, the round-10 `sdc_dot` defect — keeps every
  * correctness gate green while the hot loop quietly pays interpreted
  * cost. This suite makes that failure mode a hard error, twice over:
  *
  *  1. it extracts each query's `WholeStageCodegenExec` subtrees and
  *     feeds their generated source straight to `CodeGenerator
  *     .compile`, so a janino error surfaces as the thrown exception
  *     instead of a log line; and
  *  2. it executes the query with `spark.sql.codegen.fallback=false`,
  *     so the silent-fallback path is closed during the run itself.
  *
  * Inputs derive from `range(id)` (non-foldable) so ConstantFolding
  * cannot evaluate the expression driver-side and skip codegen.
  */
class CodegenCompiledSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def arr(n: Int, f: Int => String): String =
    (0 until n).map(f).mkString("array(", ", ", ")")

  /** (function name, selectExpr fragment over range's `id`). Geometry
    * chosen so every row yields a NON-null result — a null would mean
    * the expression took a guard exit, not the loop we mean to pin.
    */
  private val cases: Seq[(String, String)] = Seq(
    "rolling_hash" -> "rolling_hash(concat('doc ', id))",
    "phrase_count" -> "phrase_count(split(concat('a b c d ', id), ' '), array('b', 'c'))",
    "dot_d" -> "dot_d(array(cast(id as double), 2.0d), array(1.0d, 3.0d))",
    "dist2_d" -> "dist2_d(array(cast(id as double), 2.0d), array(1.0d, 3.0d))",
    "unit_d" -> "unit_d(array(cast(id as double), 2.0d, -1.5d))",
    "int8_pack" -> "int8_pack(array(cast(id as double), -3.5d), 0.1d)",
    "int8_dot" -> ("int8_dot(int8_pack(array(cast(id % 100 as double)), 1.0d), " +
      "int8_pack(array(2.0d), 1.0d))"),
    // v dim 2, m=1 → subDim 2; cb = 4 centroids × 2 dims → k=4
    "pq_encode" -> s"pq_encode(array(cast(id % 4 as double), 1.0d), ${arr(8, i => s"$i.0d")}, 1)",
    "pq_pack" -> "pq_pack(array(cast(id % 4 as int), 1))",
    // m=2 subspaces, k=4 → ADC table m·k = 8
    "adc_dot" -> s"adc_dot(array(cast(id % 4 as int), cast(id % 2 as int)), ${arr(8, i => s"$i.0d")}, 4)",
    "adc_dot_packed" -> s"adc_dot_packed(pq_pack(array(cast(id % 4 as int), 1)), ${arr(8, i => s"$i.0d")}, 4)",
    // m=2, k=4 → SDC table m·k² = 32
    "sdc_dot" -> (s"sdc_dot(pq_pack(array(cast(id % 4 as int), 1)), " +
      s"pq_pack(array(2, 3)), ${arr(32, i => s"$i.0d")}, 4)"),
    // the pinned-merge prefix: 'th' then 'the' must actually fire
    "bpe_encode" -> ("bpe_encode(concat('the', id), " +
      "array('t', 'th'), array('h', 'e'))"),
    // 2-dim vector against a 3-centroid block (6 bytes)
    "int8_dist2s" -> ("int8_dist2s(int8_pack(array(cast(id % 100 as double), " +
      "7.0d), 1.0d), int8_pack(array(1.0d, 2.0d, 3.0d, 4.0d, 5.0d, 6.0d), 1.0d))"),
    // decomposed e + U+0301 (the Scala-source unicode escape embeds
    // the raw combining char in the SQL literal) must actually take
    // the normalize branch
    "nfc_norm" -> "nfc_norm(concat('e\u0301', id))")

  private def wholeStages(df: DataFrame): Seq[WholeStageCodegenExec] = {
    // materialize first so an adaptive wrapper (if any) is final
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect { case w: WholeStageCodegenExec => w }
  }

  private def withConf[T](k: String, v: String)(f: => T): T = {
    val old = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try f
    finally old match {
      case Some(o) => spark.conf.set(k, o)
      case None => spark.conf.unset(k)
    }
  }

  cases.foreach { case (name, frag) =>
    test(s"$name runs compiled — generated source passes janino, no fallback") {
      withConf("spark.sql.codegen.fallback", "false") {
        val df = spark.range(64).selectExpr(s"$frag AS r")
        val stages = wholeStages(df)
        assert(stages.nonEmpty, s"$name: no WholeStageCodegenExec in plan — " +
          "expression did not enter codegen at all")
        // compile each stage's source directly: a janino error is the
        // thrown exception here, never a silent interpreted fallback
        stages.foreach { w => CodeGenerator.compile(w.doCodeGen()._2) }
        // and the expression must have produced real values, not a
        // guard-exit null (which would pin the wrong code path)
        assert(df.where("r IS NOT NULL").count() == 64L,
          s"$name: guard-exit nulls — fixture geometry wrong")
      }
    }
  }
}
