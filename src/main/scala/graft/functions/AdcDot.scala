package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `adc_dot(codes, qtab, k)` — the PQ asymmetric-distance inner loop
  * as a native codegen expression: Σ_s qtab[s·k + codes(s)], the sum
  * of one table lookup per subspace. This is the per-pair hot path of
  * the PQ retrieval stage (`graft.ops.Pq`): the HOF form
  * (`aggregate(zip_with(...))`) evaluates interpreted lambdas per
  * pair, while this expression fuses into WholeStageCodegen beside
  * the join that produces the pair. Identical left-fold accumulation
  * order (s ascending), so results are bit-identical to the HOF form
  * and the brute-oracle contract is untouched.
  *
  * Null contract (the [[DotProduct]] convention): null input → null,
  * null element → null; a code outside [0, k) or a lookup past the
  * table's end → null (the HOF form's `element_at` would raise or
  * yield null there — a poisoned result must never rank).
  */
case class AdcDot(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "adc_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"adc_dot expects (int array codes, double array table, int k), got " +
          s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
    }

  override protected def nullSafeEval(codesAny: Any, tabAny: Any,
      kAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val tab = tabAny.asInstanceOf[ArrayData]
    val k = kAny.asInstanceOf[Int]
    val m = codes.numElements()
    val tn = tab.numElements()
    // geometry gate in long arithmetic: a large caller-supplied k
    // would overflow s*k+c into a negative index that slips past the
    // ix >= tn bound (the expression is SQL-registered); the gate
    // also proves every subsequent int index in-range
    if (k <= 0 || m.toLong * k > tn) return null
    var acc = 0.0d
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      val ix = s * k + c
      if (c < 0 || c >= k || ix >= tn) return null
      if (tab.isNullAt(ix)) return null
      acc += tab.getDouble(ix)
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, tab, k) => {
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val ix = ctx.freshName("ix")
      val m = ctx.freshName("m")
      val tn = ctx.freshName("tn")
      val acc = ctx.freshName("acc")
      s"""
         |int $m = $codes.numElements();
         |int $tn = $tab.numElements();
         |if ($k <= 0 || (long) $m * $k > $tn) { ${ev.isNull} = true; }
         |double $acc = 0.0;
         |for (int $s = 0; !${ev.isNull} && $s < $m; $s++) {
         |  if ($codes.isNullAt($s)) { ${ev.isNull} = true; break; }
         |  int $c = $codes.getInt($s);
         |  int $ix = $s * $k + $c;
         |  if ($c < 0 || $c >= $k || $ix >= $tn || $tab.isNullAt($ix)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  $acc += $tab.getDouble($ix);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): AdcDot =
    copy(first = newFirst, second = newSecond, third = newThird)
}
