package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two double arrays as a native codegen expression.
  *
  * Semantically identical to the higher-order-function form
  * `aggregate(zip_with(a, b, (p, q) => p*q), 0.0, (acc, v) => acc+v)`
  * — the SAME sequential left-fold accumulation order, so results are
  * bit-identical and every DuckDB oracle built against the fold keeps
  * matching — but compiled into the surrounding WholeStageCodegen
  * loop instead of interpreted lambda evaluation. The cosine scoring
  * paths (brute kNN, embedding near-dup, IVF verification) evaluate
  * this once per candidate pair, so at 100 TB the interpreted-vs-fused
  * difference is the dominant CPU term of the whole operator.
  *
  * Null contract (mirrors the HOF form): null array → null, length
  * mismatch → null, null element → null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_d expects (array<double>, array<double>), got ($l, $r)")
    }

  override protected def nullSafeEval(input1: Any, input2: Any): Any = {
    val a = input1.asInstanceOf[ArrayData]
    val b = input2.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc = acc + a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc = $acc + $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
