package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Squared Euclidean distance of two numeric arrays as a native
  * codegen expression — `dist2_d(a, b)` = Σ (aᵢ−bᵢ)², accumulated in
  * the same sequential left-fold order as the higher-order-function
  * form `aggregate(zip_with(a, b, (x,y) => (x−y)*(x−y)), 0.0, _+_)`,
  * so replacing the HOF keeps every distance (and therefore every
  * centroid ranking the ANN probe selection makes) bit-identical.
  * Each side may be float or double arrays ([[ArrayNum]] — float
  * widens exactly). Used by the IVF coarse-quantizer scoring, which
  * evaluates once per (vector, centroid) pair — the inner loop of
  * probe selection.
  *
  * Null contract mirrors the HOF form: null array → null, length
  * mismatch → null, null element → null.
  */
case class SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (ArrayNum.elemOf(left.dataType), ArrayNum.elemOf(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dist2_d expects numeric arrays (float/double), got " +
          s"(${left.dataType}, ${right.dataType})")
    }

  override protected def nullSafeEval(input1: Any, input2: Any): Any = {
    val a = input1.asInstanceOf[ArrayData]
    val b = input2.asInstanceOf[ArrayData]
    val getA = ArrayNum.getterOf(left.dataType)
    val getB = ArrayNum.getterOf(right.dataType)
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = getA(a, i) - getB(b, i)
      acc = acc + d * d
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val ga = ArrayNum.genGetter(left.dataType, a, i)
      val gb = ArrayNum.genGetter(right.dataType, b, i)
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $ga - $gb;
         |    $acc = $acc + $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}
