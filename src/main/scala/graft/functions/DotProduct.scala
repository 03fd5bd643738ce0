package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two numeric arrays as a native codegen expression.
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
  * Each side may be `array<double>` or `array<float>`: a float
  * element widens exactly to the double it represents before the
  * multiply, so scoring FLOAT embeddings directly equals casting the
  * array up front bit-for-bit — while the rows moving through the
  * candidate shuffles stay half the width.
  *
  * Null contract (mirrors the HOF form): null array → null, length
  * mismatch → null, null element → null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (ArrayNum.elemOf(left.dataType), ArrayNum.elemOf(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_d expects numeric arrays (float/double), got " +
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
      acc = acc + getA(a, i) * getB(b, i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
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
         |    $acc = $acc + $ga * $gb;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Element access for float/double arrays, shared by the numeric
  * array expressions. Float elements widen exactly — `(double) f` is
  * the same real number — so mixed-width inputs score bit-identically
  * to casting the whole array to double first.
  */
private[functions] object ArrayNum {
  import org.apache.spark.sql.types.FloatType

  def elemOf(dt: DataType): Option[DataType] = dt match {
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case ArrayType(FloatType, _) => Some(FloatType)
    case _ => None
  }

  def getterOf(dt: DataType): (ArrayData, Int) => Double = dt match {
    case ArrayType(FloatType, _) => (a, i) => a.getFloat(i).toDouble
    case _ => (a, i) => a.getDouble(i)
  }

  /** Java source for reading element `i` of `arr` as a double. */
  def genGetter(dt: DataType, arr: String, i: String): String = dt match {
    case ArrayType(FloatType, _) => s"((double) $arr.getFloat($i))"
    case _ => s"$arr.getDouble($i)"
  }
}
