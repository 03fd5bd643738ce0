package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** `unit_d(v)` — projection of a numeric array onto the unit sphere
  * as a native codegen expression: one fused pass computing
  * `n = sqrt(Σ xᵢ²)` followed by the per-element divide, replacing
  * the interpreted higher-order-function form
  * `when(sqrt(dot_d(v,v)) === 0, transform(v, cast))
  *  .otherwise(transform(v, x => cast(x) / n))` that was the last
  * non-codegen expression on the IVF hot paths (`Similarity.unitOf`:
  * the corpus cell assignment under `pq_encode` and the per-vector
  * normalize feeding the probe cross join run it once per row).
  *
  * Bit-compatibility with the HOF form, term by term:
  *   - the norm accumulates `acc + xᵢ·xᵢ` in the same sequential
  *     left-fold order as `dot_d` (float elements widen exactly
  *     before the multiply), then one `Math.sqrt`;
  *   - `n == 0.0` (an all-zero vector, or squares that underflow to
  *     zero) returns the elements cast to double unchanged — the
  *     `when` branch;
  *   - otherwise each element is the IEEE division `xᵢ / n` — NaN and
  *     infinity propagate exactly as in the lambda (`NaN == 0.0` is
  *     false in both regimes, so a NaN norm takes the divide branch
  *     and yields all-NaN, like the HOF).
  *
  * Null contract (mirrors the HOF form): null array → null; a null
  * ELEMENT nulls `dot_d`, so the HOF's divide branch turned every
  * element into `x / null = null` — here the same: an array of the
  * input's length with every element null.
  */
case class UnitNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)

  override def nullable: Boolean = true

  override def prettyName: String = "unit_d"

  override def checkInputDataTypes(): TypeCheckResult =
    ArrayNum.elemOf(child.dataType) match {
      case Some(_) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"unit_d expects a numeric array (float/double), got ${child.dataType}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val get = ArrayNum.getterOf(child.dataType)
    val n = a.numElements()
    var acc = 0.0d
    var anyNull = false
    var i = 0
    while (i < n && !anyNull) {
      if (a.isNullAt(i)) anyNull = true
      else { val x = get(a, i); acc = acc + x * x }
      i += 1
    }
    if (anyNull) new GenericArrayData(new Array[Any](n))
    else {
      val nrm = math.sqrt(acc)
      val out = new Array[Any](n)
      var j = 0
      if (nrm == 0.0d) while (j < n) { out(j) = get(a, j); j += 1 }
      else while (j < n) { out(j) = get(a, j) / nrm; j += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val nrm = ctx.freshName("nrm")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      val anyNull = ctx.freshName("anyNull")
      val gi = ArrayNum.genGetter(child.dataType, a, i)
      val gj = ArrayNum.genGetter(child.dataType, a, j)
      s"""
         |int $n = $a.numElements();
         |boolean $anyNull = false;
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n && !$anyNull; $i++) {
         |  if ($a.isNullAt($i)) { $anyNull = true; }
         |  else { double $x = $gi; $acc = $acc + $x * $x; }
         |}
         |if ($anyNull) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$n]);
         |} else {
         |  double $nrm = Math.sqrt($acc);
         |  double[] $out = new double[$n];
         |  if ($nrm == 0.0) { for (int $j = 0; $j < $n; $j++) { $out[$j] = $gj; } }
         |  else { for (int $j = 0; $j < $n; $j++) { $out[$j] = $gj / $nrm; } }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnitNorm =
    copy(child = newChild)
}
