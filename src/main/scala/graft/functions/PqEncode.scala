package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** `pq_encode(v, codebook, m)` — product-quantization encoding as a
  * native codegen expression: split `v` into `m` equal subvectors and
  * return, per subspace `s`, the index of the nearest centroid in the
  * flat codebook (`codebook[(s·k + c)·subDim + j]`, with `k` and
  * `subDim` derived from the array lengths). This is the per-vector
  * hot loop of building the PQ code index — the one-time corpus pass
  * at 100 TB — replacing the interpreted nested-HOF argmin
  * (`transform(aggregate(zip_with(...)))`) in `graft.ops.Pq`.
  *
  * Bit-compatibility with the HOF form: distances accumulate in the
  * same per-element order (float widens exactly, `(x−y)²` summed
  * left-to-right) and ties break to the LOWER code via strict `<`,
  * so the emitted codes — and with them `x_knn_pq_rerank`'s
  * brute-oracle contract — are identical.
  *
  * Null contract: null input → null, null element → null, and a
  * geometry that doesn't divide evenly (v.length % m != 0, an empty
  * vector, or codebook not a multiple of m·subDim) → null.
  */
case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (ArrayNum.elemOf(first.dataType), second.dataType, third.dataType) match {
      case (Some(_), ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects (numeric array, double array codebook, int m), " +
          s"got (${first.dataType}, ${second.dataType}, ${third.dataType})")
    }

  override protected def nullSafeEval(vAny: Any, cbAny: Any, mAny: Any): Any = {
    val v = vAny.asInstanceOf[ArrayData]
    val cb = cbAny.asInstanceOf[ArrayData]
    val m = mAny.asInstanceOf[Int]
    val get = ArrayNum.getterOf(first.dataType)
    val dim = v.numElements()
    // dim == 0 would pass the modulo check with subDim = 0 and then
    // divide by zero in `cbn % (m * subDim)` — an empty vector is a
    // geometry violation like any other and yields null
    if (m <= 0 || dim == 0 || dim % m != 0) return null
    val subDim = dim / m
    val cbn = cb.numElements()
    if (cbn == 0 || cbn % (m * subDim) != 0) return null
    val k = cbn / (m * subDim)
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = -1
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d = 0.0d
        var j = 0
        while (j < subDim) {
          if (v.isNullAt(s * subDim + j)) return null
          if (cb.isNullAt((s * k + c) * subDim + j)) return null
          val diff = get(v, s * subDim + j) - cb.getDouble((s * k + c) * subDim + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, m) => {
      val dim = ctx.freshName("dim")
      val subDim = ctx.freshName("subDim")
      val k = ctx.freshName("k")
      val cbn = ctx.freshName("cbn")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val gv = ArrayNum.genGetter(first.dataType, v, s"$s * $subDim + $j")
      val bad = ctx.freshName("bad")
      s"""
         |int $dim = $v.numElements();
         |int $cbn = $cb.numElements();
         |boolean $bad = ($m <= 0) || ($dim == 0) || ($dim % $m != 0) || ($cbn == 0);
         |int $subDim = $bad ? 1 : ($dim / $m);
         |$bad = $bad || ($cbn % ($m * $subDim) != 0);
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $k = $cbn / ($m * $subDim);
         |  int[] $out = new int[$m];
         |  for (int $s = 0; $s < $m && !${ev.isNull}; $s++) {
         |    int $best = -1;
         |    double $bestD = Double.MAX_VALUE;
         |    for (int $c = 0; $c < $k && !${ev.isNull}; $c++) {
         |      double $d = 0.0;
         |      for (int $j = 0; $j < $subDim; $j++) {
         |        // one line: Spark strip-margins generated code, so a
         |        // continuation line starting with '|' would be eaten
         |        if ($v.isNullAt($s * $subDim + $j) || $cb.isNullAt(($s * $k + $c) * $subDim + $j)) {
         |          ${ev.isNull} = true; break;
         |        }
         |        double $diff = $gv - $cb.getDouble(($s * $k + $c) * $subDim + $j);
         |        $d += $diff * $diff;
         |      }
         |      if (!${ev.isNull} && $d < $bestD) { $bestD = $d; $best = $c; }
         |    }
         |    if (!${ev.isNull}) { $out[$s] = $best; }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}
