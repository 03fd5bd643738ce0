package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** `pq_pack(codes)` — store a PQ code vector as ONE UNSIGNED BYTE per
  * subspace (the [[Int8Pack]] pattern applied to the codes relation):
  * an `array<int>` of m codes occupies ~(8 + 4·m + null-bitmap) bytes
  * in Tungsten rows (~80 B at m=16) while the packed binary is m
  * bytes plus a fixed offset (~24 B) — so the resident code index,
  * and any shuffle or broadcast that carries it, actually realizes
  * the 16–25× codes-vs-vectors reduction the PQ design claims
  * instead of giving a third of it back to array headers.
  *
  * Codes are PQ centroid indices — non-negative and < k ≤ 256 — so a
  * byte stores them unsigned. Null contract (the [[DotProduct]]
  * convention): null input → null, null element → null, an element
  * outside [0, 255] → null (a code that cannot round-trip must never
  * silently truncate).
  */
case class PqPack(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def prettyName: String = "pq_pack"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"pq_pack expects an int array of PQ codes, got $other")
    }

  override protected def nullSafeEval(codesAny: Any): Any = {
    val codes = codesAny.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val out = new Array[Byte](m)
    var s = 0
    while (s < m) {
      if (codes.isNullAt(s)) return null
      val c = codes.getInt(s)
      if (c < 0 || c > 255) return null
      out(s) = c.toByte
      s += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, codes => {
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      s"""
         |int $m = $codes.numElements();
         |byte[] $out = new byte[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  if ($codes.isNullAt($s)) { ${ev.isNull} = true; break; }
         |  int $c = $codes.getInt($s);
         |  if ($c < 0 || $c > 255) { ${ev.isNull} = true; break; }
         |  $out[$s] = (byte) $c;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqPack =
    copy(child = newChild)
}

/** `adc_dot_packed(pcodes, qtab, k)` — [[AdcDot]] over byte-packed
  * codes: Σ_s qtab[s·k + (pcodes[s] & 0xFF)]. Identical left-fold
  * accumulation order and range checks as the int-array form, so
  * `adc_dot_packed(pq_pack(codes), t, k)` is bit-identical to
  * `adc_dot(codes, t, k)` wherever both are defined (the round-trip
  * spec pins it) — the packed codes relation drops straight into the
  * PQ retrieval stage without touching its brute-oracle contract.
  */
case class AdcDotPacked(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "adc_dot_packed"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (BinaryType, ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"adc_dot_packed expects (binary packed codes, double array table, " +
          s"int k), got (${first.dataType}, ${second.dataType}, ${third.dataType})")
    }

  override protected def nullSafeEval(codesAny: Any, tabAny: Any,
      kAny: Any): Any = {
    val codes = codesAny.asInstanceOf[Array[Byte]]
    val tab = tabAny.asInstanceOf[ArrayData]
    val k = kAny.asInstanceOf[Int]
    val tn = tab.numElements()
    // geometry gate in long arithmetic (the AdcDot/SdcDot convention):
    // a large caller-supplied k would overflow s*k+c into a negative
    // index past the ix >= tn bound
    if (k <= 0 || codes.length.toLong * k > tn) return null
    var acc = 0.0d
    var s = 0
    while (s < codes.length) {
      val c = codes(s) & 0xFF
      val ix = s * k + c
      if (c >= k || ix >= tn) return null
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
      val tn = ctx.freshName("tn")
      val acc = ctx.freshName("acc")
      s"""
         |int $tn = $tab.numElements();
         |if ($k <= 0 || (long) $codes.length * $k > $tn) { ${ev.isNull} = true; }
         |double $acc = 0.0;
         |for (int $s = 0; !${ev.isNull} && $s < $codes.length; $s++) {
         |  int $c = $codes[$s] & 0xFF;
         |  int $ix = $s * $k + $c;
         |  if ($c >= $k || $tab.isNullAt($ix)) {
         |    ${ev.isNull} = true; break;
         |  }
         |  $acc += $tab.getDouble($ix);
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): AdcDotPacked =
    copy(first = newFirst, second = newSecond, third = newThird)
}
