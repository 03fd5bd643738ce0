package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** `sdc_dot(pa, pb, tab, k)` — PQ symmetric-distance dot product of
  * two BYTE-PACKED code vectors: Σ_s tab[(s·k + pa[s])·k + pb[s]],
  * where `tab` is the flat [m][k][k] table of per-subspace centroid
  * dot products (`tab[(s·k + ca)·k + cb] = <cb(s)(ca), cb(s)(cb)>`).
  *
  * This is the pair-scoring inner loop of PQ-accelerated NEAR-DUP
  * (`graft.ops.Pq.embeddingNearDupPq`): unlike retrieval, where one
  * side is a query with a real vector (ADC — [[AdcDot]]), dedup
  * scores corpus×corpus pairs where BOTH sides live as codes, so the
  * approximate dot is centroid-vs-centroid. m table lookups per
  * pair, fused into the cell join's codegen stage; the bytes-per-row
  * the join shuffles drop from the 256 B vector to the m-byte packed
  * codes.
  *
  * The table is symmetric in (ca, cb) — `sdc_dot(pa, pb)` ==
  * `sdc_dot(pb, pa)` exactly, so pair orientation cannot change the
  * score. Accumulation is the sequential s-ascending left fold (the
  * [[AdcDot]] convention).
  *
  * Null contract: null input → null, code length mismatch → null, a
  * code ≥ k or a lookup past the table's end → null. The geometry
  * gate `m·k² ≤ table length` is checked UP FRONT in long arithmetic:
  * the expression is SQL-registered, and a large caller-supplied k
  * would otherwise overflow the int index into a NEGATIVE value that
  * slips past the `ix >= tn` bound and reads off-heap garbage — the
  * gate also makes every subsequent int index provably in-range.
  */
case class SdcDot(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "sdc_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (BinaryType, BinaryType, ArrayType(DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"sdc_dot expects (binary packed codes, binary packed codes, " +
          s"double array table, int k), got (${first.dataType}, " +
          s"${second.dataType}, ${third.dataType}, ${fourth.dataType})")
    }

  override protected def nullSafeEval(paAny: Any, pbAny: Any, tabAny: Any,
      kAny: Any): Any = {
    val pa = paAny.asInstanceOf[Array[Byte]]
    val pb = pbAny.asInstanceOf[Array[Byte]]
    val tab = tabAny.asInstanceOf[ArrayData]
    val k = kAny.asInstanceOf[Int]
    if (pa.length != pb.length) return null
    val tn = tab.numElements()
    val mk = pa.length.toLong * k
    if (k <= 0 || mk > tn || mk * k > tn) return null
    var acc = 0.0d
    var s = 0
    while (s < pa.length) {
      val ca = pa(s) & 0xFF
      val cb = pb(s) & 0xFF
      if (ca >= k || cb >= k) return null
      val ix = (s * k + ca) * k + cb
      if (tab.isNullAt(ix)) return null
      acc += tab.getDouble(ix)
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (pa, pb, tab, k) => {
      val s = ctx.freshName("s")
      val ca = ctx.freshName("ca")
      val cb = ctx.freshName("cb")
      val ix = ctx.freshName("ix")
      val tn = ctx.freshName("tn")
      val mk = ctx.freshName("mk")
      val acc = ctx.freshName("acc")
      s"""
         |int $tn = $tab.numElements();
         |long $mk = (long) $pa.length * $k;
         |// one line: Spark strip-margins generated code, so a
         |// continuation line starting with '|' would be eaten
         |if ($pa.length != $pb.length || $k <= 0 || $mk > $tn || $mk * $k > $tn) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $s = 0; $s < $pa.length; $s++) {
         |    int $ca = $pa[$s] & 0xFF;
         |    int $cb = $pb[$s] & 0xFF;
         |    int $ix = ($s * $k + $ca) * $k + $cb;
         |    if ($ca >= $k || $cb >= $k || $tab.isNullAt($ix)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += $tab.getDouble($ix);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): SdcDot =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}
