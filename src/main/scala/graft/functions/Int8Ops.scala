package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** Symmetric int8 vector quantization as native codegen expressions.
  *
  * `int8_pack(vec, scale)` stores a float/double embedding as ONE BYTE
  * per dimension (`code_i = floor(x_i/scale + 0.5)`, saturating at
  * ±127/-128): a 64-dim float32 embedding shrinks 256 B → 64 B, so
  * every ANN candidate shuffle and every broadcast of a query/seed set
  * moves 4× fewer bytes — at 100 TB the shuffle payload of the
  * pairwise scoring stages is the dominant I/O term, and this is the
  * standard storage format (FAISS `SQ8`-style) for it. With the
  * companion scale `max|x|/127`, codes stay in [-127, 127] and the
  * saturation never engages; it exists so a hostile scale cannot
  * wrap a byte silently.
  *
  * `int8_dot(a, b)` is the exact integer dot product of two packed
  * vectors (sign-extended bytes, LONG accumulator — 64 dims × 127²
  * can never overflow). Quantized cosine `dot/√(a·a)/√(b·b)` needs no
  * scale at all: the per-vector scales cancel, so ranking quantized
  * cosines compares pure integers divided by square roots of integers
  * — every engine that can floor a division reproduces it bit-exactly
  * (the DuckDB oracle does, with no float-tolerance escape hatch).
  *
  * Null contract (mirrors [[DotProduct]]): null input → null, null
  * element → null, length mismatch → null.
  */
case class Int8Pack(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (ArrayNum.elemOf(left.dataType), right.dataType) match {
      case (Some(_), DoubleType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"int8_pack expects (numeric array, double scale), got " +
          s"(${left.dataType}, ${right.dataType})")
    }

  override protected def nullSafeEval(input1: Any, input2: Any): Any = {
    val a = input1.asInstanceOf[ArrayData]
    val scale = input2.asInstanceOf[Double]
    val get = ArrayNum.getterOf(left.dataType)
    val n = a.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val r = if (scale > 0.0) get(a, i) / scale + 0.5 else 0.5
      var c = math.floor(r).toLong
      if (c > 127L) c = 127L
      if (c < -128L) c = -128L
      out(i) = c.toByte
      i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val c = ctx.freshName("c")
      val ga = ArrayNum.genGetter(left.dataType, a, i)
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $r = $s > 0.0 ? $ga / $s + 0.5 : 0.5;
         |  long $c = (long) Math.floor($r);
         |  if ($c > 127L) $c = 127L;
         |  if ($c < -128L) $c = -128L;
         |  $out[$i] = (byte) $c;
         |}
         |if (!${ev.isNull}) { ${ev.value} = $out; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Pack =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product of two int8-packed vectors — see
  * [[Int8Pack]]. LONG result; bytes sign-extend, so the products are
  * exact and the sum order-independent (integer addition commutes,
  * unlike the float folds this replaces).
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"int8_dot expects two binary (int8-packed) vectors, got " +
          s"(${left.dataType}, ${right.dataType})")
    }

  override protected def nullSafeEval(input1: Any, input2: Any): Any = {
    val a = input1.asInstanceOf[Array[Byte]]
    val b = input2.asInstanceOf[Array[Byte]]
    if (a.length != b.length) return null
    var acc = 0L
    var i = 0
    while (i < a.length) {
      acc += a(i).toLong * b(i).toLong
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $a.length; $i++) {
         |    $acc += ((long) $a[$i]) * ((long) $b[$i]);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dot =
    copy(left = newLeft, right = newRight)
}

/** `int8_dist2s(pack, cents)` — exact integer squared distances of one
  * packed vector to EVERY centroid in a concatenated centroid block:
  * `cents` is k·d bytes (k int8 centroids back to back), the result is
  * an `array<long>` of k values `Σ_d (a_i − c_i)²`.
  *
  * The k-means-family assignment hot loop as ONE native codegen loop.
  * The `zip_with(typedLit(cents), …)` form it replaces dispatched an
  * interpreted lambda per CELL per row (higher-order functions have no
  * codegen), each lambda re-entering `int8_dot` through interpreted
  * eval — tolerable at the old fixed k=8, but auto-k sizes k to √n
  * (256 at the 100× corpus) and the per-row interpreted work scaled
  * with it: the lattice IVF's 100× leg measured 79 s against ~7 s at
  * k=8. One fused loop restores the codegen path at any k. Values are
  * bit-identical to the algebraic `q·q + c·c − 2·int8_dot` form (exact
  * integers either way), so oracles and ties are untouched.
  *
  * Null contract: null input → null; a geometry violation (empty
  * vector, or a centroid block not a whole multiple of the vector
  * length) → null (the [[PqEncode]] convention).
  */
case class Int8Dist2s(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "int8_dist2s"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"int8_dist2s expects (packed vector, packed centroid block), got " +
          s"(${left.dataType}, ${right.dataType})")
    }

  override protected def nullSafeEval(input1: Any, input2: Any): Any = {
    val a = input1.asInstanceOf[Array[Byte]]
    val cents = input2.asInstanceOf[Array[Byte]]
    val d = a.length
    if (d == 0 || cents.length % d != 0) return null
    val k = cents.length / d
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      var acc = 0L
      var i = 0
      val base = c * d
      while (i < d) {
        val diff = a(i).toLong - cents(base + i).toLong
        acc += diff * diff
        i += 1
      }
      out(c) = acc
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, cents) => {
      val d = ctx.freshName("d")
      val k = ctx.freshName("k")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      s"""
         |int $d = $a.length;
         |if ($d == 0 || $cents.length % $d != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $k = $cents.length / $d;
         |  long[] $out = new long[$k];
         |  for (int $c = 0; $c < $k; $c++) {
         |    long $acc = 0L;
         |    int $base = $c * $d;
         |    for (int $i = 0; $i < $d; $i++) {
         |      long $diff = ((long) $a[$i]) - ((long) $cents[$base + $i]);
         |      $acc += $diff * $diff;
         |    }
         |    $out[$c] = $acc;
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8Dist2s =
    copy(left = newLeft, right = newRight)
}
