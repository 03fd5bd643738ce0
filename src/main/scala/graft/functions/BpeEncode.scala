package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_encode(word, ls, rs)` — apply a BPE merge table in rank order
  * to one word: split into code-point symbols, then for each merge i
  * replace every left-to-right non-overlapping adjacent (ls[i], rs[i])
  * pair with the concatenated symbol. Returns the final symbol array.
  *
  * The native form of `graft.ops.Bpe.applyMergeTable`, closing the
  * last `udf()` in the library: the Scala-closure seam forced a
  * serialization/boxing boundary into the encode projection; this
  * expression fuses into whole-stage codegen like every other graft
  * native ([[PhraseCount]] convention). The merge-table operands are
  * column expressions (in practice array literals — model state rides
  * into the plan like the k-means centroids), so the expression stays
  * registrable and SQL-callable.
  *
  * Null contract: any null operand → null; mismatched table lengths
  * or a null table element is a geometry violation → null (the
  * [[PqEncode]] convention). The Scala fold in `Bpe.applyMergeTable`
  * stays as the spec's independent bit-equality reference.
  */
case class BpeEncode(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "bpe_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode expects (string, string array, string array), got " +
          s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
    }

  override protected def nullSafeEval(wordAny: Any, lsAny: Any,
      rsAny: Any): Any = {
    val word = wordAny.asInstanceOf[UTF8String].toString
    val ls = lsAny.asInstanceOf[ArrayData]
    val rs = rsAny.asInstanceOf[ArrayData]
    val nm = ls.numElements()
    if (nm != rs.numElements()) return null
    var i = 0
    while (i < nm) {
      if (ls.isNullAt(i) || rs.isNullAt(i)) return null
      i += 1
    }
    var syms = new java.util.ArrayList[String]()
    var idx = 0
    while (idx < word.length) {
      val cc = Character.charCount(word.codePointAt(idx))
      syms.add(word.substring(idx, idx + cc))
      idx += cc
    }
    var m = 0
    while (m < nm) {
      val l = ls.getUTF8String(m).toString
      val r = rs.getUTF8String(m).toString
      val out = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        if (j + 1 < syms.size && syms.get(j) == l && syms.get(j + 1) == r) {
          out.add(l + r); j += 2
        } else { out.add(syms.get(j)); j += 1 }
      }
      syms = out
      m += 1
    }
    val arr = new Array[Any](syms.size)
    var j = 0
    while (j < syms.size) { arr(j) = UTF8String.fromString(syms.get(j)); j += 1 }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (word, ls, rs) => {
      val nm = ctx.freshName("nm")
      val str = ctx.freshName("str")
      val syms = ctx.freshName("syms")
      val out = ctx.freshName("out")
      val idx = ctx.freshName("idx")
      val cc = ctx.freshName("cc")
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val l = ctx.freshName("l")
      val r = ctx.freshName("r")
      val bad = ctx.freshName("bad")
      val arr = ctx.freshName("arr")
      s"""
         |int $nm = $ls.numElements();
         |boolean $bad = $nm != $rs.numElements();
         |for (int $j = 0; !$bad && $j < $nm; $j++) {
         |  if ($ls.isNullAt($j) || $rs.isNullAt($j)) $bad = true;
         |}
         |if ($bad) { ${ev.isNull} = true; } else {
         |  java.lang.String $str = $word.toString();
         |  java.util.ArrayList $syms = new java.util.ArrayList();
         |  for (int $idx = 0; $idx < $str.length(); ) {
         |    int $cc = java.lang.Character.charCount($str.codePointAt($idx));
         |    $syms.add($str.substring($idx, $idx + $cc));
         |    $idx += $cc;
         |  }
         |  for (int $m = 0; $m < $nm; $m++) {
         |    java.lang.String $l = $ls.getUTF8String($m).toString();
         |    java.lang.String $r = $rs.getUTF8String($m).toString();
         |    java.util.ArrayList $out = new java.util.ArrayList($syms.size());
         |    for (int $j = 0; $j < $syms.size(); ) {
         |      if ($j + 1 < $syms.size() && $syms.get($j).equals($l)
         |          && $syms.get($j + 1).equals($r)) {
         |        $out.add($l + $r); $j += 2;
         |      } else { $out.add($syms.get($j)); $j += 1; }
         |    }
         |    $syms = $out;
         |  }
         |  Object[] $arr = new Object[$syms.size()];
         |  for (int $j = 0; $j < $arr.length; $j++) {
         |    $arr[$j] = org.apache.spark.unsafe.types.UTF8String.fromString(
         |      (java.lang.String) $syms.get($j));
         |  }
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BpeEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}
