package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** `phrase_count(words, phrase)` — the number of start positions i
  * where `words[i+j] == phrase[j]` for every j (overlapping
  * occurrences counted), as a native codegen expression: the per-doc
  * hot loop of exact-phrase search (`graft.ops.Search.phraseSearch`).
  * The HOF form (`aggregate(sequence(...))` over `element_at`
  * equality) is `CodegenFallback` — it breaks the scan's
  * whole-stage-codegen span and evaluates interpreted lambdas per
  * position; this expression fuses into the scan projection
  * (measured ~linear in corpus tokens either way, with the constant
  * the difference). The HOF twin stays as the spec's bit-equality
  * oracle (the `Pq.codesOfHof` convention).
  *
  * Match semantics mirror the HOF's `eqNullSafe`: a null words
  * element matches only a null phrase element. Null contract: null
  * input array → null ([[DotProduct]] convention); an EMPTY phrase is
  * a geometry violation → null (the [[PqEncode]] convention — a
  * zero-length needle has no well-defined occurrence count); words
  * shorter than the phrase → 0.
  */
case class PhraseCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullable: Boolean = true

  override def prettyName: String = "phrase_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"phrase_count expects (string array, string array), got " +
          s"(${left.dataType}, ${right.dataType})")
    }

  override protected def nullSafeEval(wordsAny: Any, phraseAny: Any): Any = {
    val words = wordsAny.asInstanceOf[ArrayData]
    val phrase = phraseAny.asInstanceOf[ArrayData]
    val n = words.numElements()
    val m = phrase.numElements()
    if (m == 0) return null
    var acc = 0L
    var i = 0
    while (i + m <= n) {
      var ok = true
      var j = 0
      while (ok && j < m) {
        val wn = words.isNullAt(i + j)
        val pn = phrase.isNullAt(j)
        if (wn != pn ||
            (!wn && !words.getUTF8String(i + j).equals(phrase.getUTF8String(j))))
          ok = false
        j += 1
      }
      if (ok) acc += 1L
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (words, phrase) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val ok = ctx.freshName("ok")
      val wn = ctx.freshName("wn")
      val pn = ctx.freshName("pn")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $words.numElements();
         |int $m = $phrase.numElements();
         |if ($m == 0) { ${ev.isNull} = true; } else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i + $m <= $n; $i++) {
         |    boolean $ok = true;
         |    for (int $j = 0; $ok && $j < $m; $j++) {
         |      boolean $wn = $words.isNullAt($i + $j);
         |      boolean $pn = $phrase.isNullAt($j);
         |      if ($wn != $pn || (!$wn &&
         |          !$words.getUTF8String($i + $j).equals($phrase.getUTF8String($j)))) {
         |        $ok = false;
         |      }
         |    }
         |    if ($ok) $acc++;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PhraseCount =
    copy(left = newLeft, right = newRight)
}
