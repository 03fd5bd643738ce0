package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * canonicalization step a curation pipeline runs BEFORE any
  * text-keyed operation (exact dedup, shingling, fingerprints):
  * without it, a decomposed "é" (e + U+0301) and the precomposed
  * U+00E9 hash apart and a verbatim duplicate survives dedup. Spark
  * ships no normalization function, so this wraps the JDK's
  * `java.text.Normalizer` the way the built-in string functions wrap
  * `UTF8String` — one static call from generated code, staying
  * inside whole-stage codegen (no UDF boxing).
  *
  * An `isNormalized` fast path returns the INPUT UTF8String untouched
  * when the text is already NFC — true for almost every row of a
  * real corpus, making the common case allocation-free; only rows
  * that actually carry decomposed sequences pay the String
  * round-trip.
  */
case class NfcNorm(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    NfcNorm.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNorm.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNorm =
    copy(child = newChild)
}

object NfcNorm {
  /** Static seam the generated code calls. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
