package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extension entry point: registers graft's native functions
  * into every session built with
  * `spark.sql.extensions=graft.functions.GraftExtensions` — the
  * standard deployment hook, so `SELECT rolling_hash(text)` works in
  * plain SQL without programmatic registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  import org.apache.spark.sql.catalyst.expressions.Expression

  // arity-checked builder: a wrong-arity SQL call gets a named error
  // at analysis instead of a raw IndexOutOfBounds from exprs(i) (and
  // extra arguments fail instead of being silently ignored)
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) throw new IllegalArgumentException(
        s"function $name expects $n argument(s), got ${exprs.length}")
      build(exprs)
    }

  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      arity("rolling_hash", 1)(exprs => RollingHash(exprs.head))))
    extensions.injectFunction((
      new FunctionIdentifier("nfc_norm"),
      new ExpressionInfo(classOf[NfcNorm].getName, "nfc_norm"),
      arity("nfc_norm", 1)(exprs => NfcNorm(exprs.head))))
    extensions.injectFunction((
      new FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_d"),
      arity("dot_d", 2)(exprs => DotProduct(exprs.head, exprs(1)))))
    extensions.injectFunction((
      new FunctionIdentifier("unit_d"),
      new ExpressionInfo(classOf[UnitNorm].getName, "unit_d"),
      arity("unit_d", 1)(exprs => UnitNorm(exprs.head))))
    extensions.injectFunction((
      new FunctionIdentifier("dist2_d"),
      new ExpressionInfo(classOf[SquaredDistance].getName, "dist2_d"),
      arity("dist2_d", 2)(exprs => SquaredDistance(exprs.head, exprs(1)))))
    extensions.injectFunction((
      new FunctionIdentifier("int8_pack"),
      new ExpressionInfo(classOf[Int8Pack].getName, "int8_pack"),
      arity("int8_pack", 2)(exprs => Int8Pack(exprs.head, exprs(1)))))
    extensions.injectFunction((
      new FunctionIdentifier("int8_dot"),
      new ExpressionInfo(classOf[Int8Dot].getName, "int8_dot"),
      arity("int8_dot", 2)(exprs => Int8Dot(exprs.head, exprs(1)))))
    extensions.injectFunction((
      new FunctionIdentifier("adc_dot"),
      new ExpressionInfo(classOf[AdcDot].getName, "adc_dot"),
      arity("adc_dot", 3)(exprs => AdcDot(exprs.head, exprs(1), exprs(2)))))
    extensions.injectFunction((
      new FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      arity("pq_encode", 3)(exprs => PqEncode(exprs.head, exprs(1), exprs(2)))))
    extensions.injectFunction((
      new FunctionIdentifier("pq_pack"),
      new ExpressionInfo(classOf[PqPack].getName, "pq_pack"),
      arity("pq_pack", 1)(exprs => PqPack(exprs.head))))
    extensions.injectFunction((
      new FunctionIdentifier("adc_dot_packed"),
      new ExpressionInfo(classOf[AdcDotPacked].getName, "adc_dot_packed"),
      arity("adc_dot_packed", 3)(exprs =>
        AdcDotPacked(exprs.head, exprs(1), exprs(2)))))
    extensions.injectFunction((
      new FunctionIdentifier("sdc_dot"),
      new ExpressionInfo(classOf[SdcDot].getName, "sdc_dot"),
      arity("sdc_dot", 4)(exprs =>
        SdcDot(exprs.head, exprs(1), exprs(2), exprs(3)))))
    extensions.injectFunction((
      new FunctionIdentifier("phrase_count"),
      new ExpressionInfo(classOf[PhraseCount].getName, "phrase_count"),
      arity("phrase_count", 2)(exprs => PhraseCount(exprs.head, exprs(1)))))
    extensions.injectFunction((
      new FunctionIdentifier("int8_dist2s"),
      new ExpressionInfo(classOf[Int8Dist2s].getName, "int8_dist2s"),
      arity("int8_dist2s", 2)(exprs => Int8Dist2s(exprs.head, exprs(1)))))
    extensions.injectFunction((
      new FunctionIdentifier("bpe_encode"),
      new ExpressionInfo(classOf[BpeEncode].getName, "bpe_encode"),
      arity("bpe_encode", 3)(exprs =>
        BpeEncode(exprs.head, exprs(1), exprs(2)))))
  }
}
