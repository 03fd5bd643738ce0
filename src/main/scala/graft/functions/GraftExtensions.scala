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
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectFunction((
      new FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        RollingHash(exprs.head)))
    extensions.injectFunction((
      new FunctionIdentifier("dot_d"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_d"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs.head, exprs(1))))
    extensions.injectFunction((
      new FunctionIdentifier("dist2_d"),
      new ExpressionInfo(classOf[SquaredDistance].getName, "dist2_d"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        SquaredDistance(exprs.head, exprs(1))))
  }
}
