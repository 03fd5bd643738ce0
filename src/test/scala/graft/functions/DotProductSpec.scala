package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen dot product must be BIT-identical to the interpreted
  * zip_with+aggregate fold it replaced — that identity is what keeps
  * every cosine-based DuckDB oracle green.
  */
class DotProductSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (p, q) => p * q),
    lit(0.0d), (acc, v) => acc + v)

  test("dot_d == zip_with/aggregate fold, bit-for-bit, on random vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val data = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val rows = data.toDF("a", "b")
      .select(expr("dot_d(a, b)").as("d"), hofDot.as("h")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0))
        == java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} != ${r.getDouble(1)}")
    }
  }

  test("null contract mirrors the HOF form: null array, length mismatch, null element") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)),
        |  (array(1.0d, 2.0d), array(3.0d)),
        |  (array(1.0d, CAST(NULL AS DOUBLE)), array(3.0d, 4.0d)),
        |  (array(1.5d, 2.0d), array(2.0d, 0.5d)) AS t(a, b)""".stripMargin)
    val got = df.select(expr("dot_d(a, b)")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == Seq(None, None, None, Some(4.0)))
  }

  test("dist2_d == (a-b)^2 zip_with/aggregate fold, bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(200)((
      Seq.fill(64)(rnd.nextDouble() * 2 - 1),
      Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
    val hof = aggregate(
      zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
      lit(0.0d), (acc, v) => acc + v)
    val rows = data.toDF("a", "b")
      .select(expr("dist2_d(a, b)").as("d"), hof.as("h")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0))
        == java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"${r.getDouble(0)} != ${r.getDouble(1)}")
    }
  }

  test("dot_d stays inside WholeStageCodegen in a scoring plan") {
    // a real parquet scan — a local relation would constant-fold the
    // whole projection away before any codegen question arises
    val emb = graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .select(expr("dot_d(v, v)").as("d")).filter(col("d") > 0)
    // the `*(n)` prefix marks operators fused into a WholeStageCodegen
    // stage in the compact plan string
    val plan = emb.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[dotproduct""".r.findFirstIn(plan).isDefined,
      s"dot_d projection not codegen-fused:\n$plan")
  }
}
