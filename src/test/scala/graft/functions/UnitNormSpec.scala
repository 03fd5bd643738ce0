package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen unit-sphere projection must be BIT-identical to the
  * interpreted `when(norm === 0, cast).otherwise(x / norm)` HOF form
  * it replaced ([[graft.ops.Similarity.unitOfHof]] keeps that form as
  * this spec's oracle) — the IVF cell geometry, and with it every
  * recall/covering gate of the family, is built on these doubles.
  */
class UnitNormSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private def hof = graft.ops.Similarity.unitOfHof(col("v"))

  private def assertBitEqual(rows: Array[org.apache.spark.sql.Row]): Unit =
    rows.foreach { r =>
      (r.isNullAt(0), r.isNullAt(1)) match {
        case (true, true) => ()
        case (false, false) =>
          val a = r.getSeq[Any](0)
          val b = r.getSeq[Any](1)
          assert(a.length == b.length, s"length drift: $a vs $b")
          a.zip(b).foreach {
            case (null, null) => ()
            case (x: Double, y: Double) =>
              assert(java.lang.Double.doubleToRawLongBits(x)
                == java.lang.Double.doubleToRawLongBits(y), s"$x != $y")
            case (x, y) => fail(s"element null drift: $x vs $y")
          }
        case _ => fail(s"top-level null drift: $r")
      }
    }

  test("unit_d == the HOF normalize, bit-for-bit, on random double vectors") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val data = Seq.fill(300)(Seq.fill(64)(rnd.nextDouble() * 2 - 1))
    val rows = data.toDF("v")
      .select(expr("unit_d(v)").as("n"), hof.as("h")).collect()
    assertBitEqual(rows)
  }

  test("unit_d == the HOF normalize on FLOAT arrays (exact element widening)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = Seq.fill(300)(Seq.fill(48)(rnd.nextFloat() * 2 - 1))
    val rows = data.toDF("vf")
      .select(col("vf").cast("array<float>").as("v"))
      .select(expr("unit_d(v)").as("n"), hof.as("h")).collect()
    assertBitEqual(rows)
  }

  test("edge contract mirrors the HOF: zero vector, empty, null array, null element, NaN, underflow") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (array(0.0d, 0.0d, 0.0d)),
        |  (array(-0.0d, 0.0d)),
        |  (CAST(array() AS ARRAY<DOUBLE>)),
        |  (CAST(NULL AS ARRAY<DOUBLE>)),
        |  (array(1.0d, CAST(NULL AS DOUBLE), 3.0d)),
        |  (array(CAST('NaN' AS DOUBLE), 1.0d)),
        |  (array(1.0E-200d, -1.0E-200d)),
        |  (array(3.0d, 4.0d)) AS t(v)""".stripMargin)
    val rows = df.select(expr("unit_d(v)").as("n"), hof.as("h")).collect()
    assertBitEqual(rows)
    // the shapes themselves, so the contract is pinned even if the
    // HOF reference is ever simplified: a zero vector stays raw, a
    // null element nulls EVERY element (the norm is null), and
    // squares that underflow to 0 hit the n == 0 branch and stay raw
    val n0 = rows(0).getSeq[Double](0)
    assert(n0 == Seq(0.0d, 0.0d, 0.0d))
    assert(rows(2).getSeq[Double](0).isEmpty)
    assert(rows(3).isNullAt(0))
    assert(rows(4).getSeq[Any](0) == Seq(null, null, null))
    assert(rows(6).getSeq[Double](0) == Seq(1.0e-200d, -1.0e-200d))
    assert(rows(7).getSeq[Double](0) == Seq(0.6d, 0.8d))
  }

  test("unit_d stays inside WholeStageCodegen in an assignment-shaped plan") {
    val emb = graft.engine.Tables.table(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding").as("v"))
      .select(expr("unit_d(v)").as("u")).filter(size(col("u")) > 0)
    val plan = emb.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[unit_d""".r.findFirstIn(plan).isDefined,
      s"unit_d projection not codegen-fused:\n$plan")
  }
}
