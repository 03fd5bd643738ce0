package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native ADC lookup sum must agree bit-for-bit with the HOF
  * form it replaced (`aggregate(zip_with(codes, sequence, …))`) —
  * that identity is what keeps `x_knn_pq_rerank`'s brute-oracle
  * contract intact after the codegen swap.
  */
class AdcDotSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private val k = 32

  test("adc_dot equals the HOF aggregate(zip_with) fold bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val data = Seq.fill(300)((
      Seq.fill(16)(rnd.nextInt(k)),
      Seq.fill(16 * k)(rnd.nextDouble() * 2 - 1)))
    val hof = aggregate(
      zip_with(col("codes"), sequence(lit(0), lit(15)),
        (c, s) => element_at(col("tab"), s * k + c + 1)),
      lit(0.0d), (a, x) => a + x)
    val rows = data.toDF("codes", "tab")
      .select(
        call_function("adc_dot", col("codes"), col("tab"), lit(k)).as("native"),
        hof.as("hof"))
      .collect()
    rows.foreach { r =>
      // bit-level comparison: the fold order must be identical, not
      // merely close
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }

  test("adc_dot nulls on null inputs, out-of-range codes, and short tables") {
    import spark.implicits._
    val tab = Seq.fill(2 * k)(1.0d)
    val rows = Seq(
      (Seq(0, 1), tab, "ok"),
      (Seq(0, k), tab, "code >= k"),
      (Seq(-1, 0), tab, "negative code"),
      (Seq(0, 1, 2), tab, "table too short for 3 subspaces"))
      .toDF("codes", "tab", "why")
      .select(col("why"),
        call_function("adc_dot", col("codes"), col("tab"), lit(k)).as("d"))
      .collect()
    val byWhy = rows.map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(!byWhy("ok"))
    assert(byWhy("code >= k"))
    assert(byWhy("negative code"))
    assert(byWhy("table too short for 3 subspaces"))
    // null element in codes → null
    val nullElem = Seq((Seq[Integer](0, null), tab)).toDF("codes", "tab")
      .select(call_function("adc_dot", col("codes"), col("tab"), lit(k)).as("d"))
      .collect()(0)
    assert(nullElem.isNullAt(0))
  }
}
