package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Interpreted-eval property pins for the PQ expressions against
  * plain-Scala reference folds — semantics independent of any plan:
  * argmin ties break to the LOWER code, accumulation is the
  * sequential left fold, geometry violations yield null. (The
  * plan-level specs separately pin codegen == interpreted == HOF on
  * the corpus; this one covers arbitrary geometries and values.)
  */
class PqExprPropertySpec extends AnyFunSuite {

  private def evalEncode(v: Seq[Float], cb: Seq[Double], m: Int): Any =
    PqEncode(
      Literal.create(v, ArrayType(FloatType, containsNull = false)),
      Literal.create(cb, ArrayType(DoubleType, containsNull = false)),
      Literal(m)).eval(null)

  private def evalAdc(codes: Seq[Int], tab: Seq[Double], k: Int): Any =
    AdcDot(
      Literal.create(codes, ArrayType(IntegerType, containsNull = false)),
      Literal.create(tab, ArrayType(DoubleType, containsNull = false)),
      Literal(k)).eval(null)

  /** Reference argmin: identical accumulation order and strict-< tie
    * break, written independently of the expression's loop.
    */
  private def refEncode(v: Seq[Float], cb: Seq[Double], m: Int): Seq[Int] = {
    val subDim = v.length / m
    val k = cb.length / (m * subDim)
    (0 until m).map { s =>
      (0 until k).minBy { c =>
        // minBy keeps the FIRST minimum for ties, matching strict <
        var d = 0.0d
        var j = 0
        while (j < subDim) {
          val diff = v(s * subDim + j).toDouble - cb((s * k + c) * subDim + j)
          d += diff * diff
          j += 1
        }
        d
      }
    }
  }

  private val genGeometry: Gen[(Int, Int, Int)] = for {
    m <- Gen.oneOf(1, 2, 4, 8, 16)
    subDim <- Gen.oneOf(1, 2, 4)
    k <- Gen.chooseNum(1, 8)
  } yield (m, subDim, k)

  test("pq_encode equals the reference argmin for arbitrary geometries (property)") {
    val prop = Prop.forAll(genGeometry.flatMap { case (m, subDim, k) =>
      for {
        v <- Gen.listOfN(m * subDim, Gen.chooseNum(-8f, 8f))
        // small value domain on purpose: forces distance TIES so the
        // lower-code break is actually exercised
        cb <- Gen.listOfN(m * k * subDim, Gen.oneOf(-1.0d, 0.0d, 1.0d, 0.5d))
      } yield (v, cb, m)
    }) { case (v, cb, m) =>
      val got = evalEncode(v, cb, m).asInstanceOf[ArrayData].toIntArray().toSeq
      got == refEncode(v, cb, m)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(1000), prop)
    assert(res.passed, res.status.toString)
  }

  test("pq_encode nulls on geometry violations") {
    assert(evalEncode(Seq.fill(5)(1f), Seq.fill(8)(0d), 2) == null) // 5 % 2 != 0
    assert(evalEncode(Seq.fill(4)(1f), Seq.fill(7)(0d), 2) == null) // cb not multiple
    assert(evalEncode(Seq.fill(4)(1f), Seq.empty, 2) == null)
    assert(evalEncode(Seq.fill(4)(1f), Seq.fill(8)(0d), 0) == null)
    // the empty vector passes `dim % m == 0` with subDim = 0 and then
    // divided by zero in `cbn % (m * subDim)` before the round-10
    // guard — it's a geometry violation, not a crash
    assert(evalEncode(Seq.empty, Seq.fill(8)(0d), 2) == null)
  }

  test("pq_encode empty vector nulls (not crashes) through the CODEGEN path too") {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val out = Seq((1, Seq.empty[Float]), (2, Seq(1f, 2f, 3f, 4f)))
      .toDF("id", "v")
      .select(col("id"),
        call_function("pq_encode", col("v"),
          typedLit(Seq.fill(8)(0.5d)), lit(2)).as("codes"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(1), "empty vector must encode as null")
    assert(!out(1).isNullAt(1), "a well-formed vector still encodes")
  }

  test("adc_dot equals the sequential lookup fold (property)") {
    val prop = Prop.forAll(for {
      m <- Gen.chooseNum(1, 16)
      k <- Gen.chooseNum(1, 32)
      codes <- Gen.listOfN(m, Gen.chooseNum(0, k - 1))
      tab <- Gen.listOfN(m * k, Gen.chooseNum(-1e6, 1e6))
    } yield (codes, tab, k)) { case (codes, tab, k) =>
      val expect = codes.zipWithIndex
        .foldLeft(0.0d) { case (acc, (c, s)) => acc + tab(s * k + c) }
      java.lang.Double.doubleToLongBits(
        evalAdc(codes, tab, k).asInstanceOf[Double]) ==
        java.lang.Double.doubleToLongBits(expect)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(1000), prop)
    assert(res.passed, res.status.toString)
  }

  test("adc_dot nulls on out-of-range codes or short tables") {
    assert(evalAdc(Seq(0, 5), Seq.fill(10)(1d), 5) == null) // code == k
    assert(evalAdc(Seq(-1), Seq.fill(5)(1d), 5) == null)
    assert(evalAdc(Seq(0, 0, 0), Seq.fill(5)(1d), 5) == null) // table short
  }

  private def evalPack(codes: Seq[Int]): Any =
    PqPack(Literal.create(codes,
      ArrayType(IntegerType, containsNull = false))).eval(null)

  private def evalAdcPacked(packed: Array[Byte], tab: Seq[Double], k: Int): Any =
    AdcDotPacked(
      Literal.create(packed, org.apache.spark.sql.types.BinaryType),
      Literal.create(tab, ArrayType(DoubleType, containsNull = false)),
      Literal(k)).eval(null)

  test("adc_dot_packed(pq_pack(codes)) is bit-identical to adc_dot(codes) (property)") {
    val prop = Prop.forAll(for {
      m <- Gen.chooseNum(1, 16)
      k <- Gen.chooseNum(1, 32)
      codes <- Gen.listOfN(m, Gen.chooseNum(0, k - 1))
      tab <- Gen.listOfN(m * k, Gen.chooseNum(-1e6, 1e6))
    } yield (codes, tab, k)) { case (codes, tab, k) =>
      val packed = evalPack(codes).asInstanceOf[Array[Byte]]
      java.lang.Double.doubleToLongBits(
        evalAdcPacked(packed, tab, k).asInstanceOf[Double]) ==
        java.lang.Double.doubleToLongBits(
          evalAdc(codes, tab, k).asInstanceOf[Double])
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(1000), prop)
    assert(res.passed, res.status.toString)
  }

  test("pq_pack nulls on codes a byte cannot round-trip; adc_dot_packed range-checks") {
    assert(evalPack(Seq(0, 256)) == null)
    assert(evalPack(Seq(-1)) == null)
    assert(evalPack(Seq(0, 255)).asInstanceOf[Array[Byte]].toSeq ==
      Seq(0.toByte, 255.toByte))
    // a packed code >= k must null, not read past the subspace slot
    // (255 & 0xFF = 255 >= k = 5)
    assert(evalAdcPacked(Array(255.toByte), Seq.fill(5)(1d), 5) == null)
    // table shorter than m*k: lookup past the end nulls
    assert(evalAdcPacked(Array(0.toByte, 0.toByte, 0.toByte),
      Seq.fill(5)(1d), 5) == null)
  }

  test("packed ADC scoring survives the CODEGEN path over a real join shape") {
    val spark = graft.SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val k = 4
    val rows = Seq((1, Seq(0, 1, 2, 3)), (2, Seq(3, 2, 1, 0)))
    val tab = Seq.tabulate(16)(i => i * 0.25d)
    val out = rows.toDF("id", "codes")
      .select(col("id"),
        call_function("adc_dot", col("codes"), typedLit(tab), lit(k)).as("a"),
        call_function("adc_dot_packed",
          call_function("pq_pack", col("codes")), typedLit(tab), lit(k)).as("p"))
      .filter(col("a") === col("p"))
    assert(out.count() == 2, "codegen packed ADC must equal int-array ADC")
  }
}
