package graft.writer

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.PreparedStatement

import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the COPY↔INSERT fidelity claim: for ARBITRARY
  * values and every destination type, `PgCopy.field` and
  * `PostgresWriter.bindValue` must traverse the coercion lattice
  * identically — NULL together, and when non-null the COPY text must
  * parse back to exactly the value the JDBC bind would send. The
  * example-based specs pin the known edge cases; this one closes the
  * space between them.
  */
class PgCopyPropertySpec extends AnyFunSuite {

  private def bindOutcome(v: Any, pt: PgSql.PgType): (String, Any) = {
    val calls = mutable.Buffer.empty[(String, Any)]
    val handler = new InvocationHandler {
      override def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef = {
        if (m.getName.startsWith("set") && args != null && args.length == 2)
          calls += ((m.getName, args(1)))
        null
      }
    }
    val st = Proxy.newProxyInstance(classOf[PreparedStatement].getClassLoader,
      Array(classOf[PreparedStatement]), handler).asInstanceOf[PreparedStatement]
    PostgresWriter.bindValue(st, 1, v, pt)
    calls.head
  }

  /** Inverse of PgCopy.escape — what the server reconstructs. */
  private def unescape(s: String): String = {
    val b = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => b.append('\\')
          case 't' => b.append('\t')
          case 'n' => b.append('\n')
          case 'r' => b.append('\r')
          case c => b.append('\\').append(c)
        }
        i += 2
      } else { b.append(s.charAt(i)); i += 1 }
    }
    b.toString
  }

  private val genValue: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    Gen.oneOf(true, false).map(java.lang.Boolean.valueOf),
    Gen.chooseNum(Long.MinValue, Long.MaxValue).map(java.lang.Long.valueOf),
    Gen.chooseNum(Int.MinValue, Int.MaxValue).map(java.lang.Integer.valueOf),
    Gen.oneOf(
      Gen.chooseNum(-1e18, 1e18),
      Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
        0.0, -0.0, 1.5e-300)).flatMap(g => g).map(java.lang.Double.valueOf),
    // strings biased toward the hazardous shapes: numerics, booleans,
    // JSON-ish, and escape-heavy text
    Gen.oneOf(
      Gen.asciiPrintableStr,
      Gen.listOf(Gen.oneOf('a', '\\', '\t', '\n', '\r', '"', 'é', '漢'))
        .map(_.mkString),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(_.toString),
      Gen.chooseNum(-1e9, 1e9).map(_.toString),
      Gen.oneOf("true", "TRUE", "1", "0", "false", "nope", "",
        """{"k": 1}""", "{oops", "[1, 2]", "null")),
    Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue)).map(_.toArray))

  private val genType: Gen[PgSql.PgType] = Gen.oneOf(
    PgSql.PgText, PgSql.PgBoolean, PgSql.PgBigInt,
    PgSql.PgDouble, PgSql.PgJsonb, PgSql.PgBytea)

  test("COPY field and JDBC bind traverse the lattice identically (property)") {
    val prop = Prop.forAll(genValue, genType) { (v, pt) =>
      val field = PgCopy.field(v, pt)
      val (setter, bound) = bindOutcome(v, pt)
      val isNullBind = setter == "setObject" && bound == null
      if (field == PgCopy.Null) isNullBind
      else if (isNullBind) false
      else (setter, pt) match {
        case ("setLong", _) =>
          field.toLong == bound.asInstanceOf[java.lang.Long].longValue()
        case ("setDouble", _) =>
          // bit-level: the COPY text must parse to the exact double
          // the bind would send (NaN included)
          java.lang.Double.doubleToLongBits(field.toDouble) ==
            java.lang.Double.doubleToLongBits(
              bound.asInstanceOf[java.lang.Double].doubleValue())
        case ("setBoolean", _) =>
          field == bound.asInstanceOf[java.lang.Boolean].toString
        case ("setBytes", PgSql.PgBytea) =>
          field == "\\\\x" + bound.asInstanceOf[Array[Byte]]
            .map(b => f"${b & 0xff}%02x").mkString
        case ("setString", _) =>
          unescape(field) == bound.asInstanceOf[String]
        case ("setObject", _) =>
          // the lattice's passthrough arm (e.g. a string into a BYTEA
          // dest): both sides forward the value's text verbatim and
          // let the server reject it
          unescape(field) == bound.toString
        case _ => false
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }
}
