package graft.writer

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.PreparedStatement

import scala.collection.immutable.ListMap
import scala.collection.mutable

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the round-13 rendering seams:
  *
  *  - the BigQuery size estimate must EQUAL the escaped literal's
  *    UTF-8 byte length for arbitrary strings (an under-count can
  *    breach the 1 MB statement cap — chars undercount CJK text 3x;
  *    a systematic over-count shrinks batches);
  *  - the ClickHouse HTTP JSONEachRow rendering must traverse the
  *    coercion lattice exactly like the JDBC bind path — NULL
  *    together, same value otherwise — for arbitrary values, so the
  *    two transports can never land different data from one input.
  */
class WriterRenderPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  // strings heavy in the interesting classes: quotes, backslashes,
  // control chars (incl. the \uXXXX six-char expansions), unicode
  private val trickyString: Gen[String] = Gen.listOf(Gen.frequency(
    5 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('\'', '"', '\\', '\n', '\r', '\t'),
    2 -> Gen.choose(0.toChar, 31.toChar),
    1 -> Gen.oneOf('é', 'ß', '中', ' '))).map(_.mkString)

  test("property: BigQuery rendered-size estimate equals the escaped UTF-8 length exactly") {
    // the wire cap is on statement BYTES — a char count undercounts
    // CJK text 3x; exact equality pinned for the whole BMP, and for
    // astral chars (surrogate pairs) conservative over-count only
    check(Prop.forAll(trickyString) { s =>
      val est = BigQueryWriter.renderedStringBytes(s)
      val actual = BqSql.escapeString(s)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8).length
      est == actual
    })
  }

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper

  private def jdbcOutcome(v: Any, ct: ChSql.ChType): Option[Any] = {
    val calls = mutable.Buffer.empty[Any]
    val handler = new InvocationHandler {
      override def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef = {
        if (m.getName.startsWith("set") && args != null && args.length == 2)
          calls += args(1)
        null
      }
    }
    val st = Proxy.newProxyInstance(classOf[PreparedStatement].getClassLoader,
      Array(classOf[PreparedStatement]), handler).asInstanceOf[PreparedStatement]
    ClickHouseWriter.bindValue(st, 1, v, ct)
    calls.headOption.filter(_ != null)
  }

  private def httpOutcome(v: Any, ct: ChSql.ChType): Option[Any] = {
    val line = ChSql.jsonEachRow(ListMap("c" -> ct), Seq(Seq(v))).trim
    val node = mapper.readTree(line).get("c")
    if (node == null || node.isNull) None
    else Some(ct match {
      case ChSql.ChString => node.asText()
      case ChSql.ChBool => java.lang.Boolean.valueOf(node.asBoolean())
      case ChSql.ChInt64 => java.lang.Long.valueOf(node.asLong())
      case ChSql.ChFloat64 => java.lang.Double.valueOf(node.asDouble())
    })
  }

  private val anyValue: Gen[Any] = Gen.oneOf(
    Gen.const(null),
    trickyString,
    Gen.long.map(l => (l: java.lang.Long)),
    Gen.chooseNum(-1e12, 1e12).map(d => (d: java.lang.Double)),
    Gen.oneOf(Seq[Any](Double.NaN, Double.PositiveInfinity)),
    Gen.oneOf(true, false).map(b => (b: java.lang.Boolean)),
    Gen.numStr.suchThat(_.length < 15), // numeric-looking strings
    Gen.oneOf("true", "false", "1", "0", "2.5", "-3", "x"))

  test("property: ClickHouse HTTP JSONEachRow values equal the JDBC binds per destination") {
    val types = Seq(ChSql.ChString, ChSql.ChBool, ChSql.ChInt64, ChSql.ChFloat64)
    check(Prop.forAll(anyValue, Gen.oneOf(types)) { (v, ct) =>
      val jdbc = jdbcOutcome(v, ct).map {
        case l: java.lang.Long => l
        case i: java.lang.Integer => java.lang.Long.valueOf(i.longValue())
        case d: java.lang.Double
            if !java.lang.Double.isFinite(d) && ct == ChSql.ChFloat64 =>
          null // JSON has no NaN/Inf: the HTTP path maps these to null
        case other => other
      }.filter(_ != null)
      val http = httpOutcome(v, ct)
      // both transports must agree on null-vs-value, and on the value
      (jdbc, http) match {
        case (None, None) => true
        case (Some(a), Some(b)) => a == b
        case _ => false
      }
    })
  }
}
