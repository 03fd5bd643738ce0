package graft.writer

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.PreparedStatement

import scala.collection.immutable.ListMap
import scala.collection.mutable

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Bind-value coercion lattice (postgres.rs:775-851) without a live
  * server: a recording PreparedStatement proxy captures every
  * setLong/setDouble/setBoolean/setString/setObject call.
  */
class PostgresBindSpec extends AnyFunSuite {

  private def recordingStatement(): (PreparedStatement, mutable.Buffer[(String, Int, Any)]) = {
    val calls = mutable.Buffer.empty[(String, Int, Any)]
    val handler = new InvocationHandler {
      override def invoke(proxy: Any, m: Method, args: Array[AnyRef]): AnyRef = {
        if (m.getName.startsWith("set") && args != null && args.length == 2)
          calls += ((m.getName, args(0).asInstanceOf[Int], args(1)))
        null
      }
    }
    val st = Proxy.newProxyInstance(classOf[PreparedStatement].getClassLoader,
      Array(classOf[PreparedStatement]), handler).asInstanceOf[PreparedStatement]
    (st, calls)
  }

  private def bind(v: Any, pt: PgSql.PgType): (String, Any) = {
    val (st, calls) = recordingStatement()
    PostgresWriter.bindValue(st, 1, v, pt)
    assert(calls.size == 1)
    (calls.head._1, calls.head._3)
  }

  test("string parses into numeric dest columns; unparseable binds NULL") {
    assert(bind("42", PgSql.PgBigInt) == (("setLong", 42L)))
    assert(bind("4.5", PgSql.PgDouble) == (("setDouble", 4.5d)))
    assert(bind("nope", PgSql.PgBigInt) == (("setObject", null)))
    assert(bind("nope", PgSql.PgDouble) == (("setObject", null)))
  }

  test("string coerces into boolean dest: 'true'/'1' true, else false") {
    assert(bind("TRUE", PgSql.PgBoolean) == (("setBoolean", java.lang.Boolean.TRUE)))
    assert(bind("1", PgSql.PgBoolean) == (("setBoolean", java.lang.Boolean.TRUE)))
    assert(bind("no", PgSql.PgBoolean) == (("setBoolean", java.lang.Boolean.FALSE)))
  }

  test("boolean binds native only into boolean dest, stringifies elsewhere") {
    assert(bind(java.lang.Boolean.TRUE, PgSql.PgBoolean) == (("setBoolean", java.lang.Boolean.TRUE)))
    assert(bind(java.lang.Boolean.TRUE, PgSql.PgText) == (("setString", "true")))
    assert(bind(java.lang.Boolean.FALSE, PgSql.PgBigInt) == (("setString", "false")))
  }

  test("numbers: integral into BigInt, fractional into BigInt degrades to NULL") {
    assert(bind(java.lang.Long.valueOf(7L), PgSql.PgBigInt) == (("setLong", 7L)))
    assert(bind(java.lang.Integer.valueOf(7), PgSql.PgBigInt) == (("setLong", 7L)))
    assert(bind(java.lang.Double.valueOf(1.5), PgSql.PgBigInt) == (("setObject", null)))
    assert(bind(java.lang.Long.valueOf(7L), PgSql.PgDouble) == (("setDouble", 7.0d)))
    assert(bind(java.lang.Double.valueOf(1.5), PgSql.PgText) == (("setString", "1.5")))
    assert(bind(java.lang.Double.valueOf(1.5), PgSql.PgBoolean) == (("setObject", null)))
  }

  test("jsonb dest: scalars JSON-encode, pre-serialized JSON passes through") {
    assert(bind("plain", PgSql.PgJsonb) == (("setString", "\"plain\"")))
    assert(bind("""{"k":1}""", PgSql.PgJsonb) == (("setString", """{"k":1}""")))
    assert(bind("[1,2]", PgSql.PgJsonb) == (("setString", "[1,2]")))
    assert(bind(java.lang.Long.valueOf(3L), PgSql.PgJsonb) == (("setString", "3")))
  }

  test("null binds NULL regardless of dest type") {
    for (pt <- Seq(PgSql.PgText, PgSql.PgBigInt, PgSql.PgDouble, PgSql.PgBoolean, PgSql.PgJsonb))
      assert(bind(null, pt) == (("setObject", null)))
  }

  test("bindRows flattens rows column-major with running parameter index") {
    val (st, calls) = recordingStatement()
    val schema = ListMap("a" -> (PgSql.PgBigInt: PgSql.PgType), "b" -> (PgSql.PgText: PgSql.PgType))
    PostgresWriter.bindRows(st, Seq(Row(1L, "x"), Row(2L, "y")), schema)
    assert(calls.toSeq == Seq(
      ("setLong", 1, 1L), ("setString", 2, "x"),
      ("setLong", 3, 2L), ("setString", 4, "y")))
  }

  test("batch size caps at 65535 bind parameters (wide-table protocol limit)") {
    assert(PostgresWriter.effectiveBatch(5000, 2) == 5000)
    assert(PostgresWriter.effectiveBatch(5000, 14) == 65535 / 14)
    assert(PostgresWriter.effectiveBatch(5000, 100000) == 1)
  }

  test("binary binds native into BYTEA, base64 text elsewhere") {
    val bytes = Array[Byte](1, 2, 3)
    val (n, v) = bind(bytes, PgSql.PgBytea)
    assert(n == "setBytes" && java.util.Arrays.equals(v.asInstanceOf[Array[Byte]], bytes))
    assert(bind(bytes, PgSql.PgText) == (("setString", "AQID")))
    assert(bind(bytes, PgSql.PgJsonb) == (("setString", "\"AQID\"")))
  }

  test("merge version gate needs 9.5+: 9.4 rejected, 9.5/10 accepted") {
    assert(!PostgresWriter.supportsUpsert(9, 4))
    assert(PostgresWriter.supportsUpsert(9, 5))
    assert(PostgresWriter.supportsUpsert(10, 0))
    assert(!PostgresWriter.supportsUpsert(8, 9))
  }
}
