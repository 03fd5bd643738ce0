package graft.writer

import scala.collection.immutable.ListMap

import org.scalatest.funsuite.AnyFunSuite

import PgSql._

/** Pure contract of the COPY text encoder: escaping, NULL form, and
  * case-for-case agreement with `bindValue`'s coercion lattice. The
  * live half (PgLiveSpec) feeds these exact streams through psql into
  * PG 15.
  */
class PgCopySpec extends AnyFunSuite {

  test("copySql names every column and uses text format") {
    val s = PgCopy.copySql("t x", ListMap("a" -> PgBigInt, "b\"q" -> PgText))
    assert(s == "COPY \"t x\" (\"a\", \"b\"\"q\") FROM STDIN (FORMAT text)")
  }

  test("escaping covers backslash, tab, newline, carriage return") {
    assert(PgCopy.escape("a\\b\tc\nd\re") == "a\\\\b\\tc\\nd\\re")
  }

  test("null encodes as \\N in every destination type") {
    Seq(PgText, PgBigInt, PgDouble, PgBoolean, PgJsonb, PgBytea).foreach(pt =>
      assert(PgCopy.field(null, pt) == "\\N"))
  }

  test("numeric lattice matches bindValue: fractional into bigint is NULL") {
    assert(PgCopy.field(java.lang.Long.valueOf(7L), PgBigInt) == "7")
    assert(PgCopy.field(java.lang.Double.valueOf(7.5), PgBigInt) == "\\N")
    assert(PgCopy.field(java.lang.Double.valueOf(7.5), PgDouble) == "7.5")
    assert(PgCopy.field(java.lang.Long.valueOf(7L), PgText) == "7")
    assert(PgCopy.field(java.lang.Long.valueOf(7L), PgBoolean) == "\\N")
  }

  test("string lattice matches bindValue: parse into numerics, encode into jsonb") {
    assert(PgCopy.field("1e3", PgDouble) == "1000.0") // parsed-then-rendered
    assert(PgCopy.field("abc", PgBigInt) == "\\N")
    assert(PgCopy.field("42", PgBigInt) == "42")
    assert(PgCopy.field("TRUE", PgBoolean) == "true")
    assert(PgCopy.field("1", PgBoolean) == "true")
    assert(PgCopy.field("nope", PgBoolean) == "false")
    assert(PgCopy.field("""{"k": 1}""", PgJsonb) == """{"k": 1}""")
    assert(PgCopy.field("{oops", PgJsonb) == "\"{oops\"") // JSON-encoded
  }

  test("bytea renders hex into a BYTEA dest and base64 elsewhere") {
    val bytes = Array[Byte](0xde.toByte, 0xad.toByte, 0xbe.toByte, 0xef.toByte)
    // the field TEXT is \\x…: COPY unescapes one level to the \x hex form
    assert(PgCopy.field(bytes, PgBytea) == "\\\\xdeadbeef")
    assert(PgCopy.field(bytes, PgText) ==
      java.util.Base64.getEncoder.encodeToString(bytes))
  }

  test("encodeRow tab-separates in schema order and terminates the line") {
    val schema = ListMap("id" -> PgBigInt, "name" -> PgText, "ok" -> PgBoolean)
    assert(PgCopy.encodeRow(Seq(1L, "a\tb", null), schema) == "1\ta\\tb\t\\N\n")
  }
}
