package graft.writer

import scala.collection.immutable.ListMap

import PgSql._

/** `COPY … FROM STDIN (FORMAT text)` encoding — the PostgreSQL bulk
  * fast path for append-mode loads. Pure text-generation functions
  * (the `PgSql` pattern): unit-testable without a server, and the
  * live suite pipes the exact encoded stream through `psql` into the
  * in-sandbox PG 15.
  *
  * Field encoding follows the COPY text format: fields tab-separated,
  * rows newline-terminated, NULL as `\N`, and backslash/tab/newline/
  * carriage-return escaped. Values pass through the SAME coercion
  * lattice as the INSERT path's `PostgresWriter.bindValue`
  * (postgres.rs:775-851) so switching a pipeline from INSERT to COPY
  * can never change what lands in a column — the live fidelity spec
  * pins INSERT-vs-COPY table equality over the lattice's edge cases.
  */
object PgCopy {

  /** The COPY statement for a table+schema; explicit column list so
    * the stream is insensitive to table column order (same contract
    * as `insertSql`).
    */
  def copySql(table: String, schema: ListMap[String, PgType]): String =
    s"COPY ${quoteIdent(table)} (${schema.keys.map(quoteIdent).mkString(", ")}) " +
      "FROM STDIN (FORMAT text)"

  /** COPY text NULL. */
  val Null = "\\N"

  /** Escape one non-null field's text per the COPY text format. */
  private[writer] def escape(s: String): String = {
    val b = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => b.append("\\\\")
        case '\t' => b.append("\\t")
        case '\n' => b.append("\\n")
        case '\r' => b.append("\\r")
        case c => b.append(c)
      }
      i += 1
    }
    b.toString
  }

  private def hex(bytes: Array[Byte]): String = {
    val b = new java.lang.StringBuilder(bytes.length * 2)
    bytes.foreach(x => b.append(f"${x & 0xff}%02x"))
    b.toString
  }

  /** One value → COPY field text, mirroring `bindValue`'s lattice
    * case-for-case: numbers degrade to NULL outside numeric dests,
    * strings parse into numeric/bool dests (unparseable → NULL) and
    * JSON-encode into jsonb, bytea renders `\x` hex into a BYTEA dest
    * and base64 elsewhere. The parsed-then-rendered forms (e.g.
    * "1e3" → "1000.0") match what the bound double would store.
    */
  def field(v: Any, pt: PgType): String = (v, pt) match {
    case (null, _) => Null

    case (b: java.lang.Boolean, PgBoolean) => b.toString
    case (b: java.lang.Boolean, _) => b.toString // text form everywhere else

    case (n: Number, PgBigInt) =>
      if (PostgresWriter.isIntegral(n)) n.longValue().toString else Null
    case (n: Number, PgDouble) => n.doubleValue().toString
    case (n: Number, PgText) => escape(n.toString)
    case (n: Number, PgJsonb) => escape(n.toString)
    case (_: Number, _) => Null

    case (s: String, PgText) => escape(s)
    case (s: String, PgJsonb) =>
      if (PostgresWriter.isValidJson(s)) escape(s)
      else escape(PostgresWriter.jsonString(s))
    case (s: String, PgBigInt) =>
      s.toLongOption.map(_.toString).getOrElse(Null)
    case (s: String, PgDouble) =>
      s.toDoubleOption.map(_.toString).getOrElse(Null)
    case (s: String, PgBoolean) =>
      (s.toLowerCase == "true" || s == "1").toString

    case (b: Array[Byte], PgBytea) => "\\\\x" + hex(b) // field text `\x…`
    case (b: Array[Byte], PgJsonb) =>
      escape(PostgresWriter.jsonString(
        java.util.Base64.getEncoder.encodeToString(b)))
    case (b: Array[Byte], _) =>
      escape(java.util.Base64.getEncoder.encodeToString(b))

    case (other, _) => escape(other.toString)
  }

  /** One row (values in schema column order) → one COPY text line,
    * newline included.
    */
  def encodeRow(values: Seq[Any], schema: ListMap[String, PgType]): String = {
    val it = schema.valuesIterator
    values.map(v => field(v, it.next())).mkString("", "\t", "\n")
  }
}
