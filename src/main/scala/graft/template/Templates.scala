package graft.template

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.matching.Regex

/** SQL-module templating (SURVEY A26-A28).
  *
  * The reference renders Minijinja templates where exactly two template
  * functions exist (/root/reference/src/config/templating.rs:31-55):
  * `{{ sink(name="X") }}` records the sink and renders to "", and
  * `{{ use_source("Y") }}` records the source and renders to the source
  * name. Captures reset per render. Beyond the two functions — the only
  * surface the reference's own tests exercise — a minimal expression
  * subset of the embedded engine is supported ([[MiniJinja]]):
  * `{{ var }}` substitution, `{% if %}`/`{% else %}`/`{% endif %}`
  * truthiness branches, and `{% for x in xs %}` loops. Any OTHER
  * template construct raises instead of silently passing through as
  * SQL text (the reference would have rendered it; emitting it raw
  * would corrupt the query).
  */
object Templates {

  final case class Rendered(name: String, sql: String,
      sink: Option[String], source: Option[String])

  private val sinkRe: Regex =
    """\{\{\s*sink\s*\(\s*name\s*=\s*"([^"]*)"\s*\)\s*\}\}""".r
  private val useSourceRe: Regex =
    """\{\{\s*use_source\s*\(\s*"([^"]*)"\s*\)\s*\}\}""".r

  /** Render one module: expand the expression subset with `vars`,
    * capture sink/source, substitute the template calls (sink → empty
    * string, use_source → the source name), and reject any template
    * syntax still unrendered at the end.
    */
  def render(name: String, template: String,
      vars: Map[String, Any] = Map.empty): Rendered = {
    val expanded = MiniJinja.render(template, vars)
    var sink: Option[String] = None
    var source: Option[String] = None
    val afterSink = sinkRe.replaceAllIn(expanded, m => {
      sink = Some(m.group(1)); ""
    })
    val sql = useSourceRe.replaceAllIn(afterSink, m => {
      source = Some(m.group(1)); Regex.quoteReplacement(m.group(1))
    })
    if (sql.contains("{{") || sql.contains("{%"))
      throw new IllegalArgumentException(
        s"module '$name' contains unsupported template syntax after rendering: " +
          sql.linesIterator.find(l => l.contains("{{") || l.contains("{%"))
            .getOrElse("").trim)
    Rendered(name, sql.trim.stripSuffix(";"), sink, source)
  }

  /** Recursive module discovery: `*.sql` case-insensitive, sorted
    * relative paths (templating.rs:89-127).
    */
  def listSqlModules(root: Path): Seq[String] = {
    if (!Files.isDirectory(root)) return Seq.empty
    val stream = Files.walk(root)
    try {
      stream.iterator().asScala
        .filter(p => Files.isRegularFile(p)
          && p.getFileName.toString.toLowerCase.endsWith(".sql"))
        .map(p => root.relativize(p).toString)
        .toSeq.sorted
    } finally stream.close()
  }

  def listSqlModules(root: String): Seq[String] = listSqlModules(Paths.get(root))

  /** Source-name → table rewrite (A28). The reference does a raw
    * `sql.replace(name, dest)` (/root/reference/src/cmd/mod.rs:146),
    * which can corrupt string literals; we rewrite only identifier
    * tokens outside string literals — observable behavior is identical
    * for well-formed modules (divergence documented in SURVEY §7.3).
    *
    * Both quote forms are literals to the engine that will run the
    * SQL: single quotes always, double quotes because Spark's default
    * (non-ANSI `doubleQuotedIdentifiers`) parses them as strings too —
    * rewriting inside either would corrupt data. Literal scanning
    * honors backslash escapes (Spark's default string escape) and the
    * doubled-quote escape. Dotted `from` names (schema-qualified dest
    * tables) match as the full `part.part` token sequence.
    */
  def rewriteIdentifier(sql: String, from: String, to: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = sql.length
    def isIdentChar(c: Char) = c.isLetterOrDigit || c == '_'
    val fromParts = from.split('.').toSeq
    // copy a quoted literal verbatim: backslash escapes any next char,
    // a doubled quote is an escaped quote, anything else ends at the
    // closing quote
    def copyLiteral(quote: Char): Unit = {
      val start = i
      i += 1
      var done = false
      while (i < n && !done) {
        val ch = sql.charAt(i)
        if (ch == '\\') i += 2
        else if (ch == quote) {
          if (i + 1 < n && sql.charAt(i + 1) == quote) i += 2
          else { i += 1; done = true }
        } else i += 1
      }
      sb.append(sql.substring(start, math.min(i, n)))
    }
    // after `word` matched fromParts.head, try to consume ".part" for
    // each remaining part; returns the end index past the full dotted
    // name, or -1 if the sequence doesn't match
    def matchDotted(afterHead: Int): Int = {
      var j = afterHead
      for (part <- fromParts.tail) {
        if (j >= n || sql.charAt(j) != '.') return -1
        j += 1
        val ws = j
        while (j < n && isIdentChar(sql.charAt(j))) j += 1
        if (sql.substring(ws, j) != part) return -1
      }
      j
    }
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') copyLiteral(c)
      else if (isIdentChar(c)) {
        val start = i
        while (i < n && isIdentChar(sql.charAt(i))) i += 1
        val word = sql.substring(start, i)
        if (word == fromParts.head) {
          if (fromParts.size == 1) sb.append(to)
          else matchDotted(i) match {
            case -1 => sb.append(word)
            case end => sb.append(to); i = end
          }
        } else sb.append(word)
      } else {
        sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
}
