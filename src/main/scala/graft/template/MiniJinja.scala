package graft.template

/** A minimal subset of the Jinja expression language the reference
  * embeds (minijinja — /root/reference/src/config/templating.rs:23-87):
  *
  * - `{{ ident }}` — variable substitution (lenient like minijinja's
  *   default undefined: missing variables render empty)
  * - `{% if x %} … {% else %} … {% endif %}` — truthiness branch,
  *   `{% if not x %}` negation
  * - `{% for x in xs %} … {% endfor %}` — iteration over a Seq value
  * - `{{ fn(…) }}` — function-call expressions pass through verbatim
  *   for the caller's capture pass (sink/use_source)
  *
  * Anything else — filters, comparisons, nested attribute access,
  * unknown tags — throws: a construct this subset can't render must
  * not silently survive into the SQL text.
  */
object MiniJinja {

  private sealed trait Node
  private final case class Text(s: String) extends Node
  private final case class Subst(raw: String, expr: String) extends Node
  private final case class Branch(ident: String, negated: Boolean,
      thenBody: List[Node], elseBody: List[Node]) extends Node
  private final case class Loop(bind: String, seqIdent: String,
      body: List[Node]) extends Node

  private val tokenRe = """\{\{.*?\}\}|\{%.*?%\}""".r
  private val identRe = """[A-Za-z_][A-Za-z0-9_]*""".r
  private val ifRe = """if\s+(not\s+)?([A-Za-z_][A-Za-z0-9_]*)""".r
  private val forRe = """for\s+([A-Za-z_][A-Za-z0-9_]*)\s+in\s+([A-Za-z_][A-Za-z0-9_]*)""".r

  def render(template: String, vars: Map[String, Any]): String = {
    val (nodes, rest) = parse(tokenize(template), opener = None)
    require(rest.isEmpty, "unbalanced template blocks")
    val sb = new StringBuilder
    eval(nodes, vars, sb)
    sb.toString
  }

  // split into literal-text and {{…}}/{%…%} tokens, in order
  private def tokenize(s: String): List[String] = {
    val out = List.newBuilder[String]
    var last = 0
    tokenRe.findAllMatchIn(s).foreach { m =>
      if (m.start > last) out += s.substring(last, m.start)
      out += m.matched
      last = m.end
    }
    if (last < s.length) out += s.substring(last)
    out.result()
  }

  /** Recursive-descent over the token list; returns (body, remaining)
    * where remaining starts at the `else`/`endif`/`endfor` token that
    * closed the block (consumed by the caller). `opener` is the block
    * tag being parsed, for unclosed-block error messages (None at the
    * top level).
    */
  private def parse(tokens: List[String],
      opener: Option[String]): (List[Node], List[String]) = {
    val inBlock = opener.isDefined
    val body = List.newBuilder[Node]
    var rest = tokens
    while (rest.nonEmpty) {
      val tok = rest.head
      if (tok.startsWith("{%")) {
        val tag = tok.stripPrefix("{%").stripSuffix("%}").trim
        tag match {
          case ifRe(neg, ident) =>
            val (thenBody, afterThen) = parse(rest.tail, opener = Some(tok))
            afterThen match {
              case h :: t if blockTag(h) == "else" =>
                val (elseBody, afterElse) = parse(t, opener = Some(tok))
                afterElse match {
                  case h2 :: t2 if blockTag(h2) == "endif" =>
                    body += Branch(ident, neg != null, thenBody, elseBody)
                    rest = t2
                  case _ => fail(tok, "missing {% endif %}")
                }
              case h :: t if blockTag(h) == "endif" =>
                body += Branch(ident, neg != null, thenBody, Nil)
                rest = t
              case _ => fail(tok, "missing {% endif %}")
            }
          case forRe(bind, seqIdent) =>
            val (loopBody, afterLoop) = parse(rest.tail, opener = Some(tok))
            afterLoop match {
              case h :: t if blockTag(h) == "endfor" =>
                body += Loop(bind, seqIdent, loopBody)
                rest = t
              case _ => fail(tok, "missing {% endfor %}")
            }
          case "else" | "endif" | "endfor" if inBlock =>
            return (body.result(), rest) // caller consumes
          case other => fail(tok, s"unsupported template tag '$other'")
        }
      } else if (tok.startsWith("{{")) {
        body += Subst(tok, tok.stripPrefix("{{").stripSuffix("}}").trim)
        rest = rest.tail
      } else {
        body += Text(tok)
        rest = rest.tail
      }
    }
    opener.foreach(o => fail(o, "unclosed template block"))
    (body.result(), Nil)
  }

  private def blockTag(tok: String): String =
    if (tok.startsWith("{%")) tok.stripPrefix("{%").stripSuffix("%}").trim else ""

  private def fail(tok: String, msg: String): Nothing =
    throw new IllegalArgumentException(s"$msg (at '$tok')")

  private def truthy(v: Any): Boolean = v match {
    case null | None | false => false
    case "" => false
    case 0 | 0L | 0.0d => false
    case it: Iterable[_] => it.nonEmpty
    case Some(x) => truthy(x)
    case _ => true
  }

  private def eval(nodes: List[Node], vars: Map[String, Any], sb: StringBuilder): Unit =
    nodes.foreach {
      case Text(s) => sb.append(s)
      case Subst(raw, expr) =>
        if (identRe.matches(expr))
          sb.append(vars.get(expr).flatMap(Option(_)).fold("") {
            case Some(x) => x.toString // unwrap Option values
            case None => "" // a bound scala None renders empty, like truthy() treats it
            case v => v.toString
          })
        else if (expr.matches("""[A-Za-z_][A-Za-z0-9_]*\s*\(.*\)"""))
          sb.append(raw) // function call: caller's capture pass owns it
        else fail(raw, s"unsupported template expression '$expr'")
      case Branch(ident, negated, thenBody, elseBody) =>
        val cond = truthy(vars.get(ident).flatMap(Option(_)).orNull)
        eval(if (cond != negated) thenBody else elseBody, vars, sb)
      case Loop(bind, seqIdent, loopBody) =>
        vars.get(seqIdent).flatMap(Option(_)) match {
          case Some(it: Iterable[_]) =>
            it.foreach(item => eval(loopBody, vars + (bind -> item), sb))
          case Some(arr: Array[_]) =>
            arr.foreach(item => eval(loopBody, vars + (bind -> item), sb))
          case Some(other) => throw new IllegalArgumentException(
            s"'$seqIdent' is not iterable (${other.getClass.getSimpleName})")
          case None => () // lenient: missing sequence renders nothing
        }
    }
}
