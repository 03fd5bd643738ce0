package graft.template

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors /root/reference/tests/config/templating_tests.rs. */
class TemplatesSpec extends AnyFunSuite {

  test("sink and use_source capture (templating_tests.rs:21-60)") {
    val r = Templates.render("m.sql",
      """{{ sink(name="postgres_sink") }}
        |select * from {{ use_source("peopleforce_employees") }};""".stripMargin)
    assert(r.sink.contains("postgres_sink"))
    assert(r.source.contains("peopleforce_employees"))
    assert(r.sql == "select * from peopleforce_employees")
  }

  test("captures are per-render (templating_tests.rs:61-88)") {
    val r1 = Templates.render("a.sql",
      """{{ sink(name="s1") }} select 1 from {{ use_source("x") }}""")
    val r2 = Templates.render("b.sql", "select 2")
    assert(r1.sink.contains("s1") && r1.source.contains("x"))
    assert(r2.sink.isEmpty && r2.source.isEmpty)
  }

  test("module discovery: recursive, case-insensitive, sorted (templating_tests.rs:90-155)") {
    val dir = Files.createTempDirectory("modules")
    Files.createDirectories(dir.resolve("sub"))
    Files.writeString(dir.resolve("b.sql"), "select 1")
    Files.writeString(dir.resolve("A.SQL"), "select 2")
    Files.writeString(dir.resolve("sub/c.sql"), "select 3")
    Files.writeString(dir.resolve("notes.txt"), "not a module")
    assert(Templates.listSqlModules(dir) == Seq("A.SQL", "b.sql", "sub/c.sql"))
  }

  test("variable substitution: defined renders, undefined is lenient-empty") {
    val r = Templates.render("v.sql",
      "select * from {{ tbl }} where region = '{{ region }}'{{ missing }}",
      Map("tbl" -> "users", "region" -> "eu"))
    assert(r.sql == "select * from users where region = 'eu'")
  }

  test("a variable bound to None renders empty, consistent with truthiness") {
    val r = Templates.render("v.sql",
      "a{{ opt }}b{% if opt %}X{% endif %}",
      Map("opt" -> None))
    assert(r.sql == "ab")
    // Some values unwrap
    val s = Templates.render("v.sql", "{{ opt }}", Map("opt" -> Some("x")))
    assert(s.sql == "x")
  }

  test("if/else renders the truthy branch; not negates") {
    def render(vars: Map[String, Any]) = Templates.render("c.sql",
      "select a{% if extended %}, b{% else %}, c{% endif %} from t" +
        "{% if not extended %} limit 10{% endif %}", vars).sql
    assert(render(Map("extended" -> true)) == "select a, b from t")
    assert(render(Map("extended" -> false)) == "select a, c from t limit 10")
    assert(render(Map.empty) == "select a, c from t limit 10") // undefined = falsy
  }

  test("for loop iterates a bound sequence") {
    val r = Templates.render("f.sql",
      "select id{% for c in cols %}, {{ c }}{% endfor %} from t",
      Map("cols" -> Seq("name", "age")))
    assert(r.sql == "select id, name, age from t")
  }

  test("captures still work inside rendered branches") {
    val r = Templates.render("m.sql",
      """{% if prod %}{{ sink(name="pg") }}{% endif %}
        |select * from {{ use_source("src") }}""".stripMargin,
      Map("prod" -> true))
    assert(r.sink.contains("pg"))
    assert(r.sql == "select * from src")
  }

  test("blocks nest: if inside for, for inside if") {
    val r = Templates.render("n.sql",
      "select 1{% for c in cols %}{% if keep %}, {{ c }}{% endif %}{% endfor %}" +
        "{% if keep %}{% for c in cols %} /*{{ c }}*/{% endfor %}{% endif %}",
      Map("cols" -> Seq("a", "b"), "keep" -> true))
    assert(r.sql == "select 1, a, b /*a*/ /*b*/")
  }

  test("unbalanced blocks raise named errors") {
    val unclosed = intercept[IllegalArgumentException](
      Templates.render("u1.sql", "{% if x %}never closed"))
    assert(unclosed.getMessage.contains("unclosed template block")
      && unclosed.getMessage.contains("if x"))
    assert(intercept[IllegalArgumentException](
      Templates.render("u2.sql", "stray {% endfor %}")
    ).getMessage.contains("unsupported template tag"))
  }

  test("unsupported template syntax raises instead of passing through") {
    // a filter expression the subset can't render must not survive as SQL
    assert(intercept[IllegalArgumentException](
      Templates.render("bad.sql", "select {{ x | upper }} from t")
    ).getMessage.contains("unsupported template expression"))
    assert(intercept[IllegalArgumentException](
      Templates.render("bad2.sql", "{% macro foo() %}x{% endmacro %}")
    ).getMessage.contains("unsupported template tag"))
    // an unknown function-call expression passes the subset untouched
    // but must fail the post-render completeness check
    assert(intercept[IllegalArgumentException](
      Templates.render("bad3.sql", "select {{ mystery(1) }}")
    ).getMessage.contains("unsupported template syntax"))
  }

  test("identifier rewrite replaces only identifier tokens") {
    val sql = "SELECT name, 'posts are great' AS c FROM posts WHERE posts.id > 1"
    val out = Templates.rewriteIdentifier(sql, "posts", "posts_abc123")
    assert(out ==
      "SELECT name, 'posts are great' AS c FROM posts_abc123 WHERE posts_abc123.id > 1")
  }

  test("identifier rewrite does not touch partial words or escaped quotes") {
    assert(Templates.rewriteIdentifier(
      "SELECT reposts FROM posts", "posts", "u") == "SELECT reposts FROM u")
    assert(Templates.rewriteIdentifier(
      "SELECT 'it''s posts' FROM posts", "posts", "u") ==
      "SELECT 'it''s posts' FROM u")
  }

  test("identifier rewrite leaves double-quoted and backslash-escaped literals alone") {
    // double quotes are STRING LITERALS to Spark's default parser —
    // rewriting inside them would silently corrupt data
    assert(Templates.rewriteIdentifier(
      """SELECT * FROM posts WHERE tag = "posts"""", "posts", "u") ==
      """SELECT * FROM u WHERE tag = "posts"""")
    // backslash-escaped quote must not end the literal early
    assert(Templates.rewriteIdentifier(
      """SELECT 'don\'t posts' FROM posts""", "posts", "u") ==
      """SELECT 'don\'t posts' FROM u""")
  }

  test("identifier rewrite matches a schema-qualified (dotted) name as a unit") {
    assert(Templates.rewriteIdentifier(
      "SELECT * FROM analytics.daily WHERE analytics.daily.id > 1",
      "analytics.daily", "v_123") ==
      "SELECT * FROM v_123 WHERE v_123.id > 1")
    // the head part alone is not the dotted name
    assert(Templates.rewriteIdentifier(
      "SELECT analytics FROM analytics.other",
      "analytics.daily", "v") == "SELECT analytics FROM analytics.other")
  }
}
