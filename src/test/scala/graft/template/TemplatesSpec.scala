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
}
