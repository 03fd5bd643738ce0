package graft.config

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** `.env` loading — parity with the reference's `dotenvy::dotenv()`
  * startup (/root/reference/src/main.rs:11) and the env-indirection
  * config tests (/root/reference/src/config/tests.rs:15-56): a `.env`
  * next to the process supplies `username_env`/`password_env` values,
  * and the real environment always wins over the file.
  */
class DotEnvSpec extends AnyFunSuite {

  test("parses KEY=VALUE lines, skipping blanks, comments, malformed lines") {
    val vars = DotEnv.parse(
      """# comment
        |DB_USER=alice
        |export DB_PASS=hunter2
        |
        |QUOTED="with spaces"
        |SINGLE='single'
        |INLINE=value # trailing comment
        |HASH_IN_VALUE=a#b
        |not a kv line
        |EMPTY=
        |""".stripMargin)
    assert(vars("DB_USER") == "alice")
    assert(vars("DB_PASS") == "hunter2")
    assert(vars("QUOTED") == "with spaces")
    assert(vars("SINGLE") == "single")
    assert(vars("INLINE") == "value")
    assert(vars("HASH_IN_VALUE") == "a#b")
    assert(vars("EMPTY") == "")
    assert(!vars.contains("not a kv line") && vars.size == 7)
  }

  test("quoted values drop a trailing comment; duplicates are first-wins") {
    val vars = DotEnv.parse(
      """DB_PASS="p w" # prod credential
        |DB_PASS=overridden-too-late
        |UNTERMINATED="half
        |""".stripMargin)
    assert(vars("DB_PASS") == "p w")
    assert(vars("UNTERMINATED") == "\"half")
  }

  test("loadFile returns empty for a missing file (dotenv().ok() semantics)") {
    assert(DotEnv.loadFile(Paths.get("/tmp/definitely-not-here.env")).isEmpty)
  }

  test("findUp walks ancestor directories like dotenvy::dotenv()") {
    val root = Files.createTempDirectory("dotenv-up")
    val nested = Files.createDirectories(root.resolve("a/b/c"))
    Files.writeString(root.resolve(".env"), "K=v\n")
    assert(DotEnv.findUp(nested).contains(root.resolve(".env")))
    assert(DotEnv.resolver(nested.toString)("K").contains("v"))
    val orphan = Files.createTempDirectory("dotenv-none")
    // no .env anywhere up to / (assuming none in the temp ancestry)
    assert(DotEnv.findUp(orphan).forall(p => !p.startsWith(orphan)))
  }

  test("real environment wins over the .env overlay") {
    val getenv = DotEnv.overlay(
      Map("A" -> "from-file", "B" -> "file-only"),
      Map("A" -> "from-env").get)
    assert(getenv("A").contains("from-env"))
    assert(getenv("B").contains("file-only"))
    assert(getenv("C").isEmpty)
  }

  test("credentials resolve from a temp .env through username_env/password_env") {
    val dir = Files.createTempDirectory("dotenv")
    val envFile = dir.resolve(".env")
    Files.writeString(envFile, "TEST_PG_USER=alice\nTEST_PG_PASS=hunter2\n")
    val auth = PipelineConfig.PostgresAuth(None, None,
      usernameEnv = Some("TEST_PG_USER"), passwordEnv = Some("TEST_PG_PASS"))
    // without the overlay the env vars are missing → config error
    intercept[IllegalArgumentException] {
      auth.resolvedUsername(Map.empty[String, String].get)
    }
    // with it, the reference's config/tests.rs:37-56 success case
    val getenv = DotEnv.overlay(DotEnv.loadFile(envFile),
      Map.empty[String, String].get)
    assert(auth.resolvedUsername(getenv) == "alice")
    assert(auth.resolvedPassword(getenv) == "hunter2")
  }
}
