package graft.config

import java.nio.file.{Files, Path, Paths}

/** `.env` file loading (SURVEY A29 adjunct) — parity with the
  * reference CLI, which calls `dotenvy::dotenv()` at startup
  * (/root/reference/src/main.rs:11) so credentials in a `.env` next
  * to the process feed the config's `username_env`/`password_env`
  * indirection without being exported into the real environment.
  *
  * Supported subset (the part of the dotenv format the reference's
  * deployments rely on): `KEY=VALUE` lines, optional `export ` prefix,
  * blank lines and `#` comments skipped, single- or double-quoted
  * values unquoted, inline ` # comment` stripped from unquoted values.
  * Like dotenvy, file variables NEVER override the real environment —
  * the overlay consults the process env first.
  */
object DotEnv {

  private val Line = """^(?:export\s+)?([A-Za-z_][A-Za-z0-9_.]*)\s*=(.*)$""".r

  def parse(text: String): Map[String, String] =
    text.linesIterator.flatMap { raw =>
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#")) None
      else line match {
        case Line(key, rawValue) => Some(key -> unquote(rawValue.trim))
        case _ => None // malformed lines are skipped, like dotenvy's lenient iter
      }
    }.toMap

  private def unquote(v: String): String =
    if (v.length >= 2 && (v.head == '"' || v.head == '\'') && v.last == v.head)
      v.substring(1, v.length - 1)
    else {
      // inline comments only begin after whitespace ("a#b" is a value)
      val cut = v.indexOf(" #")
      (if (cut >= 0) v.substring(0, cut) else v).trim
    }

  /** Variables from `path`, or empty when the file doesn't exist —
    * dotenvy's `dotenv().ok()`: a missing `.env` is not an error.
    */
  def loadFile(path: Path): Map[String, String] =
    if (Files.isRegularFile(path)) parse(Files.readString(path))
    else Map.empty

  /** A getenv that consults the real environment first and falls back
    * to the `.env` variables — the overlay `PostgresAuth.resolved*`
    * plugs in. Real env wins, matching dotenvy's default.
    */
  def overlay(fileVars: Map[String, String],
      env: String => Option[String] = sys.env.get): String => Option[String] =
    k => env(k).orElse(fileVars.get(k))

  /** The CLI-startup resolver: `.env` from the working directory (or
    * an explicit path), overlaid under the process environment.
    */
  def resolver(path: String = ".env"): String => Option[String] =
    overlay(loadFile(Paths.get(path)))
}
