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

  /** Duplicate keys are FIRST-wins: dotenvy sets each var into the
    * environment as it reads, and a later line never overrides an
    * already-set var — the same rule that keeps the real environment
    * above the file keeps line 1 above line 9.
    */
  def parse(text: String): Map[String, String] =
    text.linesIterator.flatMap { raw =>
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#")) None
      else line match {
        case Line(key, rawValue) => Some(key -> unquote(rawValue.trim))
        case _ => None // malformed lines are skipped, like dotenvy's lenient iter
      }
    }.foldLeft(Map.empty[String, String]) { case (m, (k, v)) =>
      if (m.contains(k)) m else m.updated(k, v)
    }

  private def unquote(v: String): String =
    if (v.nonEmpty && (v.head == '"' || v.head == '\'')) {
      // quoted value: take up to the matching close quote, dropping
      // anything after it (e.g. a trailing comment); an unterminated
      // quote keeps the raw text, dotenvy-lenient
      val close = v.indexOf(v.head.toInt, 1)
      if (close > 0) v.substring(1, close) else v
    } else {
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

  /** First `.env` in `start` or any ancestor directory — dotenvy's
    * `dotenv()` walks up from the working directory, so a CLI run from
    * a project subdirectory still finds the project's file.
    */
  def findUp(start: Path, name: String = ".env"): Option[Path] = {
    var dir = start.toAbsolutePath.normalize
    while (dir != null) {
      val cand = dir.resolve(name)
      if (Files.isRegularFile(cand)) return Some(cand)
      dir = dir.getParent
    }
    None
  }

  /** The CLI-startup resolver: the nearest `.env` at or above
    * `startDir`, overlaid under the process environment.
    */
  def resolver(startDir: String = "."): String => Option[String] =
    overlay(findUp(Paths.get(startDir)).map(loadFile).getOrElse(Map.empty))
}
