package graft.cli

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LoggerContext, StringLayout}
import org.apache.logging.log4j.core.appender.ConsoleAppender
import org.apache.logging.log4j.core.layout.PatternLayout
import org.apache.logging.log4j.layout.template.json.JsonTemplateLayout

/** Runtime logging control (SURVEY A31), mirroring the reference's
  * `--log-json` / `--log-level` flags and `APITAP_LOG_LEVEL` /
  * `APITAP_LOG_FORMAT=json` env fallbacks
  * (/root/reference/src/log/mod.rs:12-61, src/cmd/mod.rs:47-55).
  *
  * Backed by log4j2 (Spark's logging stack): level changes go through
  * `Configurator`-style reconfiguration of the root logger, and JSON
  * mode swaps the console appender's layout for a JsonTemplateLayout
  * (one JSON object per line, ECS-shaped — parseable by log shippers).
  */
object Logging {

  /** Layout for JSON mode — exposed so tests can format an event and
    * assert it parses.
    */
  def jsonLayout(ctx: LoggerContext): StringLayout =
    JsonTemplateLayout.newBuilder()
      .setConfiguration(ctx.getConfiguration)
      .setEventTemplateUri("classpath:EcsLayout.json")
      .build()

  /** Apply CLI flags, falling back to `GRAFT_LOG_LEVEL` /
    * `GRAFT_LOG_FORMAT=json` env vars like the reference's
    * `APITAP_LOG_LEVEL`/`APITAP_LOG_FORMAT`.
    */
  def configure(json: Boolean, level: Option[String],
      getenv: String => Option[String] = sys.env.get): Unit = {
    val effectiveLevel = level.orElse(getenv("GRAFT_LOG_LEVEL"))
    val effectiveJson = json ||
      getenv("GRAFT_LOG_FORMAT").exists(_.equalsIgnoreCase("json"))

    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val config = ctx.getConfiguration
    val root = config.getRootLogger

    effectiveLevel.foreach(l => root.setLevel(Level.toLevel(l, Level.INFO)))

    if (effectiveJson) {
      val layout = jsonLayout(ctx)
      // ConsoleAppender.Builder's self-recursive generics defeat
      // Scala's inference; the deprecated factory sidesteps them
      val appender: ConsoleAppender =
        ConsoleAppender.createDefaultAppenderForLayout(layout)
      appender.start()
      root.getAppenders.keySet.toArray.foreach {
        case n: String => root.removeAppender(n)
      }
      root.addAppender(appender, root.getLevel, null)
    }
    ctx.updateLoggers()
  }

  /** Human-readable layout used when JSON is off (kept here so both
    * shapes live in one place).
    */
  def textLayout(ctx: LoggerContext): StringLayout =
    PatternLayout.newBuilder()
      .withConfiguration(ctx.getConfiguration)
      .withPattern("%d{HH:mm:ss.SSS} %-5level %logger{1}: %msg%n")
      .build()
}
