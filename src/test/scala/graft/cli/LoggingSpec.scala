package graft.cli

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.LoggerContext
import org.apache.logging.log4j.core.impl.Log4jLogEvent
import org.apache.logging.log4j.message.SimpleMessage
import org.scalatest.funsuite.AnyFunSuite

class LoggingSpec extends AnyFunSuite {

  private def ctx: LoggerContext =
    LogManager.getContext(false).asInstanceOf[LoggerContext]

  test("json layout emits one parseable JSON object per event") {
    val layout = Logging.jsonLayout(ctx)
    val event = Log4jLogEvent.newBuilder()
      .setLoggerName("graft.test")
      .setLevel(Level.INFO)
      .setMessage(new SimpleMessage("""module m1 loaded 8 rows with "quotes""""))
      .build()
    val line = layout.toSerializable(event)
    val node = new ObjectMapper().readTree(line)
    assert(node.isObject, s"not a JSON object: $line")
    assert(node.at("/message").asText().contains("loaded 8 rows"))
    assert(node.at("/log.level").asText().toLowerCase == "info"
      || node.findValue("level") != null)
  }

  test("configure sets the root level from the flag") {
    val before = ctx.getConfiguration.getRootLogger.getLevel
    try {
      Logging.configure(json = false, level = Some("warn"))
      assert(ctx.getConfiguration.getRootLogger.getLevel == Level.WARN)
      Logging.configure(json = false, level = Some("debug"))
      assert(ctx.getConfiguration.getRootLogger.getLevel == Level.DEBUG)
    } finally {
      ctx.getConfiguration.getRootLogger.setLevel(before)
      ctx.updateLoggers()
    }
  }

  test("env fallback mirrors the reference's APITAP_LOG_LEVEL behavior") {
    val before = ctx.getConfiguration.getRootLogger.getLevel
    try {
      Logging.configure(json = false, level = None,
        getenv = Map("GRAFT_LOG_LEVEL" -> "error").get)
      assert(ctx.getConfiguration.getRootLogger.getLevel == Level.ERROR)
    } finally {
      ctx.getConfiguration.getRootLogger.setLevel(before)
      ctx.updateLoggers()
    }
  }
}
