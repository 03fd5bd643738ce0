package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (JVM-wide singleton). */
object SparkTestSession {
  lazy val spark: SparkSession = graft.engine.Sessions.local(cpus = 4)
}
