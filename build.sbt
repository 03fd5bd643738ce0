ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "apitapspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked-run stdout must pass through RAW: sbt's default logger wraps
// it with an "[info] " prefix, which made the bench summary line —
// printed LAST precisely so a bounded stdout tail ends with one
// complete JSON object — unparseable for 9 rounds (BENCH_r*.json
// "parsed": null). StdoutOutput hands the child's stdout straight
// to ours, unprefixed.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// local-cluster[…] executors are launched through the worker's
// command builder, which eagerly resolves the Scala version; the
// bin/ scripts normally export this, an in-JVM launch must.
Test / envVars += "SPARK_SCALA_VERSION" -> "2.13"
// LocalClusterSpec boots its own local-cluster[2,…] SparkContext;
// Spark allows one context per JVM and every other suite shares the
// singleton local[4] session — so the cluster suite forks alone.
Test / testGrouping := {
  val (cluster, rest) = (Test / definedTests).value
    .partition(_.name.endsWith("LocalClusterSpec"))
  val opts = (Test / forkOptions).value
  Seq(
    Tests.Group("localCluster", cluster, Tests.SubProcess(opts)),
    Tests.Group("default", rest, Tests.SubProcess(opts)),
  ).filter(_.tests.nonEmpty)
}
