ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
ThisBuild / scalacOptions += "-deprecation"
name := "redisdataflowrealtimeanalyticsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// Forked `run` output must reach stdout verbatim: the bench driver
// parses the single JSON line Bench prints, and sbt's default logger
// prefixes every line with "[info] ", breaking that parse.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// suites share one SparkSession/SparkContext; run them sequentially so
// session-level state (function registry, active-session swaps in
// ExtensionsSpec) cannot race
Test / parallelExecution := false
run / fork := true
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
  // local[32] with per-query persists needs headroom: an 8g heap
  // GC-thrashed late in long multi-query runs on the 128 GiB box
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
