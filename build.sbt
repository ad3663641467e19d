ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cdcinitspark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as JSON. Two sbt behaviors broke that for three rounds: the forked
// process's stdout is re-logged with an "[info] " prefix, and a
// "[success] Total time ..." epilogue prints after it. Route forked
// output straight through (no prefix) and drop the epilogue.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command loop, not by a task — lint
// can't see that and would print a startup warning
Global / excludeLintKeys += showSuccess
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
  // a 246-query bench pass generates thousands of codegen classes; the
  // JDK-17 default 240 MB code cache fills mid-pass, the JIT disables
  // itself, and every later query runs interpreted-bytecode slow
  // (fn_try measured 5.5 s in-bench vs 0.06 s in a fresh JVM — same
  // plan, same data). Reserved size is virtual; committed grows on use.
  "-XX:ReservedCodeCacheSize=512m",
)
