ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hdinsightpysparkcntkintegrationspark"
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
// Bench/Verify stdout contract (r16, VERDICT r15 item 1): the driver
// invokes `sbt "runMain graft.Bench"` and parses the LAST stdout lines
// for the one-line JSON. sbt's default LoggedOutput strategy wraps the
// forked program's stdout in "[info] " (stderr in "[error] ") and the
// batch runner appends "[success] Total time: ..." after the task —
// together these kept the JSON machine-unreadable for six rounds
// (BENCH_r10..r15 all carry "parsed": null). StdoutOutput passes the
// forked process's streams through undecorated, and showSuccess
// suppresses the trailing success line, so the bench's final printed
// line IS the JSON. Failure detection is unaffected: sbt still exits
// nonzero on compile/test/run failure (the artifacts' "rc" field shows
// the driver tracks exit codes), and ScalaTest's own summary lines
// ("All tests passed.", "Tests: succeeded N ...") still print.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / runMain / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  "-Duser.timezone=UTC",
  // local mode = driver-only JVM; the box has 125g — don't starve 32
  // executor threads on an 8g default
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
