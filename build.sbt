ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "elt_data4transformationspark"
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
// BENCH ARTIFACT CONTRACT: the driver parses the LAST stdout line of
// `sbt runMain graft.Bench` as JSON. Two pieces of sbt log framing broke
// that for five rounds (VERDICT r7 §wrong): (a) the forked JVM's stdout
// was routed through sbt's logger, prefixing every line with `[info] `;
// (b) sbt appended a `[success] Total time: …` epilogue after it. Inherit
// stdout in the forked process (no prefix, no truncation at sbt's line
// buffer) and suppress the success banner so the compact JSON line from
// Bench.emitOnce() is genuinely the last, prefix-free stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command loop, not a task graph — the
// lintUnused pass can't see that.
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
  // 24g: local[32] runs executor-side shuffle/agg hash maps, broadcast
  // blocks, and localCheckpoint storage in this one JVM; at 8g the tail
  // of a 67-query bench pass ran against GC pressure (q67 +50% wall).
  // The host has 128 GiB; a cluster deployment sizes executors instead.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
