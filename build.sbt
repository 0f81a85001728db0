ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "crypto_data_ingestion_scriptspark"
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
// Fast tier by default: wall-clock-heavy cases (polling triggers,
// kill+restart chaos replays, whole-inventory sweeps) are tagged
// graft.SlowTest and excluded so `sbt test` fits an automated budget
// (~13 min of suite time vs ~32 with the slow tier included).
// SPARK_GRAFT_SLOW_TESTS=1 sbt test runs EVERYTHING (both tiers).
Test / testOptions ++= (
  if (sys.env.contains("SPARK_GRAFT_SLOW_TESTS")) Seq.empty
  else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.SlowTest")))
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as the round's bench JSON. Two pieces of sbt framing defeated that
// for four rounds (BENCH_r07..r10 "parsed: null"): the forked
// process's stdout is re-logged with an "[info] " prefix, and sbt
// appends "[success] Total time: ..." AFTER it. StdoutOutput passes
// the forked JVM's stdout through unprefixed, and showSuccess drops
// the trailing success banner, so the compact JSON line Bench prints
// last IS the literal final stdout line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command engine, not by another
// setting, so the unused-key lint false-positives on it
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
  // 16g default: at sf0.1 x local[32] an 8g heap shows GC-driven
  // run-to-run bench variance; the host has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
