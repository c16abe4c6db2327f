ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "knowledgegraphspark"
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
// The driver parses the LAST stdout line of `sbt "runMain graft.Bench"` as
// JSON. sbt's default logged output strategy decorates forked-run stdout
// with an "[info] " prefix and appends its own "[success]" line, which left
// BENCH_r{2,3,4}.json `parsed: null`. StdoutOutput passes the child's
// stdout through verbatim.
run / outputStrategy := Some(StdoutOutput)
// ...and the JSON must also be the LAST line: drop sbt's trailing
// "[success] Total time: ..." message. (Consumed by sbt's command loop,
// not by a task — excluded from the unused-key lint.)
showSuccess := false
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
  // the bench box has 128 GiB; a small heap makes the 63-query bench run
  // evict and recompute its cached stores (round-1 full run was ~4x slower
  // than the same queries run in isolation)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // 63 bench queries x 2 passes generate thousands of whole-stage-codegen
  // classes; the 240MB default code cache fills mid-run and the JIT shuts
  // off, making late queries run interpreted (~4x slower)
  "-XX:ReservedCodeCacheSize=1g",
)
// surface JIT shutoff instead of silently degrading
javaOptions ++= Seq(
  "-XX:+UseCodeCacheFlushing",
)
