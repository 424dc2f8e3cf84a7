ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cerebrospark"
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
// Bench stdout contract (VERDICT r11 #2): a consumer tailing `sbt
// "runMain graft.Bench"` must see the final JSON line BARE. StdoutOutput
// passes the forked JVM's stdout/stderr straight through (no [info]/
// [error] log prefixes), and showSuccess drops the trailing
// "[success] Total time" line that otherwise lands after the JSON.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
// showSuccess is consumed by the command engine, not a task — silence
// sbt's unused-key lint for it
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
// 32g default: local[32] runs 32 executor threads in ONE JVM — shuffle
// buffers, sorts and cached frames for the whole 50-query bench live in
// this heap, and an undersized heap (the old 8g) made late queries run
// 3-4x slower from GC pressure alone. The box has 128 GiB.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // pin the heap: G1 region sizing and growth stalls otherwise vary
  // run-to-run and dominate small-query timings
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // whole-stage codegen emits fresh classes per query; the 240m default
  // code cache fills after a few dozen queries, the JIT shuts off, and
  // every later query runs interpreted (10-50x slower). Size it so a
  // full bench never hits the cliff.
  "-XX:ReservedCodeCacheSize=1g",
  // Generated-class classloaders are soft-reachable; a full GC with the
  // default policy (1000 ms/free-MB) can still clear them under an
  // allocation spike, forcing whole-plan recompiles measured as 10-25x
  // single-rep outliers (SCALE.md "GC→codegen-recompile cliff"). Make
  // soft refs effectively pinned short of real memory pressure.
  "-XX:SoftRefLRUPolicyMSPerMB=50000",
)
