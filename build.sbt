ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlsparkeksspark"
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
// Pass the forked JVM's stdout through unprefixed: the driver parses
// Bench's one-line JSON from stdout, and sbt's default logger decorates
// every line with [info]/[error], breaking that parse (BENCH_r01.json
// recorded "parsed": null).
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
  // Round-10: a ~500-query bench compiles one whole-stage-codegen class
  // set per query; the JDK-17 default 240m code cache fills late in the
  // run, the JIT silently stops compiling, and fresh codegen runs
  // interpreted (the r09 q101/q103/q310 warm-CPU anomaly — 8–15× CPU on
  // untouched code, unreproducible on any fresh JVM). 512m keeps the
  // compiler alive through the full contract; UseCodeCacheFlushing (on
  // by default, kept explicit) reclaims cold nmethods if it ever fills.
  "-XX:ReservedCodeCacheSize=512m",
  "-XX:+UseCodeCacheFlushing",
)
// Optional ad-hoc JVM flags for forked runs without editing the build —
// the round-11 use is the -XX:+PrintCompilation evidence capture for the
// intermittent warm-CPU anomaly (BASELINE.md documents the findings).
javaOptions ++= sys.env.get("SPARK_GRAFT_EXTRA_JVM_OPTS")
  .toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
