ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "patternsdevkitspark"
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
// Forked run output goes straight to stdout WITHOUT sbt's "[info] " prefix:
// the driver parses Bench's single JSON result line, and the prefix breaks
// `json.loads` (BENCH_r{1,2}.json both show "parsed": null).
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
  // 24g default: at 8g the sf0.1 bench GC-thrashes once the persisted
  // dedup intermediates accumulate (measured: total 52s -> 35s, with
  // multi-second anomalies on otherwise sub-second queries). The
  // container has 128 GiB; override via SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // The 119-query battery generates thousands of codegen'd classes; the
  // default 240m code cache forces JIT sweeping/flushes mid-battery and
  // C2-compiled methods get discarded while still hot (round 6's 5.7x
  // battery pathology: hot queries stuck at low tier behind a saturated
  // C2 queue). 512m holds the whole battery's compiled surface.
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // Experiment hook: SPARK_GRAFT_JVM_OPTS="-XX:+PrintCompilation ..."
  sys.env.get("SPARK_GRAFT_JVM_OPTS").toSeq
    .flatMap(_.split("\\s+").toSeq).filter(_.nonEmpty)
