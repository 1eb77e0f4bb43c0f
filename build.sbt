ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafkaconnectminiopipelinespark"
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
// Pass forked-run output through VERBATIM (no "[info] "/"[error] " logger
// prefixes): the driver tail-captures stdout and parses the bench
// summary JSON line, and a logger prefix would make every line
// unparseable (BENCH_r01..r08 all came back parsed:null).
run / outputStrategy := Some(StdoutOutput)
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
  // Throughput GC for the forked batch JVMs (r20, measured): this
  // workload is allocation-heavy batch compute with no pause-time
  // requirement, and ParallelGC ran the 8-query heavy bench subset ~7%
  // faster than the JDK-17 G1 default in interleaved A/Bs (14.5/14.7 s
  // vs 15.6/16.0 s; dedup_allpairs_jaccard 1.9 -> 1.5-1.6 s). Larger
  // heaps were ALSO measured and lost (8g/12g/24g -> 19.7/23.1/26.3 s
  // on the same subset) — keep the bounded heap + throughput collector.
  // Override via SPARK_GRAFT_GC (e.g. "-XX:+UseG1GC" for latency-bound
  // embedding).
  sys.env.getOrElse("SPARK_GRAFT_GC", "-XX:+UseParallelGC"),
)
