ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "scespetspark"
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
// Forked-run output goes RAW to this process's stdout/stderr instead of
// through sbt's logger: under `sbt -error` the logger drops fork stdout
// (info level) entirely — which is how round 1's Bench JSON line vanished
// (BENCH_r01 `parsed: null`). With StdoutOutput, `sbt -batch -error
// "runMain graft.Bench"` emits the JSON as the only stdout line.
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
  // 1000x-gate harness knob (CORRECTNESS_SF100_r14 find 5a): the
  // memory-sink gate collects each streaming batch's results on the
  // driver, and at 1000x volume one stream_semdedup task result was
  // 1.2 GiB — over Spark's 1g default. Default unchanged; the scale
  // gates raise it explicitly.
  s"-Dspark.driver.maxResultSize=${sys.env.getOrElse("SPARK_DRIVER_MAXRESULT", "1g")}",
  // sbt-134 watch (VERDICT r13 #7): `sbt test` once exited 134 from a
  // native std::bad_alloc AFTER "All tests passed" (r12 HEAD, never
  // reproduced). If it recurs, the JVM fatal-error log names the raising
  // native library without a repro hunt.
  "-XX:ErrorFile=/tmp/graft_hs_err_%p.log",
)
// Raw fork stderr for tests too: a native abort during JVM shutdown
// prints to stderr outside the JUnit/ScalaTest reporters — StdoutOutput
// keeps it visible instead of dropping it with sbt's logger.
Test / outputStrategy := Some(StdoutOutput)
