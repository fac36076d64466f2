ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gpuolapenginespark"
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
// Driver bench contract: the artifact parses the bench JSON out of the
// last 2000 chars of stdout. With the default LoggedOutput strategy the
// forked JVM's stdout is re-emitted through sbt's logger as
// "[info] {...}" — the prefix defeats the JSON parse (BENCH_r07:
// parsed null even though the compact line fit the tail). StdoutOutput
// passes the child's stdout through verbatim; showSuccess drops the
// trailing "[success] Total time ..." footer so the compact line is the
// actual last stdout line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — exclude
// it from the unused-setting lint.
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
  // local[32] is one JVM playing driver + 32 executors: 8g proved
  // marginal once a full bench run's transient state (checkpoint
  // blocks, broadcasts, codegen caches) was resident — the r5 driver
  // bench showed contiguous GC-pressure episodes. The container has
  // 128 GiB; give the forked JVM real headroom by default.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 116 queries' whole-stage codegen emits thousands of generated
  // classes in one JVM; the 240m default code cache is marginal for
  // that volume, and a full code cache disables the JIT silently —
  // the one intra-JVM cause of a multi-query slowdown burst that GC
  // and heap instrumentation can't see. Headroom costs nothing.
  "-XX:ReservedCodeCacheSize=512m",
)
