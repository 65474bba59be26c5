ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dump1090streamparserspark"
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
  // 16g: at 8g the tail of the 190-query bench sweep ran under GC
  // pressure — q_stats_ks walls grew monotonically across its N runs
  // (2.0→4.1→7.3 s) and q_stats_outliers' first run hit 26.8 s wall /
  // 32 CPU-s, both converging to ~1 s in isolation; 16g removed the
  // storms and ~230 CPU-s of GC from the same sweep (2026-08-15 A/B).
  // local[32] executor-side state is modest — the churn is 190+
  // queries' worth of plans, codegen classes and cached blocks in one
  // driver JVM. RAM-gated so a small contributor machine keeps the old
  // 8g cap instead of swapping (SPARK_DRIVER_MEM always overrides).
  // The probe catches Throwable, not just NonFatal: getTotalMemorySize
  // is JDK 14+ com.sun.management, and on a JVM without it the failure
  // is a NoSuchMethodError/ClassCastException-class LinkageError —
  // which scala.util.Try would RETHROW (it only catches NonFatal),
  // failing every sbt task at settings evaluation. Fall back to 8g on
  // absolutely anything (ADVICE r12 + r13 review).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", try {
    val ram = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      .getTotalMemorySize
    if (ram >= 64L * 1024 * 1024 * 1024) "16g" else "8g"
  } catch { case _: Throwable => "8g" })}",
)
