ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlalchemyspark"
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
// Forked `run` output goes STRAIGHT to stdout, unprefixed: sbt's default
// LoggedOutput wraps every line in "[info] ..." which the driver's JSON
// parser rejects (five rounds of BENCH_r*.json with parsed=null). With
// StdoutOutput the Bench main's one JSON line is a bare line.
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
  // Heap sizing (r10 ADVICE): default derives from HOST memory so
  // `sbt test` starts on any machine — a fixed 32g default would fail
  // to launch (or swap) on hosts under ~32 GiB. Rationale for the high
  // ceiling: 32 local task slots at the production ~1 GB/core ratio —
  // an 8g heap left ~4.4 GB of unified memory for 32 threads, so one
  // shuffle-heavy query's execution demand evicted the session-cached
  // families mid-bench (q_dedup_recall's minhash inputs rebuilt every
  // pass, measured +2s floor). Rule (r11 ADVICE #4 simplified it):
  // clamp(hostRAM/2, 2g, 32g) — the 128 GiB bench host gets 32g, an
  // 8 GiB laptop 4g, and the com.sun cast is guarded so a non-HotSpot
  // JVM falls back to 4g instead of failing the build load.
  // SPARK_DRIVER_MEM overrides everything.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", {
    val gb = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case os: com.sun.management.OperatingSystemMXBean =>
        os.getTotalMemorySize / (1L << 30)
      case _ => 8L // non-HotSpot JVM: assume a small host
    }
    s"${math.max(2L, math.min(32L, gb / 2))}g"
  })}",
)
