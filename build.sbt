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
  // pass, measured +2s floor). Bench runs on the 128 GiB host get 32g
  // (quarter of RAM, capped); small hosts get half their RAM, floor
  // 2g. SPARK_DRIVER_MEM overrides everything.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", {
    val bytes = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      .getTotalMemorySize
    val gb = bytes / (1L << 30)
    val pick = math.max(2L, math.min(32L, math.max(gb / 4, math.min(gb / 2, 8L))))
    s"${pick}g"
  })}",
)
