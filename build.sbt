ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "azuredatabrickslakehousespark"
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
  // 24g default: local[32] runs 32 executor threads in ONE JVM, so the
  // driver heap is the whole cluster's memory — at 8g the suite spent
  // measurable time in GC and Spark's reference-queue-driven cleanup
  // (ContextCleaner) fired mid-query; the machine has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // the bench's gap System.gc() should start a concurrent G1 cycle,
  // not a stop-the-world full collection
  "-XX:+ExplicitGCInvokesConcurrent",
  // a 262-query session generates thousands of Janino classes; at the
  // 240 MB default the JIT code cache fills mid-suite and HotSpot
  // starts flushing/declining compilations — whichever query is
  // running then executes its hot loops interpreted (observed as
  // random single-query spikes with run≈cpu at ~3x steady-state CPU
  // and flat GC: q194 read 11.4 s / 37 CPU-s in one full-suite run vs
  // 3.0 s / 13 CPU-s solo on identical plans)
  "-XX:ReservedCodeCacheSize=1g",
)
