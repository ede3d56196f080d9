ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pyramidnestednerspark"
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
// SIMD GEMV kernels (graft.core.SimdKernels) use the JDK Vector API, an
// incubator module on JDK 17 — needed at javac time and in the forked JVMs.
// Kernels fall back to scalar automatically if the module is absent.
javacOptions ++= Seq("--add-modules", "jdk.incubator.vector")
javaOptions ++= jdk17AddOpens ++ Seq(
  "--add-modules", "jdk.incubator.vector",
  // The 95-query battery generates ~2000 whole-stage-codegen units per pass;
  // Spark's codegen class cache holds only 100 by default, so by the time a
  // query's second rep runs every one of its classes has been evicted and is
  // re-Janino-compiled + re-JIT'd from scratch. Scale-independent harness
  // overhead, not a data-size tunable: the cache is keyed on generated
  // source, so correctness is unaffected. Sized to hold one full battery.
  "-Dspark.sql.codegen.cache.maxEntries=4096",
  // headroom for the extra compiled classes the larger cache keeps live
  "-XX:ReservedCodeCacheSize=512m",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
