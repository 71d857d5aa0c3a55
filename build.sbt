ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "data_engineering_sf_mobile_food_facilities_publicspark"
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
// The round driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as JSON. Two sbt behaviors broke that for seven straight rounds:
// (1) forked-process output is re-logged with an "[info] " prefix — route it
//     straight through to stdout instead;
// (2) sbt prints "[success] Total time: ..." AFTER the program's last line —
//     suppress it. With both, the bare JSON summary is the final line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
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
  // local[32] runs all 32 executor threads in this one JVM; the box has
  // 128 GiB, and the heavy candidate-pair aggregations are GC-bound at 8g.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // G1 (the default) measured decisively better here than ParallelGC
  // (37-46 s vs 69-71 s bench totals): the dedup pair-explosion stages
  // allocate in bursts that G1's regional evacuation absorbs, where
  // ParallelGC full collections of the 32 GB heap stall all 32 task
  // threads. Don't "optimize" the collector without re-measuring.
)
