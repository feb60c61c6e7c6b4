ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tblakehouseenhancedspark"
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
// ScaleSmokeSpec runs a ~10x sf0.1 synthetic scale-up; it self-cancels
// unless GRAFT_SCALE_SMOKE=1 is set, keeping the default `sbt test` gate
// fast:  GRAFT_SCALE_SMOKE=1 sbt 'testOnly graft.ScaleSmokeSpec'
Test / envVars := sys.env.filterKeys(_ == "GRAFT_SCALE_SMOKE").toMap
// Forked run output passes through UNPREFIXED: the bench/verify drivers
// parse the single JSON result line from the process output, and sbt's
// default "[info] " logger prefix breaks a `line.startsWith("{")` /
// json.loads extraction (BENCH_r0{1,2,3}.json all captured `parsed: null`).
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
  // local[32] runs all 32 executor threads in this one JVM; at 8g the
  // 80-query bench run accumulated enough old-gen pressure that unrelated
  // queries late in the run measured 4-8x their isolated time (r04: q4
  // 0.89->4.07, x25 0.73->5.91 purely from heap churn). The box has
  // 128 GiB; give the fork a heap sized like a real executor set.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
)
