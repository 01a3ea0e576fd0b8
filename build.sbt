ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "missiondatapipelinespark"
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
// Emit the forked program's stdout verbatim (no "[info] " prefix) so the
// one-line JSON from Bench/Verify is machine-parseable from sbt output.
outputStrategy := Some(OutputStrategy.StdoutOutput)
// No "[success] Total time: ..." banner after runMain: the bench
// harness parses the LAST stdout line(s) for the Bench metric JSON,
// and the banner displaced it in six consecutive recorded artifacts.
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — exclude
// it from the unused-key lint
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
  // local[32] on a 128 GiB box: 8g left ~150 MB execution memory per
  // task slot and made vector-heavy joins (d13 at sf1) GC-bound and
  // bimodal (14.2 s vs 4.6 s for identical runs); 20g keeps task
  // memory ~nominal. Override with SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "20g")}",
)
