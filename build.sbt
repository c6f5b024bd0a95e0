ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "audiencefinderprospark"
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
// The sequential suite outgrew the CI window (round 19: 489 tests in
// ~24 min; the harness's test budget killed the run mid-suite with zero
// failures). Split the suites into parallel forked JVM groups: each
// group gets its OWN JVM and SparkSession, so suites that mutate
// session conf (AggregatorFallbackSpec, ScaleSpec, StreamingSpec) stay
// isolated — unlike in-JVM parallel suites, which would race on the
// shared SQLConf. Round-robin over sorted names spreads the heavy
// suites; group count 6 × 8g heap fits the sandbox comfortably.
val testGroupCount = 6
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(_.name)
  val opts = ForkOptions()
    .withJavaHome(javaHome.value)
    .withOutputStrategy(outputStrategy.value)
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withEnvVars((Test / envVars).value)
    .withWorkingDirectory((Test / baseDirectory).value)
  tests.zipWithIndex
    .groupBy(_._2 % testGroupCount)
    .toSeq.sortBy(_._1)
    .map { case (i, ts) =>
      Tests.Group(s"g$i", ts.map(_._1), Tests.SubProcess(opts))
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(32))
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
)
