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
// shared SQLConf. Grouping is weighted LPT (heaviest suite into the
// lightest bucket): plain round-robin measured 16:12 wall because one
// bucket stacked GuardBandSweepSpec (4:28 solo — the 61-query rounded-
// publish sweep) with the other sweep/streaming heavies while five
// buckets sat idle after ~6 min. Weights are coarse measured/estimated
// seconds; only their ORDER matters for balance. 8 groups × local[4]
// sessions = 32 cores; 8 × 8g heap fits the sandbox.
val testGroupCount = 8
val testSuiteWeight: Map[String, Int] = Map(
  // measured solo seconds (sbt testOnly, idle machine), round 20:
  "graft.DecisionBandSweepSpec" -> 290,
  "graft.StreamingSpec"         -> 274,
  "graft.GuardBandSweepSpec"    -> 270,
  "graft.PlansSpec"             -> 145,
  "graft.CoreQueriesDeterminismSpec0" -> 100, // 6:40 pre-split / 4
  "graft.CoreQueriesDeterminismSpec1" -> 100,
  "graft.CoreQueriesDeterminismSpec2" -> 100,
  "graft.CoreQueriesDeterminismSpec3" -> 100,
  "graft.SpectralSpec"          -> 60,
  "graft.DedupSpec"             -> 56,
  "graft.CurationSpec"          -> 47,
  "graft.TextAnalysisSpec"      -> 43,
  "graft.MultimodalSpec"        -> 41,
  "graft.SimilaritySpec"        -> 35,
  "graft.CoreQueriesSpec"       -> 30, // smoke tests after the split
  "graft.AnalyticsSpec"         -> 25,
  "graft.ScaleSpec"             -> 23,
  "graft.SkewSpec"              -> 22,
  "graft.PropertySpec"          -> 21,
  "graft.PipelinesSpec"         -> 17,
).withDefaultValue(15)
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(_.name)
  val opts = ForkOptions()
    .withJavaHome(javaHome.value)
    .withOutputStrategy(outputStrategy.value)
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withEnvVars((Test / envVars).value)
    .withWorkingDirectory((Test / baseDirectory).value)
  val buckets = Array.fill(testGroupCount)(
    (0L, List.empty[sbt.TestDefinition]))
  tests.sortBy(t => (-testSuiteWeight(t.name), t.name)).foreach { t =>
    val i = buckets.zipWithIndex.minBy(_._1._1)._2
    val (w, ts) = buckets(i)
    buckets(i) = (w + testSuiteWeight(t.name), t :: ts)
  }
  buckets.toSeq.zipWithIndex.filter(_._1._2.nonEmpty).map { case ((_, ts), i) =>
    Tests.Group(s"g$i", ts.reverse, Tests.SubProcess(opts))
  }
}
// Per-test durations in the output (-oD), so future rebalancing reads
// real numbers instead of estimates.
Test / testOptions += Tests.Argument(TestFrameworks.ScalaTest, "-oD")
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
