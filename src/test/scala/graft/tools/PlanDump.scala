package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Dev-only: dump `.explain("formatted")` for named queries to
  * `plans/<tag>/<query>_<suffix>.txt` (the optimization-round evidence
  * files) and print per-query wall time + SPARK JOB COUNT under bench
  * conditions (local[32], 32 shuffle partitions, one count()).
  *
  * Usage: runMain graft.tools.PlanDump <tag> <suffix> q1 q2 ...
  *   e.g. runMain graft.tools.PlanDump r19 before q259_embedding_lr
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <tag> <suffix> <query>...")
    val (tag, suffix, qs) = (args(0), args(1), args.drop(2).toSeq)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.ShortCircuitExists.install(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    var jobs = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs += 1
    })
    // same warmup as Bench so times are comparable
    graft.SparkEntry.entry(spark).count()
    graft.SparkEntry.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001").count()
    val outDir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(outDir)
    for (q <- qs) {
      jobs = 0
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val buildJobs = jobs
      val n = df.count()
      val t = (System.nanoTime() - t0) / 1e9
      // executedPlan AFTER the action so AQE's final plan is shown
      val txt = new StringBuilder
      txt ++= s"== $q ($suffix) sf=$dir rows=$n time=${f"$t%.2f"}s " +
        s"jobs=$jobs (build-side jobs before count: $buildJobs)\n\n"
      txt ++= df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(outDir.resolve(s"${q}_$suffix.txt"),
        txt.toString.getBytes("UTF-8"))
      println(f"$q%-34s $t%8.2fs jobs=$jobs%-4d rows=$n")
    }
    spark.stop()
  }
}
