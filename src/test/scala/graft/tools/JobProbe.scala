package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}

/** Dev-only: run named queries twice and print per-job wall times of
  * the SECOND (warm) run, so the slow job inside a multi-job query is
  * visible. Usage: runMain graft.tools.JobProbe q1 [q2 ...]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val starts = scala.collection.concurrent.TrieMap[Int, (Long, String)]()
    @volatile var record = false
    val lines = scala.collection.mutable.ArrayBuffer[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse(""))
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, desc) =>
          if (record) lines.synchronized {
            lines += f"  job ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.2fs  ${desc.take(90)}"
          }
        }
    })
    for (q <- args) {
      graft.SparkEntry.queries(q)(spark, dir).count()  // warm pass
      lines.clear(); record = true
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      val t = (System.nanoTime() - t0) / 1e9
      record = false
      Thread.sleep(300)
      println(f"== $q warm $t%.2fs rows=$n")
      lines.foreach(println)
    }
    spark.stop()
  }
}
