package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    val qs = if (args.nonEmpty) args.toSeq
      else Seq("q22_minhash_neardup", "q23_simhash_neardup", "q26_ann_lsh")
    for (q <- qs) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      df.count()
      val p = df.queryExecution.executedPlan.toString
      println(s"===== $q =====")
      println("scans=" + p.linesIterator.count(_.contains("Scan parquet")))
      println("exchanges=" + p.linesIterator.count(l => l.contains("Exchange") && !l.contains("Reused")))
      println("cartesian=" + p.linesIterator.count(_.contains("CartesianProduct")))
      println("bhj=" + p.linesIterator.count(_.contains("BroadcastHashJoin")))
      println(p.linesIterator.filter(_.contains("Scan parquet")).map(_.take(300)).mkString("\n"))
    }
    spark.stop()
  }
}
