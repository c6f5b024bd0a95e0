package graft.tools
import org.apache.spark.sql.SparkSession
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder.master("local[2]").appName("probe")
      .config("spark.sql.shuffle.partitions", "4").getOrCreate()
    import spark.implicits._
    try {
      val df = Seq(1L, 2L, 3L).toDF("k")
      df.createOrReplaceTempView("t")
      val b = spark.sql("SELECT bloom_filter_agg(xxhash64(k), 100, 1000) AS bf FROM t")
      b.createOrReplaceTempView("bf")
      val r = spark.sql("SELECT k, might_contain((SELECT bf FROM bf), xxhash64(k)) FROM t").collect()
      println("BLOOM_OK " + r.mkString(","))
    } catch { case e: Throwable => println("BLOOM_FAIL " + e.getClass.getName + ": " + e.getMessage.take(200)) }
    spark.stop()
  }
}
