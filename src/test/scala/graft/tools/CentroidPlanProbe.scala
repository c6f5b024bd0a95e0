package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{CentroidArgmax, DotProduct}

/** Dev-only: measure the literal-centroid argmax's plan-size wall
  * against the indexed CentroidArgmax expression as k grows — the
  * evidence behind FlatAssignMaxK and the q188 scale path. For each
  * k, times one full assignment pass over the sf0.1 embeddings
  * (plan construction + compile + execute — plan cost is the thing
  * being measured, so it stays inside the clock).
  */
object CentroidPlanProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nv = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"),
        graft.functions.L2Normalize.l2_normalize(col("embedding").cast("array<double>"))
          .as("nv"))
      .filter(col("nv").isNotNull)
      .persist()
    val n = nv.count()
    println(s"corpus: $n vectors")

    def flatArgmax(cents: Array[Array[Double]]) = {
      val sims = array(cents.map(c =>
        DotProduct.dot_product(col("nv"), array(c.map(lit(_)): _*))): _*)
      (array_position(sims, array_max(sims)) - 1).cast("int")
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  (checksum $r)")
    }

    // 5000 = the √n schedule's k at a 200M-vector corpus (balance 8)
    // — the round-15 verdict's requested probe point. k beyond the
    // fixture's 2000 vectors synthesizes EXTRA centroids by circular
    // shift (the ScaleBench embedding blow-up move: norm preserved,
    // distinct directions), so the k=4096/5000 rows really carry k
    // centroid trees / index entries, not a corpus-capped 2000.
    val baseVecs = nv.orderBy(col("vec_id")).select(col("nv"))
      .collect().map(_.getSeq[Double](0).toArray)
    def centroidsFor(k: Int): Array[Array[Double]] =
      Array.tabulate(k) { i =>
        val v = baseVecs(i % baseVecs.length)
        val s = i / baseVecs.length
        if (s == 0) v
        else Array.tabulate(v.length)(j => v((j + s) % v.length))
      }
    for (k <- Seq(64, 256, 1024, 4096, 5000)) {
      val cents = centroidsFor(k)
      time(s"k=$k indexed") {
        nv.select(CentroidArgmax.centroid_argmax(col("nv"), cents).as("c"))
          .agg(sum(col("c"))).head().getLong(0)
      }
      try time(s"k=$k flat") {
        nv.select(flatArgmax(cents).as("c"))
          .agg(sum(col("c"))).head().getLong(0)
      } catch {
        case e: Throwable => println(s"k=$k flat FAILED: ${e.getClass.getSimpleName} ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
