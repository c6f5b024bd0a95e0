package graft

import org.apache.spark.sql.functions._

import graft.functions.{CentroidArgmax, CentroidIndex, DotProduct}

class CentroidArgmaxSpec extends SparkSuite {
  import spark.implicits._

  // the flat literal argmax exactly as Similarity.assignCluster builds
  // it below the plan-size ceiling
  private def flatArgmax(nv: org.apache.spark.sql.Column,
                         cents: Array[Array[Double]]): org.apache.spark.sql.Column = {
    val sims = array(cents.map(c =>
      DotProduct.dot_product(nv, array(c.map(lit(_)): _*))): _*)
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }

  private def flatTopK(nv: org.apache.spark.sql.Column,
                       cents: Array[Array[Double]], p: Int): org.apache.spark.sql.Column = {
    val ranked = array_sort(array(cents.indices.map(i =>
      struct((-DotProduct.dot_product(nv, array(cents(i).map(lit(_)): _*))).as("neg_sim"),
        lit(i).as("idx"))): _*))
    transform(slice(ranked, 1, p), s => s.getField("idx"))
  }

  private def fixtureNv = spark.read.parquet(s"$sfDir/embeddings.parquet")
    .select(col("vec_id"),
      graft.functions.L2Normalize.l2_normalize(col("embedding").cast("array<double>"))
        .as("nv"))
    .filter(col("nv").isNotNull)

  private def seedCents(k: Int): Array[Array[Double]] =
    fixtureNv.orderBy(col("vec_id")).limit(k).select(col("nv"))
      .collect().map(_.getSeq[Double](0).toArray)

  test("indexed argmax is bitwise-identical to the flat literal argmax (k = 5 and 100)") {
    for (k <- Seq(5, 100)) {
      val cents = seedCents(k)
      val diff = fixtureNv.select(col("vec_id"),
          CentroidArgmax.centroid_argmax(col("nv"), cents).as("a"),
          flatArgmax(col("nv"), cents).as("b"))
        .filter(col("a") =!= col("b"))
      assert(diff.isEmpty, s"k=$k: indexed and flat argmax diverged")
    }
  }

  test("indexed top-p probe order is identical to the flat ranked slice") {
    for ((k, p) <- Seq((100, 4), (100, 1), (7, 10))) {
      val cents = seedCents(k)
      val diff = fixtureNv.select(col("vec_id"),
          CentroidArgmax.centroid_topk(col("nv"), cents, p).as("a"),
          flatTopK(col("nv"), cents, p).as("b"))
        .filter(col("a") =!= col("b"))
      assert(diff.isEmpty, s"k=$k p=$p: indexed and flat probe order diverged")
    }
  }

  test("tie-break: duplicate centroids resolve to the lowest index") {
    val c = Array(Array(0.0, 1.0), Array(1.0, 0.0), Array(1.0, 0.0))
    val out = Seq(Tuple1(Seq(1.0, 0.0))).toDF("v")
      .select(CentroidArgmax.centroid_argmax(col("v"), c).as("a"),
        CentroidArgmax.centroid_topk(col("v"), c, 3).as("t"))
      .as[(Int, Seq[Int])].head()
    assert(out._1 == 1, "argmax must keep the first of tied centroids")
    assert(out._2 == Seq(1, 2, 0), "top-k ties must order by ascending index")
  }

  test("pruning survives an adversarial grouping: many near-identical centroids") {
    // all centroids nearly collinear — every group bound stays above
    // every sim, so pruning never fires and the scan must still be
    // exact (order/tie discipline, not the bound, decides)
    val cents = Array.tabulate(80)(i => Array(1.0, i * 1e-12))
    val probe = Seq(Tuple1(Seq(1.0, 1e-12))).toDF("v")
      .select(CentroidArgmax.centroid_argmax(col("v"), cents).as("a"),
        flatArgmax(col("v"), cents).as("b"))
      .as[(Int, Int)].head()
    assert(probe._1 == probe._2)
  }

  test("large-magnitude vectors: still bitwise-identical to flat (relative slack)") {
    // the review-flagged failure mode of an ABSOLUTE pruning slack:
    // scale vectors and centroids by 1e8, so the fp error of the
    // dot/bound folds (~1e-13 relative => ~1e3 absolute at |dot|~1e16)
    // dwarfs any absolute epsilon — the magnitude-relative slack must
    // keep pruning conservative and the result exactly the flat argmax
    val scale = 1e8
    val scaled = fixtureNv.select(col("vec_id"),
      transform(col("nv"), x => x * scale).as("nv"))
    val cents = scaled.orderBy(col("vec_id")).limit(48).select(col("nv"))
      .collect().map(_.getSeq[Double](0).toArray)
    val diff = scaled.select(col("vec_id"),
        CentroidArgmax.centroid_argmax(col("nv"), cents).as("a"),
        flatArgmax(col("nv"), cents).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.isEmpty, diff.collect().take(5).mkString("; "))
  }

  test("loud failures: ragged matrix, dim mismatch, null component") {
    intercept[IllegalArgumentException] {
      new CentroidIndex(Array(Array(1.0, 0.0), Array(1.0)))
    }
    val cents = Array(Array(1.0, 0.0))
    val e1 = intercept[Exception] {
      Seq(Tuple1(Seq(1.0, 0.0, 0.0))).toDF("v")
        .select(CentroidArgmax.centroid_argmax(col("v"), cents)).collect()
    }
    assert(e1.getMessage.contains("dimension mismatch") ||
      e1.getCause != null && e1.getCause.getMessage.contains("dimension mismatch"))
    val e2 = intercept[Exception] {
      Seq(Tuple1(Seq[java.lang.Double](1.0, null))).toDF("v")
        .select(CentroidArgmax.centroid_argmax(col("v"), cents)).collect()
    }
    assert(e2.getMessage.contains("null vector component") ||
      e2.getCause != null && e2.getCause.getMessage.contains("null vector component"))
  }
}
