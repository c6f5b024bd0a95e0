package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Ids

class IdsSpec extends SparkSuite {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  test("stableRowNumber equals the naive global-window numbering") {
    val naive = docs.withColumn("row_num",
        row_number().over(Window.orderBy(col("source"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("row_num"))
    val scalable = Ids.stableRowNumber(docs, Seq(col("source"), col("doc_id")))
      .select(col("doc_id"), col("row_num"))
    assert(scalable.except(naive).isEmpty && naive.except(scalable).isEmpty)
  }

  test("numbering is invariant to the range-partition count (1..7) and contiguous") {
    val base = Ids.stableRowNumber(docs, Seq(col("doc_id")), numPartitions = Some(3))
      .select(col("doc_id"), col("row_num"))
    for (n <- Seq(1, 2, 5, 7)) {
      val other = Ids.stableRowNumber(docs, Seq(col("doc_id")), numPartitions = Some(n))
        .select(col("doc_id"), col("row_num"))
      assert(other.except(base).isEmpty && base.except(other).isEmpty, s"n=$n drifted")
    }
    val nums = base.select("row_num").as[Long].collect().sorted
    assert(nums.head == 1L && nums.last == nums.length.toLong &&
      nums.zipWithIndex.forall { case (v, i) => v == i + 1L }, "not contiguous 1..N")
  }

  test("no single-task stage: zipWithIndex construction has no global window, and partitions stay parallel") {
    val out = Ids.stableRowNumber(docs, Seq(col("doc_id")), numPartitions = Some(4))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition") && !plan.contains("Window"),
      s"result plan must carry no single-task window:\n$plan")
    // the zipped RDD preserves the range layout: 4 partitions, and the
    // numbering is contiguous per partition (offsets applied correctly)
    assert(out.rdd.getNumPartitions == 4)
    val perPart = out.select(col("row_num")).rdd
      .mapPartitions(it => Iterator(it.map(_.getLong(0)).toSeq)).collect()
    perPart.filter(_.nonEmpty).foreach { p =>
      assert(p == (p.head to p.last), s"non-contiguous partition numbering: ${p.take(5)}…")
    }
    // The naive form, by contrast, is a global-sort window over the scan:
    val naive = docs.withColumn("rn", row_number().over(Window.orderBy(col("doc_id"))))
      .queryExecution.executedPlan.toString
    assert(naive.contains("SinglePartition"), "control: naive plan should be single-task")
  }

  test("handles fewer rows than partitions and a one-row frame") {
    val tiny = Seq((3L, "c"), (1L, "a"), (2L, "b")).toDF("id", "v")
    val out = Ids.stableRowNumber(tiny, Seq(col("id")), numPartitions = Some(8))
      .orderBy("row_num").select("id", "row_num").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
    val one = Seq((42L, "x")).toDF("id", "v")
    assert(Ids.stableRowNumber(one, Seq(col("id"))).select("row_num").as[Long].collect().toSeq == Seq(1L))
  }
}
