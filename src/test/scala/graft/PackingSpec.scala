package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Packing

class PackingSpec extends SparkSuite {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private def handToks = Seq(
    (1L, 4L), (2L, 3L), (3L, 5L), (4L, 10L), (5L, 1L)
  ).toDF("id", "n_toks")

  test("hand-computed packing at capacity 10") {
    // stream offsets: 0, 4, 7, 12, 22 — doc 3 crosses the 10-boundary,
    // doc 4 starts mid-seq-1 and fills through seq 2, doc 5 is last
    val out = Packing.packSequences(handToks, Seq(col("id")), "n_toks", 10L)
      .select("id", "tok_start", "seq_first", "seq_last", "n_seqs")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 0L, 1L),
      (2L, 4L, 0L, 0L, 1L),
      (3L, 7L, 0L, 1L, 2L),
      (4L, 12L, 1L, 2L, 2L),
      (5L, 22L, 2L, 2L, 1L)))
  }

  test("matches the naive global-window prefix sum on fixture documents") {
    val t = docs.select(col("doc_id"),
      graft.ext.TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"))
    val cap = 512L
    val naive = t.filter(col("n_toks") > 0)
      .withColumn("tok_start", coalesce(sum(col("n_toks")).over(
        Window.orderBy(col("doc_id")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("doc_id"), col("tok_start"))
    val scalable = Packing.packSequences(t, Seq(col("doc_id")), "n_toks", cap)
      .select(col("doc_id"), col("tok_start"))
    assert(scalable.except(naive).isEmpty && naive.except(scalable).isEmpty)
  }

  test("invariant to the range-partition count, and token-conserving") {
    val t = docs.select(col("doc_id"),
      graft.ext.TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"))
    val base = Packing.packSequences(t, Seq(col("doc_id")), "n_toks", 256L,
        numPartitions = Some(3))
      .select("doc_id", "tok_start", "seq_first", "seq_last", "n_seqs")
    for (n <- Seq(1, 2, 7)) {
      val other = Packing.packSequences(t, Seq(col("doc_id")), "n_toks", 256L,
          numPartitions = Some(n))
        .select("doc_id", "tok_start", "seq_first", "seq_last", "n_seqs")
      assert(other.except(base).isEmpty && base.except(other).isEmpty, s"n=$n drifted")
    }
    // conservation: the stream is gapless — max(tok_start + n_toks) ==
    // sum(n_toks), and every doc's start is the previous doc's end
    val withEnd = Packing.packSequences(t, Seq(col("doc_id")), "n_toks", 256L)
    val total = t.filter(col("n_toks") > 0).agg(sum("n_toks")).as[Long].head()
    val maxEnd = withEnd.agg(max(col("tok_start") + col("n_toks"))).as[Long].head()
    assert(maxEnd == total, s"stream has gaps: end $maxEnd vs total $total")
  }

  test("zero-token rows are dropped; span arithmetic is exact at boundaries") {
    val t = Seq((1L, 0L), (2L, 10L), (3L, 10L), (4L, 1L)).toDF("id", "n_toks")
    val out = Packing.packSequences(t, Seq(col("id")), "n_toks", 10L)
      .select("id", "tok_start", "seq_first", "seq_last", "n_seqs")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // doc 1 dropped; docs 2 and 3 tile seqs 0 and 1 EXACTLY (a doc
    // ending on a boundary does not touch the next sequence)
    assert(out == Seq(
      (2L, 0L, 0L, 0L, 1L),
      (3L, 10L, 1L, 1L, 1L),
      (4L, 20L, 2L, 2L, 1L)))
  }

  test("no single-task window in the plan") {
    val t = docs.select(col("doc_id"),
      graft.ext.TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"))
    val out = Packing.packSequences(t, Seq(col("doc_id")), "n_toks", 512L,
      numPartitions = Some(4))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition") && !plan.contains("Window"),
      s"packing must not be a single-task global window:\n$plan")
    assert(out.rdd.getNumPartitions == 4)
  }

  test("incremental packing: pack(history) + pack(increment, startOffset=end) ≡ full repack") {
    val t = docs.select(col("doc_id"),
      graft.ext.TextAnalysis.tokenCount(col("text")).cast("long").as("n_toks"))
    val history = t.filter(col("doc_id") < 250)
    val increment = t.filter(col("doc_id") >= 250)
    val full = Packing.packSequences(t, Seq(col("doc_id")), "n_toks", 256L)
      .select("doc_id", "tok_start", "seq_first", "seq_last", "n_seqs")
    val packedHist = Packing.packSequences(history, Seq(col("doc_id")), "n_toks", 256L)
    val end = packedHist.agg(max(col("tok_start") + col("n_toks"))).as[Long].head()
    val packedInc = Packing.packSequences(increment, Seq(col("doc_id")), "n_toks", 256L,
      startOffset = end)
    val combined = packedHist.unionByName(packedInc)
      .select("doc_id", "tok_start", "seq_first", "seq_last", "n_seqs")
    assert(combined.except(full).isEmpty && full.except(combined).isEmpty,
      "incremental packing diverged from a full repack")
  }

  test("shuffleShards: reproducible permutation, full shards, matches naive window") {
    val t = docs.select(col("doc_id"))
    val a = graft.ops.Packing.shuffleShards(t, col("doc_id"), 64L)
      .select("doc_id", "shuffle_rank", "shard_id")
    val b = graft.ops.Packing.shuffleShards(t.repartition(7), col("doc_id"), 64L)
      .select("doc_id", "shuffle_rank", "shard_id")
    assert(a.except(b).isEmpty && b.except(a).isEmpty,
      "permutation must be reproducible across reruns and partitionings")
    // naive single-task window, the oracle's form
    val naive = t.withColumn("shuffle_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("shuffle_rank"))
    assert(a.select("doc_id", "shuffle_rank").except(naive).isEmpty &&
      naive.except(a.select("doc_id", "shuffle_rank")).isEmpty)
    // every shard full at 64 except the last; ranks contiguous
    val sizes = a.groupBy("shard_id").count().orderBy("shard_id")
      .as[(Long, Long)].collect()
    assert(sizes.init.forall(_._2 == 64L) && sizes.last._2 <= 64L)
    // and the permutation is actually a shuffle, not the identity
    val inOrder = a.orderBy("shuffle_rank").select("doc_id").as[Long].collect()
    assert(inOrder.toSeq != inOrder.sorted.toSeq, "hash order degenerated to id order")
  }

  test("fragmentation histogram: hand case and doc-count conservation") {
    val out = Packing.fragmentation(
        Packing.packSequences(handToks, Seq(col("id")), "n_toks", 10L), "n_toks")
      .as[(Long, Long, Long)].collect().toSeq
    // spans: docs 1,2,5 → 1 seq; docs 3,4 → 2 seqs
    assert(out == Seq((1L, 3L, 8L), (2L, 2L, 15L)))
  }
}
