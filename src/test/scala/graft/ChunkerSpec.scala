package graft

import org.apache.spark.sql.functions._
import graft.ext.Chunker

/** Token-window chunking (⊕): coverage/overlap invariants checked by
  * reconstructing the original token stream from the chunks, plus the
  * short-document and argument-guard edges.
  */
class ChunkerSpec extends SparkSuite {
  import spark.implicits._

  private def docs(ns: Int*) = ns.zipWithIndex.map { case (n, i) =>
    (i.toLong, (0 until n).map(j => s"t$j"))
  }.toDF("doc_id", "toks")

  private def chunksOf(df: org.apache.spark.sql.DataFrame, size: Int, overlap: Int) =
    Chunker.chunkTokens(df, col("toks"), size, overlap)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_tokens"), col("chunk_len"))
      .as[(Long, Long, Seq[String], Int)].collect()
      .groupBy(_._1).map { case (id, rows) => id -> rows.sortBy(_._2) }

  test("chunks reconstruct the token stream; consecutive chunks share exactly `overlap`") {
    val size = 6; val overlap = 2; val step = size - overlap
    val d = docs(1, 5, 6, 7, 13, 40)
    val orig = d.as[(Long, Seq[String])].collect().toMap
    for ((id, rows) <- chunksOf(d, size, overlap)) {
      // chunk_idx is dense from 0
      assert(rows.map(_._2).toList == rows.indices.map(_.toLong).toList)
      // reconstruction: first chunk + step-suffix of each later chunk
      val rebuilt = rows.head._3 ++ rows.tail.flatMap(_._3.drop(overlap))
      assert(rebuilt == orig(id), s"doc $id rebuilt=$rebuilt orig=${orig(id)}")
      // pairwise overlap
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a._3.takeRight(overlap) == b._3.take(overlap))
        case _ =>
      }
      // only the last chunk may be short
      rows.init.foreach(r => assert(r._4 == size))
      assert(rows.last._4 <= size && rows.last._4 > 0)
      // chunk_len matches the array
      rows.foreach(r => assert(r._3.size == r._4))
    }
  }

  test("documents shorter than one window yield exactly one full-copy chunk") {
    for ((id, rows) <- chunksOf(docs(1, 3, 5), size = 6, overlap = 2)) {
      assert(rows.length == 1, s"doc $id: ${rows.length} chunks")
    }
    // boundary: n == size -> one chunk too
    val exact = chunksOf(docs(6), size = 6, overlap = 2)
    assert(exact(0L).length == 1)
  }

  test("zero overlap partitions the stream") {
    for ((_, rows) <- chunksOf(docs(10), size = 4, overlap = 0)) {
      assert(rows.map(_._4).sum == 10)
      assert(rows.flatMap(_._3).toList == (0 until 10).map(j => s"t$j").toList)
    }
  }

  test("argument guards") {
    intercept[IllegalArgumentException](Chunker.chunkTokens(docs(3), col("toks"), 0, 0))
    intercept[IllegalArgumentException](Chunker.chunkTokens(docs(3), col("toks"), 4, 4))
    intercept[IllegalArgumentException](Chunker.chunkTokens(docs(3), col("toks"), 4, -1))
  }

  test("plan: chunking adds no exchange (row-local fan-out)") {
    val plan = Chunker.chunkTokens(docs(40), col("toks"), 6, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunker must not shuffle:\n$plan")
  }

  // --- content-defined chunking ---

  private def cdc(texts: (Long, String)*): Map[Long, Seq[(Long, String)]] = {
    import spark.implicits._
    Chunker.contentChunks(texts.toSeq.toDF("doc_id", "text"), col("text"))
      .select(col("doc_id"), col("chunk_idx"), col("chunk"))
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._2, r._3)).toSeq).toMap
  }

  test("contentChunks: reconstruction, single-chunk shorts, deterministic cuts") {
    val long = ("the quick brown fox jumps over the lazy dog " * 20).trim
    val out = cdc((1L, long), (2L, "short"), (3L, ""))
    assert(out(1L).map(_._2).mkString == long, "chunks must concatenate back to the text")
    assert(out(1L).map(_._1) == out(1L).indices.map(_.toLong), "contiguous 0-based indices")
    assert(out(2L) == Seq((0L, "short")), "sub-window doc is one chunk")
    assert(out(3L).map(_._2) == Seq(""), "empty doc yields one empty chunk")
    assert(cdc((1L, long))(1L) == out(1L), "cuts are deterministic")
  }

  test("contentChunks: an edit only disturbs the chunks it touches (the CDC property)") {
    // deterministic pseudo-random text: a periodic string can have
    // every distinct window miss the cut condition (44 windows at
    // divisor 64 ≈ a coin flip); ~3000 distinct windows cannot
    val base = (1 to 3000).map { i =>
      val c = ('a' + ((i * i * 31 + i * 17) % 26)).toChar
      if (i % 6 == 0) ' ' else c
    }.mkString.trim
    val edited = base.substring(0, 400) + "INSERTED EDIT " + base.substring(400)
    val a = cdc((1L, base))(1L).map(_._2)
    val b = cdc((1L, edited))(1L).map(_._2)
    assert(a.size > 5, s"expected several chunks, got ${a.size} — tune divisor")
    // chunks strictly after the edit region re-align content-identically
    val sharedTail = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.size
    assert(sharedTail >= a.size / 3,
      s"CDC must re-align after an edit: only $sharedTail of ${a.size} tail chunks shared")
    // and at least one pre-edit chunk is shared verbatim too
    assert(b.toSet.intersect(a.toSet).nonEmpty)
  }

  test("contentChunks runs on an actual stream and matches the batch chunking") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val sample = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)].collect().take(20)
    val mem = MemoryStream[(Long, String)]
    val chunked = Chunker.contentChunks(
      mem.toDF().toDF("doc_id", "text"), col("text"))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_hash"))
    val q = chunked.writeStream.outputMode("append")
      .format("memory").queryName("cdc_out").start()
    try {
      mem.addData(sample.take(10): _*)
      q.processAllAvailable()
      mem.addData(sample.drop(10): _*)
      q.processAllAvailable()
      val got = spark.table("cdc_out")
        .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2))
      val want = Chunker.contentChunks(
          sample.toSeq.toDF("doc_id", "text"), col("text"))
        .select(col("doc_id"), col("chunk_idx"), col("chunk_hash"))
        .as[(Long, Long, String)].collect().sortBy(r => (r._1, r._2))
      assert(got.toSeq == want.toSeq)
    } finally q.stop()
  }

  test("CdcCuts rolling hash equals the direct polynomial re-fold on fixture texts") {
    import spark.implicits._
    val pw = Chunker.powerTable(16, 1000003L)
    def direct(text: String): Seq[Long] = {
      val codes = text.codePoints().toArray.map(_.toLong)
      (16 to codes.length).filter { p =>
        val s = (1 to 16).map(j => codes(p - 16 + j - 1) * pw(j - 1)).sum
        s % 1000003L % 64L == 0L
      }.map(_.toLong)
    }
    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("text")).as[String].collect().take(100) ++
      Seq("", "x", "a" * 15, "a" * 16, "é" * 40 + " plus ascii tail " * 10)
    texts.foreach { t =>
      val got = graft.functions.CdcCuts.compute(t, 16, 1000003L, 64L).toLongArray.toSeq
      assert(got == direct(t), s"cut mismatch on ${t.take(40)}…")
    }
  }

  test("contentChunks: expected chunk length tracks the divisor; no shuffle in the plan") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val df = Chunker.contentChunks(docs, col("text"))
    val lens = df.agg(avg(col("chunk_len"))).as[Double].head()
    assert(lens > 16 && lens < 400, s"mean chunk length $lens implausible for divisor 64")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"contentChunks must be row-local:\n$plan")
  }
}
