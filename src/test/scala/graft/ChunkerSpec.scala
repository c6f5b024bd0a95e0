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
}
