package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ⊕ BPE tokenizer training (Sennrich et al. 2016, "Neural Machine
  * Translation of Rare Words with Subword Units") — the
  * vocabulary-learning stage of a training-data pipeline, run where
  * it is cheap: ONE corpus pass builds the word-frequency table, and
  * every merge iteration after that operates on the WORD TYPES
  * (vocabulary-sized, ~√corpus by Heaps' law), never the corpus.
  * At 100 TB the corpus pass is the only big job; the k merge
  * iterations are k small vocabulary-sized jobs with one-row driver
  * state each (the argmax pair — the centroid-collect precedent).
  *
  * Symbol encoding (the oracle contract): a word's symbol sequence is
  * a sentinel-bracketed string — `spark` → `<s><p><a><r><k><_>`
  * (`<_>` = end-of-word symbol). Merging pair (l, r) is then the
  * LITERAL string replacement `<l><r>` → `<lr>`: left-to-right
  * non-overlapping scan, which is exactly greedy BPE application
  * order, and the brackets make cross-symbol false matches
  * impossible (`<xa><b>` never contains `<a><b>`). Both engines'
  * literal `replace` share these semantics, so the DuckDB oracle
  * replays training bit-for-bit. Only `[a-z0-9]+` word types
  * participate (sentinels and `_` stay out of the alphabet;
  * non-word tokens are dropped, documented).
  *
  * Determinism: pair counts are exact integer sums of word
  * frequencies; the argmax tie-breaks on (count DESC, left ASC,
  * right ASC).
  */
object Bpe {

  /** One corpus pass: word-type frequencies over
    * [[TextAnalysis.tokens]], restricted to `[a-z0-9]+` types.
    */
  def wordFreqs(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextAnalysis.tokens(text)).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** `word` → initial sentinel-bracketed symbol string. */
  private def symbolize(word: Column): Column =
    concat(regexp_replace(word, "(.)", "<$1>"), lit("<_>"))

  /** Adjacent-pair counts over a (sym, freq) vocabulary table:
    * overlapping occurrences all count (classic get_stats), weighted
    * by word frequency. Map-side combinable aggregation over a
    * vocab-sized input.
    */
  private def pairCounts(vocab: DataFrame): DataFrame = {
    val arr = symbolsOf(col("sym"))
    vocab.select(col("freq"), arr.as("a"))
      // single-symbol words contribute no pairs; the filter also keeps
      // Spark's sequence() (which turns (1, 0) into a DESCENDING ramp,
      // not an empty list) from fabricating out-of-range indices
      .filter(size(col("a")) >= 2)
      .select(col("freq"), col("a"),
        explode(sequence(lit(1), size(col("a")) - 1)).as("i"))
      .select(col("freq"), element_at(col("a"), col("i")).as("l"),
        element_at(col("a"), col("i") + 1).as("r"))
      .groupBy(col("l"), col("r")).agg(sum(col("freq")).as("c"))
  }

  /** Learn up to `nMerges` merges from a (word, freq) table. Returns
    * the learned merge table (merge_rank, sym_left, sym_right,
    * pair_count). Stops early if the pair space exhausts.
    *
    * Iteration engine choice (the scale fix for "one Spark job per
    * merge"): the merge loop's state is the word-TYPE table —
    * vocabulary-sized (~√corpus by Heaps' law), NEVER corpus-sized —
    * so when it fits `maxLocalTypes` rows (the documented driver
    * bound — the same model-state justification as the centroid
    * collects) it is collected ONCE and the merges run in-memory with
    * incremental pair-count maintenance: O(1) Spark jobs total
    * regardless of merge count, which is what a real 32k-100k-merge
    * tokenizer needs (32k sequential Spark jobs would be pure
    * scheduler overhead on model-sized state). Above the bound,
    * [[learnMergesDistributed]] keeps the one-job-per-merge
    * vocabulary-table loop. BpeSpec proves the two engines produce
    * identical merge tables on the fixture corpus.
    */
  def learnMerges(wordFreqs: DataFrame, nMerges: Int,
                  maxLocalTypes: Int = 2000000): DataFrame = {
    require(nMerges > 0, "nMerges must be positive")
    val spark = wordFreqs.sparkSession
    import spark.implicits._
    // engine selection gated by a COUNT before any collect (review
    // round-14): the former "the bound check IS the collect" form
    // (limit bound+1) pulled up to 2M+1 word/freq ROWS to the driver
    // just to decide — with long word types that can pressure or OOM
    // a small driver before the distributed fallback is ever chosen.
    // A count() moves one long to the driver; only a table already
    // known to fit pays the collect. The aggregation is persisted
    // across the count/collect (or count/first-merge-round) pair so
    // the corpus scan behind it runs once, not once per action
    // (review round-15: the un-persisted form paid two full scans on
    // the local path).
    val staged = wordFreqs.persist()
    try {
      val nTypes = staged.count()
      if (nTypes > maxLocalTypes) learnMergesDistributed(staged, nMerges)
      else {
        val head = staged.select(col("word").cast("string"), col("freq").cast("long"))
          .as[(String, Long)].collect()
        learnMergesLocal(head, nMerges).toDF(
          "merge_rank", "sym_left", "sym_right", "pair_count")
      }
    } finally staged.unpersist()
  }

  /** The distributed merge loop — one vocabulary-sized Spark job +
    * one 1-row collect PER MERGE. Correct at any vocabulary size but
    * pays per-merge scheduler latency; [[learnMerges]] uses it only
    * above the driver bound.
    */
  private[graft] def learnMergesDistributed(wordFreqs: DataFrame,
                                            nMerges: Int): DataFrame = {
    require(nMerges > 0, "nMerges must be positive")
    val spark = wordFreqs.sparkSession
    var vocab = wordFreqs.select(symbolize(col("word")).as("sym"), col("freq"))
      .persist()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var done = false
    var rank = 1
    while (rank <= nMerges && !done) {
      val best = pairCounts(vocab)
        .orderBy(desc("c"), asc("l"), asc("r")).limit(1)
        .collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((rank, l, r, c))
        val merged = vocab.select(
          replace(col("sym"), lit(s"<$l><$r>"), lit(s"<$l$r>")).as("sym"), col("freq"))
          .persist()
        merged.count() // materialize before unpersisting the parent
        vocab.unpersist()
        vocab = merged
        rank += 1
      }
    }
    vocab.unpersist()
    import spark.implicits._
    merges.toSeq.toDF("merge_rank", "sym_left", "sym_right", "pair_count")
  }

  /** The in-memory merge loop over a collected (word, freq) table —
    * classic incremental BPE (Sennrich 2016's learn_bpe shape):
    * adjacent-pair counts and a pair→words occurrence index are
    * maintained incrementally (only words CONTAINING the merged pair
    * are touched per round), with a lazy-deletion max-heap for the
    * argmax so each round costs O(touched words · word length), not
    * O(vocabulary). Semantics are bit-identical to the distributed
    * loop: overlapping adjacent pairs all count (weighted by word
    * frequency), argmax tie-breaks (count DESC, left ASC, right ASC),
    * and merging is the same left-to-right non-overlapping scan the
    * sentinel-bracketed literal replace performs (symbols never
    * contain brackets, so every string match is symbol-aligned).
    */
  private[graft] def learnMergesLocal(types: Array[(String, Long)],
                                      nMerges: Int): Seq[(Int, String, String, Long)] = {
    import scala.collection.mutable
    val words = types.map { case (w, _) =>
      val b = mutable.ArrayBuffer.empty[String]
      w.foreach(c => b += c.toString)
      b += "_"
      b
    }
    val freqs = types.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val occ = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    // max-heap: count DESC, then left ASC, right ASC — dequeue yields
    // exactly the distributed orderBy(desc(c), asc(l), asc(r)) head
    val ord = new Ordering[(Long, String, String)] {
      def compare(a: (Long, String, String), b: (Long, String, String)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c
        else {
          val l = b._2.compareTo(a._2)
          if (l != 0) l else b._3.compareTo(a._3)
        }
      }
    }
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](ord)
    def bump(p: (String, String), by: Long): Unit = {
      val n = counts.getOrElse(p, 0L) + by
      if (n <= 0L) counts.remove(p) else { counts(p) = n; heap.enqueue((n, p._1, p._2)) }
    }
    words.indices.foreach { i =>
      val s = words(i)
      var j = 0
      while (j + 1 < s.length) {
        val p = (s(j), s(j + 1))
        bump(p, freqs(i))
        occ.getOrElseUpdate(p, mutable.Set.empty) += i
        j += 1
      }
    }
    val merges = mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    while (rank <= nMerges && counts.nonEmpty) {
      // lazy deletion: skip heap entries whose count is stale
      var top = heap.dequeue()
      while (counts.get((top._2, top._3)).forall(_ != top._1)) top = heap.dequeue()
      val (c, l, r) = top
      merges += ((rank, l, r, c))
      val touched = occ.getOrElse((l, r), mutable.Set.empty).toArray
      touched.foreach { i =>
        val old = words(i)
        // left-to-right non-overlapping scan ≡ literal replace
        val merged = mutable.ArrayBuffer.empty[String]
        var j = 0
        var changed = false
        while (j < old.length) {
          if (j + 1 < old.length && old(j) == l && old(j + 1) == r) {
            merged += l + r; j += 2; changed = true
          } else { merged += old(j); j += 1 }
        }
        if (changed) {
          var k = 0
          while (k + 1 < old.length) {
            val p = (old(k), old(k + 1))
            bump(p, -freqs(i))
            occ.get(p).foreach(_ -= i)
            k += 1
          }
          k = 0
          while (k + 1 < merged.length) {
            val p = (merged(k), merged(k + 1))
            bump(p, freqs(i))
            occ.getOrElseUpdate(p, mutable.Set.empty) += i
            k += 1
          }
          words(i) = merged
        } else occ.get((l, r)).foreach(_ -= i) // stale index entry
      }
      rank += 1
    }
    merges.toSeq
  }

  /** Apply an ordered merge list to a word column — the ENCODE side:
    * a pure projection (fold of literal replaces), no shuffle, usable
    * on a stream or the full corpus. Returns the symbol string; use
    * [[symbolsOf]] to split it.
    */
  def applyMerges(word: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(symbolize(word)) { case (acc, (l, r)) =>
      replace(acc, lit(s"<$l><$r>"), lit(s"<$l$r>"))
    }

  /** Symbol array from a sentinel-bracketed symbol string. */
  def symbolsOf(sym: Column): Column =
    split(substr(sym, lit(2), length(sym) - 2), "><")
}
