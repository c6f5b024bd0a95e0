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
    * pair_count) — built from one collected row per iteration.
    * Stops early if the pair space exhausts.
    */
  def learnMerges(wordFreqs: DataFrame, nMerges: Int): DataFrame = {
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
