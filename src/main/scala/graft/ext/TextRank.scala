package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ⊕ BM25 relevance ranking over a document corpus (north-star text
  * op): the standard probabilistic lexical ranking function
  * (Robertson/Spärck Jones; the BM25 form with the +1-smoothed idf,
  * as used by Lucene). Upgrades the reference's substring relevance
  * ordering (SURVEY F7, `app.py:47` sort="relevance") to a principled
  * corpus-statistics score.
  *
  * Plan shape at scale — two passes over the corpus, zero wide rows:
  *  1. ONE tiny aggregate computes every corpus statistic the score
  *     needs (N, avg document length, per-term document frequencies)
  *     as a single row — partial/final hash agg, one reduce to one
  *     row, broadcast back via a literal-free cross join.
  *  2. Per-document term frequencies are row-local array ops
  *     (`filter` HOF over the token array — codegen'd, no explode, no
  *     shuffle), so the scoring pass is scan-speed; the only shuffle
  *     in the whole query is the final top-k sort.
  * An inverted-index formulation (explode → groupBy term) would
  * shuffle |corpus| token rows to compute the same df values — the
  * single-row statistics aggregate is the 100 TB-friendly shape when
  * the query term set is small (the interactive-search case).
  *
  * Determinism: tf/dl/df/N are exact integers; avgdl is one double
  * division of exact sums; the per-term score terms are combined in
  * fixed literal order — both engines evaluate the identical
  * expression tree, so results agree bit-for-bit before the final
  * rounding.
  */
object TextRank {

  /** Score every document against `terms`, returning the input columns
    * plus `dl` (token count), one `tf_<i>` per term, and `bm25`
    * (rounded to 6 dp for engine-portable comparison).
    *
    * @param tokens ArrayType(StringType) column of document tokens
    *               (lowercased; e.g. [[TextAnalysis.tokens]])
    */
  def bm25(df: DataFrame, tokens: Column, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val toked = df.withColumn("__toks", tokens)
      .withColumn("dl", size(col("__toks")))
    val withTf = terms.zipWithIndex.foldLeft(toked) { case (acc, (t, i)) =>
      acc.withColumn(s"tf_$i",
        size(filter(col("__toks"), x => x === lit(t.toLowerCase))))
    }
    // One aggregate row: corpus size, average doc length, per-term dfs.
    val statAggs =
      count(lit(1)).as("__n") +:
      avg(col("dl")).as("__avgdl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"__df_$i"))
    val stats = withTf.agg(statAggs.head, statAggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i").cast("double")
      val idf = log(lit(1.0) +
        (col("__n").cast("double") - col(s"__df_$i") + lit(0.5)) / (col(s"__df_$i") + lit(0.5)))
      idf * tf * (lit(k1) + 1.0) /
        (tf + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / col("__avgdl")))
    }.reduce(_ + _)
    scored.withColumn("bm25", round(score, 6))
      .drop("__toks" +: "__n" +: "__avgdl" +: terms.indices.map(i => s"__df_$i"): _*)
  }

  /** ⊕ Relational phrase search — the positional-index query as one
    * join, no index materialization: a doc contains the phrase
    * `w₀ w₁ … wₖ` at base position b iff token wᵢ sits at b+i for
    * every i, so matching tokens map to `(doc, pos − i, i)` and a
    * phrase occurrence is a (doc, base) group covering all k+1
    * offsets. Handles repeated words in the phrase (a token row
    * matches EVERY offset of its word — the explode+filter keeps all
    * of them) and upgrades the reference's substring matching to
    * token-exact phrase semantics.
    *
    * Scale shape: tokens not in the phrase vocabulary are filtered
    * BEFORE the per-token explode (the fan-out is |phrase| on
    * matching tokens only), then ONE shuffle on (doc, base). Returns
    * (doc_id, n_occurrences).
    */
  def phraseMatches(docs: DataFrame, id: Column, text: Column,
                    phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    val words = phrase.map(_.toLowerCase)
    val offsets = array(words.zipWithIndex.map { case (w, i) =>
      struct(lit(w).as("w"), lit(i).as("i")) }: _*)
    docs
      .select(id.as("doc_id"),
        posexplode(TextAnalysis.tokens(text)).as(Seq("pos", "tok")))
      .filter(col("tok").isin(words.distinct: _*))
      .select(col("doc_id"), col("pos"), col("tok"), explode(offsets).as("p"))
      .filter(col("tok") === col("p.w"))
      .select(col("doc_id"), (col("pos") - col("p.i")).as("base"),
        col("p.i").as("i"))
      .distinct()
      .groupBy(col("doc_id"), col("base"))
      .agg(countDistinct(col("i")).as("__k"))
      .filter(col("__k") === phrase.length)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"))
  }

  /** ⊕ Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR
    * 2009): combine several top-k rankings of the same corpus into
    * one, `score(d) = Σ_lists 1/(k0 + rank_list(d))` — the standard
    * hybrid-retrieval combiner (lexical BM25 + dense ANN), chosen
    * over score interpolation because it needs no score calibration
    * across systems: only ranks enter.
    *
    * Each input is a named `(id, rank)` table (rank 1-based within
    * its own list; a document absent from a list simply contributes
    * nothing). Output: one row per distinct id with `rrf_units` (the
    * fused score), plus `rank_<name>` per input list (null = absent)
    * for attribution.
    *
    * Published in exact integer micro-units — each list contributes
    * `floor(10⁶ / (k0 + rank))` via [[graft.ops.Exact.ratioUnits]] —
    * so the fused ORDERING is tie-free by construction (the
    * q205/q229 publish convention: no double anywhere in a value
    * that downstream code orders or compares by; DuckDB replay is
    * literally `1000000 // (k0 + r)`).
    *
    * Scale shape: the inputs are already top-k reductions of their
    * corpora (TakeOrderedAndProject on their own scores — constant
    * rows each), so the fusion is one union + one groupBy over
    * Σ|top-k| rows. The fusion never touches a corpus.
    */
  def rrfFuse(lists: Seq[(String, DataFrame)], k0: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranking")
    require(lists.map(_._1).distinct.size == lists.size,
      "rrfFuse list names must be unique (they become rank_<name> columns)")
    require(k0 >= 0, s"rrfFuse k0 must be >= 0, got $k0")
    val tagged = lists.map { case (name, df) =>
      df.select(col("id"), lit(name).as("__sys"),
        col("rank").cast("long").as("__r"))
    }.reduce(_.unionByName(_))
    val rankCols = lists.map { case (name, _) =>
      max(when(col("__sys") === name, col("__r"))).as(s"rank_$name")
    }
    val aggs = sum(graft.ops.Exact.ratioUnits(
      lit(1L), lit(k0.toLong) + col("__r"), 6)).as("rrf_units") +: rankCols
    tagged.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }
}
