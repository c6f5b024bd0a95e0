package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ⊕ Training-data curation pipeline (north star): the composition a
  * 100 TB pretraining-data job actually runs, as ONE declarative
  * DataFrame program — quality gate → topic/language gate → exact
  * dedup → near-dup removal → per-source accounting.
  *
  * Stage order is part of the contract (and of the cost model):
  * row-local gates run first so the dedup shuffles only move
  * survivors; exact dedup (cheap, one hash shuffle on a 32-byte
  * fingerprint) runs before the LSH pipeline so near-dup never pays
  * for byte-identical copies.
  *
  * Shuffle inventory at scale: gates are scan-local; exact dedup is
  * one shuffle on `fp`; near-dup is the [[Dedup.nearDupPairs]]
  * single-scan band shuffle over survivors + one broadcast-able
  * anti-join of the (small) drop list; stats is one partial-aggregated
  * shuffle on `source`.
  */
object Curation {

  /** @param topics      classifier labels to KEEP (see
    *                    [[TextAnalysis.classifyByLexicon]])
    * @param blocklist   substring/phrase terms that DROP a document on
    *                    any hit (case-insensitive) — the C4-badwords /
    *                    RefinedWeb blocklist stage, matched by ONE
    *                    Aho-Corasick automaton
    *                    ([[graft.functions.DictMatch]]) so the gate is
    *                    O(text + matches) per row and O(1) plan nodes
    *                    at any dictionary size (10k-1M terms in
    *                    production)
    * @param repetitionGate run [[TextAnalysis.gopherRepetitionGate]]
    *                    (Rae et al. 2021 repetition rules — dup
    *                    lines, top/dup n-gram coverage) and drop
    *                    documents failing ANY rule — the other half
    *                    of the MassiveText screen next to the quality
    *                    gate; default off like the blocklist. q237
    *                    measured the two gates' reject sets as
    *                    non-redundant, so a production `curate` run
    *                    wants both on.
    * @param jaccard     near-dup threshold for the MinHash pipeline
    * @param targetRecall when set, the near-dup stage derives its
    *                    banding geometry from (jaccard, targetRecall)
    *                    via [[Dedup.bandingForRecall]] instead of the
    *                    fixed 8×2 default — [[Dedup.nearDupPairsForRecall]]
    *                    deployed inside the pipeline (a corpus-scale
    *                    run wants `Some(0.95)`; the default None keeps
    *                    the oracle-anchored fixed geometry)
    * @param maxBucket   LSH skew backstop, see [[Dedup.bucketPairs]]
    */
  case class Params(
      minTokens: Int = 25,
      minQuality: Double = 0.35,
      topics: Seq[String] = Nil,        // empty = keep all labels
      lexicons: Seq[(String, Seq[String])] = Nil,
      blocklist: Seq[String] = Nil,     // empty = no blocklist gate
      repetitionGate: Boolean = false,
      jaccard: Double = 0.8,
      targetRecall: Option[Double] = None,
      maxBucket: Int = Dedup.DefaultMaxBucket) {
    /** The near-dup banding geometry this parameter set rides:
      * derived from the recall contract when given, else the fixed
      * oracle-anchored default. One definition consumed by BOTH the
      * batch pipeline and the streaming form.
      */
    def bandGeometry: (Int, Int) =
      targetRecall.fold((8, 2))(r => Dedup.bandingForRecall(jaccard, r))
  }

  /** Survivors of the full pipeline, with their curation features
    * (n_tokens, quality, topic) attached. Near-dup survivor rule:
    * a document is dropped iff it near-pairs with ANY lower-id
    * document (canonical-min rule) — the standard single-pass
    * approximation of connected-component dedup (iterative union-find
    * is a multi-job fixpoint; the greedy rule over-drops only inside
    * chains a<b<c where a~b, b~c, a≁c, and never under-drops).
    */
  /** The pipeline's ROW-LOCAL prefix — scoring projection + quality/
    * topic/blocklist gates. Stateless (scan-local, no shuffle), so it
    * is valid verbatim on a STREAMING DataFrame too: this is the
    * stage [[graft.streaming.EventStream]]'s `curateStream` shares
    * byte-for-byte with the batch form, which is what makes the
    * batch≡streaming equivalence a structural property rather than a
    * re-implementation kept in sync by hand.
    */
  def rowStages(docs: DataFrame, id: Column, source: Column, text: Column,
                p: Params): DataFrame =
    docs.select(
        id.as("doc_id"), source.as("source"), text.as("text"),
        TextAnalysis.tokenCount(text).as("n_tokens"),
        TextAnalysis.qualityScore(text).as("quality"),
        (if (p.lexicons.nonEmpty)
           TextAnalysis.classifyByLexicon(text, p.lexicons)
         else lit("und")).as("topic"),
        TextAnalysis.fingerprint(text).as("fp"))
      .filter(col("n_tokens") >= p.minTokens && col("quality") >= p.minQuality)
      .filter(if (p.topics.nonEmpty) col("topic").isin(p.topics: _*) else lit(true))
      .filter(if (p.blocklist.nonEmpty)
          !graft.functions.DictMatch.dict_contains_any(col("text"), p.blocklist)
        else lit(true))

  def curate(docs: DataFrame, id: Column, source: Column, text: Column,
             p: Params): DataFrame = {
    val rowGated0 = rowStages(docs, id, source, text, p)
    // repetition gate AFTER the row-local gates: it is the one
    // shuffle-bearing screen (per-doc gram aggregation), so it should
    // only touch row-local survivors; its pass set semi-joins back —
    // survivors keep their full feature row. The gate's metric chain
    // scans its input ~5 times (line stats, two gram passes, token
    // lengths) and the semi-join reads it once more, so when the gate
    // is on the row-gated survivors are persisted — without this every
    // gate scan re-ran the full quality/lexicon/fingerprint expression
    // chain over the source (round 19: q240's executed plan carried 60
    // source scans and it benched 8.7 s; staged, warm runs read 1.9 s).
    // Same lifecycle stance as `exact` below.
    val rowGated =
      if (p.repetitionGate) rowGated0.persist() else rowGated0
    val gated =
      if (!p.repetitionGate) rowGated
      else rowGated.join(
        TextAnalysis.gopherRepetitionGate(rowGated, col("doc_id"), col("text"))
          .filter(col("passes")).select(col("doc_id")),
        Seq("doc_id"), "left_semi")
    // exact dedup: min-id survivor per content fingerprint (W1 head on
    // the 32-byte fp key — the text itself never shuffles). The
    // survivor set feeds TWO consumers (near-dup pair generation and
    // the final anti-join); persisted so the gate+dedup subtree is
    // scanned and evaluated once, not once per consumer — at scale
    // this is the checkpoint a curation job would write anyway.
    // Cache lifecycle: the entry lives until session end (survivors
    // are the smallest set in the pipeline); a caller needing eager
    // reclamation should write/checkpoint the result and unpersist
    // via its own handle.
    val exact = graft.ops.TopK.perGroupHead(gated, col("fp"), col("doc_id"), 1)
      .persist()
    // Cache size-class audit (round 20): `exact` is SURVIVOR-rows-sized
    // (the smallest set in the pipeline — the checkpoint a curation job
    // would write anyway) and lives until session end. `rowGated` is
    // CORPUS-SURVIVOR-sized including text and every feature column —
    // too big to pin for a session at 100 TB — so when the gate is on,
    // `exact` is materialized eagerly (one action; the gate scans +
    // semi-join + exact dedup all ride the rowGated cache inside it)
    // and rowGated is released immediately after, the Bpe.scala
    // materialize-then-unpersist discipline.
    if (p.repetitionGate) {
      exact.count()
      rowGated.unpersist()
    }
    // near-dup removal among exact survivors, at the geometry the
    // Params' recall contract derives (fixed 8×2 when none given)
    val (numHashes, rowsPerBand) = p.bandGeometry
    val pairs = Dedup.nearDupPairs(exact, col("doc_id"), col("text"),
      numHashes = numHashes, rowsPerBand = rowsPerBand,
      threshold = p.jaccard, maxBucket = p.maxBucket)
    val drops = pairs.select(col("id_b").as("doc_id")).distinct()
    exact.join(drops, Seq("doc_id"), "left_anti")
  }

  /** ⊕ Token-budget shard packing (context-window assembly for
    * pretraining): within each `groupCol`, documents in `orderCol`
    * order are packed into shards of ~`budget` tokens by running-total
    * assignment — `shard = floor(start_offset / budget)` where
    * start_offset is the cumulative token count BEFORE the doc. One
    * window (single shuffle on the group key, streaming running sum);
    * a doc straddling a boundary goes to the shard its first token
    * lands in (shards overflow by at most one doc, never split one).
    */
  def packShards(docs: DataFrame, groupCol: Column, orderCol: Column,
                 nTokens: Column, budget: Int): DataFrame = {
    require(budget > 0)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .withColumn("_start", coalesce(sum(nTokens).over(w), lit(0L)))
      .withColumn("shard_id", (col("_start") / budget).cast("long"))
      .drop("_start")
  }

  /** ⊕ Training-sequence assembly — the step after [[packShards]]:
    * each shard's documents concatenate IN ORDER with a document
    * separator into the one string a tokenizer consumes. Order is
    * determinized with the q31 trick — `collect_list` order under a
    * shuffle is nondeterministic, so the aggregate collects
    * (order, text) structs and `sort_array` fixes the sequence
    * row-locally before the join. One shuffle (the group-by); the
    * concatenation itself never crosses partitions.
    *
    * Scale note: a shard's sequence is ~`budget` tokens by
    * construction, so row width is bounded by the packing budget —
    * the assembly cannot produce a pathological giant row unless a
    * SINGLE document already exceeds the budget (packShards'
    * documented straddle-by-one-doc contract).
    */
  def assembleSequences(docs: DataFrame, groupCol: Column, orderCol: Column,
                        textCol: Column, nTokens: Column, budget: Int,
                        sep: String = "<|endofdoc|>"): DataFrame = {
    val packed = packShards(
      docs.select(groupCol.as("group"), orderCol.as("__o"),
        textCol.as("__txt"), nTokens.as("__nt")),
      col("group"), col("__o"), col("__nt"), budget)
    packed.groupBy(col("group"), col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("seq_tokens"),
        sort_array(collect_list(struct(col("__o"), col("__txt")))).as("__arr"))
      .select(col("group"), col("shard_id"), col("n_docs"), col("seq_tokens"),
        array_join(transform(col("__arr"), s => s.getField("__txt")), sep)
          .as("sequence"))
  }

  /** Per-source accounting of the kept set — the numbers a curation
    * run reports (doc counts, token budget, mean quality).
    *
    * avg_quality is computed in exact integer arithmetic: quality
    * values are 4-decimal multiples, so their mean regularly lands
    * EXACTLY on a .00005 rounding boundary where engines' double
    * `round()` rules diverge (HALF_UP vs half-even). Summing the
    * 1e-4-unit integers and applying HALF_UP as
    * `floor((2a + b) / (2b))` is boundary-free and engine-portable.
    */
  def stats(kept: DataFrame): DataFrame =
    kept.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_kept"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(round(col("quality") * 10000).cast("long")).as("q4"))
      .select(col("source"), col("n_kept"), col("total_tokens"),
        (expr("(2 * q4 + n_kept) div (2 * n_kept)").cast("double") / 10000.0)
          .as("avg_quality"))
      .orderBy(col("source"))
}
