package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ⊕ Entity resolution (record linkage): blocked pairwise
  * [[graft.functions.JaroWinkler]] scoring + transitive closure into
  * entity clusters — the Fellegi-Sunter pipeline shape (blocking →
  * comparator → decision → fusion) the reference's flat substring
  * match (`app.py` keyword scan) cannot express.
  *
  * Scale shape — the near-dup template applied to records: candidate
  * generation is an equi-self-join on the BLOCKING key, never a
  * global cross join, so pair work is Σ(block size²) with a
  * `maxBlock` backstop capping any skewed block (the
  * [[Dedup.DefaultMaxBucket]] contract: an overflowing block is
  * dropped from candidate generation, mirrored in the oracle's
  * HAVING). Scoring is one codegen'd expression per candidate pair;
  * clustering reuses [[Dedup.dupClusters]]' checkpointed
  * label-propagation (min-id components).
  */
object EntityRes {

  /** Candidate pairs within a block scoring at or above `threshold`:
    * `(id_a, id_b, sim)` with `id_a < id_b`, sim rounded to 6 (the
    * cross-engine double convention).
    */
  def matchPairs(df: DataFrame, id: Column, name: Column, block: Column,
                 threshold: Double,
                 maxBlock: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val recs = df.select(id.as("__id"), name.as("__nm"), block.as("__blk"))
      .filter(col("__id").isNotNull && col("__nm").isNotNull && col("__blk").isNotNull)
    val ok = recs.groupBy(col("__blk")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBlock).select(col("__blk"))
    val capped = recs.join(ok, Seq("__blk"))
    val a = capped.select(col("__blk"), col("__id").as("id_a"), col("__nm").as("__na"))
    val b = capped.select(col("__blk"), col("__id").as("id_b"), col("__nm").as("__nb"))
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(graft.functions.JaroWinkler.jaroWinkler(col("__na"), col("__nb")), 6)
          .as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** ⊕ Symmetric-delete blocked candidate pairs — the SCALE path.
    * [[matchPairs]]' single block key has a problem the q131 slope
    * measures directly (18.4× for 10× data): if the key's cardinality
    * is FIXED (25 nations), block size grows linearly with the corpus
    * and pairwise work quadratically. This form blocks on DELETION
    * VARIANTS instead (the SymSpell construction, Garbe's symmetric
    * delete): each record emits |name|+1 keys — the name itself plus
    * the name with one character removed, co-block prepended — and
    * candidates are pairs sharing any key.
    *
    * Recall guarantee: two names within Damerau-Levenshtein distance
    * 1 (one substitution, insertion, deletion, or ADJACENT
    * transposition) always share a deletion variant, so the true
    * typo class is caught completely. What this deliberately drops
    * vs the exhaustive block: pairs ≥ DL 2 that Jaro's ±⌊len/2⌋−1
    * match window still scores ≥ threshold — distant transpositions
    * and digit permutations ("…1123" vs "…1321"), which in a linkage
    * pipeline are precisely the comparator's false-positive class,
    * not variants. The trade is deterministic, and the oracle mirrors
    * the same candidate set, so it is hash-checked, not hand-waved.
    *
    * Scale shape: key generation is row-local (one explode, |name|
    * rows per record); key cardinality GROWS with the corpus (a
    * deletion variant is shared only by near-identical names), so
    * bucket sizes track duplicate density, not corpus size — work is
    * linear at fixed density where [[matchPairs]] on a fixed-
    * cardinality key is quadratic. `maxBucket` backstops degenerate
    * keys (mass-identical names), mirrored as HAVING.
    */
  def matchPairsEditBlocked(df: DataFrame, id: Column, name: Column,
                            coBlock: Column, threshold: Double,
                            maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val recs = df.select(id.as("__id"), name.as("__nm"),
        coBlock.cast("string").as("__cb"))
      .filter(col("__id").isNotNull && col("__nm").isNotNull && col("__cb").isNotNull)
    // identity key + one key per single-char deletion: a length-L vs
    // length-L+1 pair (insert/delete edit) meets at the longer name's
    // deletion == the shorter name's IDENTITY, so the identity key is
    // load-bearing, not an optimization
    // the deletion transform is guarded on non-empty names: Spark's
    // sequence(1, 0) descends ([1, 0], default step -1) where the
    // oracle's range(1, 1) is empty, so an unguarded transform would
    // emit junk keys for "" and diverge the candidate/bucket counts
    val keys = recs.select(col("__id"), col("__nm"),
      explode(concat(
        array(concat(col("__cb"), lit("|"), col("__nm"))),
        when(length(col("__nm")) > lit(0),
          transform(sequence(lit(1), length(col("__nm"))),
            i => concat(col("__cb"), lit("|"),
              col("__nm").substr(lit(1), i - lit(1)),
              col("__nm").substr(i + lit(1), length(col("__nm"))))))
          .otherwise(array().cast("array<string>")))).as("__k"))
    val ok = keys.groupBy(col("__k")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket).select(col("__k"))
    val capped = keys.join(ok, Seq("__k"))
    val a = capped.select(col("__k"), col("__id").as("id_a"), col("__nm").as("__na"))
    val b = capped.select(col("__k"), col("__id").as("id_b"), col("__nm").as("__nb"))
    a.join(b, Seq("__k"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("__na"), col("__nb"))
      .distinct()
      .select(col("id_a"), col("id_b"),
        round(graft.functions.JaroWinkler.jaroWinkler(col("__na"), col("__nb")), 6)
          .as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Transitive closure + total assignment over an (id_a, id_b) match
    * pair set: every input record mapped to its entity — the min-id
    * of its match component — plus the entity size. Records matching
    * nothing are singleton entities of themselves (size 1), so the
    * output is a total assignment, one row per record.
    */
  def resolveFromPairs(df: DataFrame, id: Column, pairs: DataFrame): DataFrame = {
    val clusters = Dedup.dupClusters(pairs)
      .select(col("doc_id").as("__cid"), col("cluster_id"), col("cluster_size"))
    df.select(id.as("id"))
      .join(clusters, col("id") === col("__cid"), "left")
      .select(col("id"),
        coalesce(col("cluster_id"), col("id")).as("entity_id"),
        coalesce(col("cluster_size"), lit(1L)).as("entity_size"))
  }

  /** Full resolution over [[matchPairs]] (single block key). */
  def resolveEntities(df: DataFrame, id: Column, name: Column, block: Column,
                      threshold: Double,
                      maxBlock: Int = Dedup.DefaultMaxBucket): DataFrame =
    resolveFromPairs(df, id, matchPairs(df, id, name, block, threshold, maxBlock))
}
