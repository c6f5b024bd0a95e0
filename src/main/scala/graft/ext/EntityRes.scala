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

  /** Full resolution: every input record mapped to its entity — the
    * min-id of its match component — plus the entity size. Records
    * matching nothing are singleton entities of themselves (size 1),
    * so the output is a total assignment, one row per record.
    */
  def resolveEntities(df: DataFrame, id: Column, name: Column, block: Column,
                      threshold: Double,
                      maxBlock: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val pairs = matchPairs(df, id, name, block, threshold, maxBlock)
    val clusters = Dedup.dupClusters(pairs)
      .select(col("doc_id").as("__cid"), col("cluster_id"), col("cluster_size"))
    df.select(id.as("id"))
      .join(clusters, col("id") === col("__cid"), "left")
      .select(col("id"),
        coalesce(col("cluster_id"), col("id")).as("entity_id"),
        coalesce(col("cluster_size"), lit(1L)).as("entity_size"))
  }
}
