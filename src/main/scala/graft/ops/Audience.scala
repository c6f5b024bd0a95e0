package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Audience overlap — the question the reference's community
  * discovery exists to answer (which communities share an audience,
  * reference `app.py`'s whole discovery flow) but never computes: it
  * surfaces candidate communities one keyword at a time and leaves
  * the cross-audience comparison to the analyst's eyeball.
  *
  * Here: the full pairwise overlap matrix of "audiences" (any
  * user-partitioning label — event type, community, cohort) in one
  * declarative pass. Each user contributes their distinct label SET
  * once; the pair explosion is |set|² per user (bounded by the label
  * vocabulary, NOT event volume — a power user with millions of
  * events still contributes ≤ |labels|² pair rows), and everything
  * aggregates map-side into at most |labels|² groups. No collect, no
  * driver-side label list: the matrix is data-defined.
  */
object Audience {

  /** ⊕ Pairwise audience overlap: for every unordered label pair
    * `(a < b)` that co-occurs in at least one user's history, the
    * audience sizes, the intersection size, and Jaccard
    * `|A∩B| / (|A| + |B| − |A∩B|)` (round 9; the denominator is
    * positive whenever the pair exists). One shuffle on the user key
    * builds the per-user label sets; pair counts and per-label
    * audience sizes both derive from those sets (never re-scanning
    * the event log), and the size join is a broadcast of ≤ |labels|
    * rows.
    */
  def overlapMatrix(events: DataFrame, userCol: Column, labelCol: Column)
      : DataFrame = {
    val perUser = events
      .filter(userCol.isNotNull && labelCol.isNotNull)
      .groupBy(userCol.as("__u"))
      .agg(collect_set(labelCol).as("__ls"))
    val sizes = perUser
      .select(explode(col("__ls")).as("label"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"))
    val pairs = perUser
      .select(explode(col("__ls")).as("a"), col("__ls"))
      .select(col("a"), explode(col("__ls")).as("b"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(sizes.select(col("label").as("a"), col("n").as("n_a"))), "a")
      .join(broadcast(sizes.select(col("label").as("b"), col("n").as("n_b"))), "b")
      .select(col("a").as("type_a"), col("b").as("type_b"),
        col("n_a"), col("n_b"), col("n_both"),
        round(col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both")).cast("double"), 9)
          .as("jaccard"))
  }

  /** ⊕ Sketch-based overlap — the scale path for the regime
    * [[overlapMatrix]]'s exact form degrades in: when users carry
    * MANY labels (thousands of communities), the per-user pair
    * explosion is |set|² and the exact matrix stops being cheap.
    * Here each label aggregates its audience into ONE DataSketches
    * HLL sketch (mergeable, fixed size, map-side combined like every
    * other A6 sketch), and every pair estimate is inclusion-exclusion
    * over two sketch unions — work is |labels|² sketch merges,
    * INDEPENDENT of both event volume and per-user label breadth.
    *
    * The pair join is a deliberate small cross (|labels| rows against
    * itself, `a < b`) — the same single-tiny-side pattern as the
    * whitelisted stats crosses. Estimates are exact while a sketch
    * stays in DataSketches list/set mode (small audiences — the q34
    * exact-mode convention, which is how q141 oracles this) and
    * within the usual HLL error envelope beyond; the intersection is
    * clamped at 0 (inclusion-exclusion can go fractionally negative
    * on disjoint audiences).
    */
  def overlapSketch(events: DataFrame, userCol: Column, labelCol: Column,
                    lgK: Int = 14): DataFrame = {
    val sk = events
      .filter(userCol.isNotNull && labelCol.isNotNull)
      .groupBy(labelCol.as("label"))
      .agg(hll_sketch_agg(userCol, lit(lgK)).as("__sk"))
    val a = sk.select(col("label").as("type_a"), col("__sk").as("__ska"))
    val b = sk.select(col("label").as("type_b"), col("__sk").as("__skb"))
    a.join(broadcast(b), col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        hll_sketch_estimate(col("__ska")).as("est_a"),
        hll_sketch_estimate(col("__skb")).as("est_b"),
        greatest(lit(0L),
          hll_sketch_estimate(col("__ska")) + hll_sketch_estimate(col("__skb"))
            - hll_sketch_estimate(hll_union(col("__ska"), col("__skb"))))
          .as("est_both"))
  }
}
