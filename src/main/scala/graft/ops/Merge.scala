package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ⊕ CDC merge ("MERGE INTO" / upsert-apply): apply a changeset of
  * inserts/updates/deletes to a keyed snapshot — the maintenance
  * operation every large training-data corpus needs between full
  * rebuilds (apply the day's crawled/deleted delta to yesterday's 100 TB
  * snapshot without rewriting unaffected rows' lineage).
  *
  * Semantics (Delta/Iceberg MERGE with last-writer-wins):
  *  1. Within the changeset, the row with the greatest (`seqCol`,
  *     `tieCol`) per key wins — earlier changes to the same key are
  *     superseded (standard CDC compaction).
  *  2. Winning op `D` deletes the key; `I`/`U` upsert the change row's
  *     full payload (full-row replace, not column patch).
  *  3. Keys untouched by the changeset pass through unchanged.
  *
  * Plan shape at scale: one window shuffle on the changeset (usually
  * ≪ snapshot — it's the delta) to compact it, then ONE full-outer
  * equi-join on the key. When the compacted delta is broadcast-small
  * Catalyst picks a broadcast join and the snapshot never shuffles;
  * with a bucketed/pre-partitioned snapshot the join is co-located and
  * exchange-free on the big side. No driver-side collection anywhere.
  */
object Merge {

  /** Apply `changes` to `snapshot`. Both must carry `key`; `changes`
    * must additionally carry `seqCol` (change ordering), `opCol`
    * (values 'I' | 'U' | 'D'), and every snapshot payload column it
    * upserts. Output schema == snapshot schema.
    *
    * `tieCol` breaks equal-`seqCol` ties deterministically (e.g. a
    * change-log offset); required so last-writer-wins is well-defined.
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, key: String,
                   seqCol: String, opCol: String, tieCol: String): DataFrame = {
    val payload = snapshot.columns.filterNot(_ == key)
    // Fail loudly on malformed changesets: any op outside {I,U,D}
    // (including null) raises at execution instead of silently
    // upserting a typo'd code into the snapshot.
    val checked = changes.withColumn(opCol,
      when(col(opCol).isin("I", "U", "D"), col(opCol)).otherwise(raise_error(
        concat(lit(s"Merge.applyChanges: unexpected $opCol value '"),
               coalesce(col(opCol), lit("null")), lit("' (expected I|U|D)")))))
    // Compact the changeset: last writer per key wins.
    val latest = checked
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(desc(seqCol), desc(tieCol))))
      .filter(col("__rn") === 1)
      .select(col(key) +: col(opCol).as("__op") +: payload.map(col): _*)
    // One full-outer join: change side absent -> keep snapshot row;
    // present with D -> drop; present with I/U -> change payload.
    val s = snapshot.as("s")
    val c = latest.as("c")
    s.join(c, Seq(key), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "D")
      .select(col(key) +: payload.map { p =>
        when(col("__op").isNotNull, col(s"c.$p")).otherwise(col(s"s.$p")).as(p)
      }: _*)
  }

  /** ⊕ SCD-type-2 history build: turn a change log into versioned
    * validity intervals per key — each change row becomes a version
    * with `valid_from` = its own `seqCol`, `valid_to` = the NEXT
    * change's `seqCol` (null while current), a dense 1-based
    * `version`, and an `is_current` flag. The dimension-history shape
    * every warehouse keeps next to the merged snapshot
    * ([[applyChanges]] produces the "current" view; this produces the
    * full history).
    *
    * One window shuffle on the key — `row_number` and `lead` share
    * the single (key, seq, tie) sort. `tieCol` makes equal-`seqCol`
    * changes a well-defined sequence, same contract as
    * [[applyChanges]].
    */
  def scd2History(changes: DataFrame, key: String,
                  seqCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(seqCol).asc, col(tieCol).asc)
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }
}
