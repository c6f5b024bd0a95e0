package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ⊕ Declarative data-quality validation — the expectations gate
  * (dbt tests / Great-Expectations / Deequ lineage) every ingestion
  * boundary at 100 TB needs: assert schema-level invariants as a
  * JOB, get back a violations REPORT, wire it to a loud failure or a
  * quarantine route. The reference trusts its API payloads blindly;
  * a lake cannot.
  *
  * Scale shape: every row-local rule (not-null / range / regex /
  * set-membership) compiles into ONE conditional-aggregation pass
  * over a single scan — `sum(violated)` + `min(violating key)` per
  * rule, map-side combinable, no shuffle beyond the single-row
  * aggregate. `Unique` adds one count-per-key aggregation on its
  * column; `RefIntegrity` adds one left-anti join against the
  * (deduplicated, usually broadcastable) reference keys. Violation
  * samples are MIN KEYS, not values — integer-deterministic across
  * engines, and the natural pointer into the offending source rows.
  *
  * Output: one row per rule — `rule`, `column`, `n_violations`,
  * `sample_key` (null when clean) — totally ordered by rule name.
  */
object Check {

  sealed trait Rule { def column: String; def name: String }
  /** Null values violate. */
  final case class NotNull(column: String) extends Rule {
    val name = s"not_null($column)"
  }
  /** Values outside `[lo, hi]` (inclusive) violate; nulls pass (pair
    * with [[NotNull]] to reject them).
    */
  final case class InRange(column: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range($column,$lo,$hi)"
  }
  /** Non-null values not FULLY matching `regex` violate (the pattern
    * is anchored here — `rlike` alone is find-anywhere, which would
    * pass `"###a@b.io<junk>"` against an email shape).
    */
  final case class Matches(column: String, regex: String) extends Rule {
    val name = s"matches($column)"
  }
  /** Non-null values outside the closed `values` set violate. */
  final case class InSet(column: String, values: Seq[String]) extends Rule {
    val name = s"in_set($column)"
  }
  /** Rows beyond the first per value violate (count − distinct). */
  final case class Unique(column: String) extends Rule {
    val name = s"unique($column)"
  }
  /** Rows whose value has no partner in `ref.refColumn` violate
    * (orphan foreign keys); nulls pass.
    */
  final case class RefIntegrity(column: String, ref: DataFrame, refColumn: String)
      extends Rule {
    val name = s"ref_integrity($column)"
  }

  /** Run `rules` over `df`; `keyCol` identifies offending rows in the
    * report (any unique key — integer or string; its type is
    * preserved in `sample_key`, and `min` over either is
    * deterministic).
    */
  def validate(df: DataFrame, keyCol: Column, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "validate needs at least one rule")
    val key = keyCol

    def predicate(r: Rule): Option[Column] = r match {
      case NotNull(c) => Some(col(c).isNull)
      case InRange(c, lo, hi) =>
        Some(col(c).isNotNull && (col(c) < lo || col(c) > hi))
      case Matches(c, re) => Some(col(c).isNotNull && !col(c).rlike(s"^(?:$re)$$"))
      case InSet(c, vs) => Some(col(c).isNotNull && !col(c).isin(vs: _*))
      case _ => None
    }

    // every row-local rule rides ONE scan + ONE single-row aggregate:
    // 2 conditional agg expressions per rule, then an explode of the
    // 1-row packed array into the per-rule report rows
    val rowLocal = rules.flatMap(r => predicate(r).map(r -> _))
    val rowLocalReport: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggExprs = rowLocal.zipWithIndex.flatMap { case ((_, v), i) =>
          Seq(sum(when(v, lit(1L)).otherwise(lit(0L))).as(s"__n$i"),
            min(when(v, key)).as(s"__k$i"))
        }
        Some(df.agg(aggExprs.head, aggExprs.tail: _*)
          .select(explode(array(rowLocal.zipWithIndex.map { case ((r, _), i) =>
            struct(lit(r.name).as("rule"), lit(r.column).as("column"),
              coalesce(col(s"__n$i"), lit(0L)).as("n_violations"),
              col(s"__k$i").as("sample_key"))
          }: _*)).as("e"))
          .select(col("e.rule"), col("e.column"),
            col("e.n_violations"), col("e.sample_key")))
      }

    val parts = rowLocalReport.toSeq ++ rules.collect {
      case r @ Unique(c) =>
        // per-key counts; "violations" = the surplus rows, sample =
        // the smallest key inside any duplicated group
        df.filter(col(c).isNotNull)
          .groupBy(col(c)).agg(count(lit(1)).as("__n"), min(key).as("__k"))
          .filter(col("__n") > 1)
          .agg(sum(col("__n") - 1).as("n_violations"),
            min(col("__k")).as("sample_key"))
          .select(lit(r.name).as("rule"), lit(c).as("column"),
            coalesce(col("n_violations"), lit(0L)).as("n_violations"),
            col("sample_key"))
      case r @ RefIntegrity(c, ref, rc) =>
        df.filter(col(c).isNotNull)
          .join(broadcast(ref.select(ref(rc).as("__ref")).distinct()),
            col(c) === col("__ref"), "left_anti")
          .agg(count(lit(1)).as("n_violations"), min(key).as("sample_key"))
          .select(lit(r.name).as("rule"), lit(c).as("column"),
            col("n_violations"), col("sample_key"))
    }
    parts.reduce(_ unionByName _).orderBy(col("rule"))
  }

  /** Fail-loud form: throws listing every violated rule (the CI /
    * pre-publish gate); returns the clean report otherwise.
    */
  def requireValid(df: DataFrame, keyCol: Column, rules: Seq[Rule]): DataFrame = {
    val rep = validate(df, keyCol, rules)
    val bad = rep.filter(col("n_violations") > 0).collect()
    require(bad.isEmpty,
      "data-quality violations:\n" + bad.map(r =>
        s"  ${r.getString(0)}: ${r.getLong(2)} rows (e.g. key ${r.get(3)})")
        .mkString("\n"))
    rep
  }
}
