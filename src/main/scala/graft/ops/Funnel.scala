package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Product-analytics operators over an event log: ordered funnels,
  * cohort retention, last-touch attribution, and session path
  * transitions — the audience-measurement layer the reference's
  * community-discovery domain implies (who converts, who returns,
  * what drove it) but only ever approximates with flat scans
  * (reference `app.py` filters + counts; no ordered-sequence or
  * cohort operator exists there).
  *
  * All four are window/join compositions over ONE shuffle key — the
  * user — so at 100 TB each op is a single hash repartition of the
  * event log followed by per-partition sorted scans; nothing here
  * materializes per-user state wider than a handful of timestamps.
  */
object Funnel {

  /** ⊕ Ordered funnel: for each prefix of `steps`, the users whose
    * events contain the steps IN ORDER (strictly increasing
    * timestamps), with every later step landing within `horizon` of
    * the user's step-1 time (the entry-anchored window convention —
    * a funnel measures a journey that STARTED, so the clock runs
    * from entry, not from the previous step).
    *
    * Returns `(step_idx, step_name, n_users)`, one row per step —
    * the conversion curve. `n_users` is non-increasing by
    * construction.
    *
    * Shape: step 1 is one hash aggregation of the filtered scan;
    * each later step is an equi-join of the (shrinking) reached set
    * against the step's filtered events on the user key plus one
    * aggregation — k−1 joins that all share the user-hash
    * partitioning, each strictly smaller than the last. The per-user
    * carry is two timestamps (entry anchor + previous step), never a
    * collected event list — a power user with millions of events
    * costs the same two columns as anyone else.
    *
    * EAGER: unlike most operators in this package, this runs its Spark
    * jobs at call time (the stage caches must be materialized in
    * sequence and released before returning); the returned DataFrame
    * is a small local result, not a lazy plan over `events`.
    */
  def funnelSteps(events: DataFrame, userCol: Column, tsCol: Column,
                  typeCol: Column, steps: Seq[String],
                  horizon: String = "7 days"): DataFrame = {
    val stages = reachedStages(events, userCol, tsCol, typeCol, steps, horizon)
    // NOTE: runs Spark jobs eagerly at call time (unlike most ops here,
    // which return a lazy plan) — each count materializes its stage's
    // cache in sequence (so the next stage's join reuses it) and IS the
    // per-stage aggregate. try/finally so a failing stage aggregation
    // still releases every already-persisted stage.
    val counts =
      try stages.map(_.count())
      finally stages.foreach(_.unpersist())
    val rows = steps.indices.map(i => Row(i + 1, steps(i), counts(i)))
    val schema = StructType(Seq(
      StructField("step_idx", IntegerType, nullable = false),
      StructField("step_name", StringType, nullable = false),
      StructField("n_users", LongType, nullable = false)))
    events.sparkSession.createDataFrame(rows.asJava, schema)
      .orderBy(col("step_idx"))
  }

  /** Per-step reached sets, shared by [[funnelSteps]] and
    * [[funnelTimes]]: stage i holds one row per user who completed
    * step i+1, carrying ONLY `(__u, __t1 entry anchor, __tp this
    * step's time)` — the bounded two-timestamp build side.
    */
  private def reachedStages(events: DataFrame, userCol: Column, tsCol: Column,
                            typeCol: Column, steps: Seq[String],
                            horizon: String): Seq[DataFrame] = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val base = events.select(userCol.as("__u"), tsCol.as("__ts"), typeCol.as("__et"))
      .filter(col("__u").isNotNull && col("__ts").isNotNull)
    // per-user (entry anchor t1, previous-step time tp) — both carried
    // through every join so each stage stays a two-column build side
    var reached = base.filter(col("__et") === steps.head)
      .groupBy(col("__u")).agg(min(col("__ts")).as("__t1"))
      .withColumn("__tp", col("__t1"))
      .persist() // reused as the next stage's build side AND aggregated
    val stages = scala.collection.mutable.ArrayBuffer[DataFrame](reached)
    for (i <- 1 until steps.length) {
      val prev = reached
      reached = base.filter(col("__et") === steps(i))
        .join(prev, Seq("__u"))
        .filter(col("__ts") > col("__tp") &&
          col("__ts") <= col("__t1") + expr(s"INTERVAL $horizon"))
        .groupBy(col("__u"))
        .agg(min(col("__t1")).as("__t1"), min(col("__ts")).as("__tp"))
        .persist()
      stages += reached
    }
    stages.toSeq
  }

  /** ⊕ Funnel time-to-convert: for each step, how long reaching
    * users took from ENTRY (the anchor convention of
    * [[funnelSteps]]) — median and p90 of `step time − entry time`
    * in whole seconds, plus the step's user count (so the output
    * subsumes the conversion curve). Exact percentiles with linear
    * interpolation — bit-identical to the oracle's `quantile_cont`
    * — over the per-step reached sets, which hold one row per user,
    * never the event log; step 1's times are identically 0 by
    * construction (entry IS step 1).
    *
    * EAGER: runs its Spark jobs at call time, like [[funnelSteps]];
    * the returned DataFrame is a small local result.
    */
  def funnelTimes(events: DataFrame, userCol: Column, tsCol: Column,
                  typeCol: Column, steps: Seq[String],
                  horizon: String = "7 days"): DataFrame = {
    val stages = reachedStages(events, userCol, tsCol, typeCol, steps, horizon)
    // same eager-aggregate + unpersist discipline as [[funnelSteps]]
    // (jobs run at call time): one tiny row per stage, caches released
    // in a finally so error paths can't leak the persisted stages
    val aggRows =
      try stages.map { df =>
        df.select((col("__tp").cast("long") - col("__t1").cast("long")).as("__dt"))
          .agg(count(lit(1)).as("n_users"),
            round(percentile(col("__dt"), lit(0.5)), 6).as("p50_sec"),
            round(percentile(col("__dt"), lit(0.9)), 6).as("p90_sec"))
          .head()
      }
      finally stages.foreach(_.unpersist())
    val rows = steps.indices.map { i =>
      val r = aggRows(i)
      Row(i + 1, steps(i), r.getLong(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2))
    }
    val schema = StructType(Seq(
      StructField("step_idx", IntegerType, nullable = false),
      StructField("step_name", StringType, nullable = false),
      StructField("n_users", LongType, nullable = false),
      StructField("p50_sec", DoubleType, nullable = true),
      StructField("p90_sec", DoubleType, nullable = true)))
    events.sparkSession.createDataFrame(rows.asJava, schema)
      .orderBy(col("step_idx"))
  }

  /** ⊕ Weekly cohort retention: users are cohorted by the ISO week
    * of their first event; for every (cohort week, week offset) the
    * count of cohort members active that week. The classic
    * triangular retention matrix, flattened to rows.
    *
    * Shape: distinct (user, week) activity — one hash aggregation —
    * then the per-user min as the cohort, joined back on the user
    * key (co-partitioned with the distinct's output), then one final
    * aggregation on (cohort, offset). The event log is scanned once.
    */
  def retentionCohorts(events: DataFrame, userCol: Column, tsCol: Column)
      : DataFrame = {
    val act = events
      .filter(userCol.isNotNull && tsCol.isNotNull)
      .select(userCol.as("__u"), date_trunc("week", tsCol).as("__w"))
      .distinct()
    val coh = act.groupBy(col("__u")).agg(min(col("__w")).as("__cw"))
    act.join(coh, Seq("__u"))
      .groupBy(date_format(col("__cw"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("__w"), col("__cw")) / 7).cast("int").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** ⊕ Last-touch attribution: each conversion event's value is
    * credited to the type of the user's most recent preceding touch
    * event within `lookback`, or `"direct"` when no touch qualifies.
    * `(channel, n_conversions, sum_value)` per channel.
    *
    * Shape: ONE window pass over the user-partitioned, time-ordered
    * event log (`last(..., ignoreNulls)` over an unbounded-preceding
    * ROWS frame is an O(1)-per-row running value, not a frame
    * re-scan), then a hash aggregation on the channel. The
    * `(ts, id)` ordering is a total order, so credit assignment is
    * deterministic under ties.
    */
  def lastTouchAttribution(events: DataFrame, userCol: Column, tsCol: Column,
                           typeCol: Column, idCol: Column,
                           touchTypes: Seq[String], convType: String,
                           valueCol: Column, lookback: String = "3 days")
      : DataFrame = {
    val isTouch = typeCol.isin(touchTypes.map(x => x: Any): _*)
    val w = Window.partitionBy(userCol).orderBy(tsCol.asc, idCol.asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("__ltype", last(when(isTouch, typeCol), ignoreNulls = true).over(w))
      .withColumn("__lts", last(when(isTouch, tsCol), ignoreNulls = true).over(w))
      .filter(typeCol === convType)
      .select(
        when(col("__lts").isNotNull &&
            col("__lts") >= tsCol - expr(s"INTERVAL $lookback"),
          col("__ltype")).otherwise(lit("direct")).as("channel"),
        valueCol.as("__v"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        round(sum(col("__v")), 2).as("sum_value"))
  }

  /** ⊕ Session path transitions: the first-order Markov matrix of
    * event types — for every consecutive (A → B) pair of a user's
    * time-ordered events with gap ≤ `maxGap`, the transition count
    * and the per-source probability. The "where do users go next"
    * view q39's sessionizer implies but never materializes.
    *
    * Shape: one `lead` window pass on the user partition, then a
    * hash aggregation on (from, to); the probability is a second
    * tiny window over the aggregated matrix (|types|² rows), not the
    * event log.
    */
  def pathTransitions(events: DataFrame, userCol: Column, tsCol: Column,
                      typeCol: Column, idCol: Column,
                      maxGap: String = "10 minutes"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol.asc, idCol.asc)
    val agg = events
      .withColumn("__nt", lead(typeCol, 1).over(w))
      .withColumn("__nts", lead(tsCol, 1).over(w))
      .filter(col("__nt").isNotNull &&
        col("__nts") <= tsCol + expr(s"INTERVAL $maxGap"))
      .groupBy(typeCol.as("from_type"), col("__nt").as("to_type"))
      .agg(count(lit(1)).as("n"))
    agg.withColumn("p", round(col("n") /
        sum(col("n")).over(Window.partitionBy(col("from_type"))), 6))
  }
}
