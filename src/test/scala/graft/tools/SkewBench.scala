package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: measure the window family's hot-key breaking point
  * (VERDICT r6 #7). Two synthetic event tables of the same size —
  * uniform (every key ~10 rows) and skewed (ONE key owns 10% of all
  * rows) — drive the four per-key window paths:
  *
  *   asof     — [[graft.ops.AsOf.asofJoinBackward]]   (q64 shape)
  *   merge    — [[graft.ops.Merge.applyChanges]]       (q74 shape)
  *   rolling  — [[graft.ops.Time.trailingWindow]] sum  (q76 shape)
  *   decay    — [[graft.ops.Time.decayedScore]]        (q85 shape)
  *   decay-ch — [[graft.ops.Time.withDecayedScoreChunked]] (mitigation)
  *
  * The skew ratio (skewed time / uniform time) quantifies how much a
  * hot key serializes each op; decay-ch on the skewed table shows the
  * chunked two-pass variant recovering parallelism. Results recorded
  * in BASELINE.md §skew.
  */
object SkewBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "4000000").toInt
    val hotPct = sys.env.getOrElse("SPARK_GRAFT_SKEW_HOT", "10").toInt
    val nKeys = n / 10
    val hotMod = 100 / hotPct

    // uniform: key = i % nKeys; skewed: hotPct% of rows -> key 0, rest
    // as uniform. Timestamps spread over ~46 days of seconds.
    def events(skewed: Boolean): DataFrame =
      spark.range(0, n).select(
        col("id").as("event_id"),
        (if (skewed) when(col("id") % hotMod === 0, 0L).otherwise(col("id") % nKeys)
         else col("id") % nKeys).as("user_id"),
        (col("id") * 37 % 4000000L).cast("double").as("t"),
        ((col("id") * 13 % 1000L) / 100.0).as("value"))
        .repartition(cpus.toInt)

    def time(name: String)(f: => Long): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val c = f
        require(c > 0)
        (System.nanoTime() - t0) / 1e9
      }
      runs.min
    }

    val uni = events(skewed = false).cache(); uni.count()
    val skw = events(skewed = true).cache(); skw.count()

    def asof(df: DataFrame): Long = {
      val left = df.filter(col("event_id") % 2 === 0)
        .select(col("event_id"), col("user_id"), col("t").as("lts"))
      val right = df.filter(col("event_id") % 2 === 1)
        .select(col("event_id").as("rid"), col("user_id"), col("t").as("rts"), col("value"))
      graft.ops.AsOf.asofJoinBackward(left, right, "user_id", "lts", "rts", "rid").count()
    }
    def merge(df: DataFrame): Long = {
      val snapshot = df.filter(col("event_id") % 2 === 0)
        .select(col("user_id").as("k"), col("value"))
        .groupBy(col("k")).agg(sum(col("value")).as("value"))
      val changes = df.filter(col("event_id") % 2 === 1)
        .select(col("user_id").as("k"), col("value"),
          col("t").as("seq"), lit("U").as("op"), col("event_id").as("chg"))
      graft.ops.Merge.applyChanges(snapshot, changes, "k", "seq", "op", "chg").count()
    }
    def rolling(df: DataFrame): Long =
      df.withColumn("s", sum(col("value")).over(
          graft.ops.Time.trailingWindow(col("user_id"), col("t").cast("long"), 3600)))
        .filter(col("s") >= 0).count()
    // dense-time variant: ~30 rows/sec — the regime where per-second
    // pre-aggregation collapses both partition rows and frame peers.
    // Span capped at 120 s: the hot key's plain sliding frame costs
    // O(rows × in-frame peers) (Spark re-aggregates per bound change),
    // and at span 3600 the 25%-share case is ~10^11 peer scans —
    // unrunnable, which is itself the finding.
    def dense(df: DataFrame): DataFrame =
      df.withColumn("es", (col("t").cast("long") / 30L) * 1L)
    def rollingDense(df: DataFrame): Long =
      dense(df).withColumn("s", sum(col("value")).over(
          graft.ops.Time.trailingWindow(col("user_id"), col("es"), 120)))
        .filter(col("s") >= 0).count()
    def rollingPreagg(df: DataFrame): Long =
      graft.ops.Time.trailingSumsByTime(dense(df),
          "user_id", "es", "value", 120, "n", "s")
        .filter(col("s") >= 0).count()
    def decay(df: DataFrame): Long =
      df.withColumn("ds", graft.ops.Time.decayedScore(
          col("user_id"), col("t") / 86400.0, col("event_id"), col("value"), 0.1))
        .filter(!isnan(col("ds"))).count()
    def decayChunked(df: DataFrame): Long =
      graft.ops.Time.withDecayedScoreChunked(
          df.withColumn("td", col("t") / 86400.0),
          "user_id", "td", "event_id", "value", lambda = 0.1, chunkSpan = 1.0)
        .filter(!isnan(col("decay_score"))).count()

    println(f"rows=$n keys=$nKeys hot-key share=$hotPct%%  (min of 3, local[$cpus])")
    println(f"${"op"}%-10s ${"uniform"}%8s ${"skewed"}%8s ${"ratio"}%6s")
    val ops = Seq[(String, DataFrame => Long)](
      "asof" -> asof, "merge" -> merge, "rolling" -> rolling,
      "roll-dense" -> rollingDense, "roll-pa" -> rollingPreagg,
      "decay" -> decay, "decay-ch" -> decayChunked)
    ops.foreach { case (name, f) =>
      val a = time(s"$name-uni")(f(uni))
      val b = time(s"$name-skw")(f(skw))
      println(f"$name%-10s $a%8.2f $b%8.2f ${b / a}%6.2fx")
    }
    spark.stop()
  }
}
