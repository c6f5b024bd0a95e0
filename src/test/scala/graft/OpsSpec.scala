package graft

import org.apache.spark.sql.functions._
import graft.ops.{Agg, Match, Score, Text, TopK}

/** Unit tests for the op library over tiny in-memory frames —
  * the edge cases the reference encodes (SURVEY.md §5.2).
  */
class OpsSpec extends SparkSuite {
  import spark.implicits._

  test("X1 cleanText collapses whitespace and trims, idempotent") {
    val df = Seq("  a \t b\n c  ", "x", " ", "").toDF("t")
      .select(Text.cleanText(col("t")).as("c"))
    assert(df.as[String].collect().toSeq == Seq("a b c", "x", "", ""))
    // clean(clean(x)) == clean(x)
    val twice = Seq("  a \t b\n c  ").toDF("t")
      .select(Text.cleanText(Text.cleanText(col("t"))).as("c"))
    assert(twice.as[String].head == "a b c")
  }

  test("F5 containsKeyword is case-insensitive") {
    val df = Seq("Hello WORLD", "nope").toDF("t")
    val hits = df.filter(Match.containsKeyword(col("t"), "world")).count()
    assert(hits == 1)
  }

  test("A3 matchedKeywords preserves input order; X11 firstMatch takes first") {
    val df = Seq("the quick brown fox").toDF("t")
    val kws = Seq("Brown", "missing", "Quick")
    val got = df.select(Match.matchedKeywords(col("t"), kws).as("m")).as[Seq[String]].head
    assert(got == Seq("brown", "quick"))
    val first = df.select(Match.firstMatch(col("t"), kws).as("f")).as[String].head
    assert(first == "brown")
    val none = df.select(Match.firstMatch(col("t"), Seq("zzz")).as("f"))
      .collect().head.isNullAt(0)
    assert(none)
  }

  test("X10 relevanceScore additive, range 0..6") {
    val df = Seq(
      (1, Seq(Score.FoundViaDirect)),
      (2, Seq(Score.FoundViaDirect, Score.FoundViaPost)),
      (3, Seq(Score.FoundViaDirect, Score.FoundViaPost, Score.FoundViaComment)),
      (4, Seq.empty[String]),
    ).toDF("id", "via").select(col("id"), Score.relevanceScore(col("via")).as("s"))
    val m = df.as[(Int, Int)].collect().toMap
    assert(m == Map(1 -> 1, 2 -> 3, 3 -> 6, 4 -> 0))
  }

  test("W2 perGroupTopK respects k and ordering") {
    val df = Seq(("a", 1), ("a", 3), ("a", 2), ("b", 9)).toDF("g", "v")
    val top = TopK.perGroupTopK(df, Seq(col("g")), Seq(desc("v")), 2)
      .orderBy("g", "v").as[(String, Int)].collect().toSeq
    assert(top == Seq(("a", 2), ("a", 3), ("b", 9)))
  }

  test("A1 dedupFirstWins takes attributes from the lowest ordinal") {
    val df = Seq(("x", 1, 100L), ("x", 2, 200L), ("y", 5, 50L)).toDF("k", "ord", "members")
    val got = Agg.dedupFirstWins(df, col("k"), col("ord"), Seq(col("members")))
      .orderBy("k").as[(String, Int, Long)].collect().toSeq
    assert(got == Seq(("x", 1, 100L), ("y", 5, 50L)))
  }

  test("A2 collectSetSorted dedupes and sorts") {
    val df = Seq(("u", "b"), ("u", "a"), ("u", "b")).toDF("k", "v")
    val got = df.groupBy("k").agg(Agg.collectSetSorted(col("v")).as("s"))
      .select("s").as[Seq[String]].head
    assert(got == Seq("a", "b"))
  }

  test("X7 truncateEllipsis only truncates long values") {
    val df = Seq("abcdef", "ab").toDF("t")
      .select(Text.truncateEllipsis(col("t"), 4).as("c"))
    assert(df.as[String].collect().toSeq == Seq("abcd...", "ab"))
  }

  test("X8 stripPrefix only strips leading prefix") {
    val df = Seq("r/scala", "nor/scala").toDF("t")
      .select(Text.stripPrefix(col("t"), "r/").as("c"))
    assert(df.as[String].collect().toSeq == Seq("scala", "nor/scala"))
  }

  test("F6 parseQueryLines strips, drops blanks, dedupes, sorts") {
    assert(Text.parseQueryLines("  b \n\n a \n b \n   \n") == Seq("a", "b"))
    assert(Text.parseQueryLines("") == Seq())
  }

  test("S5 unionTolerant skips unreadable paths") {
    val ok = s"$sfDir/orders.parquet"
    val got = sources.Tables.unionTolerant(spark, Seq(ok, "/nonexistent/nope.parquet"))
    assert(got.isDefined && got.get.count() == spark.read.parquet(ok).count())
    assert(sources.Tables.unionTolerant(spark, Seq("/nonexistent/a")).isEmpty)
  }

  test("Jsonl: declared-schema tolerant read round-trips and flags corrupt lines") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toFile
    val f = new java.io.File(dir, "part-0.json")
    java.nio.file.Files.writeString(f.toPath,
      """{"id": 1, "text": "alpha"}
        |not json at all
        |{"id": 2, "text": "beta"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("text", StringType),
      StructField(sources.Jsonl.corruptCol, StringType)))
    val df = sources.Jsonl.read(spark, schema, f.getAbsolutePath)
    assert(df.count() == 3)
    val good = sources.Jsonl.wellFormed(df)
    assert(good.select("id").as[Long].collect().toSet == Set(1L, 2L))
    // write round-trip
    val out = new java.io.File(dir, "out").getAbsolutePath
    sources.Jsonl.write(good, out)
    val back = sources.Jsonl.read(spark,
      StructType(schema.filterNot(_.name == sources.Jsonl.corruptCol)), out)
    assert(back.count() == 2)
  }

  test("TopKByWeight aggregator agrees with the window top-k pattern") {
    val df = Seq(
      ("a", 1L, 5.0), ("a", 2L, 9.0), ("a", 3L, 9.0), ("a", 4L, 1.0),
      ("b", 5L, 2.0), ("b", 6L, 3.0))
      .toDF("g", "id", "w")
    val viaAgg = df.groupBy(col("g"))
      .agg(functions.TopKByWeight.topK(2)(col("id"), col("w")).as("top"))
      .select(col("g"), explode(col("top")).as("e"))
      .select(col("g"), col("e.id"), col("e.w"))
      .as[(String, Long, Double)].collect().toSet
    val viaWindow = ops.TopK.perGroupTopK(df,
        Seq(col("g")), Seq(desc("w"), asc("id")), 2)
      .as[(String, Long, Double)].collect().toSet
    assert(viaAgg == viaWindow)
    // tie at the boundary: (2, 9.0) before (3, 9.0) by id
    assert(viaAgg.contains(("a", 2L, 9.0)) && viaAgg.contains(("a", 3L, 9.0)))
  }

  test("Profile.summarize: one row, exact vs sketch distincts agree on small data") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, null)).toDF("id", "s")
    val ex = ops.Profile.summarize(df, Seq("id", "s"), exact = true).collect()(0)
    assert(ex.getAs[Long]("nulls_id") == 0 && ex.getAs[Long]("nulls_s") == 1)
    assert(ex.getAs[Long]("distinct_id") == 3 && ex.getAs[Long]("distinct_s") == 1)
    assert(ex.getAs[String]("min_id") == "1" && ex.getAs[String]("max_s") == "a")
    val ap = ops.Profile.summarize(df, Seq("id", "s")).collect()(0)
    assert(ap.getAs[Long]("distinct_id") == 3)  // HLL exact at tiny cardinality
  }

  test("Sampling.weightedSample: deterministic, weight-proportional, guards nulls") {
    // 200 keys, weight 9 for ids < 20, weight 1 otherwise
    val df = (1L to 200L).map(i => (i, if (i < 20) 9.0 else 1.0, "g"))
      .toDF("id", "w", "g")
    def draw(salt: Long) = ops.Sampling.weightedSample(
        df, Seq(col("g")), "id", col("w"), k = 20, salt = salt)
      .select("id").as[Long].collect().toSet
    // layout-independent: same sample under any partitioning
    val a = draw(0)
    val b = ops.Sampling.weightedSample(df.repartition(13), Seq(col("g")),
        "id", col("w"), k = 20, salt = 0)
      .select("id").as[Long].collect().toSet
    assert(a == b)
    assert(a.size == 20)
    // weight-proportional: across many salts, heavy keys (9x weight,
    // 19 of 200 keys) occupy far more than their 9.5% of k=20 slots
    val heavyShare = (0L until 30L).map(s => draw(s).count(_ < 20)).sum / (30.0 * 20)
    assert(heavyShare > 0.3, s"heavy keys drew only $heavyShare of slots")
    // zero/negative/null weights and null keys are excluded
    val guarded = ops.Sampling.weightedSample(
        Seq((Some(1L), Some(1.0)), (Some(2L), Some(0.0)), (Some(3L), Some(-1.0)),
            (Some(4L), None), (None, Some(1.0)))
          .toDF("id", "w").withColumn("g", lit("g")),
        Seq(col("g")), "id", col("w"), k = 10)
      .select("id").as[Long].collect().toSet
    assert(guarded == Set(1L))
  }

  test("Sampling.byHash is partitioning-independent and rate-accurate") {
    val df = (1L to 4000L).toDF("k")
    val a = ops.Sampling.byHash(df, "k", 0.25).as[Long].collect().toSet
    val b = ops.Sampling.byHash(df.repartition(13), "k", 0.25).as[Long].collect().toSet
    assert(a == b, "sample changed under repartitioning")
    assert(math.abs(a.size / 4000.0 - 0.25) < 0.03, s"rate off: ${a.size}")
    // nested rates: a 10% sample is a subset of the 25% sample
    val c = ops.Sampling.byHash(df, "k", 0.10).as[Long].collect().toSet
    assert(c.subsetOf(a))
    // edge rates
    assert(ops.Sampling.byHash(df, "k", 0.0).count() == 0)
    assert(ops.Sampling.byHash(df, "k", 1.0).count() == 4000)
    // null keys are excluded explicitly (no stable identity to sample on)
    val withNulls = Seq(Some(1L), None, Some(2L)).toDF("k")
    assert(ops.Sampling.byHash(withNulls, "k", 1.0).count() == 2)
  }

  test("Sampling.stratified respects per-stratum fractions") {
    val df = (1 to 2000).map(i => (if (i % 4 == 0) "rare" else "common", i))
      .toDF("cls", "v")
    val got = ops.Sampling.stratified(df, "cls", Map("common" -> 0.1, "rare" -> 1.0))
    val byCls = got.groupBy("cls").count().as[(String, Long)].collect().toMap
    assert(byCls("rare") == 500)  // keep-all stratum is exact
    assert(byCls("common") > 75 && byCls("common") < 225)
  }

  test("X13 timeFilter maps the reference enum to window predicates") {
    import graft.ops.Time
    val now = lit("2024-06-15 00:00:00").cast("timestamp")
    val df = Seq("2024-06-14 12:00:00", "2024-06-01 00:00:00",
        "2024-01-01 00:00:00", "2022-01-01 00:00:00")
      .toDF("s").select(col("s").cast("timestamp").as("ts"))
    def n(f: String): Long = df.filter(Time.timeFilter(col("ts"), f, now)).count()
    assert(n("day") == 1 && n("week") == 1 && n("month") == 2 &&
      n("year") == 3 && n("all") == 4)
    intercept[IllegalArgumentException](Time.timeFilter(col("ts"), "hour", now))
    // sinceTs agrees with the predicate form
    val ts0 = java.sql.Timestamp.valueOf("2024-06-15 00:00:00")
    assert(Time.sinceTs("all", ts0).isEmpty)
    assert(Time.sinceTs("week", ts0).get ==
      java.sql.Timestamp.valueOf("2024-06-08 00:00:00"))
  }

  test("Sampling.assignSplit: covers every row, rate-accurate, partitioning-independent") {
    import graft.ops.Sampling
    val keys = (1L to 4000L).toDF("k")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val counts = keys.withColumn("s", Sampling.assignSplit("k", splits))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 4000L)           // every key labeled
    assert(math.abs(counts("train") - 3200L) < 200)
    assert(math.abs(counts("val") - 400L) < 120)
    assert(math.abs(counts("test") - 400L) < 120)
    // same assignment regardless of layout
    val a = keys.withColumn("s", Sampling.assignSplit("k", splits))
      .as[(Long, String)].collect().toMap
    val b = keys.repartition(13).withColumn("s", Sampling.assignSplit("k", splits))
      .as[(Long, String)].collect().toMap
    assert(a == b)
    // null key -> null label
    val n = Seq(Option.empty[Long]).toDF("k")
      .select(Sampling.assignSplit("k", splits)).as[Option[String]].head()
    assert(n.isEmpty)
    intercept[IllegalArgumentException](Sampling.assignSplit("k", Seq("a" -> 0.5)))
    intercept[IllegalArgumentException](Sampling.assignSplit("k", Nil))
  }

  test("Time.decayedScore matches the naive per-row weighted sum") {
    import graft.ops.Time
    // deterministic pseudo-random fixture, multiple keys, tied times
    val rows = (0 until 60).map { i =>
      (i.toLong, (i % 4).toLong, (i * 7919 % 20) / 2.0, (i * 104729 % 50) / 10.0)
    } // (id, key, t, value)
    val df = rows.toDF("id", "k", "t", "v")
    val got = df.withColumn("s",
        Time.decayedScore(col("k"), col("t"), col("id"), col("v"), lambda = 0.3))
      .select("id", "s").as[(Long, Double)].collect().toMap
    // naive reference: for each row, sum over rows at-or-before it in
    // (t, id) order within the key
    val naive = rows.map { case (id, k, t, _) =>
      val s = rows.filter { case (id2, k2, t2, _) =>
        k2 == k && (t2 < t || (t2 == t && id2 <= id))
      }.map { case (_, _, t2, v2) => v2 * math.exp(-0.3 * (t - t2)) }.sum
      id -> s
    }.toMap
    rows.foreach { case (id, _, _, _) =>
      assert(math.abs(got(id) - naive(id)) < 1e-9, s"row $id: ${got(id)} vs ${naive(id)}")
    }
    intercept[IllegalArgumentException](
      Time.decayedScore(col("k"), col("t"), col("id"), col("v"), lambda = 0.0))
  }

  test("Time.trailingWindow: inclusive [ts-span, ts] frame per key, peers included") {
    import graft.ops.Time
    // per-key epochs; span 10 -> frames computed by hand
    val df = Seq(
      ("a", 0L), ("a", 5L), ("a", 10L), ("a", 11L), ("a", 30L),
      ("b", 100L), ("b", 100L), ("b", 111L)  // peers at 100 count together
    ).toDF("k", "es")
    val got = df.withColumn("n",
        count(lit(1)).over(Time.trailingWindow(col("k"), col("es"), 10L)))
      .select("k", "es", "n").as[(String, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.map(_._3).toSet).toMap
    assert(got(("a", 0L)) == Set(1L))
    assert(got(("a", 10L)) == Set(3L))   // 0, 5, 10 all inside [0,10]
    assert(got(("a", 11L)) == Set(3L))   // 5, 10, 11 (0 falls out)
    assert(got(("a", 30L)) == Set(1L))
    assert(got(("b", 100L)) == Set(2L))  // equal-es peers share the frame
    assert(got(("b", 111L)) == Set(1L))  // [101,111] excludes the 100s
    intercept[IllegalArgumentException](Time.trailingWindow(col("k"), col("es"), -1L))
  }

  test("Time.resampleFill: hourly grid, last-obs-per-bin, forward fill, observed flags") {
    import graft.ops.Time
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 10:05:00"), 1.0),
      (1L, ts("2024-01-01 10:40:00"), 2.0),   // same bin -> later wins
      (1L, ts("2024-01-01 13:10:00"), 9.0),   // bins 11,12 are gaps
      (2L, ts("2024-01-01 00:30:00"), 5.0))
      .toDF("user_id", "ts", "value")
    val got = Time.resampleFill(df, col("user_id"), col("ts"), col("value"), 3600L)
      .orderBy("key", "bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    val h = ts("2024-01-01 10:00:00").getTime / 1000 / 3600
    assert(got.toSeq === Seq(
      (1L, h,     2.0, true),   // later obs in the bin wins
      (1L, h + 1, 2.0, false),  // gap carried forward
      (1L, h + 2, 2.0, false),
      (1L, h + 3, 9.0, true),
      (2L, ts("2024-01-01 00:00:00").getTime / 1000 / 3600, 5.0, true)))
    intercept[IllegalArgumentException](
      Time.resampleFill(df, col("user_id"), col("ts"), col("value"), 0L))
  }

  test("Profile.madOutliers: hand-computed median/MAD; heavy tail robust; zero-MAD convention") {
    import graft.ops.Profile
    // group a: 1..7 plus one wild outlier 1000 -> med 4.5, deviations
    // {3.5,2.5,1.5,0.5,0.5,1.5,2.5,995.5} -> mad 2.0; only 1000 exceeds 3*mad
    val df = (Seq.tabulate(7)(i => ("a", (i + 1).toDouble)) :+ ("a", 1000.0) :+
      ("b", 5.0) :+ ("b", 5.0) :+ ("b", 9.0))
      .toDF("g", "x")
    val got = Profile.madOutliers(df, col("g"), col("x"), k = 3.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(got("a") === ((8L, 4.5, 2.0, 1L)), s"${got("a")}")
    // group b: med 5, mad 0 -> strict convention flags the 9
    assert(got("b") === ((3L, 5.0, 0.0, 1L)), s"${got("b")}")
  }

  test("Profile.histogram: hand-checked buckets, max in last bucket, constant column, nulls out") {
    import graft.ops.Profile
    val df = Seq[java.lang.Double](0.0, 1.0, 2.5, 5.0, 9.9, 10.0, null).toDF("x")
    val h = Profile.histogram(df, col("x"), 4).orderBy("bucket")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // range [0,10], width 2.5: 0,1 -> b0; 2.5 -> b1; 5 -> b2; 9.9,10 -> b3
    assert(h.toSeq === Seq(
      (0L, 2L, 0.0, 2.5), (1L, 1L, 2.5, 5.0), (2L, 1L, 5.0, 7.5), (3L, 2L, 7.5, 10.0)))
    assert(h.map(_._2).sum == 6L, "null must not be bucketed")
    val const = Profile.histogram(Seq(3.0, 3.0).toDF("x"), col("x"), 4).collect()
    assert(const.length == 1 && const.head.getLong(0) == 0L && const.head.getLong(1) == 2L)
  }
}
