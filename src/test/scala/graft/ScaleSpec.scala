package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew
import graft.sinks.Bucketed
import graft.sources.Tables

/** Scale-lever tests: salted joins preserve semantics; bucketed writes
  * eliminate join-time shuffles (asserted on the physical plan).
  */
class ScaleSpec extends SparkSuite {

  test("saltedJoin equals plain join") {
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey").as("k"), col("o_totalprice"))
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("k"), col("l_quantity"))
    val plain = li.join(o, "k").agg(
      count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 2)).head
    val salted = Skew.saltedJoin(li, o, "k", n = 8).agg(
      count(lit(1)), round(sum(col("l_quantity") * col("o_totalprice")), 2)).head
    assert(plain == salted)
  }

  test("keyHistogram surfaces the heaviest keys") {
    val h = Skew.keyHistogram(Tables.lineitem(spark, sfDir), col("l_returnflag"), 3)
      .collect()
    assert(h.length == 3)
    assert(h.map(_.getLong(1)).toSeq == h.map(_.getLong(1)).sortBy(-_).toSeq)
  }

  test("bucketed co-located join plans without Exchange") {
    spark.sql("DROP TABLE IF EXISTS graft_b_orders")
    spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
    Bucketed.write(Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice")), "graft_b_orders", "o_orderkey", 4)
    Bucketed.write(Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "graft_b_lineitem", "o_orderkey", 4)
    // force the non-broadcast path: bucketing matters exactly when the
    // build side is too big to broadcast
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.coLocatedJoin(spark, "graft_b_orders", "graft_b_lineitem", "o_orderkey")
      val expected = Tables.lineitem(spark, sfDir).count()
      assert(joined.count() == expected)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("CDC merge against a BUCKETED snapshot: only the delta shuffles") {
    // the applyChanges scale claim made concrete: with the snapshot
    // bucketed by key, the full-outer join reads the snapshot's bucket
    // layout directly — the one hash Exchange left in the plan is the
    // delta's compaction window, i.e. the 100 TB side never moves
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_b_snapshot")
    val snap = (1L to 2000L).map(k => (k, s"name$k", k * 1.5)).toDF("k", "name", "bal")
    Bucketed.write(snap, "graft_b_snapshot", "k", 4)
    val changes = Seq(
      (5L, "upd5", 1.0, 100L, "U", 1L),
      (2001L, "new", 2.0, 100L, "I", 2L),
      (7L, "gone", 0.0, 100L, "D", 3L)
    ).toDF("k", "name", "bal", "seq", "op", "chg_id")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val merged = graft.ops.Merge.applyChanges(
        spark.table("graft_b_snapshot"), changes, "k", "seq", "op", "chg_id")
      assert(merged.count() == 2000) // 2000 - 1 delete + 1 insert
      assert(merged.filter(col("k") === 5L).select("name").as[String].head() == "upd5")
      val plan = merged.queryExecution.executedPlan.toString
      val hashExchanges = plan.linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") && !l.contains("Reused"))
      assert(hashExchanges == 1,
        s"expected ONLY the delta's window exchange, got $hashExchanges:\n${plan.take(2500)}")
      assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n${plan.take(1500)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("day-partitioned write prunes partitions at planning time") {
    import graft.sinks.Partitioned
    val dir = java.nio.file.Files.createTempDirectory("bydate").toFile.getAbsolutePath
    val events = Tables.events(spark, sfDir)
    Partitioned.writeByDay(events, "ts", dir)
    val days = events.select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .distinct().orderBy("d").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect()
    assert(days.length >= 2, s"fixture spans ${days.length} day(s)")
    val firstDay = days.head
    val pruned = spark.read.parquet(dir)
      .filter(Partitioned.dayRange(firstDay, days(1)))
    val expected = events
      .filter(date_format(col("ts"), "yyyy-MM-dd") === firstDay).count()
    assert(pruned.count() == expected)
    val plan = pruned.queryExecution.executedPlan.toString
    // the day predicate must land in PartitionFilters (directory
    // pruning), NOT in DataFilters/PushedFilters (row-level work)
    val scanLine = plan.linesIterator.find(_.contains("Scan parquet")).get
    assert(scanLine.contains("PartitionFilters: [") &&
      scanLine.replaceAll(".*PartitionFilters: \\[", "").takeWhile(_ != ']')
        .contains("p_date"), s"no partition pruning in:\n$scanLine")
  }

  test("ORC roundtrip preserves rows and pushes the filter into the ORC scan") {
    import graft.sinks.Orc
    val dir = java.nio.file.Files.createTempDirectory("orc_rt").toFile.getAbsolutePath
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
    Orc.write(docs, dir)
    val back = Orc.read(spark, dir).filter(col("n_chars") >= 100)
    assert(back.count() == docs.filter(col("n_chars") >= 100).count())
    val scanLine = back.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("Scan orc")).get
    assert(scanLine.contains("PushedFilters: [") &&
      scanLine.replaceAll(".*PushedFilters: \\[", "").takeWhile(_ != ']')
        .contains("n_chars"), s"filter not pushed to ORC scan:\n$scanLine")
  }

  test("IVF inverted file as a cluster-partitioned layout: probe prunes to nprobe clusters") {
    // The 100 TB form of ivfSearch: the cluster assignment is the
    // PARTITION column of the stored table, so probing nprobe of k
    // clusters is directory pruning — the scan never touches the other
    // k - nprobe partitions' files.
    import graft.ext.Similarity
    val em = Tables.embeddings(spark, sfDir)
    val model = Similarity.ivfFit(em, col("vec_id"), col("embedding"), k = 4, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("ivfstore").toFile.getAbsolutePath
    model.assigned.write.mode("overwrite").partitionBy("cluster").parquet(dir)
    val probed = spark.read.parquet(dir).filter(col("cluster").isin(0, 1))
    val expected = model.assigned.filter(col("cluster").isin(0, 1)).count()
    assert(probed.count() == expected && expected > 0)
    val scan = probed.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("Scan parquet")).get
    val pf = scan.replaceAll(".*PartitionFilters: \\[", "").takeWhile(_ != ']')
    assert(pf.contains("cluster"), s"probe filter not in PartitionFilters:\n$scan")
    model.unpersist()
  }
}
