package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Drift

class DriftSpec extends SparkSuite {
  import spark.implicits._

  private def snap(rows: (String, Int)*) =
    rows.toSeq.flatMap { case (c, n) => Seq.fill(n)(c) }.toDF("cat")

  test("identical snapshots have exactly zero PSI everywhere") {
    val a = snap("x" -> 40, "y" -> 30, "z" -> 5)
    val d = Drift.categoricalDrift(a, a, col("cat"))
    assert(d.filter(col("psi_units") =!= 0L).isEmpty)
    assert(Drift.totalPsi(d).as[java.math.BigDecimal].head()
      .compareTo(java.math.BigDecimal.ZERO) == 0)
  }

  test("a planted shift dominates; one-sided categories appear with count 0") {
    val a = snap("stable" -> 100, "shrinks" -> 100, "gone" -> 20)
    val b = snap("stable" -> 100, "shrinks" -> 10, "new" -> 50)
    val d = Drift.categoricalDrift(a, b, col("cat"))
      .orderBy(col("category"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val byCat = d.map(r => r._1 -> r).toMap
    assert(byCat.keySet == Set("stable", "shrinks", "gone", "new"))
    assert(byCat("gone")._3 == 0L && byCat("new")._2 == 0L,
      "one-sided categories must surface with a zero count")
    // every contribution non-negative (monotone quantization preserves
    // the sign agreement of (p-q) and ln(p/q))
    assert(d.forall(_._6 >= 0L))
    // the stable category contributes less than every shifted one
    assert(Seq("shrinks", "gone", "new").forall(c => byCat(c)._6 > byCat("stable")._6))
  }

  test("deterministic across partitionings, and totalPsi sums the table") {
    val a = snap("x" -> 37, "y" -> 11, "z" -> 3)
    val b = snap("x" -> 5, "y" -> 40, "w" -> 9)
    val base = Drift.categoricalDrift(a, b, col("cat"))
    val rep = Drift.categoricalDrift(a.repartition(7), b.repartition(3), col("cat"))
    assert(base.except(rep).isEmpty && rep.except(base).isEmpty)
    val total = Drift.totalPsi(base).as[java.math.BigDecimal].head()
    val manual = base.select(sum(col("psi_units"))).as[Long].head()
    assert(total.longValueExact() == manual)
  }

  test("numericDrift: identical snapshots zero out; shift and null-rate changes surface") {
    val a = (1 to 100).map(_.toDouble).toDF("x")
    val same = Drift.numericDrift(a, a, col("x"), nBins = 10)
    assert(same.filter(col("psi_units") =!= 0L).isEmpty)
    // bins from A's deciles: each holds ~10% of A by construction
    val counts = same.select("category", "count_a")
      .as[(Long, Long)].collect().toMap
    assert(counts.keySet == (0L to 9L).toSet)
    assert(counts.values.forall(c => c >= 9L && c <= 11L), s"unbalanced: $counts")
    // a location shift concentrates B's mass in the top bin
    val b = (1 to 100).map(_ + 200.0).toDF("x")
    val drift = Drift.numericDrift(a, b, col("x"), nBins = 10)
      .select("category", "count_b").as[(Long, Long)].collect().toMap
    assert(drift(9L) == 100L, s"shifted mass must land in the top bin: $drift")
    // nulls are bin -1, a real category
    val withNulls = (1 to 50).map(i => Some(i.toDouble)).toDF("x")
      .unionByName(Seq.fill(50)(Option.empty[Double]).toDF("x"))
    val nd = Drift.numericDrift(a, withNulls, col("x"), nBins = 10)
      .select("category", "count_b").as[(Long, Long)].collect().toMap
    assert(nd(-1L) == 50L, s"null bin missing: $nd")
  }

  test("streaming-maintained counts feed driftFromCounts ≡ batch drift of the same rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val counts = mem.toDF().toDF("cat")
      .groupBy(col("cat").as("category")).agg(count(lit(1)).as("count_b"))
    val q = counts.writeStream.outputMode("complete")
      .format("memory").queryName("drift_counts").start()
    val batch1 = Seq("x", "x", "y")
    val batch2 = Seq("y", "z", "x", "x")
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    val baseline = snap("x" -> 10, "y" -> 10, "z" -> 10)
      .select(col("cat").as("category")).groupBy(col("category"))
      .agg(count(lit(1)).as("count_a"))
    val streamed = Drift.driftFromCounts(baseline, spark.table("drift_counts"))
    val batch = Drift.categoricalDrift(
      snap("x" -> 10, "y" -> 10, "z" -> 10),
      (batch1 ++ batch2).toDF("cat"), col("cat"))
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty,
      "stream-maintained drift table drifted from the batch computation")
  }

  test("requireStable: passes on stable snapshots, fails loudly naming the worst shift") {
    val a = snap("x" -> 50, "y" -> 50)
    // near-identical → tiny PSI → passes
    val ok = Drift.requireStable(a, snap("x" -> 52, "y" -> 48), col("cat"))
    assert(ok.count() == 2)
    // a collapsed category → large PSI → loud gate failure
    val e = intercept[IllegalStateException] {
      Drift.requireStable(a, snap("x" -> 99, "y" -> 1), col("cat"), maxPsi = 0.25)
    }
    assert(e.getMessage.contains("drift gate failed") && e.getMessage.contains("y"),
      s"message should name the gate and a worst category: ${e.getMessage}")
  }

  // q171/q173 (and q180, which shares driftFromCounts) emit raw
  // psi_units — products of ln-quantized terms. That is only
  // engine-portable if no ln input sits on a floor bin edge (a
  // cross-libm last-ulp ln difference moves the pre-floor value by
  // ~2e-6 units). This audit recomputes every smoothed rate the
  // operator quantizes — bit-identical recomputation: one correctly
  // rounded division of the same exact integers — and demands ≥ 1e-4
  // units of clearance, ~50× the drift. The rate site (p·1e6) needs
  // no guard: division is correctly rounded identically in both
  // engines, so its bin can never flip.
  private def auditLnGuardBand(d: DataFrame, what: String): Unit = {
    val counts = d.select(col("category"), col("count_a"), col("count_b"))
    val norm = counts.agg(sum(col("count_a")).as("__na"),
      sum(col("count_b")).as("__nb"), count(lit(1)).as("__k"))
    val pa = (col("count_a") + 1).cast("double") / (col("__na") + col("__k"))
    val pb = (col("count_b") + 1).cast("double") / (col("__nb") + col("__k"))
    val y = log(col("p")) * 1e9 + 0.5
    val fr = y - floor(y)
    val worst = counts.crossJoin(broadcast(norm))
      .select(explode(array(pa, pb)).as("p"))
      .select(col("p"), least(fr, lit(1.0) - fr).as("dist"))
      .orderBy(col("dist")).limit(1).collect()(0)
    assert(worst.getDouble(1) >= 1e-4,
      s"$what: smoothed rate p=${worst.getDouble(0)} sits " +
        s"${worst.getDouble(1)} units from a floor(ln(p)*1e9 + 0.5) bin " +
        "edge - inside the cross-libm knife edge; coarsen psi_units or " +
        "drop them from the hashed readout")
  }

  test("q171/q173 guard band: ln quantization inputs sit far from bin edges") {
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")
         if new java.io.File(dir).isDirectory) {
      val ev = spark.read.parquet(s"$dir/events.parquet")
      val catg = concat(col("event_type"), lit("|"),
        coalesce(floor(col("value") / 100.0).cast("string"), lit("null")))
      val split = lit("2024-01-16").cast("timestamp")
      val (first, second) =
        (ev.filter(col("ts") < split), ev.filter(col("ts") >= split))
      auditLnGuardBand(Drift.categoricalDrift(first, second, catg), s"$dir q171")
      auditLnGuardBand(Drift.numericDrift(first, second, col("value"), nBins = 10),
        s"$dir q173")
    }
  }

  test("hand-checked two-category drift: integer-units pipeline") {
    // a: 3×p 1×q  (n=4, K=2) → pa_p=(3+1)/6, pa_q=(1+1)/6
    // b: 1×p 3×q            → pb_p=(1+1)/6, pb_q=(3+1)/6
    val a = snap("p" -> 3, "q" -> 1)
    val b = snap("p" -> 1, "q" -> 3)
    val d = Drift.categoricalDrift(a, b, col("cat"))
      .orderBy("category")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    def ru(x: Double) = math.floor(x * 1e6 + 0.5).toLong
    def lu(x: Double) = math.floor(math.log(x) * 1e9 + 0.5).toLong
    val (p23, p13) = (4.0 / 6, 2.0 / 6)
    assert(d == Seq(
      ("p", 3L, 1L, ru(p23), ru(p13), (ru(p23) - ru(p13)) * (lu(p23) - lu(p13))),
      ("q", 1L, 3L, ru(p13), ru(p23), (ru(p13) - ru(p23)) * (lu(p13) - lu(p23)))))
  }
}
