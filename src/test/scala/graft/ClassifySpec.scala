package graft

import org.apache.spark.sql.functions._

import graft.ext.Classify

class ClassifySpec extends SparkSuite {
  import spark.implicits._

  private def u(x: Double): Long = math.floor(math.log(x) * 1e9 + 0.5).toLong

  // class a: "x x y", "x"  (totals: x=3, y=1, total=4)
  // class b: "z z", "z y"  (totals: z=3, y=1, total=4)
  // vocab {x, y, z}, V=3, priors 2/4 each
  private def train = Seq(
    ("a", "x x y"), ("a", "x"), ("b", "z z"), ("b", "z y")
  ).toDF("label", "text")

  test("fit reproduces hand-computed smoothed log-likelihood units and priors") {
    val m = Classify.naiveBayesFit(train, col("label"), col("text"))
    val grid = m.grid.as[(String, String, Long)].collect()
      .map { case (l, t, w) => (l, t) -> w }.toMap
    assert(grid == Map(
      ("a", "x") -> u(4.0 / 7), ("a", "y") -> u(2.0 / 7), ("a", "z") -> u(1.0 / 7),
      ("b", "x") -> u(1.0 / 7), ("b", "y") -> u(2.0 / 7), ("b", "z") -> u(4.0 / 7)))
    val labs = m.labels.as[(String, Long, Long)].collect()
      .map { case (l, p, o) => l -> ((p, o)) }.toMap
    assert(labs == Map(
      "a" -> ((u(0.5), u(1.0 / 7))), "b" -> ((u(0.5), u(1.0 / 7)))))
  }

  test("score: hand-computed argmax, OOV floor, and deterministic tie-break") {
    val m = Classify.naiveBayesFit(train, col("label"), col("text"))
    val docs = Seq((1L, "x y"), (2L, "z"), (3L, "q q")).toDF("id", "text")
    val out = Classify.naiveBayesScore(m, docs, col("id"), col("text"))
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == (("a", u(0.5) + u(4.0 / 7) + u(2.0 / 7))))
    assert(out(2L) == (("b", u(0.5) + u(4.0 / 7))))
    // all-OOV doc scores prior + 2·oov for BOTH classes (equal integer
    // scores) → the ascending-label tie-break must pick "a"
    assert(out(3L) == (("a", u(0.5) + 2 * u(1.0 / 7))))
  }

  test("scores are exact integers: invariant under repartitioning") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val m = Classify.naiveBayesFit(docs.filter(col("doc_id") % 10 =!= 0),
      col("source"), col("text"))
    val test10 = docs.filter(col("doc_id") % 10 === 0)
    val a = Classify.naiveBayesScore(m, test10, col("doc_id"), col("text"))
    val b = Classify.naiveBayesScore(m, test10.repartition(7, col("source")),
      col("doc_id"), col("text"))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    assert(a.count() == test10.count(), "every held-out doc gets exactly one prediction")
  }

  // The q154 selection contract: only (pred, hit) cross the engine
  // boundary because ln is not engine-portable at the last ulp. These
  // two tests make that contract CHECKED, not lucky: (1) every ln
  // quantization input sits ≥ 1e-4 units from its floor bin edge —
  // ~50× the worst cross-libm drift of ~2e-6 units — so no grid cell
  // flips a bin across engines; (2) even if every contributing cell
  // DID flip one bin, no argmax selection would change, because every
  // scored doc's top-1/top-2 margin exceeds the worst-case total
  // drift (n_tok + 2 one-unit flips per class, both classes adverse).
  test("q154 guard band: ln quantization inputs sit far from bin edges") {
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")
         if new java.io.File(dir).isDirectory) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val xs = Classify.quantizationInputs(docs.filter(col("doc_id") % 10 =!= 0),
        col("source"), col("text"))
      val y = log(col("x")) * 1e9 + 0.5
      val fr = y - floor(y)
      val worst = xs.select(col("site"), col("x"),
          least(fr, lit(1.0) - fr).as("dist"))
        .orderBy(col("dist")).limit(1).collect()(0)
      assert(worst.getDouble(2) >= 1e-4,
        s"$dir: quantization input x=${worst.getDouble(1)} at site " +
          s"${worst.getString(0)} sits ${worst.getDouble(2)} units from a " +
          "floor(ln(x)*1e9 + 0.5) bin edge - inside the cross-libm knife " +
          "edge; coarsen the unit scale or adjust the readout")
    }
  }

  test("q154 guard band: argmax margins dwarf worst-case per-cell drift") {
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")
         if new java.io.File(dir).isDirectory) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val m = Classify.naiveBayesFit(docs.filter(col("doc_id") % 10 =!= 0),
        col("source"), col("text"))
      val test10 = docs.filter(col("doc_id") % 10 === 0)
      val scored = Classify.naiveBayesScoreAll(m, test10, col("doc_id"), col("text"))
      val margins = scored.groupBy(col("__id"))
        .agg(sort_array(collect_list(col("score_units")), asc = false).as("ss"))
        .select((element_at(col("ss"), 1) - element_at(col("ss"), 2)).as("margin"))
      assert(scored.select(col("label")).distinct().count() >= 2,
        s"$dir: margin audit needs >= 2 classes")
      // worst-case cross-engine drift: every one of the <= n_tok + 2
      // quantized terms per class flips one unit, both classes adverse
      val maxTok = test10
        .select(size(graft.ext.TextAnalysis.tokens(col("text"))).cast("long").as("n"))
        .agg(max(col("n"))).as[Long].head()
      val minMargin = margins.agg(min(col("margin"))).as[Long].head()
      assert(minMargin > 2 * (maxTok + 2),
        s"$dir: min top-1/top-2 margin $minMargin does not clear the " +
          s"worst-case drift bound ${2 * (maxTok + 2)} - the selection " +
          "itself is knife-edged; the q154 pred/hit contract is unsafe")
    }
  }

  test("separable synthetic classes classify perfectly") {
    val tr = Seq(("pos", "good great fine"), ("pos", "great good"),
      ("neg", "bad awful poor"), ("neg", "awful bad")).toDF("label", "text")
    val m = Classify.naiveBayesFit(tr, col("label"), col("text"))
    val docs = Seq((1L, "good fine"), (2L, "poor awful"), (3L, "great great bad"))
      .toDF("id", "text")
    val preds = Classify.naiveBayesScore(m, docs, col("id"), col("text"))
      .select(col("id"), col("pred")).as[(Long, String)].collect().toMap
    assert(preds == Map(1L -> "pos", 2L -> "neg", 3L -> "pos"))
  }

  // ---- hashed logistic regression (q214) ----

  test("hashedDims matches the reference polynomial hash") {
    def refHash(t: String): Long = {
      var h = 0L
      t.foreach(c => h = (h * 31 + c.toInt) % 2147483648L)
      h
    }
    // no empty token: cleanText collapses whitespace, so tokens()
    // can never emit one
    val toks = Seq("with.", "the", "engine", "Zz9")
    // tokens() lower-cases, so feed pre-lowered text and check dims
    val got = Seq(toks.mkString(" ")).toDF("text")
      .select(Classify.hashedDims(col("text"), 64).as("d"))
      .as[Seq[Int]].collect().head.toSet
    val want = toks.map(t => (refHash(t.toLowerCase) % 64).toInt).toSet
    assert(got == want, s"got=$got want=$want")
  }

  test("logisticFit separates a synthetic screen and is partitioning-invariant") {
    val mk = (id: Long, spam: Boolean) =>
      (id, if (spam) s"buy now cheap pills offer $id" else s"regular prose about engines $id",
        if (spam) 1 else 0)
    val rows = (1L to 80L).map(i => mk(i, i % 2 == 0))
    val tr = rows.toDF("id", "text", "y")
    val m1 = Classify.logisticFit(tr, col("y"), col("text"))
    val m2 = Classify.logisticFit(tr.repartition(7, col("id")), col("y"), col("text"))
    assert(m1 == m2, "model must be identical under any partitioning")
    val scored = Classify.logisticScore(m1, tr, col("id"), col("text"))
      .join(tr.select(col("id"), col("y")), "id")
      .select((col("pred") === (col("y") === 1)).as("hit"))
      .filter(!col("hit")).count()
    assert(scored == 0, s"$scored training rows misclassified on a separable set")
  }

  test("q214 guard band: residual quantization inputs sit far from bin edges") {
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")
         if new java.io.File(dir).isDirectory) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 0, lit(" the and that have with."))
              .otherwise(lit(""))).as("t"))
      val xs = Classify.residualInputs(docs.filter(col("doc_id") % 10 =!= 0),
        (col("doc_id") % 3 === 0).cast("int"), col("t"))
      val fr = col("x") - floor(col("x"))
      val worst = xs.select(col("iter"), col("x"),
          least(fr, lit(1.0) - fr).as("dist"))
        .orderBy(col("dist")).limit(1).collect()(0)
      assert(worst.getDouble(2) >= 1e-5,
        s"$dir: residual input x=${worst.getDouble(1)} at iter " +
          s"${worst.getInt(0)} sits ${worst.getDouble(2)} units from a " +
          "floor bin edge - inside the cross-libm exp knife edge; " +
          "adjust lr/iters")
    }
  }

  test("denseLogisticFit recovers a planted linear teacher and is partitioning-invariant") {
    // planted teacher in feature space: y = [x1 + x2 > 0] over random-ish
    // deterministic vectors — the q259 construction at spec scale
    val rows = (1L to 80L).map { i =>
      // shader-hash pseudo-random features: near-independent across
      // dims (a sin LATTICE is heavily cross-correlated and lets a
      // noise dim shadow the teacher)
      val v = Seq.tabulate(8) { d =>
        val x = math.sin(i * 12.9898 + d * 78.233) * 43758.5453
        2 * (x - math.floor(x)) - 1
      }
      (i, v, if (v(0) + v(1) > 0) 1 else 0)
    }
    val tr = rows.toDF("id", "v", "y")
    val m1 = Classify.denseLogisticFit(tr, col("y"), col("v"), lrNum = 16L)
    val m2 = Classify.denseLogisticFit(tr.repartition(7, col("id")),
      col("y"), col("v"), lrNum = 16L)
    assert(m1 == m2, "dense model must be identical under any partitioning")
    // the teacher direction must dominate the learned weights: w(1), w(2)
    // (the planted dims) carry the largest magnitudes after the bias
    val planted = Seq(m1.w(1), m1.w(2)).map(math.abs).min
    val rest = m1.w.drop(3).map(math.abs).max
    assert(planted > rest,
      s"planted dims must outweigh noise dims: ${m1.w}")
    val mis = Classify.denseLogisticScore(m1, tr, col("id"), col("v"))
      .join(tr.select(col("id"), col("y")), "id")
      .filter(col("pred") =!= (col("y") === 1)).count()
    assert(mis <= 8, s"$mis/80 misclassified — the 8-step budget should fit most of a separable set")
  }

  test("dense LR fails loudly on variable-length vectors (no NULL-padded margins)") {
    // r18 ADVICE: a length mismatch must never publish a NULL margin
    // (zip_with NULL-pads where the oracle truncates — a silent
    // cross-engine divergence). Fit: require at collect time. Score:
    // row-local raise_error.
    val good = (1L to 10L).map(i => (i, Seq.tabulate(4)(d => (i + d).toDouble / 10), (i % 2).toInt))
    val short = Seq((99L, Seq(1.0, 2.0), 1))
    val mixed = (good ++ short).toDF("id", "v", "y")
    val eFit = intercept[IllegalArgumentException] {
      Classify.denseLogisticFit(mixed, col("y"), col("v"), iters = 1)
    }
    assert(eFit.getMessage.contains("uniform-length"), eFit.getMessage)
    val model = Classify.denseLogisticFit(good.toDF("id", "v", "y"),
      col("y"), col("v"), iters = 1)
    val eScore = intercept[Exception] {
      Classify.denseLogisticScore(model, mixed, col("id"), col("v")).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(eScore).contains("denseLogisticScore"), chain(eScore))
    // uniform-length scoring still works against the same model
    assert(Classify.denseLogisticScore(model, good.toDF("id", "v", "y"),
      col("id"), col("v")).count() == 10)
  }

  test("q259 guard band: dense residual quantization inputs sit far from bin edges") {
    for (dir <- Seq(sfDir, "/root/testdata/sf0.01")
         if new java.io.File(dir).isDirectory) {
      val em = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
        .withColumn("__v", col("embedding").cast("array<double>"))
        .withColumn("y",
          (element_at(col("__v"), 1) + element_at(col("__v"), 2) > 0).cast("int"))
      val xs = Classify.denseResidualInputs(em.filter(col("vec_id") % 10 =!= 0),
        col("y"), col("embedding"), lrNum = 16L)
      val fr = col("x") - floor(col("x"))
      val worst = xs.select(col("iter"), col("x"),
          least(fr, lit(1.0) - fr).as("dist"))
        .orderBy(col("dist")).limit(1).collect()(0)
      assert(worst.getDouble(2) >= 1e-5,
        s"$dir: dense residual input x=${worst.getDouble(1)} at iter " +
          s"${worst.getInt(0)} sits ${worst.getDouble(2)} units from a " +
          "floor bin edge - inside the cross-libm exp knife edge; " +
          "adjust lr/iters")
    }
  }
}
