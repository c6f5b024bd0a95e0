package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.plans.{GraftExtensions, ShortCircuitExists}

class PlansSpec extends SparkSuite {
  import spark.implicits._

  /** The physical plan with the AQE wrapper removed: collect/exists on
    * an `AdaptiveSparkPlanExec` do NOT descend into the wrapped plan
    * (it is held as a field, not a child), so shape assertions against
    * the raw executedPlan are vacuously true for any plan with an
    * exchange. Discovered when the q208 one-window assertion read 0.
    */
  private def physicalPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.execution.SparkPlan =
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }

  private def countExchanges(df: org.apache.spark.sql.DataFrame): Int =
    physicalPlan(df).collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.size

  private def countWindows(df: org.apache.spark.sql.DataFrame): Int =
    physicalPlan(df).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.size

  private def matchedCond = {
    val kws = array(lit("spark"), lit("query"))
    size(filter(kws, k => col("t").contains(k))) > 0
  }

  test("rule rewrites size(filter(...)) > 0 into exists(...)") {
    ShortCircuitExists.install(spark)
    try {
      // parquet-backed source: a literal LocalRelation would be
      // constant-folded before our rule could be observed
      val df = sources.Tables.documents(spark, sfDir)
        .filter(size(filter(array(lit("spark"), lit("query")),
          k => col("text").contains(k))) > 0)
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("exists("), s"no exists in:\n$optimized")
      assert(!optimized.contains("size(filter("), s"filter survived in:\n$optimized")
      assert(df.count() > 0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == ShortCircuitExists)
    }
  }

  test("rewrite preserves results vs unoptimized") {
    val df = Seq("a spark text", "nothing here", "query time", "").toDF("t")
    val plain = df.filter(matchedCond).as[String].collect().toSet
    ShortCircuitExists.install(spark)
    try {
      val rewritten = df.filter(matchedCond).as[String].collect().toSet
      assert(plain == rewritten)
      // negation variant
      val n1 = df.filter(size(filter(array(lit("spark")), k => col("t").contains(k))) === 0)
        .as[String].collect().toSet
      assert(n1 == Set("nothing here", "query time", ""))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == ShortCircuitExists)
    }
  }

  test("near-dup pipelines scan the source exactly once (no aliased self-join double-eval)") {
    // regression guard for the bucketPairs restructure: the old
    // self-equi-join form scanned + evaluated the shingle/signature
    // subtree once per join side, and the size(sh)>0 filter was pushed
    // into the scan (re-evaluating the chain as a DataFilter)
    val docs = sources.Tables.documents(spark, sfDir)
    for ((name, df) <- Seq(
        "minhash" -> ext.Dedup.nearDupPairs(docs, col("doc_id"), col("text")),
        "simhash" -> ext.Dedup.simhashNearDup(docs, col("doc_id"), col("text")),
        "winnow"  -> ext.Dedup.winnowNearDup(docs, col("doc_id"), col("text")))) {
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      val scans = plan.linesIterator.count(_.contains("Scan parquet"))
      assert(scans == 1, s"$name: expected 1 parquet scan, got $scans")
      assert(!plan.contains("DataFilters: [(size("),
        s"$name: expensive chain pushed into scan DataFilters")
    }
  }

  test("q86 kNN-graph symmetrizes with ONE pair-generation subtree") {
    // regression guard for the explode symmetrization: the old
    // unionByName(pairs, pairs.swapped) form planned the LSH bucketing,
    // pair expansion and cosine verify TWICE (ReuseExchange only saved
    // the shuffles). One lsh_buckets generate + one parquet scan = one
    // subtree.
    val df = SparkEntry.queries("q86_knn_graph")(spark, sfDir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected 1 parquet scan, got $scans")
    val lshGens = plan.linesIterator.count(_.contains("lshbuckets"))
    assert(lshGens == 1, s"expected 1 lshbuckets generate, got $lshGens")
  }

  test("whole-surface plan sweep: no unexpected cartesian product or scalar UDF in ANY query") {
    // every declared query's physical plan, checked in one sweep —
    // a new query with an accidental O(n^2) join or a non-codegen
    // ScalaUDF fails here before it ever reaches the driver.
    // Whitelisted cartesians are the labeled exact baselines (q24/q25,
    // maxRows-guarded) and the single-row stats crosses: BM25's corpus
    // aggregate (q73) and the LM model's normalizer/OOV floor (q93,
    // and q107 which scores against TWO such models).
    val cartesianOk = Set("q24_knn_brute", "q25_cosine_pairs", "q73_bm25_rank",
      "q93_lm_quality", "q107_dsir_sample", "q118_histogram",
      "q119_provenance_prep", "q121_cooccur_pmi",
      // |labels|×|labels| sketch-pair cross — one tiny broadcast side,
      // independent of event volume (ops/Audience.overlapSketch)
      "q141_overlap_sketch",
      // docs × |classes| scoring base and vocab × |classes| smoothing
      // grid — the class dimension is a handful of broadcast rows
      // (ext/Classify; the q93 normalizer stance)
      "q154_naive_bayes",
      // source-counts × single-row weight total — the q93 single-row
      // broadcast normalizer (ops/Sampling.temperatureMixture; q166
      // embeds the same chain as its final stage)
      "q163_temperature_mix", "q166_pipeline_r12",
      // category-table × single-row totals normalizer (ops/Drift —
      // the q93 stance), and q172's per-split table × single-row
      // straddle invariant
      "q171_drift_psi", "q172_leak_safe_split", "q173_numeric_drift",
      "q180_embedding_drift",
      // |types|×|types| sketch-pair cross — the q141 stance
      "q182_theta_audiences",
      // per-table single-row accounting crosses (the q93 stance)
      "q183_forget_flow",
      // q154's class-dimension scoring cross, audited over the full
      // corpus
      "q185_lang_audit",
      // scored-docs × single-row tercile-boundary normalizer (the q93
      // stance applied to the CCNet bucket cut)
      "q196_ccnet_buckets",
      // the recall measurements' EXACT side is the labeled q24 brute
      // baseline (broadcast query table × corpus)
      "q198_ann_recall", "q202_pq_recall_nprobe",
      // q220 shares q198's brute ground-truth side verbatim
      "q220_ranking_metrics",
      // scored-docs × single-row median normalizer + the LM model's
      // OOV-floor cross (the q93/q196 stance)
      "q221_synthetic_screen",
      // candidate responses × the reward LM's single-row OOV floor —
      // the q93 normalizer stance (ext/TextAnalysis.lmScore)
      "q215_best_of_n",
      // corpus × the single-row grand-total stratum of the rollup —
      // the full-suppression level's group size (ext/Redact.kAnonymize)
      "q216_k_anonymity",
      // pairs × the single-row reward-tercile boundary (the q196
      // stance) + the reward LM's OOV floor (the q93/q215 stance)
      "q217_sft_export",
      // scored-docs × single-row decile-boundary normalizer (the q196
      // stance applied to the reliability-diagram bin cut)
      "q223_calibration",
      // candidates × single-row corr/quartile-boundary normalizer +
      // the reward LM's OOV floor (the q93/q215 stance)
      "q224_reward_length_bias",
      // the reward LM's OOV floor cross (the q93/q215 stance); the
      // candidate pair join itself is post-keyed, not cartesian
      "q225_pref_concordance",
      // vectors × single-row median/MAD normalizers (the q124
      // construction at corpus level — the q93 stance)
      "q226_embedding_sanity",
      // two LM OOV-floor crosses (reference + proxy) + the two
      // single-row token-share/softmax normalizers over the 5-row
      // source table (the q93 stance)
      "q228_domain_reweight",
      // scored-docs × single-row per-class confidence thresholds (the
      // q93/q223 stance applied to the confident-learning cut)
      "q229_label_noise",
      // the reward LM's OOV floor + the per-MM-round single-row
      // renormalizer over the 4-row rating table (the q93 stance)
      "q236_bt_rating",
      // LM OOV floor + single-row tercile boundary (the q196 stance)
      "q237_screen_overlap",
      // the lexical side carries q73's single-row corpus-stats cross;
      // the dense side is the q24 broadcast-query scoring at ONE query
      // (1 × corpus = O(n), the labeled brute baseline shape); q250
      // swaps the dense side to the q38 IVF index (its centroid table
      // is a single-row broadcast — the q93 stance)
      "q244_hybrid_rrf", "q250_hybrid_rrf_ivf",
      // single-row mean/component broadcasts per power step (the q93
      // stance: the build side is model-sized — one d-array row —
      // regardless of corpus volume; ext/Spectral)
      "q245_pca_component", "q246_pca_project", "q247_pca_spectrum",
      "q249_pca_project_sized",
      // the datacard's quantile row × the two-row spectrum readout —
      // both single-row broadcasts (the q93 stance)
      "q252_spectral_datacard",
      // the power-step single-row crosses of the spectral fit plus
      // the fitted (mu, pc) single-row state broadcast into
      // projectWith (the q93 stance); the dedup half is the q106
      // cluster-keyed equi-join, not cartesian
      "q253_whitened_semdedup", "q255_whitened3_semdedup",
      // q257 = q253's composition on the q249 sampled-fit path — the
      // same power-step single-row crosses and (mu, pc) state
      // broadcast (the q93 stance); q258 = the fully-sized form
      // (sized fit + semDedupAuto), same plan shapes
      "q257_whitened_semdedup_sized", "q258_whitened_semdedup_auto",
      // the funnel datacard's readout row is eight single-row
      // aggregates crossed (the q93 stance); every corpus-sized join
      // upstream is cluster- or id-keyed
      "q256_dedup_funnel",
      // scored-corpus × single-row tercile-boundary normalizer (the
      // q196 stance applied to the trained classifier's cut); q261 is
      // the same cross feeding a one-row rollup
      "q260_classifier_cut", "q261_classifier_card",
      // q262 = q255's composition on the q249 sampled two-component
      // fit — the same power-step single-row crosses and (mu, pc,
      // pc2) state broadcast (the q93 stance); the dedup half is the
      // q106 cluster-keyed equi-join, not cartesian; q263 = the
      // fully-sized form (sized fit + semDedupAuto), same plan shapes
      "q262_whitened3_semdedup_sized", "q263_whitened3_semdedup_auto")
    for ((name, fn) <- SparkEntry.queries) {
      val df = fn(spark, sfDir)
      // scalar-only output contract (the q188/r13 lesson): the driver's
      // correctness harness sorts result rows with pandas, which cannot
      // sort array/struct/map cells — a non-scalar output column reds
      // the row no matter how correct the operator is. The builder's
      // local checker tuple-converts arrays; the driver's does not, so
      // this gap is only catchable here.
      for (f <- df.schema.fields)
        assert(!f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
            !f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType] &&
            !f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType],
          s"$name output column '${f.name}' is non-scalar (${f.dataType.simpleString}); " +
            "emit array_join/concat_ws or per-element columns instead")
      val physical = df.queryExecution.executedPlan.toString
      if (!cartesianOk(name))
        assert(!physical.contains("CartesianProduct") && !physical.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unbounded join:\n${physical.take(1500)}")
      assert(!physical.contains("BatchEvalPython"), s"$name plans a Python UDF")
      val hasScalaUdf = df.queryExecution.analyzed.expressions.exists(_.exists {
        case _: org.apache.spark.sql.catalyst.expressions.ScalaUDF => true
        case _ => false
      })
      assert(!hasScalaUdf, s"$name uses a scalar ScalaUDF (zero-UDF contract)")
    }
  }

  test("no lazy localCheckpoint anywhere in src/main (the r17 deadlock lesson)") {
    // A lazy checkpoint can be finalized by a broadcast-exchange
    // thread (any broadcast whose lineage carries the checkpointed
    // table runs its materialization job on that pool), and Spark's
    // doCheckpoint / getCacheLocs monitors then deadlock against the
    // DAG scheduler — hit as a permanent mid-bench hang in round 17.
    // Convention: staging is always an EAGER localCheckpoint, and only
    // for tables consumed many times that stay sample-sized at scale.
    import scala.jdk.CollectionConverters._
    // Regex, not an exact literal (r17 ADVICE): spacing variants and the
    // positional form `localCheckpoint(false)` must trip the guard too.
    // and the trailing \b keeps identifiers like `falseFlag` from
    // false-positiving (r18 ADVICE).
    val lazyCk = """localCheckpoint\s*\(\s*(eager\s*=\s*)?false\b""".r
    val bad = java.nio.file.Files.walk(java.nio.file.Paths.get("src/main/scala"))
      .iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filter(p => lazyCk.findFirstIn(
        new String(java.nio.file.Files.readAllBytes(p))).isDefined)
      .map(_.toString).toList
    assert(bad.isEmpty,
      s"lazy localCheckpoint reintroduced (deadlocks vs the DAG scheduler): $bad")
  }

  test("oracle SQL carries no doubled backslash escapes (the r14 no-op-regex lesson)") {
    // Scala plain AND raw triple-quoted strings do not process
    // backslash escapes, so a '\\s+' written there reaches DuckDB as
    // a two-backslash pattern — regexp_replace silently no-ops, and
    // the row stays green only while the fixture text has nothing to
    // collapse. 35 chains carried this latently until round 14.
    for ((k, v) <- SparkEntry.oracleSql)
      assert(!v.contains("\\\\"),
        s"$k oracle SQL contains a doubled backslash — write the single-backslash regex")
  }

  test("round-13 operators keep their promised plan shapes") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // row-local line ops: ZERO shuffles, ZERO windows
    val clean = docs.select(
      graft.ext.TextAnalysis.c4LineClean(col("text")).as("c"),
      graft.ext.TextAnalysis.gopherQualityGate(col("text")).as("g"))
    assert(countExchanges(clean) == 0 && countWindows(clean) == 0,
      "line cleaning / gopher gate must stay row-local")
    // token-budget cut: NO per-source window anywhere (the whole
    // point of the prefix-sum construction)
    val budget = graft.ops.Sampling.tokenBudgetSample(
      docs.select(col("doc_id"), col("source"), col("n_chars").as("n_tokens")),
      col("source"), col("doc_id"), col("n_tokens"), Seq("src0" -> 100L))
    assert(countWindows(budget) == 0, "tokenBudgetSample must not plan a window")
    // global paragraph dedup: no window; the min-struct aggregation
    // carries the first-occurrence choice
    val para = graft.ext.TextAnalysis.dedupParagraphsGlobal(
      docs, col("doc_id"), col("text"))
    assert(countWindows(para) == 0, "dedupParagraphsGlobal must not plan a window")
    // the normalization expressions ride whole-stage codegen contexts
    // (no BatchEvalPython / ScalaUDF anywhere - covered by the sweep)
    val uni = docs.select(
      graft.functions.UnicodeNorm.nfc_normalize(col("text")),
      graft.functions.UnicodeNorm.strip_accents(col("text")))
    assert(countExchanges(uni) == 0)
  }

  test("round-14 operators keep their promised plan shapes") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // dictionary screen: row-local — ZERO shuffles at any term count
    val dict = graft.functions.DictMatch.automaton(
      (0 until 5000).map(i => f"zq$i%04d"))
    val screen = docs.select(
      graft.functions.DictMatch.dict_contains_any(col("text"), dict),
      graft.functions.DictMatch.dict_matches(col("text"), dict))
    assert(countExchanges(screen) == 0, "blocklist screen must stay row-local")
    // repetition gate: shuffle-based (per design), but NEVER an
    // unbounded join and NEVER a per-doc O(m^2) HOF — the gram/count
    // machinery must not plan a cartesian
    val rep = graft.ext.TextAnalysis.gopherRepetitionGate(
      docs, col("doc_id"), col("text"))
    val repPlan = rep.queryExecution.executedPlan.toString
    assert(!repPlan.contains("CartesianProduct") &&
      !repPlan.contains("BroadcastNestedLoopJoin"),
      "gopherRepetitionGate must not plan an unbounded join")
    // epoch water-fill: windows only over the SOURCE table (documented
    // model-sized single-task state), corpus touched once
    val alloc = graft.ops.Sampling.epochAllocation(
      docs.select(col("source"), col("n_chars").as("nt")),
      col("source"), col("nt"), budget = 1000L)
    val scans = alloc.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Scan parquet"))
    assert(scans == 1, s"epochAllocation must scan the corpus exactly once, got $scans scans")
  }

  test("post-training miners keep their promised plan shapes") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val posts = docs.select(col("doc_id").cast("string").as("post_id"),
      col("source").as("subreddit"), col("text").as("title"), lit("").as("selftext"))
    val comments = docs.select(col("doc_id").cast("string").as("post_id"),
      col("doc_id").cast("string").as("comment_id"), lit(0).as("flat_idx"),
      col("text").as("body"), lit("u").as("author"))
    // preference pairs: the whole point of the max_by/min_by shape is
    // NO window — the extremes fold map-side as a partial aggregate
    val pref = graft.ext.Posttrain.preferencePairs(posts, comments, 1)
    assert(countWindows(pref) == 0, "preferencePairs must not plan a window")
    assert(pref.queryExecution.executedPlan.toString.contains("partial_max_by"),
      "preferencePairs must partially aggregate map-side")
    // dialog assembly: one aggregation, no window — turn logic is
    // row-local HOFs over the collected array
    val dia = graft.ext.Posttrain.assembleDialogs(posts, comments)
    assert(countWindows(dia) == 0, "assembleDialogs must not plan a window")
    // sft pairs: exactly the one documented top-1 window (per post_id)
    val sft = graft.ext.Posttrain.sftPairs(posts, comments, 1)
    assert(countWindows(sft) == 1, sft.queryExecution.executedPlan.toString.take(4000))
    // best-of-n (q215): the reward argmax is the same window-free
    // combinable max_by shape as preferencePairs — the per-post
    // winner folds map-side
    val bon = graft.SparkEntry.queries("q215_best_of_n")(spark, sfDir)
    assert(bon.queryExecution.executedPlan.toString.contains("partial_max_by"),
      "q215 best-of-n must partially aggregate its reward argmax map-side")
  }

  test("GraftExtensions registers the rule at session build time") {
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // note: getOrCreate may return the shared session; only assert when
    // we truly got a fresh one with the extension applied
    val df = Seq("a spark text").toDF("t").filter(
      size(filter(array(lit("spark")), k => col("t").contains(k))) > 0)
    assert(df.count() == 1)
  }

  test("GraftFunctions.install: SQL bindings agree with the Column API") {
    graft.functions.GraftFunctions.install(spark)
    Seq(("the quick brown fox jumps over the lazy dog", Seq(1.0f, 2.0f, 2.0f)))
      .toDF("t", "v").createOrReplaceTempView("gf_probe")
    val got = spark.sql(
      """SELECT shingle_set(t, 3) AS sh,
        |  simhash64(split(t, ' ')) AS sim,
        |  minhash_sig(shingle_set(t, 3), 4) AS mh,
        |  dot_product(CAST(v AS ARRAY<DOUBLE>), CAST(v AS ARRAY<DOUBLE>)) AS dp,
        |  l2_normalize(CAST(v AS ARRAY<DOUBLE>)) AS nv,
        |  winnow(t, 8, 4) AS wn
        |FROM gf_probe""".stripMargin).collect()(0)
    val viaColumns = Seq(("the quick brown fox jumps over the lazy dog", Seq(1.0f, 2.0f, 2.0f)))
      .toDF("t", "v")
      .select(
        graft.functions.ShingleSet.shingle_set(col("t"), 3).as("sh"),
        graft.functions.SimHash64.simhash64(split(col("t"), " ")).as("sim"),
        graft.functions.MinHashSig.minhash_sig(
          graft.functions.ShingleSet.shingle_set(col("t"), 3), 4).as("mh"),
        graft.functions.DotProduct.dot_product(
          col("v").cast("array<double>"), col("v").cast("array<double>")).as("dp"),
        graft.functions.L2Normalize.l2_normalize(col("v").cast("array<double>")).as("nv"),
        graft.functions.Winnow.winnow(col("t"), 8, 4).as("wn"))
      .collect()(0)
    assert(got.getSeq[String](0) == viaColumns.getSeq[String](0))
    assert(got.getLong(1) == viaColumns.getLong(1))
    assert(got.getSeq[String](2) == viaColumns.getSeq[String](2))
    assert(got.getDouble(3) == viaColumns.getDouble(3) && got.getDouble(3) == 9.0)
    assert(got.getSeq[Double](4) == viaColumns.getSeq[Double](4))
    assert(got.getSeq[Long](5) == viaColumns.getSeq[Long](5))
    // shape args must be integer literals
    val err = intercept[Exception](spark.sql("SELECT shingle_set('x', 'k')").collect())
    assert(err.getMessage.contains("integer literal"))
    // the entity decoder is SQL-bound too
    assert(spark.sql("SELECT decode_html_entities('Caf&#233; &amp;lt; &mdash;')")
      .collect()(0).getString(0) == "Café &lt; —")
    // cdc_cuts: SQL ≡ Column API ≡ direct compute
    val text = "the quick brown fox jumps over the lazy dog " * 8
    val viaSql = spark.sql(
      s"SELECT cdc_cuts('${text}', 16, 1000003, 64)").collect()(0).getSeq[Long](0)
    val viaCol = Seq(text).toDF("t")
      .select(graft.functions.CdcCuts.cdcCuts(col("t")))
      .collect()(0).getSeq[Long](0)
    assert(viaSql == viaCol &&
      viaSql == graft.functions.CdcCuts.compute(text, 16, 1000003L, 64L).toLongArray.toSeq)
  }
}
