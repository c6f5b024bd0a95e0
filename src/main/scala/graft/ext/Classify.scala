package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ⊕ Trained text classification — the model-based stage of a corpus
  * quality/domain filter (CCNet trains a fastText classifier against
  * a reference corpus; the linear bag-of-words form of that screen is
  * multinomial Naive Bayes). [[TextAnalysis.classifyByLexicon]] is
  * the rule-based stage; this is the trained one: fit per-class token
  * statistics on a labeled sample, score the full corpus.
  *
  * Scale shape: training is two corpus passes over the LABELED sample
  * (token counts per class, class priors) — map-side-combinable
  * aggregations, model state is vocab × classes rows, never corpus
  * rows. Scoring is one explode + one equi-join against the model +
  * one per-(doc, class) integer aggregation; the class dimension is a
  * handful of rows, so the doc × class scoring base is a documented
  * tiny-dim broadcast cross (the q79/q93 normalizer stance).
  *
  * Determinism (the oracle contract): every log-probability is
  * quantized to integer NANO-UNITS the moment it is computed —
  * `floor(ln(exact-integer-ratio) · 1e9 + 0.5)` — so all downstream
  * per-document accumulation is EXACT integer summation, order-free
  * under any partitioning (the q137 integer-cents convention applied
  * to log-space). Laplace smoothing with α = 1 keeps every ratio a
  * ratio of exact integers.
  */
object Classify {

  /** Fitted model: `grid` = (label, token, w_units) for EVERY vocab ×
    * class cell (zero counts smoothed, so scoring never needs an OOV
    * branch for in-vocab tokens); `labels` = (label, prior_units,
    * oov_units) — one row per class.
    */
  final case class NbModel(grid: DataFrame, labels: DataFrame)

  private def units(x: Column): Column =
    floor(log(x) * 1e9 + 0.5).cast("long")

  /** The raw (pre-quantization) probability ratios, one per `ln`
    * site: `labelsRaw(label, __prior_x, __oov_x)` and
    * `gridRaw(label, token, __w_x)`. [[naiveBayesFit]] quantizes
    * these; [[quantizationInputs]] audits them — both derive from
    * this ONE pipeline so the audited ratios are exactly the ratios
    * the model quantizes (exact-deterministic: each is one
    * correctly-rounded double division of exact integer counts).
    */
  private def fitRaw(train: DataFrame, labelCol: Column,
                     textCol: Column): (DataFrame, DataFrame) = {
    val tr = train.select(labelCol.as("label"), textCol.as("__text"))
    val tok = tr.select(col("label"),
      explode(TextAnalysis.tokens(col("__text"))).as("token"))
    // class sizes (docs) and token totals — class-count rows each
    val nDocs = tr.groupBy(col("label")).agg(count(lit(1)).as("__n_docs"))
    val totals = tok.groupBy(col("label")).agg(count(lit(1)).as("__total"))
    // corpus scalars: vocabulary size and training-doc count, attached
    // as single-row broadcast normalizers (q79/q93 stance)
    val vocab = tok.select(col("token")).distinct()
    val vs = vocab.agg(count(lit(1)).as("__v"))
    val nd = tr.agg(count(lit(1)).as("__n"))
    val labelsRaw = nDocs.join(totals, Seq("label"))
      .crossJoin(broadcast(vs)).crossJoin(broadcast(nd))
      .select(col("label"),
        (col("__n_docs").cast("double") / col("__n")).as("__prior_x"),
        (lit(1.0) / (col("__total") + col("__v"))).as("__oov_x"),
        col("__total"), col("__v"))
    val counts = tok.groupBy(col("label"), col("token")).agg(count(lit(1)).as("__c"))
    val gridRaw = vocab.crossJoin(broadcast(labelsRaw))
      .join(counts, Seq("label", "token"), "left")
      .select(col("label"), col("token"),
        ((coalesce(col("__c"), lit(0L)) + lit(1.0)) /
          (col("__total") + col("__v"))).as("__w_x"))
    (labelsRaw, gridRaw)
  }

  /** Multinomial NB fit over `train` (labelCol, textCol). Tokens are
    * [[TextAnalysis.tokens]] (the q80 vocabulary convention).
    */
  def naiveBayesFit(train: DataFrame, labelCol: Column, textCol: Column): NbModel = {
    val (labelsRaw, gridRaw) = fitRaw(train, labelCol, textCol)
    val grid = gridRaw.select(col("label"), col("token"),
      units(col("__w_x")).as("w_units"))
    val labels = labelsRaw.select(col("label"),
      units(col("__prior_x")).as("prior_units"),
      units(col("__oov_x")).as("oov_units"))
    NbModel(grid, labels)
  }

  /** Every raw ratio the fit quantizes, one row per `ln` site:
    * `(site, x)` — the guard-band audit surface. ClassifySpec asserts
    * each site's `ln(x)·1e9 + 0.5` sits far from its `floor` bin
    * edge, which is what makes the q154 selection contract CHECKED
    * rather than lucky (a cross-libm last-ulp `ln` difference moves
    * the pre-floor value by ~1e-6 units; the spec demands ≥ 1e-4).
    */
  private[graft] def quantizationInputs(train: DataFrame, labelCol: Column,
                                        textCol: Column): DataFrame = {
    val (labelsRaw, gridRaw) = fitRaw(train, labelCol, textCol)
    gridRaw.select(lit("grid").as("site"), col("__w_x").as("x"))
      .unionAll(labelsRaw.select(lit("prior").as("site"), col("__prior_x").as("x")))
      .unionAll(labelsRaw.select(lit("oov").as("site"), col("__oov_x").as("x")))
  }

  /** Full per-(doc, class) integer score table — the internal scoring
    * base [[naiveBayesScore]] argmaxes over. Exposed (package-private)
    * so ClassifySpec can assert the selection guard band: the top-1 /
    * top-2 margin must dwarf the worst-case per-cell nano-unit drift,
    * which is what licenses outputting only the SELECTION across
    * engines (the q92 "ln stays internal" convention).
    */
  private[graft] def naiveBayesScoreAll(model: NbModel, docs: DataFrame,
                                        idCol: Column, textCol: Column): DataFrame = {
    val d = docs.select(idCol.as("__id"), TextAnalysis.tokens(textCol).as("__toks"))
    val tok = d.select(col("__id"), explode(col("__toks")).as("token"))
    val known = tok.join(model.grid, Seq("token"))
      .groupBy(col("__id"), col("label"))
      .agg(sum(col("w_units")).as("__s_known"), count(lit(1)).as("__n_known"))
    val base = d.select(col("__id"), size(col("__toks")).cast("long").as("__n_tok"))
      .crossJoin(broadcast(model.labels))
    base.join(known, Seq("__id", "label"), "left")
      .select(col("__id"), col("label"),
        (col("prior_units") + coalesce(col("__s_known"), lit(0L)) +
         (col("__n_tok") - coalesce(col("__n_known"), lit(0L))) * col("oov_units"))
          .as("score_units"))
  }

  /** Score `docs` (idCol, textCol): per-document argmax class.
    * Output: id, pred, score_units (winning class's integer score).
    * Ties break on ascending label — deterministic because scores are
    * integers. Callers that cross an engine boundary should emit only
    * the selection (`pred`), not the raw units — see q154's contract.
    */
  def naiveBayesScore(model: NbModel, docs: DataFrame,
                      idCol: Column, textCol: Column): DataFrame = {
    val scored = naiveBayesScoreAll(model, docs, idCol, textCol)
    graft.ops.TopK.perGroupTopK(scored, Seq(col("__id")),
        Seq(desc("score_units"), asc("label")), 1)
      .select(col("__id").as("id"), col("label").as("pred"), col("score_units"))
  }

  // --------------------------------------------------------------------
  // ⊕ Hashed logistic regression — the fastText-shaped quality
  // classifier (Joulin et al. 2017 bag-of-features linear model;
  // CCNet/LLaMA train exactly this against a reference corpus) with
  // the feature-hashing trick (Weinberger et al. 2009) so model size
  // is FIXED at `dims` weights regardless of vocabulary.
  //
  // Scale shape: each GD iteration is ONE map-side-combinable integer
  // aggregation over the labeled sample (never the corpus) producing
  // `dims + 1` gradient rows; the weight vector lives on the driver
  // (bounded model state, the centroid/codebook stance) and re-enters
  // each pass as a literal array. Scoring the full corpus is one
  // row-local fold per document — no join, no shuffle.
  //
  // Determinism (the oracle contract): weights are integer NANO-UNITS
  // throughout. The per-doc margin Σ w[d] is exact integer summation;
  // the ONLY transcendental site is the per-(doc, iteration) residual
  // quantization floor((σ(margin/1e9) − y)·1e9 + 0.5), audited by
  // [[residualInputs]] exactly like the Naive Bayes `ln` sites; the
  // weight update runs in driver-side Math.floorDiv — exact integer
  // arithmetic end to end, order-free under any partitioning.
  // --------------------------------------------------------------------

  /** Fitted hashed-LR model: integer nano-unit bias + one weight per
    * hashed dimension.
    */
  final case class LrModel(bias: Long, w: Seq[Long])

  /** Distinct hashed PRESENCE features of a document: each token maps
    * to `polyHash31(token) mod dims` (h = (h·31 + codepoint) mod 2³¹ —
    * integer arithmetic both engines express natively; md5 would work
    * but costs a digest per token where this is two multiplies).
    * Binary presence (not counts) keeps the margin bounded by
    * `dims·max|w|` so σ never needs feature scaling.
    */
  def hashedDims(textCol: Column, dims: Int): Column =
    array_distinct(transform(TextAnalysis.tokens(textCol), t =>
      (polyHash31(t) % dims).cast("int")))

  /** h = (h·31 + codepoint) mod 2³¹ over the string's characters —
    * via explicit 1-based substr indexing so the character walk is
    * structurally identical in both engines (no splitter
    * empty-trailing-element ambiguity). Empty string hashes to 0.
    */
  private def polyHash31(t: Column): Column =
    when(length(t) === 0, lit(0L)).otherwise(
      aggregate(
        transform(sequence(lit(1), length(t)), i => ascii(t.substr(i, lit(1)))),
        lit(0L), (h, c) => (h * 31 + c) % 2147483648L))

  /** Margin in nano-units for one document given literal weights:
    * bias + Σ_{d ∈ dims present} w[d] — a row-local integer fold.
    */
  private def marginUnits(dimsCol: Column, model: LrModel): Column = {
    val wLit = array(model.w.map(v => lit(v)): _*)
    lit(model.bias) + aggregate(dimsCol, lit(0L),
      (acc, d) => acc + element_at(wLit, d + 1))
  }

  /** Per-row residual nano-units at the current weights:
    * floor((σ(wx/1e9) − y)·1e9 + 0.5) — the one quantize-at-birth
    * site (see [[residualInputs]] for the guard-band audit surface).
    */
  private def residualUnits(wx: Column, y: Column): Column =
    floor((lit(1.0) / (lit(1.0) + exp(-wx.cast("double") / 1e9))
      - y.cast("double")) * 1e9 + 0.5).cast("long")

  /** The shared GD loop over a prepared `(__y, __d)` feature table —
    * [[logisticFit]] runs it for the model, [[residualInputs]] runs
    * it with the trace on; ONE loop so the audited residuals are
    * exactly the residuals the fit quantizes (the [[fitRaw]] stance).
    *
    * Dims assumption: the no-shuffle gradient evaluates `dims`
    * `array_contains` scans per row (O(dims·|__d|)) and codegens a
    * dims+1-wide aggregate — the right trade at the default dims=64,
    * but it degrades quadratically and risks a whole-stage-codegen
    * fallback if a caller pushes dims into the hundreds; above that,
    * revert to the explode + groupBy(__j) form this replaced
    * (identical order-free integer sums).
    */
  private def gdLoop(feats: DataFrame, dims: Int, iters: Int,
                     lrNum: Long, lrDen: Long,
                     trace: Boolean): (LrModel, Option[DataFrame]) = {
    // The training-row count rides the FIRST gradient aggregation
    // (round 20: a separate feats.count() setup job paid one extra
    // action barrier per fit just to learn n before iteration 1; n is
    // only consumed by step()'s denominator AFTER the first agg
    // returns). The first iteration's aggregation also materializes
    // the feats cache, exactly as the count did.
    var n = 0L
    var model = LrModel(0L, Vector.fill(dims)(0L))
    var traced: Option[DataFrame] = None
    for (it <- 1 to iters) {
      val wx = marginUnits(col("__d"), model)
      if (trace) {
        val x = (lit(1.0) / (lit(1.0) + exp(-wx.cast("double") / 1e9))
          - col("__y").cast("double")) * 1e9 + 0.5
        val slice = feats.select(lit(it).as("iter"), x.as("x"))
        traced = Some(traced.map(_.unionAll(slice)).getOrElse(slice))
      }
      // ONE no-groupBy aggregation with dims + 1 integer sums (round
      // 19: was explode + shuffle + collect per iteration): the bias
      // component is the plain residual sum, each weight component
      // sums the residual where its dim is present — identical
      // order-free integer sums, no shuffle, one job per step
      val gradRow = feats
        .select(residualUnits(wx, col("__y")).as("__r"), col("__d"))
        .agg(count(lit(1)),
          sum(col("__r")) +:
            (0 until dims).map(d =>
              sum(when(array_contains(col("__d"), d), col("__r")))): _*)
        .head()
      if (it == 1) n = gradRow.getLong(0)
      val grad = Array.tabulate(dims + 1)(i =>
        if (gradRow.isNullAt(i + 1)) 0L else gradRow.getLong(i + 1))
      // Robbins–Monro 1/t step decay keeps full-batch GD from
      // oscillating at count-scale margins — and `lrDen·n·t` stays an
      // integer denominator, so the decayed step is still exact
      def step(g: Long): Long = Math.floorDiv(lrNum * g, lrDen * n * it)
      model = LrModel(
        model.bias - step(grad(0)),
        Vector.tabulate(dims)(d => model.w(d) - step(grad(d + 1))))
    }
    (model, traced)
  }

  /** Fit by `iters` full-batch gradient-descent steps at decaying
    * learning rate `lrNum/(lrDen·t)`:
    * w ← w − floorDiv(lrNum·Σ r·x, lrDen·n·t). `labelCol` must be
    * 0/1. The labeled sample is persisted for the `iters` passes (it
    * is the SAMPLE, not the corpus — the training set of a quality
    * classifier is small by construction). Defaults measured on the
    * fixtures: 64 presence dims at lr 1/t separate the stop-word
    * decoration perfectly by step 5.
    */
  def logisticFit(train: DataFrame, labelCol: Column, textCol: Column,
                  dims: Int = 64, iters: Int = 8,
                  lrNum: Long = 1L, lrDen: Long = 1L): LrModel = {
    val feats = train.select(labelCol.cast("long").as("__y"),
        hashedDims(textCol, dims).as("__d"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try gdLoop(feats, dims, iters, lrNum, lrDen, trace = false)._1
    finally { feats.unpersist() }
  }

  /** Score `docs`: `(id, margin_units, pred)` — pred = margin ≥ 0.
    * Row-local, no shuffle; margins are exact integers so the full
    * row is safe across an engine boundary.
    */
  def logisticScore(model: LrModel, docs: DataFrame,
                    idCol: Column, textCol: Column): DataFrame =
    docs.select(idCol.as("id"),
        marginUnits(hashedDims(textCol, model.w.length), model)
          .as("margin_units"))
      .withColumn("pred", col("margin_units") >= 0)

  /** Every pre-floor residual value the fit quantizes, one row per
    * (iteration, doc): `(iter, x)` where the quantized residual is
    * `floor(x)`. LrSpec asserts each `x` sits ≥ 1e-5 nano-units from
    * its floor bin edge — cross-libm `exp` last-ulp drift moves `x`
    * by ~1e-7, so the contract is CHECKED with a 100× margin rather
    * than lucky (the [[quantizationInputs]] convention).
    */
  private[graft] def residualInputs(train: DataFrame, labelCol: Column,
                                    textCol: Column, dims: Int = 64,
                                    iters: Int = 8, lrNum: Long = 1L,
                                    lrDen: Long = 1L): DataFrame = {
    val feats = train.select(labelCol.cast("long").as("__y"),
      hashedDims(textCol, dims).as("__d"))
    gdLoop(feats, dims, iters, lrNum, lrDen, trace = true)._2.get
  }

  // --------------------------------------------------------------------
  // DENSE-feature logistic regression — the EMBEDDING classifier (the
  // FineWeb-Edu shape: train a tiny linear model on an annotated
  // sample's embeddings, then score the whole corpus row-locally).
  // Same determinism contract as the hashed form, adapted to dense
  // real features: features are quantized AT BIRTH to integer
  // MILLI-units (floor(x·1e3 + 0.5) — coarser than the nano-unit
  // weights so a 64-term margin times a 10⁶-row gradient sum stays
  // inside Long range, with an explicit headroom `require` in the GD
  // loop and a BigInt step so nothing can silently wrap), weights
  // are integer nano-units, the
  // margin Σ w·x is an exact integer in 10⁻¹² units, and the ONLY
  // transcendental site is the per-(row, iter) residual floor (same
  // guard-band audit surface as [[residualUnits]]). Scale shape: the
  // fit is `iters` aggregations over the LABELED SAMPLE (a quality
  // classifier's training set is small by construction — the q214
  // stance) with one (d+1)-row collect per step; scoring is a
  // row-local zip_with fold against literal weights — no join, no
  // shuffle, the 100 TB deployment shape.
  // --------------------------------------------------------------------

  /** Fitted dense model: one nano-unit weight per feature; `w(0)` is
    * the bias, whose feature is the constant 1000 milli-units (1.0).
    */
  final case class DenseLrModel(w: Seq[Long])

  /** Milli-unit quantized feature vector with the bias constant
    * prepended: [1000, floor(v_1·1e3 + 0.5), ...]. floor(x + 0.5) is
    * the engine-portable round-half-up both codebases already use.
    */
  def milliFeatures(vec: Column): Column =
    concat(array(lit(1000L)),
      transform(Similarity.vecD(vec), x => floor(x * 1000 + lit(0.5)).cast("long")))

  /** Margin in 10⁻¹² units: Σ_j w_j(nano) · x_j(milli) — an exact
    * integer row-local fold against literal weights.
    */
  private def denseMargin(xCol: Column, model: DenseLrModel): Column = {
    val wLit = array(model.w.map(v => lit(v)): _*)
    aggregate(zip_with(xCol, wLit, (x, w) => x * w), lit(0L), (a, b) => a + b)
  }

  private def denseGdLoop(feats: DataFrame, iters: Int, lrNum: Long,
                          lrDen: Long, trace: Boolean)
      : (DenseLrModel, Option[DataFrame]) = {
    // ONE setup aggregation over the sample (round 19: this was three
    // separate jobs — count, head for the dimension, a mismatch count
    // — on a table the loop then scans `iters` more times): row count,
    // min and max feature length in one pass. Uniform length ⇔
    // min == max, and the model dimension is that shared length.
    val setup = feats.agg(count(lit(1)), min(size(col("__x"))),
      max(size(col("__x")))).head()
    val n = setup.getLong(0)
    require(n > 0, "denseLogisticFit needs a non-empty training set")
    // Gradient-sum headroom: each row contributes at most ~5e8 (the
    // residual cap) × the milli-unit feature magnitude to a gradient
    // component, so the Long sum is safe only while n × 5e8 × |x|
    // stays under 2⁶³. At |x| ≈ 1000 (unit-scale embeddings) that is
    // ~1.8e7 rows — far above any sensible labeled sample (a quality
    // classifier trains on an annotated SAMPLE; hash-sample the
    // labels if they outgrow this). Fail loudly rather than wrap:
    // Spark's non-ANSI Long sum wraps silently while DuckDB raises,
    // and a silent wrap trains a sign-flipped model.
    require(n <= (1L << 24),
      s"denseLogisticFit: $n training rows exceeds the integer-gradient " +
        "headroom (~1.6e7 at unit-scale features); hash-sample the labeled set")
    val dim = setup.getInt(1)
    // A variable-length vector would NULL-pad the zip_with margin
    // (silently diverging from an oracle that truncates to the row's
    // own length) — fail loudly instead, from the same setup readout.
    require(setup.getInt(2) == dim,
      s"denseLogisticFit: training rows span vector lengths " +
        s"${dim - 1}..${setup.getInt(2) - 1} (bias slot excluded); " +
        "dense LR needs uniform-length vectors")
    var model = DenseLrModel(Vector.fill(dim)(0L))
    var traced: Option[DataFrame] = None
    for (it <- 1 to iters) {
      val wx = denseMargin(col("__x"), model)
      val pre = (lit(1.0) / (lit(1.0) + exp(-wx.cast("double") / 1e12))
        - col("__y").cast("double")) * 1e9 + lit(0.5)
      if (trace) {
        val slice = feats.select(lit(it).as("iter"), pre.as("x"))
        traced = Some(traced.map(_.unionAll(slice)).getOrElse(slice))
      }
      val r = floor(pre).cast("long")
      // dense features: every gradient component is present in every
      // row, so ONE no-groupBy aggregation with dim+1 integer sums
      // yields the whole gradient in a single-stage job (round 19:
      // the former posexplode + groupBy(__j) shape paid a dim-fold
      // row inflation plus a shuffle per iteration for the same
      // order-free integer sums; only the model crosses to the
      // driver — the k-means convention either way)
      val gradRow = feats
        .select(r.as("__r"), col("__x"))
        .agg(sum(col("__r") * element_at(col("__x"), 1)),
          (2 to dim).map(j =>
            sum(col("__r") * element_at(col("__x"), j))): _*)
        .head()
      val grad = Array.tabulate(dim)(j =>
        if (gradRow.isNullAt(j)) 0L else gradRow.getLong(j))
      // nano-unit step: gradient units are 10⁻⁹·10⁻³ = 10⁻¹², so the
      // ÷1000 converts back to nano; BigInt floor-division mirrors the
      // SQL pmod identity exactly (negative gradients FLOOR, never
      // truncate) AND cannot wrap where `lrNum * g` would exceed Long
      // near the headroom bound above — Spark would wrap silently
      // there while DuckDB raises, diverging the engines.
      def step(g: Long): Long = {
        val a = BigInt(lrNum) * g
        val b = BigInt(lrDen) * n * it * 1000L
        ((a - a.mod(b)) / b).toLong  // mod ≥ 0 for b > 0 ⇒ floor division
      }
      model = DenseLrModel(
        Vector.tabulate(dim)(j => model.w(j) - step(grad(j))))
    }
    (model, traced)
  }

  /** Fit by `iters` full-batch GD steps at the Robbins–Monro
    * `lrNum/(lrDen·t)` decay — the dense twin of [[logisticFit]].
    * Rows with null/empty vectors are excluded (they have no features
    * to learn from); `labelCol` must be 0/1.
    */
  def denseLogisticFit(train: DataFrame, labelCol: Column, vecCol: Column,
                       iters: Int = 8, lrNum: Long = 1L,
                       lrDen: Long = 1L): DenseLrModel = {
    val feats = train
      .select(labelCol.cast("long").as("__y"), milliFeatures(vecCol).as("__x"))
      .filter(col("__x").isNotNull && size(col("__x")) > 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try denseGdLoop(feats, iters, lrNum, lrDen, trace = false)._1
    finally { feats.unpersist(); () }
  }

  /** Score: `(id, margin_units, pred)` — margin an exact integer in
    * 10⁻¹² units, pred = margin ≥ 0 (σ is monotone, so the published
    * row never computes a transcendental). Row-local, no shuffle.
    */
  def denseLogisticScore(model: DenseLrModel, df: DataFrame,
                         idCol: Column, vecCol: Column): DataFrame =
    df.select(idCol.as("id"), milliFeatures(vecCol).as("__x"))
      .filter(col("__x").isNotNull && size(col("__x")) > 1)
      // Row-local length guard: a vector whose length differs from the
      // model dimension would NULL-pad the zip_with margin — publish a
      // loud per-row error instead of a silent NULL the oracle would
      // diverge on (raise_error keeps the guard inside codegen; the
      // happy path costs one size() compare).
      .select(col("id"),
        when(size(col("__x")) === lit(model.w.length),
            denseMargin(col("__x"), model))
          .otherwise(raise_error(concat(
            lit("denseLogisticScore: feature length "),
            (size(col("__x")) - 1).cast("string"),
            lit(s" != model dimension ${model.w.length - 1}"))))
          .as("margin_units"))
      .withColumn("pred", col("margin_units") >= 0)

  /** [[residualInputs]] for the dense fit — the guard-band audit
    * surface of its one transcendental site.
    */
  private[graft] def denseResidualInputs(train: DataFrame, labelCol: Column,
                                         vecCol: Column, iters: Int = 8,
                                         lrNum: Long = 1L,
                                         lrDen: Long = 1L): DataFrame = {
    val feats = train
      .select(labelCol.cast("long").as("__y"), milliFeatures(vecCol).as("__x"))
      .filter(col("__x").isNotNull && size(col("__x")) > 1)
      // persist like the fit path: without it each iteration's count/
      // gradient pass rescans the source, and the traced union's
      // collect re-derives every margin chain from scratch
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // eager checkpoint makes the trace self-contained so feats can
      // unpersist before the caller collects (the in-tree staging
      // idiom — eager, like every checkpoint in-tree)
      denseGdLoop(feats, iters, lrNum, lrDen, trace = true)._2.get
        .localCheckpoint()
    } finally { feats.unpersist(); () }
  }
}
