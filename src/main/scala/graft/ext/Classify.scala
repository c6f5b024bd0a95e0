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
}
