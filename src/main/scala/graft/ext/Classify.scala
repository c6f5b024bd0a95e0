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

  /** Multinomial NB fit over `train` (labelCol, textCol). Tokens are
    * [[TextAnalysis.tokens]] (the q80 vocabulary convention).
    */
  def naiveBayesFit(train: DataFrame, labelCol: Column, textCol: Column): NbModel = {
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
    val labels = nDocs.join(totals, Seq("label"))
      .crossJoin(broadcast(vs)).crossJoin(broadcast(nd))
      .select(col("label"),
        units(col("__n_docs").cast("double") / col("__n")).as("prior_units"),
        units(lit(1.0) / (col("__total") + col("__v"))).as("oov_units"),
        col("__total"), col("__v"))
    val counts = tok.groupBy(col("label"), col("token")).agg(count(lit(1)).as("__c"))
    val grid = vocab.crossJoin(broadcast(labels))
      .join(counts, Seq("label", "token"), "left")
      .select(col("label"), col("token"),
        units((coalesce(col("__c"), lit(0L)) + lit(1.0)) /
          (col("__total") + col("__v"))).as("w_units"))
    NbModel(grid, labels.select(col("label"), col("prior_units"), col("oov_units")))
  }

  /** Score `docs` (idCol, textCol): per-document argmax class.
    * Output: id, pred, score_units (winning class's integer score).
    * Ties break on ascending label — deterministic because scores are
    * integers.
    */
  def naiveBayesScore(model: NbModel, docs: DataFrame,
                      idCol: Column, textCol: Column): DataFrame = {
    val d = docs.select(idCol.as("__id"), TextAnalysis.tokens(textCol).as("__toks"))
    val tok = d.select(col("__id"), explode(col("__toks")).as("token"))
    val known = tok.join(model.grid, Seq("token"))
      .groupBy(col("__id"), col("label"))
      .agg(sum(col("w_units")).as("__s_known"), count(lit(1)).as("__n_known"))
    val base = d.select(col("__id"), size(col("__toks")).cast("long").as("__n_tok"))
      .crossJoin(broadcast(model.labels))
    val scored = base.join(known, Seq("__id", "label"), "left")
      .select(col("__id"), col("label"),
        (col("prior_units") + coalesce(col("__s_known"), lit(0L)) +
         (col("__n_tok") - coalesce(col("__n_known"), lit(0L))) * col("oov_units"))
          .as("score_units"))
    graft.ops.TopK.perGroupTopK(scored, Seq(col("__id")),
        Seq(desc("score_units"), asc("label")), 1)
      .select(col("__id").as("id"), col("label").as("pred"), col("score_units"))
  }
}
