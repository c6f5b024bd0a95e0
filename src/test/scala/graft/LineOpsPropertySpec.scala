package graft

import org.apache.spark.sql.functions._

import graft.ext.TextAnalysis
import graft.ops.Sampling

/** Fixpoint/idempotence properties of the round-13 cleaning family —
  * each operator's output must be invariant under a second
  * application, because every survivor already satisfies the rule
  * that admitted it. A violation means the rule reads state it also
  * mutates (the classic cleaning-pipeline bug class).
  */
class LineOpsPropertySpec extends SparkSuite {
  import spark.implicits._

  private def fixtureLines = {
    // multi-line synthesis over fixture text (the q190 derivation)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val w = TextAnalysis.tokens(col("text"))
    val L = (lit(4) + col("doc_id") % 5).cast("int")
    val nl = ceil(size(w).cast("double") / L).cast("int")
    docs.filter(col("text").isNotNull && size(w) > 0)
      .select(col("doc_id"),
        array_join(transform(sequence(lit(0), nl - 1), i =>
          concat(array_join(slice(w, i * L + 1, L), " "),
            when((col("doc_id") + i) % 3 === 0, lit("")).otherwise(lit("."))))
          , "\n").as("text"))
  }

  test("c4LineClean is idempotent: cleaning cleaned text keeps every line") {
    val once = fixtureLines.select(col("doc_id"),
      TextAnalysis.c4LineClean(col("text")).getField("text_clean").as("text"))
    val twice = once.select(col("doc_id"),
      TextAnalysis.c4LineClean(col("text")).as("c"))
    // every line that survived pass 1 satisfies the rules, so pass 2
    // must keep all of them (the all-dropped doc's "" also re-cleans
    // to "" — a fixpoint either way)
    val diff = twice.join(once, Seq("doc_id"))
      .filter(col("c.text_clean") =!= col("text"))
    assert(diff.isEmpty, "c4LineClean is not a fixpoint on its own output")
  }

  test("dedupLines and dedupParagraphsGlobal are idempotent") {
    val once = TextAnalysis.dedupLines(fixtureLines, col("doc_id"), col("text"))
      .select(col("doc_id"), col("text_clean").as("text"))
    val twice = TextAnalysis.dedupLines(once, col("doc_id"), col("text"))
    assert(twice.filter(col("n_lines") =!= col("n_unique")).isEmpty,
      "a deduped doc must contain no repeated lines")
    val g1 = TextAnalysis.dedupParagraphsGlobal(fixtureLines, col("doc_id"), col("text"))
      .filter(col("n_kept") >= 1)
      .select(col("doc_id"), col("text_clean").as("text"))
    val g2 = TextAnalysis.dedupParagraphsGlobal(g1, col("doc_id"), col("text"))
    assert(g2.filter(col("n_paras") =!= col("n_kept")).isEmpty,
      "a globally deduped corpus must contain no repeated paragraphs")
  }

  test("tokenBudgetSample is idempotent: the kept set already fits the budget") {
    val t = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
    val sources = t.select(col("source")).distinct()
      .as[String].collect().toSeq.sorted
    val budgets = sources.map(_ -> 300L)
    val once = Sampling.tokenBudgetSample(t, col("source"), col("doc_id"),
      col("n_tokens"), budgets)
    val twice = Sampling.tokenBudgetSample(
      once.select(col("doc_id"), col("source"), col("n_toks").as("n_tokens")),
      col("source"), col("doc_id"), col("n_tokens"), budgets)
    assert(once.count() == twice.count(),
      "re-cutting an already-cut corpus must keep everything")
  }

  test("gopher gate verdicts are a pure function: stable across partitionings") {
    val a = fixtureLines.select(col("doc_id"),
      TextAnalysis.gopherQualityGate(col("text")).getField("passes").as("p"))
    val b = fixtureLines.repartition(7).select(col("doc_id"),
      TextAnalysis.gopherQualityGate(col("text")).getField("passes").as("p"))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }
}
