package graft

import org.apache.spark.sql.functions._
import graft.ext.TextAnalysis

class TextAnalysisSpec extends SparkSuite {
  import spark.implicits._

  test("tokenCount and unitCount") {
    val df = Seq("Hello,  world! 42", "one").toDF("t")
      .select(TextAnalysis.tokenCount(col("t")).as("n"),
              TextAnalysis.unitCount(col("t")).as("u"))
    val got = df.as[(Int, Int)].collect().toSeq
    // "hello, world! 42" → 3 ws tokens; units: hello , world ! 4 2 → 6
    assert(got == Seq((3, 6), (1, 1)))
  }

  test("classifyByLexicon: argmax with deterministic tie-break and fallback") {
    val lex = Seq(
      "fr" -> Seq("le", "la", "et"),
      "en" -> Seq("the", "and", "of"))
    val df = Seq(
      "le chat et la table",   // fr
      "the cat and the dog",   // en
      "zzz qqq",               // none → und
      "le the",                // tie 1-1 → first label (fr) wins
    ).toDF("t").select(TextAnalysis.classifyByLexicon(col("t"), lex).as("l"))
    assert(df.as[String].collect().toSeq == Seq("fr", "en", "und", "fr"))
  }

  test("qualityScore in [0,1]; repetitive text scores below diverse text") {
    val df = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon",
      "spam spam spam spam spam spam spam spam spam spam " +
        "spam spam spam spam spam spam spam spam spam spam",
    ).toDF("t").select(TextAnalysis.qualityScore(col("t")).as("q"))
    val Seq(diverse, repetitive) = df.as[Double].collect().toSeq
    assert(diverse > repetitive)
    assert(diverse >= 0 && diverse <= 1 && repetitive >= 0 && repetitive <= 1)
  }

  test("fingerprint invariant to case and spacing") {
    val df = Seq(("A  B\tc", "a b C"), ("x", "y")).toDF("p", "q")
      .select((TextAnalysis.fingerprint(col("p")) ===
               TextAnalysis.fingerprint(col("q"))).as("eq"))
    assert(df.as[Boolean].collect().toSeq == Seq(true, false))
  }
}
