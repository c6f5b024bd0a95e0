package graft

import org.apache.spark.sql.functions._

import graft.functions.CharBigrams

class CharBigramsSpec extends SparkSuite {
  import spark.implicits._

  // the former composable form, verbatim — the equivalence target
  private def hofBigrams(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val chars = split(c, "")
    val n = size(chars)
    when(length(c) >= 2,
      zip_with(slice(chars, lit(1), n - 1), slice(chars, lit(2), n - 1),
        (a, b) => concat(a, b)))
      .otherwise(array().cast("array<string>"))
  }

  test("char_bigrams ≡ the split/slice/zip_with form on ASCII, multi-byte, " +
      "degenerate and whitespace inputs") {
    val rows = Seq(
      "spark sql", "ab", "a", "", "é", "héllo wörld", "日本語のテキスト",
      "mixed é日x", "  spaced  out  ", "aa", "𝔘nicode 𝔴ide",  // non-BMP
      "tab\tand\nnewline", "0123456789")
    val df = rows.toDF("t")
    val diff = df.select(
        CharBigrams.char_bigrams(col("t")).as("fast"),
        hofBigrams(col("t")).as("hof"))
      .filter(not(col("fast") <=> col("hof")))
      .count()
    assert(diff == 0, "custom expression diverges from the HOF form")
  }

  test("char_bigrams on the fixture corpus matches the HOF form row for row") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val c = graft.ops.Text.cleanText(lower(col("text")))
    val diff = docs.select(
        CharBigrams.char_bigrams(c).as("fast"), hofBigrams(c).as("hof"))
      .filter(not(col("fast") <=> col("hof")))
      .count()
    assert(diff == 0, "fixture divergence between custom and HOF bigrams")
  }

  test("null text explodes to zero rows through either form") {
    val df = Seq[(java.lang.Long, String)]((1L, null), (2L, "ab"))
      .toDF("id", "t")
    val viaFast = df.select(col("id"),
      explode(CharBigrams.char_bigrams(col("t"))).as("bg")).collect()
    val viaHof = df.select(col("id"),
      explode(hofBigrams(col("t"))).as("bg")).collect()
    assert(viaFast.toSeq == viaHof.toSeq)
    assert(viaFast.length == 1 && viaFast.head.getString(1) == "ab")
  }
}
