package graft

import org.apache.spark.sql.functions._

import graft.functions.UnicodeNorm.{nfc_normalize, strip_accents}

class UnicodeNormSpec extends SparkSuite {
  import spark.implicits._

  private def one(s: String,
                  f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String =
    Seq(Tuple1(s)).toDF("t").select(f(col("t"))).as[String].head()

  // all literals via \u escapes: composed vs decomposed must be
  // byte-exact in the source, not editor-dependent
  test("nfc composes decomposed sequences; composed input is a fixpoint") {
    assert(one("e\u0301", nfc_normalize) == "\u00e9", "e + acute must compose")
    assert(one("\u00e9", nfc_normalize) == "\u00e9", "composed input unchanged")
    assert(one("e\u0301", nfc_normalize).length == 1)
    assert(one("plain ascii.", nfc_normalize) == "plain ascii.")
    // idempotence
    assert(one(one("e\u0301 u\u0308", nfc_normalize), nfc_normalize) ==
      one("e\u0301 u\u0308", nfc_normalize))
  }

  test("strip_accents folds composed AND decomposed marks to the base letters") {
    assert(one("m\u00fchleisen", strip_accents) == "muhleisen")  // composed u-umlaut
    assert(one("mu\u0308hleisen", strip_accents) == "muhleisen") // u + combining diaeresis
    assert(one("\u00e9 e\u0301 \u00f1 n\u0303", strip_accents) == "e e n n")
    assert(one("no accents here!", strip_accents) == "no accents here!")
  }

  test("null passes through; non-string input fails analysis loudly") {
    val n = Seq(Tuple1(null.asInstanceOf[String])).toDF("t")
      .select(nfc_normalize(col("t"))).collect()(0)
    assert(n.isNullAt(0))
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1(1)).toDF("t").select(strip_accents(col("t"))).collect()
    }
  }
}
