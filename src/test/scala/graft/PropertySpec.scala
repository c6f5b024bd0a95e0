package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.{Agg, Match, Score, Text}

/** Property-based invariants (SURVEY.md §5.3): the algebraic facts the
  * reference's behavior implies, checked over scalacheck-generated
  * inputs (driven directly through Gen — the scalatest bridge artifact
  * isn't on the offline classpath).
  */
class PropertySpec extends SparkSuite {
  import spark.implicits._

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val textGen = Gen.listOf(Gen.oneOf(wordGen, Gen.const("  "), Gen.const("\t")))
    .map(_.mkString(" "))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("X1 clean is idempotent and never longer") {
    val texts = samples(textGen, 60)
    val df = texts.toDF("t").select(
      Text.cleanText(col("t")).as("c1"),
      Text.cleanText(Text.cleanText(col("t"))).as("c2"),
      length(col("t")).as("lt"), length(Text.cleanText(col("t"))).as("lc"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1))
      assert(r.getInt(3) <= r.getInt(2))
    }
  }

  test("A3 matched keywords are a subset of the keyword list, lowercased") {
    val kwSets = samples(Gen.nonEmptyListOf(wordGen).map(_.distinct.take(5)), 10)
    val texts = samples(textGen, 30)
    kwSets.foreach { kws =>
      val got = texts.toDF("t")
        .select(Match.matchedKeywords(col("t"), kws).as("m"))
        .as[Seq[String]].collect()
      val lower = kws.map(_.toLowerCase).toSet
      got.foreach(m => assert(m.toSet.subsetOf(lower)))
    }
  }

  test("X10 score is additive over every channel subset and bounded 0..6") {
    val channels = Seq(Score.FoundViaDirect, Score.FoundViaPost, Score.FoundViaComment)
    val subsets = (0 to 7).map(mask => channels.zipWithIndex.collect {
      case (c, i) if (mask & (1 << i)) != 0 => c
    })
    val scores = subsets.toDF("via")
      .select(Score.relevanceScore(col("via")).as("s")).as[Int].collect()
    subsets.zip(scores).foreach { case (sub, s) =>
      val expected = sub.map {
        case Score.FoundViaDirect => 1
        case Score.FoundViaPost => 2
        case Score.FoundViaComment => 3
      }.sum
      assert(s == expected && s >= 0 && s <= 6)
    }
  }

  test("union conserves row counts; dedup is idempotent") {
    samples(Gen.nonEmptyListOf(Gen.choose(0, 5)), 10).foreach { xs =>
      val df = xs.toDF("v")
      assert(df.unionByName(df).count() == 2L * xs.length)
      val d1 = Agg.dedupFirstWins(df, col("v"), col("v"), Nil)
      val d2 = Agg.dedupFirstWins(d1.select(col("v")), col("v"), col("v"), Nil)
      assert(d1.count() == d2.count() && d1.count() == xs.distinct.length)
    }
  }

  test("minhash depends only on the shingle set") {
    samples(Gen.listOfN(12, wordGen), 10).filter(_.size >= 3).foreach { words =>
      val t = words.mkString(" ")
      val hs = Seq(t, t).toDF("t")
        .select(ext.Dedup.minhash(ext.Dedup.shingles(col("t"), 3), 1).as("h"))
        .as[String].collect()
      assert(hs(0) == hs(1))
    }
  }
}
