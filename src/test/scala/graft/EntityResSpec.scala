package graft

import org.apache.spark.sql.functions._
import graft.ext.EntityRes
import graft.functions.JaroWinkler

/** [[graft.functions.JaroWinkler]] pinned against the published
  * reference values (the Winkler 1990 examples every implementation —
  * including the q131 oracle's DuckDB native — agrees on), plus
  * [[graft.ext.EntityRes]] blocking/cluster semantics.
  */
class EntityResSpec extends SparkSuite {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.computeChars(a, b)

  test("jaroWinkler: published reference pairs") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.961111111) < 1e-9)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-9)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.813333333) < 1e-9)
    // below the 0.7 boost threshold: plain jaro, no prefix bonus
    assert(math.abs(jw("abc", "xyc") - jw("cba", "cyx")) < 1e-9)
  }

  test("jaroWinkler: edges — equal, empty, disjoint, prefix cap at 4") {
    assert(jw("same", "same") === 1.0)
    assert(jw("", "") === 1.0)        // equal strings, both empty
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("abc", "xyz") === 0.0)  // no matches
    // prefix bonus caps at 4 shared chars: these differ only past
    // position 4 and at the tail, same jaro => same boost
    val a = jw("prefixAB", "prefixBA")
    assert(a > 0.9)
  }

  test("jaroWinkler: ASCII byte fast path == code-unit path; non-ASCII falls back correctly") {
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = Seq("martha", "marhta", "dwayne", "duane", "", "a",
      "Customer#000000001", "Customer#000000010", "prefixAB", "prefixBA")
    for (a <- ascii; b <- ascii) {
      val viaBytes = JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))
      assert(viaBytes === jw(a, b), s"($a, $b)")
    }
    // non-ASCII: numChars != numBytes forces the String path — accents
    // must compare as ONE char, not as their multi-byte encoding
    val c1 = JaroWinkler.compute(
      UTF8String.fromString("café"), UTF8String.fromString("cafe"))
    assert(c1 === jw("café", "cafe"))
    val c2 = JaroWinkler.compute(
      UTF8String.fromString("café"), UTF8String.fromString("café"))
    assert(c2 === 1.0)
    // mixed: one ASCII, one not
    val c3 = JaroWinkler.compute(
      UTF8String.fromString("strasse"), UTF8String.fromString("straße"))
    assert(c3 === jw("strasse", "straße"))
  }

  test("jaroWinkler: expression matches the Scala helper through codegen and the SQL registration") {
    val df = Seq(("martha", "marhta"), ("dwayne", "duane"), ("", ""), ("a", ""))
      .toDF("a", "b")
    val viaExpr = df.select(JaroWinkler.jaroWinkler(col("a"), col("b")))
      .as[Double].collect().toSeq
    val expect = Seq(jw("martha", "marhta"), jw("dwayne", "duane"), 1.0, 0.0)
    viaExpr.zip(expect).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
    graft.functions.GraftFunctions.install(spark)
    df.createOrReplaceTempView("jwt")
    val viaSql = spark.sql("SELECT jaro_winkler(a, b) FROM jwt")
      .as[Double].collect().toSeq
    assert(viaSql === viaExpr)
  }

  test("resolveEntities: clusters within blocks, no matches across blocks, singletons kept") {
    val recs = Seq(
      (1L, "Acme Corporation", "US"),
      (2L, "Acme Corporatlon", "US"),   // 1-char variant of 1 — same entity
      (3L, "Acme Corporation", "EU"),   // identical name, different block: NOT merged
      (4L, "Zenith Ltd", "US"),
      (5L, "Zenith Ltd.", "EU"))
      .toDF("id", "name", "region")
    val r = EntityRes.resolveEntities(recs, col("id"), col("name"),
        col("region"), threshold = 0.95)
      .as[(Long, Long, Long)].collect().map { case (i, e, s) => i -> ((e, s)) }.toMap
    assert(r(1L) === ((1L, 2L)) && r(2L) === ((1L, 2L)))
    assert(r(3L) === ((3L, 1L)))
    assert(r(4L) === ((4L, 1L)) && r(5L) === ((5L, 1L)))
  }

  test("resolveEntities: transitive closure merges chains through a shared middle record") {
    // a~b and b~c but a,c farther apart: one entity via transitivity
    val recs = Seq(
      (10L, "Jonathan Smithers", "X"),
      (11L, "Jonathon Smithers", "X"),
      (12L, "Jonathon Smethers", "X"))
      .toDF("id", "name", "blk")
    val pairs = EntityRes.matchPairs(recs, col("id"), col("name"), col("blk"), 0.93)
      .as[(Long, Long, Double)].collect().toSeq
    assert(pairs.map(p => (p._1, p._2)).toSet.contains((10L, 11L)))
    val r = EntityRes.resolveEntities(recs, col("id"), col("name"),
        col("blk"), threshold = 0.93)
      .as[(Long, Long, Long)].collect().map { case (i, e, s) => i -> ((e, s)) }.toMap
    assert(r.values.toSet === Set((10L, 3L)), s"expected one 3-entity, got $r")
  }

  test("matchPairsEditBlocked: complete for the DL<=1 class — substitution, adjacent transposition, insert/delete") {
    val recs = Seq(
      (1L, "Jonathan Smith", "X"),
      (2L, "Jonathon Smith", "X"),   // substitution (a->o)
      (3L, "Jonathan Smiht", "X"),   // adjacent transposition (th->ht)
      (4L, "Jonathan Smiths", "X"),  // insertion (trailing s)
      (5L, "Jonathan Smit", "X"),    // deletion (trailing h)
      (6L, "completely other", "X"))
      .toDF("id", "name", "blk")
    val cand = graft.ext.EntityRes.matchPairsEditBlocked(recs, col("id"),
        col("name"), col("blk"), threshold = 0.0)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    // every DL<=1 neighbor of record 1 must be a candidate
    assert(Set((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L)).subsetOf(cand), s"$cand")
    assert(!cand.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("matchPairsEditBlocked: empty name emits ONLY its identity key (no junk sequence(1,0) deletions)") {
    // "" must contribute exactly one entry to the "X|" bucket; the
    // unguarded form emitted two extra junk keys for it (Spark's
    // sequence(1, 0) = [1, 0]) which here would tip the bucket over
    // maxBucket = 3 and silently drop every candidate — diverging
    // from the oracle's empty range(1, 1)
    val recs = Seq((1L, "", "X"), (2L, "a", "X"), (3L, "b", "X"))
      .toDF("id", "name", "blk")
    val cand = graft.ext.EntityRes.matchPairsEditBlocked(recs, col("id"),
        col("name"), col("blk"), threshold = 0.0, maxBucket = 3)
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2)).toSet
    // bucket "X|" holds {""-identity, "a"-deletion, "b"-deletion} = 3 <= cap
    assert(cand === Set((1L, 2L), (1L, 3L), (2L, 3L)), s"$cand")
  }

  test("matchPairsEditBlocked: co-block separates otherwise identical names; resolveFromPairs keeps singletons") {
    val recs = Seq(
      (1L, "Acme Corporation", "US"),
      (2L, "Acme Corporatlon", "US"),
      (3L, "Acme Corporation", "EU"))
      .toDF("id", "name", "region")
    val pairs = graft.ext.EntityRes.matchPairsEditBlocked(recs, col("id"),
      col("name"), col("region"), threshold = 0.95)
    val r = graft.ext.EntityRes.resolveFromPairs(recs, col("id"), pairs)
      .as[(Long, Long, Long)].collect().map { case (i, e, s) => i -> ((e, s)) }.toMap
    assert(r(1L) === ((1L, 2L)) && r(2L) === ((1L, 2L)) && r(3L) === ((3L, 1L)))
  }

  test("matchPairs: an over-cap block is dropped from candidate generation (skew backstop)") {
    val recs = (1L to 10L).map(i => (i, "same name", "big")) :+ ((11L, "same name", "small"))
    val df = recs.toDF("id", "name", "blk")
    val pairs = EntityRes.matchPairs(df, col("id"), col("name"), col("blk"),
        threshold = 0.9, maxBlock = 5)
    assert(pairs.count() === 0)
    val r = EntityRes.resolveEntities(df, col("id"), col("name"), col("blk"),
        threshold = 0.9, maxBlock = 5)
    // everyone survives as a singleton — records are never lost
    assert(r.count() === 11)
  }
}
