package graft

import org.apache.spark.sql.functions._
import graft.ext.Curation

class CurationSpec extends SparkSuite {
  import spark.implicits._

  private val lex = Seq("tech" -> Seq("spark", "query"), "other" -> Seq("cat"))

  test("curate: gates, exact dedup, and near-dup removal compose") {
    val base = "spark query engine runs a fast distributed query plan " +
      "over columnar data with vectorized execution and shuffle stages"
    val docs = Seq(
      (1L, "a", base),                                  // kept (canonical)
      (2L, "a", base),                                  // exact dup of 1 -> dropped
      (3L, "b", base + " extra trailing words here"),   // near-dup of 1 -> dropped
      (4L, "b", "too short"),                           // token gate
      (5L, "c", ("cat " * 30).trim),                    // repetitive -> low quality
      (6L, "c", "the cat sat on a mat while another cat " +
        "watched birds fly over green hills during a quiet warm evening")
      // ^ 'other' topic -> topic gate
    ).toDF("doc_id", "source", "text")
    val kept = Curation.curate(docs, col("doc_id"), col("source"), col("text"),
      Curation.Params(minTokens = 10, minQuality = 0.3,
        topics = Seq("tech"), lexicons = lex, jaccard = 0.5))
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L))
  }

  test("curate: targetRecall derives the banding geometry and rides nearDupPairsForRecall's pairs") {
    // geometry contract: (jaccard, targetRecall) → bandingForRecall
    assert(Curation.Params(jaccard = 0.5, targetRecall = Some(0.95))
      .bandGeometry == (22, 2))
    assert(Curation.Params(jaccard = 0.5).bandGeometry == (8, 2))
    // behavior: the auto form's kept set equals the pipeline rebuilt
    // around an explicit nearDupPairsForRecall call (same stages)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), lit("s").as("source"), col("text"))
    val p = Curation.Params(minTokens = 5, minQuality = 0.0,
      jaccard = 0.5, targetRecall = Some(0.95))
    val kept = Curation.curate(docs, col("doc_id"), col("source"),
      col("text"), p).select("doc_id").as[Long].collect().toSet
    val exact = graft.ops.TopK.perGroupHead(
      Curation.rowStages(docs, col("doc_id"), col("source"), col("text"), p),
      col("fp"), col("doc_id"), 1)
    val drops = graft.ext.Dedup.nearDupPairsForRecall(exact, col("doc_id"),
        col("text"), threshold = 0.5, targetRecall = 0.95)
      .select(col("id_b")).as[Long].collect().toSet
    val manual = exact.select("doc_id").as[Long].collect().toSet -- drops
    assert(kept == manual,
      s"auto-geometry curate diverged: ${kept.size} vs ${manual.size} kept")
    // non-vacuous: the recall-derived geometry drops at least as much
    // as the fixed default at the same threshold (superset property)
    val keptFixed = Curation.curate(docs, col("doc_id"), col("source"),
        col("text"), p.copy(targetRecall = None))
      .select("doc_id").as[Long].collect().toSet
    assert(kept.subsetOf(keptFixed),
      "more bands can only ADD verified drops at the same threshold")
    assert(drops.nonEmpty, "fixture must have near-dups at t=0.5")
  }

  test("curate: blocklist gate drops on any-hit, including cross-token phrases") {
    val base = "spark query engine runs a fast distributed query plan " +
      "over columnar data with vectorized execution and shuffle stages"
    val docs = Seq(
      (1L, "a", base),                                    // kept
      (2L, "a", base.replace("columnar data", "leaked credentials")), // term hit
      (3L, "b", base.replace("fast distributed", "Slow Shuffle"))     // phrase hit (CI)
    ).toDF("doc_id", "source", "text")
    val kept = Curation.curate(docs, col("doc_id"), col("source"), col("text"),
      Curation.Params(minTokens = 10, minQuality = 0.3, lexicons = lex,
        blocklist = Seq("leaked credentials", "slow shuffle"), jaccard = 0.95))
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(1L))
    // empty blocklist = gate absent (q46's pinned oracle path unchanged)
    val all = Curation.curate(docs, col("doc_id"), col("source"), col("text"),
      Curation.Params(minTokens = 10, minQuality = 0.3, lexicons = lex,
        jaccard = 0.95))
    assert(all.count() == 3)
  }

  test("packShards: running-total assignment fills budget without splitting docs") {
    val docs = Seq(
      (1L, "s", 800L), (2L, "s", 800L), (3L, "s", 800L),  // starts 0,800,1600 -> shard 0
      (4L, "s", 3000L),                                   // start 2400 -> shard 1 (overflows)
      (5L, "s", 100L),                                    // start 5400 -> shard 2
      (6L, "t", 50L))                                     // own group -> shard 0
      .toDF("doc_id", "source", "n_tokens")
    val got = Curation.packShards(docs, col("source"), col("doc_id"),
        col("n_tokens"), budget = 2000)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 2L, 6L -> 0L))
  }

  test("stats: integer-exact HALF_UP mean quality") {
    val docs = Seq(
      (1L, "s", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "s", "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "source", "text")
    val kept = Curation.curate(docs, col("doc_id"), col("source"), col("text"),
      Curation.Params(minTokens = 1, minQuality = 0.0))
    val r = Curation.stats(kept).collect()
    assert(r.length == 1 && r(0).getLong(1) == 2)
    // mean of the two 4-dp qualities, HALF_UP at 1e-4
    val qs = kept.select("quality").as[Double].collect().sorted
    val expected = math.floor((2 * qs.map(q => math.rint(q * 10000)).sum + 2) / 4.0) / 10000.0
    assert(r(0).getDouble(3) == expected)
  }

  test("assembleSequences: in-order concatenation with separator, shard boundaries respected") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // budget 5: docs of 3+3 tokens -> doc1 in shard 0, doc2 starts at
    // offset 3 (< 5) -> also shard 0 (straddle-by-one contract);
    // doc3 starts at 6 -> shard 1; group b stays separate
    val docs = Seq(
      (1L, "a", "one two three", 3L),
      (2L, "a", "four five six", 3L),
      (3L, "a", "seven eight nine", 3L),
      (9L, "b", "solo doc here", 3L))
      .toDF("doc_id", "grp", "text", "n_tokens")
    val seqs = graft.ext.Curation.assembleSequences(docs, col("grp"), col("doc_id"),
        col("text"), col("n_tokens"), budget = 5, sep = "|SEP|")
      .orderBy(col("group"), col("shard_id"))
      .collect()
    assert(seqs.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq(("a", 0L, 2L), ("a", 1L, 1L), ("b", 0L, 1L)))
    assert(seqs(0).getString(4) === "one two three|SEP|four five six")
    assert(seqs(1).getString(4) === "seven eight nine")
    assert(seqs(2).getString(4) === "solo doc here")
  }
}
