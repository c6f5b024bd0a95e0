package graft.ext

import org.apache.spark.sql.functions._

class BucketPairsSpec extends graft.SparkSuite {
  import spark.implicits._

  test("bucketPairs maxBucket excludes oversized buckets") {
    val rows = Seq((1L, "k1"), (2L, "k1"), (3L, "k1"), (10L, "k2"), (11L, "k2"))
      .toDF("id", "bkey")
    def pairs(cap: Int) =
      Dedup.bucketPairs(rows, Seq("bkey"), struct(col("id")), cap)
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id"), col("b.id")).as[(Long, Long)].collect().toSet
    // unlimited: k1 has 3 pairs, k2 has 1
    assert(pairs(Int.MaxValue) == Set((1L, 2L), (1L, 3L), (2L, 3L), (10L, 11L)))
    // cap 2: the 3-member k1 bucket is excluded entirely
    assert(pairs(2) == Set((10L, 11L)))
  }

  test("near-dup entry points honor the maxBucket backstop") {
    // 8 identical docs: every LSH band bucket is one degenerate
    // 8-member bucket. Under the cap they all pair; a cap below the
    // bucket size excludes the bucket entirely (degenerate input
    // belongs in exact dedup, not quadratic pair expansion).
    val docs = (1L to 8L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    assert(Dedup.nearDupPairs(docs, col("doc_id"), col("text")).count() == 28)
    assert(Dedup.nearDupPairs(docs, col("doc_id"), col("text"), maxBucket = 4).count() == 0)
  }

  test("bucketPairs keeps fingerprint multiplicity (winnow n_shared contract)") {
    // two docs sharing the same fp value twice each -> 4 in-bucket
    // ordered pairs, matching the old join-based count semantics
    val rows = Seq((1L, 7L), (1L, 7L), (2L, 7L), (2L, 7L)).toDF("id", "fp")
    val n = Dedup.bucketPairs(rows, Seq("fp"), struct(col("id")))
      .filter(col("a.id") < col("b.id")).count()
    assert(n == 4)
  }
}
