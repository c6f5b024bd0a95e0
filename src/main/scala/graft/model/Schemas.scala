package graft.model

import org.apache.spark.sql.types._

/** Explicit StructTypes for the reverse-engineered Reddit relations the
  * reference consumes (SURVEY.md §1.3, FIXTURES.md §2) and the two
  * pipeline output schemas (`app.py:72` and `app.py:100-107,134-141`).
  * Schemas are declared, not inferred — at 100 TB, schema inference is
  * a full extra pass.
  */
object Schemas {

  val subreddits: StructType = StructType(Seq(
    StructField("display_name", StringType, nullable = false),
    StructField("subscribers", LongType, nullable = true),
    StructField("over18", BooleanType, nullable = true),
    StructField("description", StringType, nullable = true)))

  val posts: StructType = StructType(Seq(
    StructField("post_id", StringType, nullable = false),
    StructField("subreddit", StringType, nullable = false),
    StructField("title", StringType, nullable = true),
    StructField("selftext", StringType, nullable = true),
    // nullable; '[deleted]' tombstone (app.py:93)
    StructField("author", StringType, nullable = true),
    StructField("score", LongType, nullable = true),
    StructField("created_utc", TimestampType, nullable = true),
    StructField("permalink", StringType, nullable = true)))

  val comments: StructType = StructType(Seq(
    StructField("comment_id", StringType, nullable = false),
    StructField("post_id", StringType, nullable = false),
    StructField("parent_id", StringType, nullable = true),
    // BFS-order ordinal: makes the reference's "first k comments"
    // (`comments.list()[:k]`, app.py:116) well-defined distributed.
    StructField("flat_idx", IntegerType, nullable = false),
    // nullable; '[deleted]'/'[removed]' tombstones (app.py:121-124)
    StructField("body", StringType, nullable = true),
    StructField("author", StringType, nullable = true),
    StructField("permalink", StringType, nullable = true)))

  /** Metadata struct of the multimodal media schema
    * (ext.Multimodal.mediaSchema's `meta` field).
    */
  val mediaMeta: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("duration_ms", IntegerType, nullable = true)))

  /** Output of pipeline A (community discovery), app.py:72. */
  val communities: StructType = StructType(Seq(
    StructField("Community", StringType, nullable = false),
    StructField("Relevance Score", IntegerType, nullable = false),
    StructField("Found Via", StringType, nullable = false),
    StructField("Members", LongType, nullable = true),
    StructField("Community Link", StringType, nullable = false),
    StructField("Top Posts (Month)", StringType, nullable = false)))

  /** Output of pipeline B (buying-signal scan), app.py:100-107,134-141. */
  val signals: StructType = StructType(Seq(
    StructField("Subreddit", StringType, nullable = false),
    StructField("Match", StringType, nullable = false),
    StructField("Type", StringType, nullable = false),
    StructField("Text", StringType, nullable = true),
    StructField("Author", StringType, nullable = true),
    StructField("Link", StringType, nullable = true)))
}
