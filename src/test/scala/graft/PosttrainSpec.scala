package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Posttrain

/** [[graft.ext.Posttrain]] — SFT pair mining, preference pairs, and
  * dialog assembly over the posts/comments model: tombstone gates,
  * deterministic candidate ranking (token count desc, flat_idx asc),
  * the window-free max_by/min_by extremes, role tagging, and the
  * alternation audit (incl. the zip_with padded-tail edge).
  */
class PosttrainSpec extends SparkSuite {
  import spark.implicits._

  private def posts(rows: (String, String, String)*): DataFrame =
    rows.toDF("post_id", "subreddit", "title")
      .withColumn("selftext", lit(""))
      .withColumn("author", lit("op"))

  private def comments(rows: (String, String, Int, String, String)*): DataFrame =
    rows.toDF("comment_id", "post_id", "flat_idx", "body", "author")

  test("sftPairs: tombstones drop, rank = (tokens desc, flat_idx asc), acceptance flag") {
    val p = posts(("p1", "s", "A  question?"), ("p2", "s", "short"))
    val c = comments(
      ("c1", "p1", 0, "one two three", "u1"),        // 3 tokens
      ("c2", "p1", 1, "one two three four", "u2"),   // 4 tokens — best
      ("c3", "p1", 2, "[deleted]", "u3"),            // tombstone body
      ("c4", "p1", 3, "alpha beta gamma delta", "[deleted]"), // tombstone author
      ("c5", "p2", 0, "tie a b", "u1"),              // 3 tokens, idx 0 — wins tie
      ("c6", "p2", 1, "tie c d", "u2"))              // 3 tokens, idx 1
    val got = Posttrain.sftPairs(p, c, minResponseTokens = 4)
      .select("post_id", "prompt", "response", "n_prompt_tokens", "n_resp_tokens", "accepted")
      .as[(String, String, String, Int, Int, Boolean)].collect().toSet
    assert(got == Set(
      ("p1", "A question?", "one two three four", 2, 4, true),
      ("p2", "short", "tie a b", 1, 3, false)))
  }

  test("sftPairs: a post with no surviving candidate emits no pair") {
    val p = posts(("p1", "s", "t"))
    val c = comments(("c1", "p1", 0, "[removed]", "u1"), ("c2", "p1", 1, "  ", "u2"))
    assert(Posttrain.sftPairs(p, c, 1).count() == 0)
  }

  test("preferencePairs: max_by/min_by endpoints ≡ the window extremes; ties and singles drop") {
    val p = posts(("p1", "s", "q1"), ("p2", "s", "q2"), ("p3", "s", "q3"))
    val c = comments(
      ("c1", "p1", 0, "a b c", "u1"),          // 3 tokens
      ("c2", "p1", 1, "a b c d e", "u2"),      // 5 tokens — chosen
      ("c3", "p1", 2, "a", "u3"),              // 1 token  — rejected
      ("c4", "p2", 0, "x y", "u1"),            // tie with c5 → margin 0 → dropped
      ("c5", "p2", 1, "z w", "u2"),
      ("c6", "p3", 0, "only one here", "u1"))  // single candidate → dropped
    val got = Posttrain.preferencePairs(p, c, minMarginTokens = 1)
      .select("post_id", "n_cands", "chosen", "rejected", "margin_tokens")
      .as[(String, Long, String, String, Int)].collect().toList
    assert(got == List(("p1", 3L, "a b c d e", "a", 4)))
  }

  test("preferencePairs: equal token counts break by flat_idx (chosen lowest, rejected highest)") {
    val p = posts(("p1", "s", "q"))
    val c = comments(
      ("c1", "p1", 0, "a a a", "u1"),
      ("c2", "p1", 1, "b b b b", "u2"),
      ("c3", "p1", 2, "c c c c", "u3"),  // ties c2 on 4 tokens — higher idx loses chosen
      ("c4", "p1", 3, "d d d", "u4"))    // ties c1 on 3 tokens — higher idx is rejected
    val got = Posttrain.preferencePairs(p, c, minMarginTokens = 1)
      .select("chosen", "rejected").as[(String, String)].collect().toList
    assert(got == List(("b b b b", "d d d")))
  }

  test("assembleDialogs: flat_idx order, alternating roles from assistant, turn count") {
    val p = posts(("p1", "s", "  The   question "))
    val c = comments(
      ("c2", "p1", 1, "second", "u2"),
      ("c1", "p1", 0, "first", "u1"),
      ("c3", "p1", 2, "third", "u3"))
    val got = Posttrain.assembleDialogs(p, c)
      .select("n_turns", "alternation_ok", "dialog")
      .as[(Int, Boolean, String)].collect().toList
    assert(got == List((4, true,
      "user: The question\nassistant: first\nuser: second\nassistant: third")))
  }

  test("assembleDialogs: consecutive same-author comment turns flip alternation_ok only") {
    val p = posts(("p1", "s", "q"), ("p2", "s", "q2"))
    val c = comments(
      ("c1", "p1", 0, "a", "self"),
      ("c2", "p1", 1, "b", "self"),   // self-reply → invalid
      ("c3", "p2", 0, "a", "u1"),
      ("c4", "p2", 1, "b", "u2"),
      ("c5", "p2", 2, "c", "u1"))     // u1 again but NOT consecutive → valid
    val got = Posttrain.assembleDialogs(p, c)
      .select("post_id", "alternation_ok").as[(String, Boolean)].collect().toMap
    assert(got == Map("p1" -> false, "p2" -> true))
  }

  test("assembleDialogs: single comment turn (the zip_with padded tail) is valid") {
    val p = posts(("p1", "s", "q"))
    val c = comments(("c1", "p1", 0, "only", "u1"))
    val got = Posttrain.assembleDialogs(p, c)
      .select("n_turns", "alternation_ok").as[(Int, Boolean)].collect().toList
    assert(got == List((2, true)))
  }

  test("partitioning invariance: results identical at 1 and 7 partitions") {
    val p = posts((1 to 40).map(i => (s"p$i", "s", s"title $i words here")): _*)
    val c = comments((1 to 40).flatMap(i => Seq(
      (s"c${i}a", s"p$i", 0, s"reply ${"x " * (i % 5)}end", s"u${i % 3}"),
      (s"c${i}b", s"p$i", 1, s"other ${"y " * ((i + 2) % 5)}end", s"u${(i + 1) % 3}"),
      (s"c${i}c", s"p$i", 2, if (i % 4 == 0) "[deleted]" else s"third reply $i", s"u${i % 3}"))): _*)
    def all(pp: DataFrame, cc: DataFrame): Set[String] = {
      val a = Posttrain.sftPairs(pp, cc, 3)
        .select(concat_ws("|", col("post_id"), col("response"), col("accepted"))).as[String].collect().toSet
      val b = Posttrain.preferencePairs(pp, cc, 1)
        .select(concat_ws("|", col("post_id"), col("chosen"), col("rejected"))).as[String].collect().toSet
      val d = Posttrain.assembleDialogs(pp, cc)
        .select(concat_ws("|", col("post_id"), col("dialog"), col("alternation_ok"))).as[String].collect().toSet
      a ++ b ++ d
    }
    assert(all(p.repartition(1), c.repartition(1)) == all(p.repartition(7), c.repartition(7)))
  }
}
