package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Text

/** ⊕ Post-training data mining (north star): the pipeline stage that
  * turns the reference's forum relations (SURVEY.md §1.3 posts +
  * comments, `app.py:74-151`'s data model) into supervised
  * fine-tuning pairs, preference pairs, and multi-turn dialogs — the
  * post-training third of an LLM data pipeline, the way public
  * instruction datasets are mined from forum threads (ELI5, Fan et
  * al. 2019: question = post, answer = a comment; Stanford Human
  * Preferences, Ethayarajh et al. 2022: preference pairs from
  * comment pairs under the same post; OpenAssistant, Köpf et al.
  * 2023: role-alternating dialog trees).
  *
  * Candidate ranking deviates from SHP deliberately: the fixture
  * comment relation carries no vote score (SURVEY §1.3 — the
  * reference reads `comment.body`/`author` only, `app.py:121-127`),
  * so candidates rank by response token count with `flat_idx` as the
  * deterministic tie-break. The rank column is a parameter of the
  * shapes below, not of the algebra: swap in a score column and every
  * plan is unchanged.
  *
  * Shuffle inventory at scale (the 100 TB shape):
  * - tombstone/empty gates are row-local and run BEFORE any exchange,
  *   so dead comments never pay a shuffle;
  * - [[sftPairs]] = one hash shuffle of surviving comments on
  *   `post_id` (window top-1) + one equi-join against posts on the
  *   same key — with both sides large this is the co-partitioned
  *   sort-merge join, and the window reuses the join's partitioning;
  * - [[preferencePairs]] replaces the window with ONE map-side
  *   combinable `max_by`/`min_by` aggregation — partial aggregation
  *   folds each partition to one chosen/rejected candidate per post
  *   before the exchange, so the shuffle moves two rows per (post ×
  *   partition), not every comment;
  * - [[assembleDialogs]] = one `collect_list` aggregation per post
  *   (bounded by the per-post comment budget) with all turn logic —
  *   ordering, role tagging, alternation audit — row-local HOFs over
  *   the collected array.
  */
object Posttrain {

  /** Tombstoned or structurally unusable comment rows (F3/F4, the
    * reference's comment-branch filters `app.py:121-124`): null or
    * `[deleted]`/`[removed]` bodies, deleted authors, and bodies that
    * are empty after whitespace normalization.
    */
  def candidateResponses(comments: DataFrame): DataFrame =
    comments
      .filter(col("body").isNotNull && !col("body").isin("[deleted]", "[removed]") &&
        col("author").isNotNull && col("author") =!= "[deleted]")
      .withColumn("response", Text.cleanText(col("body")))
      .filter(length(col("response")) > 0)
      .withColumn("n_resp_tokens", TextAnalysis.tokenCount(col("body")))

  /** SFT pair mining: one (prompt, response) pair per post — prompt =
    * normalized `title + selftext`, response = the top-ranked clean
    * comment (token count desc, `flat_idx` asc). `accepted` marks
    * pairs whose response clears `minResponseTokens`, emitted as a
    * flag rather than a filter so the acceptance rate is visible to
    * the datacard a mining run publishes.
    */
  def sftPairs(posts: DataFrame, comments: DataFrame,
               minResponseTokens: Int): DataFrame = {
    val w = Window.partitionBy(col("post_id"))
      .orderBy(col("n_resp_tokens").desc, col("flat_idx").asc)
    val best = candidateResponses(comments)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("post_id"), col("response"), col("n_resp_tokens"))
    val p = posts.select(col("post_id"), col("subreddit"),
      Text.cleanText(concat_ws(" ", col("title"), col("selftext"))).as("prompt"),
      TextAnalysis.tokenCount(concat_ws(" ", col("title"), col("selftext")))
        .as("n_prompt_tokens"))
    p.join(best, Seq("post_id"))
      .withColumn("accepted", col("n_resp_tokens") >= minResponseTokens)
  }

  /** Preference (DPO) pair mining: per post with ≥ 2 clean candidates,
    * `chosen` = the top-ranked response and `rejected` = the
    * bottom-ranked one (SHP's construction with the documented
    * token-count rank). Pairs whose margin — chosen minus rejected
    * token count — is below `minMarginTokens` are dropped: a tie
    * carries no preference signal (and with `minMarginTokens ≥ 1`
    * chosen ≠ rejected by construction).
    *
    * Plan shape: no window — ONE `max_by`/`min_by` aggregation keyed
    * on `post_id`, partially aggregated map-side, so each partition
    * contributes at most one candidate pair per post to the exchange.
    * The (rank, -flat_idx) struct makes both extremes deterministic:
    * max picks (most tokens, then LOWEST flat_idx), min picks (fewest
    * tokens, then HIGHEST flat_idx).
    */
  def preferencePairs(posts: DataFrame, comments: DataFrame,
                      minMarginTokens: Int): DataFrame = {
    val key = struct(col("n_resp_tokens"), (col("flat_idx") * -1).as("nidx"))
    val cand = struct(col("response"), col("n_resp_tokens"))
    val agg = candidateResponses(comments)
      .groupBy(col("post_id"))
      .agg(count(lit(1)).as("n_cands"),
        max_by(cand, key).as("__c"), min_by(cand, key).as("__r"))
      .filter(col("n_cands") >= 2)
      .select(col("post_id"), col("n_cands"),
        col("__c.response").as("chosen"),
        col("__r.response").as("rejected"),
        (col("__c.n_resp_tokens") - col("__r.n_resp_tokens")).as("margin_tokens"))
      .filter(col("margin_tokens") >= minMarginTokens)
    posts.select(col("post_id"), col("subreddit"),
        Text.cleanText(concat_ws(" ", col("title"), col("selftext"))).as("prompt"))
      .join(agg, Seq("post_id"))
  }

  /** Multi-turn dialog assembly (the OpenAssistant shape): the post is
    * turn 0 (`user`), surviving comments follow in `flat_idx` order
    * with alternating roles (`assistant` first). Emits the rendered
    * dialog, its turn count, and `alternation_ok` — true iff no two
    * CONSECUTIVE comment turns share an author (a self-reply chain
    * reads as one speaker talking to themselves; OpenAssistant
    * enforces the same validity rule on its trees).
    *
    * All turn logic is row-local over one `collect_list` per post:
    * `array_sort` orders turns, `transform` with the position index
    * assigns roles, `zip_with` over the array and its tail audits
    * alternation. No window, no second shuffle.
    */
  def assembleDialogs(posts: DataFrame, comments: DataFrame): DataFrame = {
    val turns = candidateResponses(comments)
      .groupBy(col("post_id"))
      .agg(sort_array(collect_list(struct(
        col("flat_idx"), col("author"), col("response")))).as("__t"))
    posts.select(col("post_id"), col("subreddit"),
        Text.cleanText(concat_ws(" ", col("title"), col("selftext"))).as("prompt"))
      .join(turns, Seq("post_id"))
      .select(col("post_id"), col("subreddit"),
        (size(col("__t")) + 1).as("n_turns"),
        // zip_with pads the shorter side with null; `<=>` keeps the
        // padded comparison a plain false (authors are non-null after
        // the candidate gate), so `exists` never goes three-valued.
        (!exists(
          zip_with(col("__t"), slice(col("__t"), 2, 2147483646),
            (a, b) => a.getField("author") <=> b.getField("author")),
          x => x)).as("alternation_ok"),
        concat(lit("user: "), col("prompt"), lit("\n"),
          array_join(
            transform(col("__t"), (t, i) =>
              concat(when(i % 2 === 0, lit("assistant: "))
                  .otherwise(lit("user: ")),
                t.getField("response"))), "\n")).as("dialog"))
  }
}
