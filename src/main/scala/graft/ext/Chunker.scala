package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ⊕ Token-window document chunking for LLM training/embedding
  * pipelines (north-star text op): split each document into
  * fixed-size token windows with overlap — the standard pre-embedding
  * / context-packing segmentation.
  *
  * Chunk layout for `n` tokens, window `size`, overlap `o`
  * (step = size − o): starts are `1, 1+step, 2·step+1, …` up to
  * `max(n − o, 1)`, so every token is covered, consecutive chunks
  * share exactly `o` tokens, and only the last chunk may be short.
  * A document shorter than one window yields exactly one chunk.
  *
  * Plan shape: tokenize → `sequence` of starts → `explode` → `slice`,
  * all codegen'd Catalyst built-ins. Fan-out is `≈ n/step` rows per
  * document — the same multiplier any chunker pays — and stays
  * row-local: no shuffle is introduced, so chunking scales with the
  * scan and downstream ops see an ordinary (doc_id, chunk_idx)-keyed
  * table. Filters on chunk columns stay on generated columns
  * (post-explode), which keeps the scan's pushdown surface intact.
  */
object Chunker {

  /** Explode `df` into one row per (document, chunk). Appends
    * `chunk_idx` (0-based), `chunk_tokens` (array), `chunk_len`;
    * other columns pass through.
    *
    * @param tokens an `ArrayType(StringType)` column of the document's
    *               tokens (e.g. [[TextAnalysis.tokens]])
    */
  def chunkTokens(df: DataFrame, tokens: Column, chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0, s"chunk size must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got overlap=$overlap chunkSize=$chunkSize")
    val step = chunkSize - overlap
    df.withColumn("__toks", tokens)
      .withColumn("__start",
        explode(sequence(lit(1), greatest(size(col("__toks")) - overlap, lit(1)), lit(step))))
      .withColumn("chunk_idx", ((col("__start") - 1) / step).cast("long"))
      .withColumn("chunk_tokens", slice(col("__toks"), col("__start"), lit(chunkSize)))
      .withColumn("chunk_len", size(col("chunk_tokens")))
      .drop("__toks", "__start")
  }
}
