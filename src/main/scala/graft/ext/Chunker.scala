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

  /** ⊕ Content-defined chunking (LBFS rolling-hash cuts,
    * Muthitacharoen et al. 2001; the FastCDC lineage): cut each
    * document where the rolling hash of the trailing `window`-char
    * context ≡ 0 (mod `divisor`). Because cut points depend only on
    * LOCAL content, an insertion or deletion shifts at most the two
    * chunks it touches — every other chunk re-aligns and
    * content-hashes identically, which is what makes chunk-level
    * dedup across document VERSIONS work (fixed-offset chunking
    * re-shifts everything after the edit). Storage dedup, diff
    * transfer, and near-identical-crawl handling all reduce to this.
    *
    * Expected chunk length ≈ `divisor` chars. The hash is the exact
    * integer polynomial `Σ code(c_j)·256^(window−j) mod m` — no
    * floats, no engine-specific rounding — with the power table
    * interpolated as literals, so the oracle replays cuts
    * bit-for-bit in SQL (as an O(len·window) re-fold; the engine side
    * computes the SAME polynomial with the codegen'd O(1)-per-shift
    * rolling form — [[graft.functions.CdcCuts]]). Everything is
    * row-local, riding the scan — no shuffle; documents shorter than
    * `window` are a single chunk.
    *
    * Output: one row per chunk — `chunk_idx` (0-based), `chunk`
    * (text), `chunk_hash` (md5), `chunk_len`; other columns pass
    * through.
    */
  def contentChunks(df: DataFrame, text: Column, window: Int = 16,
                    modulus: Long = 1000003L, divisor: Long = 64L): DataFrame = {
    require(window > 0 && divisor > 0 && modulus > 1, "bad CDC parameters")
    require(modulus < (1L << 35),
      "modulus must keep code·power products inside a long")
    // cut positions via the codegen'd O(1)-per-shift rolling hash —
    // same polynomial (and so the same cut set) as the SQL oracle's
    // power-table re-fold; see graft.functions.CdcCuts
    val n = length(text).cast("bigint")
    val bounds = concat(array(lit(0L)),
      filter(col("__cuts"), c => c < n), array(n))
    df.withColumn("__cuts",
        graft.functions.CdcCuts.cdcCuts(text, window, modulus, divisor))
      .withColumn("__bounds", bounds)
      .withColumn("chunk_idx",
        explode(sequence(lit(1), size(col("__bounds")) - 1)))
      .withColumn("chunk",
        substr(text, element_at(col("__bounds"), col("chunk_idx")) + 1,
          element_at(col("__bounds"), col("chunk_idx") + 1) -
            element_at(col("__bounds"), col("chunk_idx"))))
      .withColumn("chunk_idx", (col("chunk_idx") - 1).cast("long"))
      .withColumn("chunk_hash", md5(col("chunk")))
      .withColumn("chunk_len", length(col("chunk")).cast("long"))
      .drop("__cuts", "__bounds")
  }

  /** 256^(window−j) mod m for j = 1..window — shared with the oracle. */
  def powerTable(window: Int, modulus: Long): Seq[Long] =
    (1 to window).map(j =>
      BigInt(256).modPow(BigInt(window - j), BigInt(modulus)).toLong)
}
