package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Text

/** ⊕ Text-analysis operators for LLM-data pipelines (north star):
  * language/topic ID by lexicon hits, quality scoring, token counting,
  * and content fingerprinting. All pure Catalyst column expressions —
  * row-local, codegen'd, shuffle-free; they scale with the scan.
  */
object TextAnalysis {

  /** Whitespace tokens of normalized text. */
  def tokens(text: Column): Column = split(Text.cleanText(lower(text)), " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword-unit count: letter runs, single digits, and
    * punctuation marks each count as one unit (regex kept to classes
    * portable between Java and RE2-style engines).
    */
  def unitCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0)))

  /** Lexicon-hit score: number of tokens that appear in `lexicon`. */
  def lexiconHits(text: Column, lexicon: Seq[String]): Column = {
    val lex = array(lexicon.map(w => lit(w.toLowerCase)): _*)
    size(filter(tokens(text), t => array_contains(lex, t)))
  }

  /** Language/topic ID by lexicon argmax (n-gram-heuristic language ID
    * in the classic train-free form: score each label by
    * characteristic-token hits, pick the max; ties break by label
    * order, so classification is deterministic).
    *
    * Hot path: count-and-argmax is ONE fused codegen'd pass over one
    * tokenization ([[graft.functions.LexiconScores.lexicon_best]]).
    * History: the original per-label `tokens + filter` HOF form paid
    * k regex splits and k interpreted lambda passes per row (lost at
    * CHUNK granularity, q160/q166); the round-13 `lexicon_scores` +
    * `greatest`/`when` fold referenced the scores array ~2k times and
    * codegen CSE did NOT collapse them on q46's filter+project shape
    * (judge-bisected 2.2× regression at DOCUMENT granularity). The
    * fused expression makes single evaluation structural — fast at
    * BOTH granularities. Labels/tie-breaks/fallback are bit-identical
    * to the fold (first max in priority order; fallback when all
    * counts are 0, including for null text via the coalesce).
    *
    * @param lexicons (label, characteristic tokens) in priority order
    */
  def classifyByLexicon(text: Column, lexicons: Seq[(String, Seq[String])],
                        fallback: String = "und"): Column =
    coalesce(
      graft.functions.LexiconScores.lexicon_best(tokens(text), lexicons, fallback),
      lit(fallback))

  /** Quality features: token count, type-token ratio, mean token
    * length, and a composite [0,1] score (long-enough, diverse,
    * word-sized tokens). The score form mirrors common heuristic
    * quality filters (length + lexical-diversity gates) from public
    * data-pipeline literature.
    *
    * The score is min(n,20)/20 · distinct/n · wordGate with
    * wordGate ∈ {1, ½} — a RATIO OF SMALL INTEGERS, so the former
    * `round(double, 4)` publish landed exactly on `.5` boundaries
    * (0.59375, 0.28125, … — 21 sightings in the r15 guard-band
    * sweep) where the verdict is engine tie-rule convention. Now
    * published tie-free via [[graft.ops.Exact.ratio]]: exact integer
    * floor division at 4 dp, same schema, same scale. The word gate
    * compares mean token length ∈ [2, 12] as the equivalent integer
    * inequality 3n ≤ cleanLen+1 ≤ 13n — no double in the whole
    * computation.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val n = size(toks).cast("long")
    val d = size(array_distinct(toks)).cast("long")
    val lenC = length(Text.cleanText(text)).cast("long")
    // meanLen = (lenC - (n-1))/n in [2, 12]  ⇔  3n ≤ lenC+1 ≤ 13n
    val w2 = when((lenC + 1).between(n * 3, n * 13), lit(2L)).otherwise(lit(1L))
    graft.ops.Exact.ratio(least(n, lit(20L)) * d * w2, n * lit(40L), 4)
  }

  /** Content fingerprint: md5 of the case-folded, whitespace-normalized
    * text. Identical content (modulo spacing/case) → identical
    * fingerprint; engine-portable.
    */
  def fingerprint(text: Column): Column = md5(Text.cleanText(lower(text)))

  /** ⊕ Gopher quality rules (Rae et al. 2021, Appendix A1.1 — the
    * MassiveText heuristic gate, also FineWeb's "Gopher filtering"
    * stage): the canonical per-document screen run before any trained
    * filter. Emits every metric AND every rule verdict so a curation
    * run can report WHY a document died, plus the conjunction
    * `passes`:
    *
    *  - `n_words` in [minWords, maxWords]    (default 50..100,000)
    *  - `mean_word_len` in [3, 10]
    *  - `hash_ratio` ≤ 0.1 and `ellipsis_ratio` ≤ 0.1 (symbol-to-word)
    *  - `bullet_frac` ≤ 0.9  (lines starting with a bullet)
    *  - `ellipsis_line_frac` ≤ 0.3  (lines ending with "...")
    *  - `n_stop` ≥ 2 of the canonical stop set (the, be, to, of, and,
    *    that, have, with)
    *
    * ROW-LOCAL (one fold + HOF passes over tokens and lines; no
    * shuffle, streamable). Ratios are rounded to 4 dp — the repo's
    * cross-engine double convention; counts are exact integers. Word
    * metrics use the q80 token fold; line metrics split on `\n` and
    * trim before the prefix/suffix checks.
    */
  def gopherQualityGate(text: Column, minWords: Int = 50,
                        maxWords: Int = 100000): Column = {
    val toks = tokens(text)
    val nW = size(toks)
    val nWd = nW.cast("double")
    val meanLen = round((length(Text.cleanText(lower(text))).cast("double") -
      (nWd - 1)) / nWd, 4)
    def ratioOf(pred: Column => Column): Column =
      round(size(filter(toks, pred)).cast("double") / nWd, 4)
    val hashRatio = ratioOf(t => t.contains(lit("#")))
    val ellipsisRatio = ratioOf(t => t.contains(lit("...")))
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val nStop = size(filter(typedLit(stops), s => array_contains(toks, s)))
    val lines = filter(transform(split(text, "\n"), l => trim(l)),
      l => l =!= "")
    val nL = greatest(size(lines), lit(1)).cast("double")
    val bulletFrac = round(size(filter(lines,
      l => l.startsWith("-") || l.startsWith("*") || l.startsWith("•")))
      .cast("double") / nL, 4)
    val ellLineFrac = round(size(filter(lines, l => l.endsWith("...")))
      .cast("double") / nL, 4)
    val okWords = nW >= minWords && nW <= maxWords
    val okLen = meanLen >= 3.0 && meanLen <= 10.0
    val okSym = hashRatio <= 0.1 && ellipsisRatio <= 0.1
    val okBullet = bulletFrac <= 0.9
    val okEll = ellLineFrac <= 0.3
    val okStop = nStop >= 2
    struct(
      nW.as("n_words"), meanLen.as("mean_word_len"),
      hashRatio.as("hash_ratio"), ellipsisRatio.as("ellipsis_ratio"),
      bulletFrac.as("bullet_frac"), ellLineFrac.as("ellipsis_line_frac"),
      nStop.as("n_stop"),
      okWords.as("ok_words"), okLen.as("ok_word_len"), okSym.as("ok_symbols"),
      okBullet.as("ok_bullets"), okEll.as("ok_ellipsis_lines"),
      okStop.as("ok_stops"),
      (okWords && okLen && okSym && okBullet && okEll && okStop).as("passes"))
  }

  /** ⊕ CORPUS-WIDE paragraph dedup (the RefinedWeb/FineWeb rule,
    * Penedo et al. 2023: repeated paragraphs are removed across the
    * whole crawl, not just within a document — [[dedupLines]]' global
    * dual): every paragraph keeps exactly its FIRST corpus occurrence
    * under the total order (doc_id, position); later copies anywhere
    * drop. Output: `(doc_id, n_paras, n_kept, text_clean)` for every
    * input document (a doc whose every paragraph is claimed elsewhere
    * comes back with `n_kept = 0` and empty text — visible, not
    * dropped).
    *
    * Scale shape: paragraphs are keyed by md5 (fixed 32-byte shuffle
    * key — the q97 stance); the global first occurrence is ONE
    * min-struct aggregation per key (map-side combinable), the
    * winners semi-join back against the exploded paragraphs, and
    * reassembly is a per-doc sort-collect over that doc's own
    * SURVIVING paragraphs only. Nothing is quadratic; the only
    * corpus-wide exchanges are hash-partitioned on paragraph content.
    */
  /** ⊕ Gopher REPETITION filters (Rae et al. 2021, Appendix A1.1 —
    * the other half of the MassiveText screen; [[gopherQualityGate]]
    * covers the quality rules, this covers the repetition rules that
    * catch templated/looping documents near-dup passes miss because
    * the repetition is INTERNAL to the document):
    *
    *  - `dup_line_frac` ≤ 0.30 — fraction of line occurrences beyond
    *    the first of each distinct line content;
    *  - `dup_line_char_frac` ≤ 0.20 — characters in those beyond-first
    *    occurrences over all line characters;
    *  - `top{2,3,4}_frac` ≤ 0.20/0.18/0.16 — characters of the most
    *    frequent word n-gram (count × gram chars incl. separators,
    *    ties to the lexicographically smallest gram) over the cleaned
    *    text's characters;
    *  - `dup{5,10}_frac` ≤ 0.15/0.10 — characters of TOKEN POSITIONS
    *    covered by some n-gram occurring ≥ 2× in the document, over
    *    all token characters (position-union coverage, the q97 cover
    *    idea turned row-metric — a char is never counted twice no
    *    matter how many repeated grams span it).
    *
    * Documented deviation: the paper's dup-gram definition is
    * ambiguous about overlap; this implementation pins the
    * position-union reading (deterministic, never exceeds 1.0).
    * Thresholds are the paper's; n = 6..9 are omitted from the
    * default readout (same machinery, linearly more gram volume) —
    * the two endpoints bracket the family.
    *
    * Plan shape at scale: all n-gram strings are built ROW-LOCALLY in
    * one `transform` and exploded once for every n in one pass
    * (row width stays (doc, n, pos, gram)), and the gram table is
    * deliberately NOT staged: its two consumers (the counts
    * aggregation and the coverage semi-join) each re-run the explode —
    * a row-local, linear, memory-free pass — because caching a
    * 5×-exploded corpus is exactly what does not survive 100 TB
    * (500 TB of cache to buy back one map pass), and because an
    * unstaged plan keeps Catalyst's whole-plan pruning (a consumer
    * that never references the gate columns never pays for them).
    * The previous lazy-localCheckpoint staging also carried a real
    * deadlock (broadcast-thread checkpoint finalization vs the DAG
    * scheduler — see Spectral's scaladoc); counting is one hash
    * shuffle on (doc, n, gram) — partial-aggregated, key cardinality
    * ≈ corpus gram volume; coverage is a semi-join of the gram table
    * against its own ≥2 counts + one distinct on (doc, n, pos).
    * Line metrics are one shuffle on (doc, line). NOTHING is
    * quadratic in document length (the HOF alternative — counting
    * each gram with a per-element filter — is O(m²) per doc and dies
    * on long documents).
    */
  /** Gopher repetition thresholds (Rae et al. 2021 Appendix A1.1) —
    * ONE definition shared by the batch gate and the row-local
    * streaming twin [[repetitionPassesLocal]], so the two forms
    * cannot drift on the contract itself (the parity spec then only
    * has to prove the METRIC arithmetic agrees).
    */
  val RepetitionTopNs: Seq[(Int, Double)] = Seq(2 -> 0.20, 3 -> 0.18, 4 -> 0.16)
  val RepetitionDupNs: Seq[(Int, Double)] = Seq(5 -> 0.15, 10 -> 0.10)
  val RepetitionDupLineMax: Double = 0.30
  val RepetitionDupLineCharMax: Double = 0.20

  def gopherRepetitionGate(df: DataFrame, id: Column, text: Column): DataFrame = {
    val topNs = RepetitionTopNs
    val dupNs = RepetitionDupNs
    val base = df.select(id.as("doc_id"), text.as("__txt"))
      .select(col("doc_id"),
        tokens(col("__txt")).as("__w"),
        split(col("__txt"), "\n").as("__ls"),
        length(Text.cleanText(lower(col("__txt")))).cast("long").as("__cb"))
      .withColumn("__m", size(col("__w")))
      .withColumn("__wlen", transform(col("__w"), w => length(w)))
      .withColumn("__tw",
        aggregate(col("__wlen"), lit(0L), (a, x) => a + x))
    val lineStats = base
      .select(col("doc_id"), explode(col("__ls")).as("__l"))
      .groupBy(col("doc_id"), col("__l")).agg(count(lit(1)).as("__c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("__c")).as("__nl"),
        sum(col("__c") - 1).as("__nd"),
        sum((col("__c") - 1) * length(col("__l"))).as("__dch"),
        sum(col("__c") * length(col("__l"))).as("__tch"))
    val allNs = (topNs.map(_._1) ++ dupNs.map(_._1)).distinct
    // UNSTAGED on purpose (round 17, reversing the r14 staging): the
    // explode re-runs once per consumer, which is linear row-local
    // work; staging it was measured 3.6-5× worse end-to-end once the
    // checkpoint had to be eager (lazy checkpoints deadlock — see the
    // scaladoc), and a cache of the exploded corpus is not a
    // 100 TB-viable trade for one saved map pass
    val grams = (base
      .select(col("doc_id"), col("__w"), col("__m"),
        explode(array(allNs.map(lit(_)): _*)).as("__n"))
      .filter(col("__m") >= col("__n"))
      .select(col("doc_id"), col("__n"),
        explode(transform(sequence(lit(0), col("__m") - col("__n")),
          i => struct(i.cast("int").as("i"),
            array_join(slice(col("__w"), i + 1, col("__n")), " ").as("g"))))
          .as("__e"))
      .select(col("doc_id"), col("__n"),
        col("__e.i").as("__i"), col("__e.g").as("__g"))
      )
    val counts = grams.groupBy(col("doc_id"), col("__n"), col("__g"))
      .agg(count(lit(1)).as("__c"))
    val top = graft.ops.TopK.perGroupTopK(
        counts.filter(col("__n").isin(topNs.map(_._1): _*)),
        Seq(col("doc_id"), col("__n")), Seq(desc("__c"), asc("__g")), 1)
      .select(col("doc_id"), col("__n"),
        (col("__c") * length(col("__g"))).as("__topch"))
    val dupG = counts
      .filter(col("__n").isin(dupNs.map(_._1): _*) && col("__c") >= 2)
      .select(col("doc_id"), col("__n"), col("__g"))
    val tokLens = base.select(col("doc_id"),
      posexplode(col("__wlen")).as(Seq("__j", "__wl")))
    val covChars = grams.filter(col("__n").isin(dupNs.map(_._1): _*))
      .join(dupG, Seq("doc_id", "__n", "__g"), "left_semi")
      .select(col("doc_id"), col("__n"),
        explode(sequence(col("__i"), col("__i") + col("__n") - 1)).as("__j"))
      .distinct()
      .join(tokLens, Seq("doc_id", "__j"))
      .groupBy(col("doc_id"), col("__n")).agg(sum(col("__wl")).as("__covch"))
    val topP = top.groupBy(col("doc_id"))
      .agg(max(when(col("__n") === topNs.head._1, col("__topch"))).as(s"__top${topNs.head._1}"),
        topNs.tail.map { case (n, _) =>
          max(when(col("__n") === n, col("__topch"))).as(s"__top$n") }: _*)
    val covP = covChars.groupBy(col("doc_id"))
      .agg(max(when(col("__n") === dupNs.head._1, col("__covch"))).as(s"__cov${dupNs.head._1}"),
        dupNs.tail.map { case (n, _) =>
          max(when(col("__n") === n, col("__covch"))).as(s"__cov$n") }: _*)
    val joined = base.select(col("doc_id"), col("__cb"), col("__tw"))
      .join(lineStats, Seq("doc_id"), "left")
      .join(topP, Seq("doc_id"), "left")
      .join(covP, Seq("doc_id"), "left")
    // fracs publish via Exact.ratio (integer floor division at 4 dp,
    // tie-free) — these are ratios of small integer char/line counts,
    // and the former round(double, 4) landed exactly on .5 boundaries
    // (0.18125, 0.15625, … — the r15 guard-band sweep's q204 hits)
    val dupLineFrac = graft.ops.Exact.ratio(
      coalesce(col("__nd"), lit(0L)), col("__nl"), 4)
    val dupLineCharFrac = graft.ops.Exact.ratio(
      coalesce(col("__dch"), lit(0L)), greatest(col("__tch"), lit(1L)), 4)
    val topFracs = topNs.map { case (n, thr) =>
      val f = graft.ops.Exact.ratio(
        coalesce(col(s"__top$n"), lit(0L)), greatest(col("__cb"), lit(1L)), 4)
      (n, thr, f)
    }
    val dupFracs = dupNs.map { case (n, thr) =>
      val f = graft.ops.Exact.ratio(
        coalesce(col(s"__cov$n"), lit(0L)), greatest(col("__tw"), lit(1L)), 4)
      (n, thr, f)
    }
    val okDupLine = dupLineFrac <= RepetitionDupLineMax
    val okDupLineChar = dupLineCharFrac <= RepetitionDupLineCharMax
    val okCols = topFracs.map { case (n, thr, f) => (s"ok_top$n", f <= thr) } ++
      dupFracs.map { case (n, thr, f) => (s"ok_dup$n", f <= thr) }
    val passes = okCols.map(_._2).foldLeft(okDupLine && okDupLineChar)(_ && _)
    joined.select(
      col("doc_id") +:
        col("__nl").cast("int").as("n_lines") +:
        dupLineFrac.as("dup_line_frac") +:
        dupLineCharFrac.as("dup_line_char_frac") +:
        (topFracs.map { case (n, _, f) => f.as(s"top${n}_frac") } ++
          dupFracs.map { case (n, _, f) => f.as(s"dup${n}_frac") } ++
          Seq(okDupLine.as("ok_dup_line"), okDupLineChar.as("ok_dup_line_char")) ++
          okCols.map { case (nm, c) => c.as(nm) } ++
          Seq(passes.as("passes"))): _*)
  }

  /** ROW-LOCAL twin of [[gopherRepetitionGate]]'s `passes` verdict,
    * for the streaming pipeline ([[graft.streaming.EventStream]]
    * `curateStream`): the gate is semantically a function of ONE
    * document's text, but the batch form spells it as explode +
    * aggregation so Tungsten owns the gram table at corpus scale — a
    * shape a streaming micro-batch cannot ride (mid-stream multi-key
    * aggregations are stateful operators with different semantics).
    * This twin computes the identical metrics per row with hash maps
    * (O(tokens) per doc, no shuffle) inside a typed filter.
    *
    * Parity is a TESTED contract, not an aspiration:
    * TextAnalysisSpec asserts verdict equality against the batch gate
    * per document over the planted-repetition fixture plus
    * adversarial edge cases (empty text, one line, all-duplicate
    * lines, short docs below every n). Every detail mirrors the batch
    * chain: the tokenizer (`split(cleanText(lower(text)), " ")`,
    * Locale.ROOT lowercasing), raw-text `\n` line split with trailing
    * empties kept (Spark `split` limit −1), top-1 gram ties broken
    * (count DESC, gram ASC), dup-gram position-UNION coverage, and
    * the tie-free `Exact.ratio` publish arithmetic — integer floor
    * division at 4 dp, then the same double `<=` threshold compare.
    */
  def repetitionPassesLocal(text: String): Boolean = {
    val t = if (text == null) "" else text
    // tokens/cb mirror tokens(col)/length(cleanText(lower(col)))
    val cleaned =
      t.toLowerCase(java.util.Locale.ROOT).replaceAll("\\s+", " ").trim
    val w = cleaned.split(" ", -1)
    val m = w.length
    val wlen = w.map(_.length)
    val tw = wlen.map(_.toLong).sum
    val cb = cleaned.length.toLong
    // line stats over the RAW text (batch: split(__txt, "\n"))
    val lines = t.split("\n", -1)
    val nl = lines.length.toLong
    val byLine = new scala.collection.mutable.HashMap[String, Long]()
    lines.foreach(l => byLine.update(l, byLine.getOrElse(l, 0L) + 1L))
    val nd = byLine.valuesIterator.map(_ - 1L).sum
    var dch = 0L; var tch = 0L
    byLine.foreach { case (l, c) =>
      dch += (c - 1L) * l.length; tch += c * l.length
    }
    // Exact.ratio(num, den, 4) then the batch double threshold compare
    def fracLe(num: Long, den: Long, thr: Double): Boolean =
      Math.floorDiv(num * 10000L, math.max(den, 1L)).toDouble / 10000.0 <= thr
    val okDupLine = fracLe(nd, nl, RepetitionDupLineMax)
    val okDupLineChar = fracLe(dch, math.max(tch, 1L), RepetitionDupLineCharMax)
    def gramAt(i: Int, n: Int): String = {
      val sb = new java.lang.StringBuilder(wlen.slice(i, i + n).sum + n)
      var j = i
      while (j < i + n) { if (j > i) sb.append(' '); sb.append(w(j)); j += 1 }
      sb.toString
    }
    // top-{2,3,4}-gram char fraction of the cleaned byte length
    val okTop = RepetitionTopNs.map { case (n, thr) =>
      if (m < n) fracLe(0L, math.max(cb, 1L), thr)
      else {
        val counts = new scala.collection.mutable.HashMap[String, Long]()
        var i = 0
        while (i <= m - n) {
          val g = gramAt(i, n)
          counts.update(g, counts.getOrElse(g, 0L) + 1L); i += 1
        }
        // ties: count DESC, gram ASC (ASCII fixture ⇒ UTF8 == UTF16 order)
        var bestG: String = null; var bestC = 0L
        counts.foreach { case (g, c) =>
          if (c > bestC || (c == bestC && (bestG == null || g < bestG))) {
            bestG = g; bestC = c
          }
        }
        fracLe(bestC * bestG.length, math.max(cb, 1L), thr)
      }
    }
    // dup-{5,10}-gram position-union coverage of the token char mass
    val okDup = RepetitionDupNs.map { case (n, thr) =>
      if (m < n) fracLe(0L, math.max(tw, 1L), thr)
      else {
        val counts = new scala.collection.mutable.HashMap[String, Long]()
        var i = 0
        while (i <= m - n) {
          val g = gramAt(i, n)
          counts.update(g, counts.getOrElse(g, 0L) + 1L); i += 1
        }
        val covered = new Array[Boolean](m)
        i = 0
        while (i <= m - n) {
          if (counts(gramAt(i, n)) >= 2L) {
            var j = i; while (j < i + n) { covered(j) = true; j += 1 }
          }
          i += 1
        }
        var covch = 0L; var j = 0
        while (j < m) { if (covered(j)) covch += wlen(j); j += 1 }
        fracLe(covch, math.max(tw, 1L), thr)
      }
    }
    okDupLine && okDupLineChar && (okTop ++ okDup).forall(identity)
  }

  def dedupParagraphsGlobal(df: DataFrame, id: Column, text: Column,
                            sep: String = "\n"): DataFrame = {
    val (base, ex) = paragraphExplode(df, id, text, sep)
    firstOccurrenceRebuild(base, ex, sep)
  }

  /** ⊕ INCREMENTAL corpus-wide paragraph dedup — the daily-increment
    * form of [[dedupParagraphsGlobal]] (the q123/q186 maintenance
    * convention): an increment paragraph survives iff its content
    * hash appears NOWHERE in the history corpus AND it is the first
    * occurrence within the increment under (doc_id, pos). Under
    * append-only ids (history ids < increment ids) this is EXACTLY
    * the global rule over history ∪ increment restricted to the
    * increment — TextAnalysisSpec proves the equivalence, and the
    * q199 oracle byte-shares q195's chain with an output filter.
    *
    * Scale shape: history contributes only its DISTINCT paragraph
    * hashes (the maintained seen-set — one anti-join key per distinct
    * paragraph, the q123 stance); the increment never re-reads
    * history text, so a daily run costs the increment plus one
    * hash-keyed anti-join.
    */
  def dedupParagraphsIncremental(history: DataFrame, increment: DataFrame,
                                 id: Column, text: Column,
                                 sep: String = "\n"): DataFrame = {
    val seen = history.select(explode(split(text, sep)).as("__t"))
      .select(md5(col("__t")).as("__h")).distinct()
    val (base, ex) = paragraphExplode(increment, id, text, sep)
    firstOccurrenceRebuild(base, ex.join(seen, Seq("__h"), "left_anti"), sep)
  }

  private def paragraphExplode(df: DataFrame, id: Column, text: Column,
                               sep: String): (DataFrame, DataFrame) = {
    val base = df.select(id.as("doc_id"), split(text, sep).as("__ps"))
    val ex = base.select(col("doc_id"), posexplode(col("__ps")).as(Seq("__p", "__t")))
      .select(col("doc_id"), col("__p"), col("__t"), md5(col("__t")).as("__h"))
    (base, ex)
  }

  /** First occurrence per content key — lexicographic min of
    * (doc_id, pos), a deterministic order-free aggregation — then
    * per-doc pos-ordered reassembly over each doc's own survivors.
    * The winning occurrence's TEXT rides inside the min struct
    * (round 19: (doc_id, __p) is already unique per group, so the
    * third field never decides the min — and every group's rows share
    * one text anyway), which makes the aggregation output THE kept
    * rows directly: the former `ex` semi-join re-evaluated the whole
    * upstream explode chain a second time (q197's plan showed the
    * regex-heavy clean chain three times — measured ~2.1 s per
    * evaluation at sf0.1) and paid an extra join shuffle.
    */
  private def firstOccurrenceRebuild(base: DataFrame, ex: DataFrame,
                                     sep: String): DataFrame = {
    val kept = ex.groupBy(col("__h"))
      .agg(min(struct(col("doc_id"), col("__p"), col("__t"))).as("__w"))
      .select(col("__w.doc_id").as("doc_id"), col("__w.__p").as("__p"),
        col("__w.__t").as("__t"))
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_kept"),
        array_join(transform(array_sort(collect_list(
          struct(col("__p"), col("__t")))), s => s.getField("__t")), sep)
          .as("text_clean"))
    base.select(col("doc_id"), size(col("__ps")).as("n_paras"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_paras"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** ⊕ C4-style line-level cleaning (Raffel et al. 2020 §2.2 — the
    * per-LINE rules applied before any document-level gate; FineWeb
    * and MassiveText run the same family): a line survives iff it
    * ends in terminal punctuation (`.` `!` `?` `"`), carries ≥
    * `minWords` words, and contains no banned phrase and no `{`
    * (the code/boilerplate tell). Returns a struct
    * `(n_lines, n_kept, text_clean)`; the conventional doc-level
    * follow-up is `n_kept ≥ 3` (C4's three-sentence floor), left to
    * the caller so the line and doc gates stay composable.
    *
    * ROW-LOCAL: one split + one HOF filter per document — no shuffle,
    * usable on a stream. Word counting and case folding use the q80
    * token convention (lowercase, whitespace-normalized, single-space
    * split) so the SQL oracle mirrors bit-for-bit; banned phrases are
    * matched against the folded line.
    */
  def c4LineClean(text: Column, minWords: Int = 3,
                  banned: Seq[String] = Seq("javascript", "lorem ipsum",
                    "terms of use", "privacy policy", "cookie")): Column = {
    val lines = split(text, "\n")
    val kept = filter(lines, l => {
      val t = lower(trim(regexp_replace(l, "\\s+", " ")))
      val words = size(split(t, " "))
      val punctOk = t.rlike("[.!?\"]$")
      val cleanOk = banned.map(b => !t.contains(lit(b.toLowerCase)))
        .foldLeft(!t.contains(lit("{")))(_ && _)
      punctOk && words >= minWords && cleanOk
    })
    struct(size(lines).as("n_lines"), size(kept).as("n_kept"),
      array_join(kept, "\n").as("text_clean"))
  }

  /** ⊕ Within-document repeated-line dedup (the MassiveText /
    * FineWeb "dup_line" rule): every line keeps only its FIRST
    * occurrence inside the document — navigation bars, repeated
    * footers, and chat-log echoes collapse while order is preserved.
    * Output: `(doc_id, n_lines, n_unique, text_clean)`.
    *
    * Plan shape: explode to (doc, line, pos), keep min(pos) per
    * (doc, line) — a map-side-combinable aggregation — and
    * reassemble in pos order; the shuffle key is (doc, line
    * content), state is one position per distinct line. No per-doc
    * window, no O(len²) row-local scan, so a pathological
    * million-line document costs its distinct-line count, not its
    * square.
    */
  def dedupLines(df: DataFrame, id: Column, text: Column): DataFrame = {
    // n_lines rides the aggregation as max(position)+1 (every position
    // 0..n−1 appears in the explode, so the max is exact) — the former
    // separate `size(__ls)` branch re-evaluated the input text chain a
    // second time and paid a join shuffle just to attach one integer
    // (round 19; both forms drop null-text docs: posexplode emits
    // nothing and the former inner join had no right side)
    df.select(id.as("doc_id"), posexplode(split(text, "\n")).as(Seq("__p", "__l")))
      .groupBy(col("doc_id"), col("__l"))
      .agg(min(col("__p")).as("__fp"), max(col("__p")).as("__mp"))
      .groupBy(col("doc_id"))
      .agg((max(col("__mp")) + 1).cast("int").as("n_lines"),
        count(lit(1)).as("n_unique"),
        array_join(transform(array_sort(collect_list(
          struct(col("__fp"), col("__l")))), s => s.getField("__l")), "\n")
          .as("text_clean"))
      .select(col("doc_id"), col("n_lines"), col("n_unique").cast("int").as("n_unique"),
        col("text_clean"))
  }

  /** ⊕ Per-group template-prefix detection — the site-boilerplate
    * screen for crawled corpora: pages from one source share a
    * rendered header ("Menu | Home | About …") that survives HTML
    * extraction and pollutes token statistics downstream. The whole
    * detection is ONE map-side-combinable aggregation: the longest
    * common prefix of a SET of strings equals
    * `LCP(min(S), max(S))` under lexicographic order (any mismatch
    * between the extremes bounds every other member), so the group
    * pass reduces to `min(text), max(text)` and the LCP itself runs
    * row-locally on #groups rows — never per document.
    *
    * Returns `(group, n_docs, prefix_len, prefix)`. Degenerate
    * single-document groups yield their full text as the "prefix"
    * (mn = mx) — callers gate on `n_docs` and/or cap `prefix_len`.
    * Strip with [[stripPrefixes]].
    */
  def templatePrefix(df: DataFrame, group: Column, text: Column): DataFrame = {
    val g = df.groupBy(group.as("group"))
      .agg(count(lit(1)).as("n_docs"),
        min(text).as("__mn"), max(text).as("__mx"))
    val bound = least(length(col("__mn")), length(col("__mx")))
    // contiguous per-char fold; guard the Spark sequence(1, 0)
    // descending-ramp edge when either extreme is empty
    val lcp = when(bound < 1, lit(0)).otherwise(
      aggregate(sequence(lit(1), bound), lit(0), (acc, i) =>
        when(acc === i - 1 &&
          col("__mn").substr(i, lit(1)) === col("__mx").substr(i, lit(1)), i)
          .otherwise(acc)))
    g.select(col("group"), col("n_docs"), lcp.as("prefix_len"),
      col("__mn").substr(lit(1), lcp).as("prefix"))
  }

  /** Strip each row's group template prefix (from [[templatePrefix]],
    * broadcast back — prefixes are #groups rows): rows whose text
    * starts with the group prefix lose it; others pass through.
    * Returns the input columns plus `stripped`; all join-side columns
    * ride collision-proof internal names, so a caller that already
    * carries `prefix`/`prefix_len`/`group` columns is unaffected.
    */
  def stripPrefixes(df: DataFrame, group: Column, text: Column,
                    prefixes: DataFrame): DataFrame = {
    val p = broadcast(prefixes.select(col("group").as("__tp_g"),
      col("prefix_len").as("__tp_len"), col("prefix").as("__tp_pre")))
    df.join(p, group === col("__tp_g"), "left")
      .withColumn("stripped",
        when(col("__tp_pre").isNotNull && text.startsWith(col("__tp_pre")),
          text.substr(col("__tp_len") + 1, length(text)))
          .otherwise(text))
      .drop("__tp_g", "__tp_len", "__tp_pre")
  }

  /** ⊕ Per-document character-distribution entropy — the
    * gibberish/repetition screen ORTHOGONAL to the corpus-model
    * signals ([[charBigramLm]] scores against the CORPUS's
    * distribution; this is the document's entropy against ITSELF):
    * `aaaaaaa…` and base64 blobs sit at the two extremes no
    * corpus-relative score separates — near-zero self-entropy for
    * the repetition, near-log(alphabet) for the blob — while natural
    * language sits in the middle band (≈ 2.5-3.2 nats for English
    * letters).
    *
    * H = −Σ_c p_c ln p_c over the case-folded, space-stripped
    * characters, published in exact integer NANO-nats: each term is
    * one double division + one ln quantized at birth
    * (`floor(p·ln p·1e9 + 0.5)` — the q154/q171 convention), so the
    * per-doc sum is an exact order-free integer sum. Cost is one
    * char-level explode — proportional to corpus BYTES, the lower
    * bound for an exact per-char statistic — and two hash
    * aggregations on (doc, char) / (doc).
    *
    * Returns `(id, n_chars, n_distinct, entropy_nano)`; empty-
    * after-cleaning documents are dropped (F4 stance).
    */
  def charEntropy(df: DataFrame, id: Column, text: Column): DataFrame = {
    val s = regexp_replace(Text.cleanText(lower(text)), " ", "")
    // one linear pass per document: split on the empty pattern yields
    // the character array directly (a sequence+substr index walk would
    // build a per-row index array AND re-seek the string per position
    // — O(len²) on exactly the long documents this screen targets);
    // the empty-string filter drops the regex-split edge artifacts
    val chars = df.select(id.as("id"), s.as("__s"))
      .filter(length(col("__s")) > 0)
      .select(col("id"), explode(split(col("__s"), "")).as("c"))
      .filter(col("c") =!= "")
    val counts = chars.groupBy(col("id"), col("c")).agg(count(lit(1)).as("__n"))
    val totals = counts.groupBy(col("id"))
      .agg(sum(col("__n")).as("__t"), count(lit(1)).as("n_distinct"))
    val p = col("__n").cast("double") / col("__t")
    counts.join(totals, Seq("id"))
      .groupBy(col("id"))
      .agg(first(col("__t")).as("n_chars"),
        first(col("n_distinct")).as("n_distinct"),
        (-sum(floor(p * log(p) * 1e9 + 0.5).cast("long"))).as("entropy_nano"))
  }

  /** ⊕ Repeated n-gram ratio — the classic boilerplate/repetition
    * signal (Gopher-style "fraction of duplicate n-grams" quality
    * gate): `1 − distinct_ngrams / total_ngrams`, 0.0 for documents
    * shorter than `n` tokens. High values mark templated or looping
    * text that near-dup passes miss because the repetition is
    * INTERNAL to the document.
    *
    * Distinct grams come from the single-pass [[graft.functions.ShingleSet]]
    * codegen expression; the total is arithmetic on the token count —
    * the whole signal is row-local and shuffle-free, so it rides the
    * scan like the other quality features.
    */
  def dupNgramRatio(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val total = greatest(tokenCount(text) - (n - 1), lit(0)).cast("double")
    val distinctN =
      size(graft.functions.ShingleSet.shingle_set(text, n)).cast("double")
    when(total > 0, round(lit(1.0) - distinctN / total, 6)).otherwise(lit(0.0))
  }

  /** ⊕ Corpus vocabulary: per-token total frequency (`tf`) and
    * document frequency (`df`), gated by a minimum document
    * frequency — tokenizer-vocabulary construction / corpus-stats
    * scan.
    *
    * Plan shape: the canonical map-side-combine word count — explode
    * to (doc, token), partial hash-aggregate per partition, ONE
    * shuffle on the token, final aggregate. `countDistinct(doc)` adds
    * the standard distinct expand; tf and df still travel through the
    * same single exchange. Output is vocabulary-sized (≪ corpus), so
    * the downstream top-k sort is cheap.
    */
  def vocabulary(df: DataFrame, id: Column, text: Column,
                 minDocFreq: Long = 1L): DataFrame =
    df.select(id.as("__id"), explode(tokens(text)).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("__id")).as("df"))
      .filter(col("df") >= minDocFreq)

  /** Character bigrams of the cleaned lower-cased text, row-local and
    * O(len): `zip_with` over two slices of the split-to-chars array,
    * whose lambda touches ONLY its element variables. The obvious
    * `transform(sequence(...), i => clean.substr(i, 2))` form captures
    * the whole clean-regex subtree inside the lambda and Catalyst
    * re-evaluates it per element — O(len²) per row, measured 16 s for
    * the q93 scan at sf0.1 vs ~1 s for this form (the ShingleSet
    * lesson, avoided here without a custom expression). Docs shorter
    * than 2 cleaned chars yield an empty array.
    */
  def charBigrams(text: Column): Column =
    graft.functions.CharBigrams.char_bigrams(
      graft.ops.Text.cleanText(lower(text)))

  /** ⊕ Windowed co-occurrence counts + PMI — the corpus statistic
    * word-embedding training preps (the GloVe/word2vec input): every
    * ordered token pair within `window` forward positions counts
    * once, and PMI = ln( (c₁₂/Tp) / ((c₁/Tu)·(c₂/Tu)) ) scores
    * association from the pair and unigram distributions.
    *
    * Scale shape: NO positional self-join fan-out — each token
    * explodes to its `window` forward offsets and pairs form by an
    * EQUI-join on (doc, position) (one shuffle); unigram counts and
    * the two single-row totals are broadcast back (vocabulary-sized
    * and 1-row respectively). `minCount` prunes the rare-pair tail
    * BEFORE the PMI math — at corpus scale the pair table is
    * vocab²-bounded either way, but the filter keeps the hash
    * aggregate's output small.
    */
  def cooccurrencePmi(docs: DataFrame, id: Column, text: Column,
                      window: Int = 2, minCount: Long = 1): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val tk = docs.select(id.as("doc_id"),
      posexplode(tokens(text)).as(Seq("pos", "tok")))
    val pairs = tk
      .select(col("doc_id"), col("tok").as("w1"), col("pos"),
        explode(sequence(lit(1), lit(window))).as("off"))
      .select(col("doc_id"), col("w1"), (col("pos") + col("off")).as("pos2"))
      .join(tk.select(col("doc_id"), col("pos").as("pos2"), col("tok").as("w2")),
        Seq("doc_id", "pos2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val uni = tk.groupBy(col("tok")).agg(count(lit(1)).as("__c"))
    val tu = uni.agg(sum(col("__c")).cast("double").as("__tu"))
    val tp = pairs.agg(sum(col("c12")).cast("double").as("__tp"))
    pairs
      .join(broadcast(uni.select(col("tok").as("w1"), col("__c").as("__c1"))), "w1")
      .join(broadcast(uni.select(col("tok").as("w2"), col("__c").as("__c2"))), "w2")
      .crossJoin(broadcast(tp)).crossJoin(broadcast(tu))
      .select(col("w1"), col("w2"), col("c12"),
        round(log((col("c12").cast("double") / col("__tp")) /
          ((col("__c1").cast("double") / col("__tu")) *
           (col("__c2").cast("double") / col("__tu")))), 6).as("pmi"))
  }

  /** ⊕ Corpus-trained character-bigram language model: (bigram,
    * log-probability) over the training docs — the CCNet-style
    * "perplexity proxy" screen (docs whose character statistics
    * diverge from the corpus score low: alien scripts, base64 blobs,
    * mojibake, boilerplate).
    *
    * Plan shape: the canonical map-side-combine count (explode →
    * partial agg → ONE shuffle on the bigram) plus the q73 trick for
    * the normalizer — a single-row total broadcast-crossed back, so
    * `logp = ln(count / total)` is row-local. Output is
    * vocabulary-sized (≤ alphabet², tiny).
    */
  def charBigramLm(train: DataFrame, text: Column): DataFrame = {
    // persisted (round 19): the model row set feeds the normalizer agg
    // here AND the scoring-side broadcast AND [[lmScore]]'s OOV-floor
    // agg — unpersisted, each consumer re-ran the corpus bigram
    // explode (measured: the train-half explode evaluated 3× in q93's
    // plan). The cache is vocabulary-sized (distinct bigrams), never
    // corpus-sized.
    val counts = train.select(explode(charBigrams(text)).as("bg"))
      .groupBy(col("bg")).agg(count(lit(1)).as("__c"))
      .persist()
    val total = counts.agg(sum(col("__c")).as("__total"))
    counts.crossJoin(broadcast(total)) // single-row normalizer
      .select(col("bg"),
        log(col("__c").cast("double") / col("__total").cast("double")).as("logp"),
        col("__total"))
  }

  /** ⊕ Score docs against a [[charBigramLm]] model: per-doc MEAN
    * bigram log-probability (rounded; higher = more corpus-like).
    * Unseen bigrams take the floor `ln(0.5 / total)` — half a count,
    * the additive-smoothing convention — so out-of-vocabulary text is
    * penalized, not dropped. Docs with no bigrams are excluded (no
    * evidence either way).
    *
    * Plan shape: explode to (doc, bigram), BROADCAST-join the tiny
    * model, one groupBy on the doc id. The corpus side never
    * re-shuffles on content.
    */
  /** ⊕ DSIR-style importance weights (data selection via importance
    * resampling, with the [[charBigramLm]] standing in for hashed
    * n-gram models): `weight = exp(lm_target − lm_raw)` — the
    * likelihood ratio of a target-domain model to the raw-corpus
    * model under [[lmScore]]'s mean-log-prob scoring, the signal
    * DSIR resamples by ("keep raw docs that look like the target
    * domain"). The target domain is a PREDICATE over the corpus rows
    * (DSIR's setting — target examples live inside the raw pool),
    * which is what makes one-pass training possible. Both scores
    * ride along for inspection; weight is rounded so the ratio
    * survives engine boundaries.
    *
    * Plan shape: BOTH models train from ONE corpus-bigram
    * aggregation (raw count + conditional target count per bigram —
    * one explode, one shuffle on the bigram key), and scoring is one
    * more pass over the same exploded stream with the single
    * vocabulary-sized two-column model broadcast onto it, both means
    * in a single doc-id aggregation. Two corpus passes total,
    * regardless of how many models score (the first cut trained each
    * model separately: measured 3 passes, ~1.3× slower end-to-end).
    * A bigram unseen in the target half takes the target OOV floor
    * via the same coalesce that covers join misses — exactly the
    * LEFT-JOIN-miss semantics the q107 oracle mirrors. Feed the
    * weight to [[graft.ops.Sampling.weightedSample]] for the
    * reproducible resampling draw (q107 composes the two).
    */
  def importanceWeights(docs: DataFrame, id: Column, text: Column,
                        isTarget: Column, roundTo: Int = 4): DataFrame = {
    // the exploded stream collapses IMMEDIATELY to per-doc bigram
    // counts — map-side combinable (a doc's bigrams sit in one
    // partition), and every downstream stage then works on distinct
    // (doc, bigram) rows (~50× fewer than occurrences): the model
    // trains from a re-aggregation of these counts and the broadcast
    // scoring join touches each doc-bigram once, with the mean taken
    // count-weighted (identical value; round absorbs the summation-
    // order ulps, the q01 convention)
    // persisted (round 19): bgc feeds the model-count branch AND the
    // scoring pass, and `counts` feeds the normalizer agg AND the
    // model projection — unpersisted, the corpus bigram explode
    // evaluated 3× in q107's executed plan (three concurrent ~1.9 s
    // jobs at sf0.1). bgc is distinct-(doc, bigram)-sized (~50× fewer
    // than occurrences), counts vocabulary-sized.
    val bgc = docs.select(id.as("doc_id"), isTarget.as("__t"),
        explode(charBigrams(text)).as("bg"))
      .groupBy(col("doc_id"), col("__t"), col("bg"))
      .agg(count(lit(1)).as("__n"))
      .persist()
    val counts = bgc.groupBy(col("bg")).agg(
      sum(col("__n")).as("__cr"),
      sum(when(col("__t"), col("__n"))).as("__ct"))
      .persist()
    // single row: both normalizers and both OOV floors
    val tots = counts.agg(
      sum(col("__cr")).as("__tr"), sum(col("__ct")).as("__tt"))
    val model = counts.crossJoin(broadcast(tots))
      .select(col("bg"),
        when(col("__ct") > 0,
          log(col("__ct").cast("double") / col("__tt").cast("double"))).as("__lt"),
        log(col("__cr").cast("double") / col("__tr").cast("double")).as("__lr"))
    val floors = tots.select(
      log(lit(0.5) / col("__tt").cast("double")).as("__ft"),
      log(lit(0.5) / col("__tr").cast("double")).as("__fr"))
    bgc.crossJoin(broadcast(floors))
      .join(broadcast(model), Seq("bg"), "left")
      .groupBy(col("doc_id"))
      .agg(
        round(sum(col("__n") * coalesce(col("__lt"), col("__ft"))) /
          sum(col("__n")), roundTo).as("lm_target"),
        round(sum(col("__n") * coalesce(col("__lr"), col("__fr"))) /
          sum(col("__n")), roundTo).as("lm_raw"))
      .select(col("doc_id"), col("lm_target"), col("lm_raw"),
        round(exp(col("lm_target") - col("lm_raw")), 6).as("weight"))
  }

  def lmScore(docs: DataFrame, id: Column, text: Column,
              model: DataFrame, roundTo: Int = 4): DataFrame = {
    // the OOV floor is one value for the whole model: single-row agg,
    // broadcast-crossed like the normalizer itself (q73 pattern)
    val floorRow = model.agg(
      log(lit(0.5) / max(col("__total")).cast("double")).as("__floor"))
    docs.select(id.as("doc_id"), explode(charBigrams(text)).as("bg"))
      .crossJoin(broadcast(floorRow))
      .join(broadcast(model.select(col("bg"), col("logp"))), Seq("bg"), "left")
      .groupBy(col("doc_id"))
      .agg(round(avg(coalesce(col("logp"), col("__floor"))), roundTo).as("lm_score"))
  }

  /** ⊕ Chunked LM profile: per-doc mean log-probability plus
    * BURSTINESS — the stddev of per-chunk mean log-prob across
    * fixed-size bigram windows within the doc. The GLTR/DetectGPT
    * family's observable heuristic for machine-generated text:
    * model-sampled text sits uniformly high-likelihood (low
    * burstiness), human text alternates predictable and surprising
    * stretches. Chunk means stay UNROUNDED into the doc fold —
    * rounding them first puts the doc average on a decimal grid whose
    * half-ties engines resolve differently (measured: 1.2% of rows
    * flipped at 4 dp) — and only the doc-level statistics round.
    * Single-chunk docs report burstiness 0 (no within-doc variation
    * evidence).
    *
    * Plan shape: [[lmScore]]'s — one posexplode to (doc, pos, bigram),
    * the tiny model broadcast onto it, then per-(doc, chunk) and
    * per-doc aggregations that both partially aggregate map-side. The
    * corpus never re-shuffles on content.
    */
  def lmBurstiness(docs: DataFrame, id: Column, text: Column,
                   model: DataFrame, chunkSize: Int = 50,
                   roundTo: Int = 4): DataFrame = {
    require(chunkSize > 0, s"lmBurstiness needs chunkSize > 0, got $chunkSize")
    val floorRow = model.agg(
      log(lit(0.5) / max(col("__total")).cast("double")).as("__floor"))
    val perChunk = docs
      .select(id.as("doc_id"), posexplode(charBigrams(text)).as(Seq("__p", "bg")))
      .select(col("doc_id"), floor(col("__p") / chunkSize).cast("int").as("__chunk"),
        col("bg"))
      .crossJoin(broadcast(floorRow))
      .join(broadcast(model.select(col("bg"), col("logp"))), Seq("bg"), "left")
      .groupBy(col("doc_id"), col("__chunk"))
      .agg(avg(coalesce(col("logp"), col("__floor"))).as("__clm"))
    perChunk.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        round(avg(col("__clm")), roundTo).as("lm_mean"),
        round(coalesce(stddev_samp(col("__clm")), lit(0.0)), roundTo)
          .as("burstiness"))
  }
}
