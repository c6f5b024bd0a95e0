package graft.streaming

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types._

/** ⊕ Structured Streaming surface over the events table (north star;
  * the reference itself has no streams — SURVEY.md §2.7 maps its
  * cooperative cancel/progress loops to job-group cancel + listeners).
  *
  * Batch/stream parity: these transforms take a DataFrame and work
  * identically on `spark.read` and `spark.readStream` inputs — the
  * batch forms are what q20 oracle-checks; the streaming forms add
  * watermarks for state eviction (without a watermark, windowed state
  * grows unboundedly at 100 TB/day event rates).
  */
object EventStream {

  /** events schema as ingested by the streaming reader (ts already a
    * proper timestamp; see Tables.events for the ns-parquet caveat).
    */
  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based streaming source over a directory of event parquet
    * (each new file = one micro-batch at scale).
    */
  def readStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** X14 full form: parse `props` into a typed struct with an explicit
    * schema (`from_json`) — unlike `get_json_object`, one parse serves
    * any number of fields, and the declared schema keeps the column
    * prunable/codegen-typed downstream.
    */
  val propsSchema: StructType = StructType(Seq(StructField("k", LongType)))

  def withParsedProps(events: DataFrame): DataFrame =
    events.withColumn("props_parsed",
      org.apache.spark.sql.functions.from_json(col("props"), propsSchema))

  /** Tumbling/sliding window counts with late-data watermark:
    * state for a window is dropped `lateness` after its end.
    */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     slide: Option[String] = None,
                     lateness: String = "30 minutes"): DataFrame = {
    val w = slide.fold(window(col("ts"), windowLen))(s => window(col("ts"), windowLen, s))
    events
      .withWatermark("ts", lateness)
      .groupBy(w, col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"), col("n"), col("sum_value"))
  }

  /** Exactly-once-per-id dedup within the watermark horizon
    * (`dropDuplicates` keeps per-key state only until the watermark
    * passes — bounded state, unlike an unbounded global distinct).
    */
  def dedupWithinWatermark(events: DataFrame, lateness: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", lateness).dropDuplicatesWithinWatermark("event_id")

  /** Session windows: events within `gap` of each other merge into one
    * session per user.
    */
  def sessionCounts(events: DataFrame, gap: String = "10 minutes",
                    lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap).as("session"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session.start").as("session_start"),
        col("session.end").as("session_end"), col("user_id"), col("n_events"), col("sum_value"))

  /** Stream-static enrichment join: each micro-batch broadcast-joins
    * the (small, slowly-changing) dimension — the streaming analog of
    * the J1 post→subreddit lookup. The dim side is re-read per batch
    * by Spark, so dimension updates are picked up without restarting
    * the query; no streaming state is kept for the join itself.
    */
  def enriched(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left_outer")

  /** Streaming near-exact dedup by content fingerprint within the
    * watermark horizon — the streaming form of the q30/q21 exact-dedup
    * path: state is one 32-byte md5 per distinct payload per horizon,
    * not the payload itself.
    */
  def dedupByFingerprint(docs: DataFrame, tsCol: String, textCol: String,
                         lateness: String = "30 minutes"): DataFrame =
    docs
      .withColumn("fp", graft.ext.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("fp")

  // --- streaming NEAR-dup: stateful banded simhash --------------------------

  case class SigInput(doc_id: Long, sig: Long)
  /** Per-bucket state: the (id, sig) pairs seen so far, parallel
    * arrays (product-encoded; one row per live band bucket).
    */
  case class BucketSigs(ids: Array[Long], sigs: Array[Long])
  case class NearDupPair(id_a: Long, id_b: Long, hamming: Int)

  /** ⊕ Streaming NEAR-dup pair detection — the incremental form of
    * [[graft.ext.Dedup.simhashNearDup]]: each document's 64-bit
    * simhash is split into the same 4×16-bit bands, rows are keyed by
    * (band, value), and a `flatMapGroupsWithState` bucket remembers
    * the signatures seen so far — an arriving document emits a pair
    * for every earlier same-bucket signature within `maxHamming`
    * bits. Complete for maxHamming ≤ 3 by the batch form's pigeonhole
    * argument, and each pair is emitted EXACTLY once via a second
    * stateful stage keyed by the pair itself: every band whose bucket
    * actually STORED the earlier signature emits a candidate, and the
    * pair-keyed stage passes only the first. (The earlier "lowest
    * colliding band emits" rule broke under cap pressure — if the
    * lowest colliding band's bucket was full when the earlier sig
    * arrived, no band emitted at all; deciding the emitting band
    * locally from the two sigs cannot know which buckets stored
    * them.) The pair stage also absorbs source re-deliveries of a
    * doc_id, which would otherwise re-emit its pairs.
    *
    * State/scale shape: per-bucket state is the distinct signature
    * list, capped at `maxPerBucket` (the streaming mirror of the
    * batch `maxBucket` skew backstop — an overflowing boilerplate
    * bucket stops absorbing new signatures instead of growing without
    * bound; a pair whose signatures were stored in NO shared bucket
    * is still missed — that is the cap's documented trade). Pair-
    * stage state is one boolean per emitted pair — proportional to
    * the output, the same order as the buckets already hold. Within a
    * micro-batch, rows process in doc-id order, so replays are
    * deterministic. Like [[errorAlerts]] this keeps NoTimeout state
    * for the test horizon; a production deployment bounds the horizon
    * with a timeout eviction, accepting misses beyond it (the same
    * trade [[dedupByFingerprint]] makes via its watermark).
    */
  def nearDupPairsStream(docs: DataFrame, idCol: String, textCol: String,
                         maxHamming: Int = 3, maxPerBucket: Int = 10000)
      : org.apache.spark.sql.Dataset[NearDupPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    def bandOf(sig: Long, b: Int): Long = (sig >>> (16 * b)) & 0xffffL
    val candidates = docs
      .select(col(idCol).cast("long").as("doc_id"),
        graft.functions.SimHash64.simhash64(
          graft.ext.Dedup.shingles(col(textCol), 3)).as("sig"))
      .as[SigInput]
      .flatMap(r => (0 until 4).map(b => (b, bandOf(r.sig, b), r.doc_id, r.sig)))
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (key: (Int, Long), rows: Iterator[(Int, Long, Long, Long)],
         state: GroupState[BucketSigs]) =>
          val st = state.getOption.getOrElse(BucketSigs(Array.empty, Array.empty))
          var ids = st.ids; var sigs = st.sigs
          val out = scala.collection.mutable.ArrayBuffer[NearDupPair]()
          rows.toArray.sortBy(_._3).foreach { case (_, _, id, sig) =>
            // every STORED earlier sig within maxHamming emits a
            // candidate — cross-band duplicates are resolved by the
            // pair-keyed stage below, so no local band arbitration
            var i = 0
            while (i < ids.length) {
              if (ids(i) != id) {
                val h = java.lang.Long.bitCount(sigs(i) ^ sig)
                if (h <= maxHamming) {
                  val (a, bId) = if (ids(i) < id) (ids(i), id) else (id, ids(i))
                  out += NearDupPair(a, bId, h)
                }
              }
              i += 1
            }
            if (ids.length < maxPerBucket && !ids.contains(id)) {
              ids = ids :+ id; sigs = sigs :+ sig
            }
          }
          state.update(BucketSigs(ids, sigs))
          out.iterator
      }
    candidates
      .groupByKey(p => (p.id_a, p.id_b))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (_: (Long, Long), rows: Iterator[NearDupPair],
         state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); rows.take(1) }
      }
  }

  // --- streaming ingestion quota: per-source token budget ------------------

  case class QuotaDoc(doc_id: Long, source: String, n_tokens: Long)
  case class QuotaState(used: Long)

  /** ⊕ Streaming per-source ingestion quota — the incremental form of
    * the mixture/budget gate ([[graft.ops.Sampling.mixtureSample]] /
    * `packShards`' budget): each source admits documents until its
    * cumulative token count reaches `quotaTokens`, across micro-
    * batches, with the admitting doc allowed to straddle the boundary
    * (the `packShards` overflow-by-one convention — a budget is a
    * target, not a truncation point). State per source is ONE long.
    * Within a micro-batch rows admit in doc-id order, so replays are
    * deterministic. The "stop reading from source X once its budget
    * is spent" control a continuously-ingesting training pipeline
    * needs — expressible only as cross-batch state, which is why it
    * lives here and not in the batch Sampling module.
    */
  def quotaSampleStream(docs: DataFrame, quotaTokens: Long)
      : org.apache.spark.sql.Dataset[QuotaDoc] = {
    require(quotaTokens > 0, s"quotaTokens must be positive, got $quotaTokens")
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), col("source"),
        col("n_tokens").cast("long")).as[QuotaDoc]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[QuotaDoc], state: GroupState[QuotaState]) =>
          var used = state.getOption.getOrElse(QuotaState(0L)).used
          val out = Vector.newBuilder[QuotaDoc]
          rows.toArray.sortBy(_.doc_id).foreach { r =>
            if (used < quotaTokens) { used += r.n_tokens; out += r }
          }
          state.update(QuotaState(used))
          out.result().iterator
      }
  }

  // --- streaming corpus-wide paragraph dedup ------------------------------

  case class ParaRow(doc_id: Long, p: Int, t: String, h: String)
  case class ParaOut(doc_id: Long, p: Int, t: String, kept: Boolean)

  /** ⊕ Streaming corpus-wide paragraph dedup — the incremental form of
    * [[graft.ext.TextAnalysis.dedupParagraphsIncremental]] (q199, the
    * RefinedWeb rule) as a stream: the batch form's history seen-set
    * IS per-hash streaming state. Arriving documents explode to
    * paragraphs keyed by content md5; a `flatMapGroupsWithState`
    * bucket per hash remembers whether the paragraph was ever seen —
    * an arriving paragraph survives iff its hash is new AND it is the
    * (doc_id, p)-minimal occurrence in its micro-batch (the same
    * lexicographic first-occurrence rule as the batch min-struct
    * aggregation, so batch ≡ streaming whenever micro-batch arrival
    * respects the append-only id order — StreamingSpec proves the
    * fold). Every paragraph row is emitted with its verdict so the
    * per-document rebuild ([[rebuildParagraphDocs]], the foreachBatch
    * step — a document's paragraphs ride one input row, hence one
    * micro-batch) can reassemble `text_clean` and count survivors.
    *
    * State/scale shape: ONE BOOLEAN per distinct paragraph hash —
    * exactly the anti-join seen-set the batch incremental form
    * carries, sharded by the hash key. NoTimeout for the test horizon
    * (the [[nearDupPairsStream]] trade); a deployment bounds history
    * with timeout eviction, accepting re-admitted paragraphs older
    * than the horizon — the same trade the batch form makes when it
    * compacts its history table.
    */
  def dedupParagraphsStream(docs: DataFrame, idCol: String, textCol: String,
                            sep: String = "\n")
      : org.apache.spark.sql.Dataset[ParaOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), sep)).as(Seq("p", "t")))
      .select(col("doc_id"), col("p").cast("int").as("p"), col("t"),
        md5(col("t")).as("h"))
      .as[ParaRow]
      .groupByKey(_.h)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[ParaRow], state: GroupState[Boolean]) =>
          val sorted = rows.toArray.sortBy(r => (r.doc_id, r.p))
          val already = state.getOption.getOrElse(false)
          if (!already) state.update(true)
          sorted.iterator.zipWithIndex.map { case (r, i) =>
            ParaOut(r.doc_id, r.p, r.t, kept = !already && i == 0)
          }
      }
  }

  /** Per-paragraph-hash seen-state as a [[StatefulProcessor]] — the
    * `transformWithState` form of [[dedupParagraphsStream]]'s
    * flatMapGroupsWithState bucket, with the PRODUCTION history bound
    * made explicit: `ttl` configures state TTL (RocksDB-evicted), so
    * a paragraph unseen for longer than the horizon is re-admitted —
    * exactly the trade the batch incremental form makes when it
    * compacts its history table, now enforced by the store instead of
    * a compaction job. `TTLConfig.NONE` = unbounded ≡ the
    * flatMapGroupsWithState form (StreamingSpec proves the fold).
    */
  class ParaSeenProcessor extends StatefulProcessor[String, ParaRow, ParaOut] {
    @transient private var seen: ValueState[Boolean] = _
    private var ttl: TTLConfig = TTLConfig.NONE
    def this(ttlMs: Long) = { this(); ttl = TTLConfig(java.time.Duration.ofMillis(ttlMs)) }
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Boolean]("seen",
        org.apache.spark.sql.Encoders.scalaBoolean, ttl)
    override def handleInputRows(h: String, rows: Iterator[ParaRow],
                                 timerValues: TimerValues): Iterator[ParaOut] = {
      val sorted = rows.toArray.sortBy(r => (r.doc_id, r.p))
      val already = seen.exists() && seen.get()
      if (!already) seen.update(true)
      sorted.iterator.zipWithIndex.map { case (r, i) =>
        ParaOut(r.doc_id, r.p, r.t, kept = !already && i == 0)
      }
    }
  }

  /** [[dedupParagraphsStream]] on the Spark 4 `transformWithState`
    * surface with an optional TTL history bound (see
    * [[ParaSeenProcessor]]). `ttlMs = None` ≡ the
    * flatMapGroupsWithState form and runs in `TimeMode.None` (no
    * timers, no extra batches). A TTL bound REQUIRES
    * `TimeMode.ProcessingTime`, and in that mode Spark's
    * `TransformWithStateExec.shouldRunAnotherBatch` is always true —
    * under the default hot trigger the query constructs no-data
    * micro-batches back-to-back forever (observed: checkpoint-rename
    * churn saturating a core). So the TTL form must be driven by a
    * real trigger: `Trigger.ProcessingTime(interval)` in a long-lived
    * deployment, or `Trigger.AvailableNow` for the
    * run-compact-rerun shape (state persists in the checkpoint across
    * runs; expired hashes re-admit on the next run — the same trade
    * the batch incremental form makes when it compacts its history
    * table).
    */
  def dedupParagraphsStreamV2(docs: DataFrame, idCol: String, textCol: String,
                              sep: String = "\n", ttlMs: Option[Long] = None)
      : org.apache.spark.sql.Dataset[ParaOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val proc = ttlMs.fold(new ParaSeenProcessor)(ms => new ParaSeenProcessor(ms))
    val timeMode = if (ttlMs.isDefined) TimeMode.ProcessingTime() else TimeMode.None()
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(split(col(textCol), sep)).as(Seq("p", "t")))
      .select(col("doc_id"), col("p").cast("int").as("p"), col("t"),
        md5(col("t")).as("h"))
      .as[ParaRow]
      .groupByKey(_.h)
      .transformWithState(proc, timeMode, OutputMode.Append())
  }

  /** Per-document reassembly of [[dedupParagraphsStream]] output — the
    * foreachBatch step (plain batch aggregation; a doc's paragraphs
    * share its micro-batch by construction). Output schema matches
    * the batch form: (doc_id, n_paras, n_kept, text_clean).
    */
  def rebuildParagraphDocs(batch: DataFrame, sep: String = "\n"): DataFrame =
    batch.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_paras"),
        sum(when(col("kept"), 1L).otherwise(0L)).cast("int").as("n_kept"),
        array_join(transform(array_sort(collect_list(
            when(col("kept"), struct(col("p"), col("t"))))),
          s => s.getField("t")), sep).as("text_clean"))

  // --- streaming curation: the composed MassiveText screen stack ----------

  case class CurateDoc(doc_id: Long, source: String, text: String,
                       n_tokens: Int, quality: Double, topic: String,
                       fp: String)
  case class BandIn(band_idx: Int, band_key: String, doc_id: Long,
                    sh: Array[String], payload: Option[CurateDoc])
  case class BandVerdict(doc_id: Long, hit: Boolean,
                         payload: Option[CurateDoc])
  /** Per-band-bucket near-dup state: ids + shingle sets of the docs
    * stored so far — the streaming mirror of the batch pipeline
    * carrying `sh` through the ONE band shuffle.
    */
  case class BucketDocs(ids: Array[Long], shs: Array[Array[String]])

  /** ⊕ STREAMING curation — [[graft.ext.Curation.curate]]'s composed
    * MassiveText screen stack (q240's batch form) as one streaming
    * pipeline, same gate ORDER and same semantics per stage:
    *
    *  1. row-local gates — byte-shared with batch via
    *     [[graft.ext.Curation.rowStages]] (stateless projection +
    *     filters, valid verbatim on a streaming DataFrame);
    *  2. Gopher repetition gate — the row-local typed twin
    *     [[graft.ext.TextAnalysis.repetitionPassesLocal]] (per-doc
    *     verdict; parity with the batch explode/agg form is a tested
    *     contract in TextAnalysisSpec);
    *  3. exact dedup — first-wins per content fingerprint, ONE boolean
    *     of state per distinct fp (the batch min-id-per-fp rule under
    *     the append-only id-order arrival convention);
    *  4. near-dup removal — the SAME MinHash banding columns as batch
    *     ([[graft.ext.Dedup.shingles]]/`minhash_sig`/`bandKeys`, so
    *     LSH candidate generation is identical by construction), with
    *     a per-bucket state of stored (id, shingle-set) pairs: an
    *     arriving doc is DROPPED iff some stored earlier (lower-id)
    *     doc in a shared band bucket has exact Jaccard ≥ threshold
    *     after the batch form's round-to-4dp — the same greedy
    *     drop-against-any-lower-id rule. Docs with empty shingle sets
    *     (null signature) ride a solo bucket and are always kept,
    *     matching the batch null-key filter.
    *
    * Batch ≡ streaming whenever (a) micro-batch arrival respects the
    * append-only doc-id order (the [[dedupParagraphsStream]]
    * convention — within a batch rows process in id order, so only
    * CROSS-batch order matters) and (b) no band bucket overflows
    * `maxPerBucket` (the batch `maxBucket` skew backstop's streaming
    * mirror; an overflowing boilerplate bucket stops absorbing new
    * signatures — the [[nearDupPairsStream]] trade). StreamingSpec
    * proves row-identity against the batch `curate` on the planted
    * q240-style fixture, split across micro-batches.
    *
    * State/scale shape: stage 3 is one boolean per distinct
    * fingerprint; stage 4 buckets hold ids + shingle sets capped at
    * `maxPerBucket` per bucket and one boolean per doc for the
    * verdict join — all sharded by their group keys, nothing
    * corpus-sized in one place. NoTimeout for the test horizon; a
    * deployment bounds history with timeout eviction, accepting
    * re-admitted duplicates older than the horizon (the same trade
    * the batch form makes when it compacts its history).
    */
  def curateStream(docs: DataFrame, id: Column, source: Column, text: Column,
                   p: graft.ext.Curation.Params,
                   maxPerBucket: Int = 10000)
      : org.apache.spark.sql.Dataset[CurateDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the SAME banding geometry the batch pipeline derives from the
    // Params (fixed 8×2, or the recall contract via bandingForRecall)
    val (numHashes, rowsPerBand) = p.bandGeometry
    val rowGated = graft.ext.Curation.rowStages(docs, id, source, text, p)
      .select(col("doc_id").cast("long").as("doc_id"), col("source"),
        col("text"), col("n_tokens").cast("int").as("n_tokens"),
        col("quality").cast("double").as("quality"), col("topic"), col("fp"))
      .as[CurateDoc]
    val gated =
      if (!p.repetitionGate) rowGated
      else rowGated.filter(d =>
        graft.ext.TextAnalysis.repetitionPassesLocal(d.text))
    // stage 3: exact dedup — first fp occurrence wins (id-min in-batch)
    val exact = gated.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (_: String, rows: Iterator[CurateDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); Iterator.single(rows.minBy(_.doc_id)) }
      }
    // stage 4: the batch banding columns, then stateful bucket compare
    val banded = exact.toDF()
      .withColumn("__sh", graft.ext.Dedup.shingles(col("text"), 3))
      .withColumn("__sig",
        graft.functions.MinHashSig.minhash_sig(col("__sh"), numHashes))
      .withColumn("__bands",
        when(col("__sig").isNull,
          array(struct(lit(-1).as("band_idx"),
            concat(lit("solo:"), col("doc_id")).as("band_key"))))
          .otherwise(graft.ext.Dedup.bandKeys(col("__sig"), numHashes, rowsPerBand)))
      .select(col("doc_id"), col("source"), col("text"), col("n_tokens"),
        col("quality"), col("topic"), col("fp"), col("__sh"),
        explode(col("__bands")).as("__b"))
      .select(
        col("__b.band_idx").as("band_idx"),
        col("__b.band_key").as("band_key"),
        col("doc_id"),
        col("__sh").as("sh"),
        when(col("__b.band_idx") <= 0,
          struct(col("doc_id"), col("source"), col("text"), col("n_tokens"),
            col("quality"), col("topic"), col("fp")))
          .otherwise(lit(null)).as("payload"))
      .as[BandIn]
    val verdicts = banded.groupByKey(r => (r.band_idx, r.band_key))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (_: (Int, String), rows: Iterator[BandIn],
         state: GroupState[BucketDocs]) =>
          val st = state.getOption.getOrElse(
            BucketDocs(Array.empty, Array.empty))
          var ids = st.ids; var shs = st.shs
          val out = scala.collection.mutable.ArrayBuffer[BandVerdict]()
          rows.toArray.sortBy(_.doc_id).foreach { r =>
            val mySh = r.sh.toSet
            var hit = false
            var i = 0
            while (i < ids.length && !hit) {
              if (ids(i) != r.doc_id) {
                val other = shs(i)
                val inter = other.count(mySh.contains)
                val union = mySh.size + other.length - inter
                if (union > 0) {
                  // the batch verify: round(jaccard, 4) >= threshold
                  val j4 = java.math.BigDecimal
                    .valueOf(inter.toDouble / union)
                    .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
                  if (j4 >= p.jaccard) hit = true
                }
              }
              i += 1
            }
            out += BandVerdict(r.doc_id, hit, r.payload)
            if (ids.length < maxPerBucket && !ids.contains(r.doc_id)) {
              ids = ids :+ r.doc_id; shs = shs :+ r.sh
            }
          }
          state.update(BucketDocs(ids, shs))
          out.iterator
      }
    // verdict join: a doc's band rows share its micro-batch; kept iff
    // NO band reported a lower-id near-match. One boolean of state
    // per doc absorbs source re-deliveries.
    verdicts.groupByKey(_.doc_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[BandVerdict], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            val rs = rows.toArray
            if (rs.exists(_.hit)) Iterator.empty
            else rs.flatMap(_.payload).headOption.iterator
          }
      }
  }

  // --- streaming funnel: per-user step progression ------------------------

  case class FunnelEvent(user_id: Long, ts: java.sql.Timestamp, event_type: String)
  /** Per-user progression: entry-anchor micros, previous-step micros,
    * steps completed so far (0 = not entered).
    */
  case class FunnelState(t1: Long, tp: Long, step: Int)
  case class FunnelAdvance(user_id: Long, step_idx: Int, step_name: String,
                           ts: java.sql.Timestamp)

  /** ⊕ Streaming eval decontamination — q211's trigram contamination
    * screen ([[graft.ext.Dedup.contaminationPairs]]) as a
    * STREAM-STATIC join, the last batch-only screen a
    * continuously-ingesting pipeline wants streamed: arriving
    * documents (the would-be training side) are checked against the
    * STATIC protected eval set before they ever land in a training
    * shard.
    *
    * Plan shape: the eval posting (test_id, n_test_shingles, sh) is
    * derived once from the static side and broadcast per micro-batch
    * (the [[enriched]] stream-static convention — eval sets are
    * small and slowly-changing, re-read per batch so benchmark
    * updates apply without a restart); each arriving doc explodes to
    * its distinct k-shingles, inner-joins the posting, and one
    * watermark-windowed aggregation counts |S_train ∩ S_test| per
    * (train, test) pair — every shingle of a doc carries the doc's
    * own event time, so a pair's count closes as soon as the
    * watermark passes its window (bounded state, append output).
    *
    * Output rows match the batch form: (test_id, train_id,
    * n_overlap, overlap_frac) with the same `minOverlap` cut and the
    * same tie-free [[graft.ops.Exact.ratio]] fraction — batch ≡
    * streaming on any prefix of the stream EXCEPT that the batch
    * form's train-side document-frequency cap (`maxDocsPerShingle`,
    * an offline skew guard over the whole train corpus) is not
    * computable online and is omitted: below the cap the two are
    * row-identical (StreamingSpec proves it on the fixture corpus).
    */
  def contaminationPairsStream(docs: DataFrame, evalSet: DataFrame,
                               tsCol: String, idCol: String, textCol: String,
                               evalId: Column, evalText: Column,
                               k: Int = 3, minOverlap: Int = 3,
                               lateness: String = "10 minutes",
                               windowLen: String = "1 minute"): DataFrame = {
    val posting = evalSet
      .select(evalId.as("test_id"), graft.ext.Dedup.shingles(evalText, k).as("__shs"))
      .filter(size(col("__shs")) > 0)
      .select(col("test_id"), size(col("__shs")).as("n_test_shingles"),
        explode(col("__shs")).as("sh"))
    val trainSh = docs
      .select(col(tsCol).as("__ts"), col(idCol).cast("long").as("train_id"),
        explode(graft.ext.Dedup.shingles(col(textCol), k)).as("sh"))
    trainSh
      .withWatermark("__ts", lateness)
      .join(broadcast(posting), "sh")
      .groupBy(window(col("__ts"), windowLen),
        col("test_id"), col("train_id"), col("n_test_shingles"))
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
      .select(col("test_id"), col("train_id"), col("n_overlap"),
        graft.ops.Exact.ratio(col("n_overlap"), col("n_test_shingles"), 4)
          .as("overlap_frac"))
  }

  /** ⊕ Streaming PCA projection/residual screen — the q246 readout
    * on a LIVE ingest: the offline-fitted single-row
    * [[graft.ext.Spectral.fitState]] (mean + component) broadcasts
    * onto each micro-batch, and scoring is the stateless row-local
    * center/project/residual pass BYTE-SHARED with the batch form
    * ([[graft.ext.Spectral.projectWith]] — this method pins the
    * streaming contract; the arithmetic lives once). No watermark, no
    * state: every arriving vector scores independently, append
    * output — the shape a continuously-ingesting embedding pipeline
    * wants its off-manifold alarm in. Batch ≡ streaming is structural
    * here and StreamingSpec still proves it across micro-batches.
    */
  def pcaProjectStream(vectors: DataFrame, id: Column, vec: Column,
                       fitted: DataFrame, roundTo: Int = 4): DataFrame =
    graft.ext.Spectral.projectWith(vectors, id, vec, fitted, roundTo)

  /** ⊕ Streaming embedding-classifier screen — q259's trained dense
    * LR on a LIVE ingest: fit offline on the annotated sample
    * ([[graft.ext.Classify.denseLogisticFit]]), hand the literal
    * nano-unit weights to the stream, and every arriving vector
    * scores as one row-local integer fold
    * ([[graft.ext.Classify.denseLogisticScore]] — byte-shared with
    * batch; no state, no watermark, no join, append output). The
    * published row is transcendental-free (exact integer margin,
    * pred = margin ≥ 0), so batch ≡ streaming is structural — and
    * StreamingSpec still proves it across micro-batches, the
    * [[pcaProjectStream]] stance.
    */
  def denseLogisticScoreStream(vectors: DataFrame, id: Column, vec: Column,
                               model: graft.ext.Classify.DenseLrModel): DataFrame =
    graft.ext.Classify.denseLogisticScore(model, vectors, id, vec)

  /** ⊕ Streaming classifier-gated cut — q260's curation composition
    * on a LIVE ingest ([[curateStream]]'s stance for the trained
    * gate): the tercile boundary is a CORPUS statistic, so it is
    * computed OFFLINE on the static corpus (recomputing it per
    * micro-batch would make the gate drift with arrival order — the
    * same reason the fit is offline) and handed to the stream as a
    * literal; each arriving vector then scores and gates row-locally
    * (exact integer margin vs the literal threshold — no state, no
    * watermark, no join, append output). Batch ≡ streaming is
    * structural and StreamingSpec proves it across micro-batches.
    */
  def classifierCutStream(vectors: DataFrame, id: Column, vec: Column,
                          model: graft.ext.Classify.DenseLrModel,
                          thresholdUnits: Double): DataFrame =
    graft.ext.Classify.denseLogisticScore(model, vectors, id, vec)
      .filter(col("margin_units") >= lit(thresholdUnits))

  case class DecimIn(id: Long, nv: Array[Double], cluster: Int)
  /** Per-cluster state: every footprint SEEN so far (kept or dropped —
    * the batch one-shot rule compares j against all earlier i, not
    * just survivors), parallel arrays, capped at `maxPerCluster`;
    * `overflowIds` records ids seen AFTER the cap (id only, no
    * footprint) so an at-least-once re-delivery of a beyond-cap row
    * cannot re-emit it — 8 bytes per overflow row, the same
    * output-proportional state order as [[nearDupPairsStream]]'s pair
    * stage.
    */
  case class ClusterSeen(ids: Array[Long], nvs: Array[Array[Double]],
                         overflowIds: Array[Long])
  case class DecimKeep(vec_id: Long, cluster: Int)

  /** ⊕ Streaming spectral decimation — the q253 composition on a LIVE
    * ingest, completing the family's batch/streaming symmetry
    * ([[curateStream]] / [[pcaProjectStream]] are the other twins).
    * Deployment shape: fit OFFLINE (the sample-sized
    * [[graft.ext.Spectral.fitStateSized]] at corpus scale — q257's
    * path — plus one [[graft.ext.Similarity.ivfFit]] over the static
    * corpus's footprints), then hand BOTH models to the stream. Each
    * arriving vector scores row-locally against the broadcast (mu, pc)
    * state ([[graft.ext.Spectral.projectWith]] — byte-shared with
    * batch), folds to its 2-d [proj, √resid] footprint, normalizes and
    * assigns to its nearest literal centroid
    * ([[graft.ext.Similarity.assignToCentroids]] — row-local, no
    * shuffle), and a per-cluster `flatMapGroupsWithState` emits it iff
    * no EARLIER-SEEN same-cluster footprint sits within the tau-ball
    * (cosine rounded at `roundTo`, the exact batch comparison: Spark's
    * HALF_UP `round`). Under id-ordered arrival this reproduces the
    * batch [[graft.ext.Similarity.semDedup]] one-shot min-id rule
    * exactly — StreamingSpec proves stream ≡ batch on the same corpus.
    *
    * State/scale shape: per-cluster state is the seen-footprint list
    * (2-d vectors — 16 bytes each), capped at `maxPerCluster`, the
    * streaming mirror of the batch `maxCluster` backstop with the
    * DOCUMENTED divergence: the batch form keeps above-cap clusters
    * intact (skips pair generation), while the stream keeps comparing
    * late arrivals against the stored prefix — it cannot know a
    * cluster's final size. NoTimeout state for the test horizon (the
    * [[nearDupPairsStream]] trade); a deployment evicts idle clusters
    * by timeout, accepting re-admitted footprint classes beyond it.
    */
  def spectralDecimateStream(vectors: DataFrame, id: Column, vec: Column,
                             fitted: DataFrame,
                             model: graft.ext.Similarity.IvfModel,
                             tau: Double, roundTo: Int = 4,
                             maxPerCluster: Int = 10000)
      : org.apache.spark.sql.Dataset[DecimKeep] = {
    val spark = vectors.sparkSession
    import spark.implicits._
    require(roundTo >= 0, "roundTo must be non-negative")
    // Spark's round() is BigDecimal HALF_UP — the state-side compare
    // must use the identical rounding or stream and batch disagree on
    // exact-tau boundaries.
    def roundAt(x: Double): Double =
      BigDecimal(x).setScale(roundTo, BigDecimal.RoundingMode.HALF_UP).toDouble
    val fp = graft.ext.Spectral.projectWith(vectors, id, vec, fitted, roundTo)
      .select(col("id"), array(col("proj"), sqrt(col("resid_sq"))).as("w"))
    val assigned = graft.ext.Similarity
      .assignToCentroids(model, fp, col("id"), col("w"))
      .select(col("id").cast("long").as("id"),
        col("nv").cast("array<double>").as("nv"),
        col("cluster").cast("int").as("cluster"))
      .as[DecimIn]
    assigned.groupByKey(_.cluster)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (cluster: Int, rows: Iterator[DecimIn], state: GroupState[ClusterSeen]) =>
          val st = state.getOption.getOrElse(
            ClusterSeen(Array.empty, Array.empty, Array.empty))
          val ids = scala.collection.mutable.ArrayBuffer.empty[Long] ++ st.ids
          val nvs = scala.collection.mutable.ArrayBuffer
            .empty[Array[Double]] ++ st.nvs
          val over = scala.collection.mutable.ArrayBuffer
            .empty[Long] ++ st.overflowIds
          // O(1) re-delivery membership: one O(stored) set build per
          // group invocation instead of a linear Array.contains per
          // arriving row (the state schema stays flat arrays — the
          // set is rebuilt, never encoded)
          val seen = scala.collection.mutable.HashSet.empty[Long]
          seen ++= ids; seen ++= over
          val out = scala.collection.mutable.ArrayBuffer[DecimKeep]()
          rows.toArray.sortBy(_.id).foreach { r =>
            var dup = false
            var i = 0
            while (i < ids.length && !dup) {
              if (ids(i) != r.id) {
                var d = 0.0
                var j = 0
                while (j < r.nv.length) { d += nvs(i)(j) * r.nv(j); j += 1 }
                dup = roundAt(d) >= tau
              }
              i += 1
            }
            // a re-delivered id is neither re-emitted nor re-stored —
            // including one that arrived AFTER the cap and so was never
            // stored with its footprint (overflowIds remembers it)
            val seenSelf = seen.contains(r.id)
            if (!dup && !seenSelf) out += DecimKeep(r.id, cluster)
            if (!seenSelf) {
              seen += r.id
              if (ids.length < maxPerCluster) {
                ids += r.id; nvs += r.nv
              } else over += r.id
            }
          }
          state.update(ClusterSeen(ids.toArray, nvs.toArray, over.toArray))
          out.iterator
      }
  }

  /** ⊕ Streaming funnel progression — the incremental form of
    * [[graft.ops.Funnel.funnelSteps]]: per-user state is the same two
    * timestamps the batch form carries (entry anchor + previous step)
    * plus the step counter, and an arriving event advances the user
    * to step k+1 iff it is the next step's type, strictly after the
    * previous step, and within `horizonSec` of entry. Emits one
    * [[FunnelAdvance]] row per step a user completes — the running
    * conversion log a dashboard folds into q127's curve (grouping
    * emitted rows by step_idx reproduces the batch counts, which is
    * exactly what StreamingSpec asserts).
    *
    * Within a micro-batch, events process in (ts, event_type) order;
    * state per user is three scalars regardless of event volume —
    * the same power-user bound as the batch form. NoTimeout state
    * for the test horizon (the [[nearDupPairsStream]] trade); a
    * deployment evicts users whose entry anchor has aged past the
    * horizon, after which no further advance is possible anyway.
    */
  def funnelStream(events: DataFrame, steps: Seq[String], horizonSec: Long)
      : org.apache.spark.sql.Dataset[FunnelAdvance] = {
    require(steps.nonEmpty, "funnelStream needs at least one step")
    require(steps.distinct.size == steps.size,
      "funnelStream steps must be distinct (a repeated type is ambiguous " +
        "for the per-event step lookup); use the batch form for repeated-step funnels")
    val spark = events.sparkSession
    import spark.implicits._
    val stepIdx = steps.zipWithIndex.toMap
    events.select(col("user_id").cast("long"), col("ts"), col("event_type"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0L, 0L, 0))
          val out = Vector.newBuilder[FunnelAdvance]
          // only steps can advance state; (ts, type) order makes the
          // batch deterministic under same-ts ties
          rows.toArray.filter(e => stepIdx.contains(e.event_type))
            .sortBy(e => (e.ts.getTime, e.event_type)).foreach { e =>
              if (st.step < steps.length) {
                val micros = e.ts.getTime * 1000L
                val isNext = stepIdx(e.event_type) == st.step
                val inOrder = st.step == 0 || micros > st.tp
                val inHorizon = st.step == 0 ||
                  micros <= st.t1 + horizonSec * 1000000L
                if (isNext && inOrder && inHorizon) {
                  val anchor = if (st.step == 0) micros else st.t1
                  st = FunnelState(anchor, micros, st.step + 1)
                  out += FunnelAdvance(user, st.step, e.event_type, e.ts)
                }
              }
            }
          state.update(st)
          out.result().iterator
      }
  }

  // --- streaming attribution: per-user last touch -------------------------

  case class TouchEvent(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
                        event_type: String, value: Double)
  /** The whole per-user carry: last touch type + its micros. */
  case class TouchState(ltype: String, lts: Long)
  case class AttributionHit(user_id: Long, event_id: Long,
                            ts: java.sql.Timestamp, channel: String,
                            value: Double)

  /** ⊕ Streaming last-touch attribution — the incremental form of
    * [[graft.ops.Funnel.lastTouchAttribution]]: per-user state is ONE
    * (touch type, timestamp) pair; a conversion event credits that
    * touch if it landed within `lookbackSec` (inclusive, the batch
    * boundary rule), else `direct`, and emits one [[AttributionHit]].
    * Folding emitted hits by channel reproduces the batch readout —
    * counts and value sums — which is what StreamingSpec asserts.
    *
    * Within a micro-batch, events process in (ts, event_id) order —
    * the batch form's window order — so a same-timestamp touch with
    * the lower id credits the conversion in both forms. State never
    * grows with event volume (the [[funnelStream]] bound); NoTimeout
    * for the test horizon, a deployment evicts users whose last touch
    * has aged past the lookback (after which only `direct` is
    * possible anyway).
    */
  def attributionStream(events: DataFrame, touchTypes: Seq[String],
                        convType: String, lookbackSec: Long)
      : org.apache.spark.sql.Dataset[AttributionHit] = {
    require(touchTypes.nonEmpty, "attributionStream needs at least one touch type")
    require(!touchTypes.contains(convType),
      "the conversion type cannot also be a touch (a self-crediting " +
        "conversion is ambiguous); use the batch form to model that explicitly")
    val spark = events.sparkSession
    import spark.implicits._
    val touch = touchTypes.toSet
    events.select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("ts"), col("event_type"), col("value").cast("double"))
      .as[TouchEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[TouchEvent], state: GroupState[TouchState]) =>
          var st = state.getOption.orNull
          val out = Vector.newBuilder[AttributionHit]
          rows.toArray.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
            if (touch(e.event_type)) {
              st = TouchState(e.event_type, e.ts.getTime)
            } else if (e.event_type == convType) {
              val ch =
                if (st != null && st.lts >= e.ts.getTime - lookbackSec * 1000L)
                  st.ltype
                else "direct"
              out += AttributionHit(user, e.event_id, e.ts, ch, e.value)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** ⊕ Stream-stream interval join — the streaming analog of the batch
    * banded range join ([[graft.ops.AsOf.rangePairsBackward]] / q65):
    * each error pairs with same-user clicks from the preceding
    * `windowSec` seconds. Both inputs carry watermarks and the join
    * condition bounds event time on BOTH sides, so Spark can evict
    * buffered rows once the watermark passes — state stays bounded at
    * any input rate (an unbounded-time stream-stream join would
    * buffer forever). Append-mode output; matches emit once both
    * watermarks clear the pair.
    */
  def errorsWithRecentClicks(errors: DataFrame, clicks: DataFrame,
                             windowSec: Long = 600,
                             lateness: String = "30 minutes"): DataFrame = {
    val e = errors
      .select(col("event_id").as("error_id"), col("user_id"), col("ts").as("error_ts"))
      .withWatermark("error_ts", lateness)
    val c = clicks
      .select(col("event_id").as("click_id"), col("user_id").as("click_user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", lateness)
    e.join(c,
        col("user_id") === col("click_user_id") &&
        col("click_ts") >= col("error_ts") - expr(s"INTERVAL $windowSec SECOND") &&
        col("click_ts") < col("error_ts"))
      .select(col("error_id"), col("user_id"), col("error_ts"),
        col("click_id"), col("click_ts"))
  }

  // --- custom state: running per-user anomaly counter -----------------------

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class UserErrorState(errors: Long)
  case class ErrorAlert(user_id: Long, total_errors: Long)

  /** `flatMapGroupsWithState` example (SURVEY.md §2.7 ⊕): emit an
    * alert each time a user's cumulative `error` count crosses a
    * multiple of `every`. Custom state the built-in windows can't
    * express: monotone cross-batch counters with on-change emission.
    */
  def errorAlerts(events: org.apache.spark.sql.Dataset[Event], every: Long = 3)
      : org.apache.spark.sql.Dataset[ErrorAlert] = {
    import events.sparkSession.implicits._
    events
      .filter(col("event_type") === "error")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserErrorState]) =>
          val prev = state.getOption.getOrElse(UserErrorState(0L)).errors
          val next = prev + batch.size
          state.update(UserErrorState(next))
          // one alert per crossed multiple of `every`
          ((prev / every + 1) to (next / every)).map(k => ErrorAlert(userId, k * every)).iterator
      }
  }

  /** [[errorAlerts]] on the Spark 4 arbitrary-state API v2
    * (`transformWithState` + `StatefulProcessor`): same on-change
    * semantics, state as a named typed `ValueState` cell. The v2 API
    * requires the RocksDB state store provider — the store you would
    * run at 100 TB state anyway (HDFS-backed keeps all state on heap);
    * it also adds per-state TTL and timers, which the v1 API cannot
    * express per cell.
    */
  class ErrorAlertProcessor(every: Long)
      extends StatefulProcessor[Long, Event, ErrorAlert] {
    @transient private var errors: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      errors = getHandle.getValueState[Long]("errors",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[ErrorAlert] = {
      val prev = if (errors.exists()) errors.get() else 0L
      val next = prev + rows.size
      errors.update(next)
      ((prev / every + 1) to (next / every)).map(k => ErrorAlert(userId, k * every)).iterator
    }
  }

  def errorAlertsV2(events: org.apache.spark.sql.Dataset[Event], every: Long = 3)
      : org.apache.spark.sql.Dataset[ErrorAlert] = {
    import events.sparkSession.implicits._
    events
      .filter(col("event_type") === "error")
      .groupByKey(_.user_id)
      .transformWithState(new ErrorAlertProcessor(every),
        TimeMode.None(), OutputMode.Append())
  }

  /** ⊕ Streaming CDC apply: maintain a keyed parquet snapshot by
    * applying each micro-batch's I/U/D changes through
    * [[graft.ops.Merge.applyChanges]] inside `foreachBatch` — the
    * continuous form of the q74 batch merge (what a Delta/Iceberg
    * MERGE sink does, on plain parquet).
    *
    * Snapshot versioning: parquet can't overwrite a path it is
    * reading in the same job, so each batch writes
    * `$snapshotDir/v=<batchId>` and then points `_latest` at it —
    * write-ahead then pointer swap (see [[writePointer]] for the
    * atomicity contract per filesystem).
    *
    * Crash replay (the at-least-once `foreachBatch` contract): if the
    * process dies AFTER the pointer swing but BEFORE the streaming
    * checkpoint commits, the replayed batch would read `_latest` —
    * now its own `v=<batchId>` dir — and overwrite the same path,
    * which Spark rejects ("Cannot overwrite a path that is also being
    * read from") and every restart would re-fail. So the batch
    * SHORT-CIRCUITS when the pointer already equals its own version
    * dir: the pointer swings only after the version write completes,
    * so pointer == vDir proves the batch's full effect is on disk and
    * replay is a no-op. Dying between version-write and pointer swing
    * instead leaves the pointer at v=<prev>; the replay then re-merges
    * from v=<prev> and overwrites the orphaned v=<batchId> (legal —
    * it is not being read). Either way the snapshot converges
    * exactly-once.
    *
    * Scale: per batch this is the q74 plan — one window on the DELTA
    * (micro-batches are small) + one join against the snapshot;
    * Catalyst broadcasts the compacted delta. Old versions are the
    * caller's retention policy (kept = time travel; deleted = compact).
    */
  def applyChangesStream(changes: DataFrame, snapshotDir: String,
                         checkpointDir: String, key: String, seqCol: String,
                         opCol: String, tieCol: String)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = changes.sparkSession
    changes.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyChangesBatch(spark, batch, batchId, snapshotDir,
          key, seqCol, opCol, tieCol)
      }
      .start()
  }

  /** One micro-batch of the CDC apply — the `foreachBatch` body,
    * visible so crash-replay sequences can be driven deterministically
    * in tests. Idempotent per (batchId, batch-content): see the replay
    * contract on [[applyChangesStream]].
    */
  def applyChangesBatch(spark: SparkSession, batch: DataFrame, batchId: Long,
                        snapshotDir: String, key: String, seqCol: String,
                        opCol: String, tieCol: String): Unit = {
    val vDir = s"$snapshotDir/v=$batchId"
    val current = currentSnapshotPath(spark, snapshotDir)
    if (current.contains(vDir)) return // replay after pointer swing: committed
    val snap = current.map(spark.read.parquet(_))
      .getOrElse(batch.filter(lit(false))
        .select(col(key) +: snapshotPayload(batch, key, seqCol, opCol, tieCol): _*))
    val merged = graft.ops.Merge.applyChanges(snap, batch, key, seqCol, opCol, tieCol)
    merged.write.mode("overwrite").parquet(vDir)
    writePointer(spark, snapshotDir, vDir)
  }

  /** The snapshot the next batch merges into: the version `_latest`
    * points at, or None before the first batch commits.
    */
  def currentSnapshot(spark: SparkSession, snapshotDir: String): Option[DataFrame] =
    currentSnapshotPath(spark, snapshotDir).map(spark.read.parquet(_))

  /** The version path `_latest` points at, or None before the first
    * commit. Hadoop [[FileSystem]] API throughout — the snapshot of a
    * 100 TB corpus lives on HDFS/S3/ABFS, not the driver's local disk.
    */
  def currentSnapshotPath(spark: SparkSession, snapshotDir: String): Option[String] = {
    val dir = new Path(snapshotDir)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    val ptr = new Path(dir, "_latest")
    if (!fs.exists(ptr)) None
    else {
      val len = fs.getFileStatus(ptr).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(ptr)
      try in.readFully(0, buf) finally in.close()
      Some(new String(buf, "UTF-8").trim)
    }
  }

  private def snapshotPayload(batch: DataFrame, key: String, seqCol: String,
                              opCol: String, tieCol: String) =
    batch.columns.filterNot(c => c == key || c == seqCol || c == opCol || c == tieCol)
      .map(col)

  /** Swing `_latest` to `vDir`: write-temp-then-rename via
    * [[FileContext]] with `Rename.OVERWRITE`.
    *
    * Atomicity contract: on HDFS, ABFS and POSIX local filesystems
    * the overwrite-rename is atomic — readers see the old pointer or
    * the new one, never a partial file. On S3A, rename is
    * copy-then-delete and `Rename.OVERWRITE` deletes the destination
    * first, so there is a small window where `_latest` is absent and
    * [[currentSnapshotPath]] returns None; concurrent READERS on S3
    * should retry-on-missing or resolve versions by listing `v=*`.
    * The WRITER is immune: only the single streaming query mutates
    * the pointer, and a crash inside the window replays the batch,
    * which rebuilds the same content (see [[applyChangesStream]]).
    * The temp name is deterministic per version (no clock/random) so
    * a crashed attempt's leftover temp is simply overwritten by the
    * retry.
    */
  private def writePointer(spark: SparkSession, snapshotDir: String,
                           vDir: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val dir = new Path(snapshotDir)
    val fs = dir.getFileSystem(conf)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s"_latest.tmp.${new Path(vDir).getName}")
    val out = fs.create(tmp, true)
    try out.write(vDir.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(fs.getUri, conf)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(new Path(dir, "_latest")),
      Options.Rename.OVERWRITE)
  }
}
