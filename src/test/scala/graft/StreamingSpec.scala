package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

class StreamingSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("windowedCounts over a memory stream; late row beyond watermark dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val agg = EventStream.windowedCounts(
      mem.toDF().withColumn("props", lit("{}")), "1 hour", None, "30 minutes")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:15:00"), 2, "click", 2.0),
        Event(3, ts("2024-01-01 11:05:00"), 1, "view", 1.0))
      q.processAllAvailable()
      // advance watermark far past 10:00-11:00 so that window closes
      mem.addData(Event(4, ts("2024-01-01 13:00:00"), 3, "view", 1.0))
      q.processAllAvailable()
      // this arrival is older than watermark (13:00 - 30m) → dropped
      mem.addData(Event(5, ts("2024-01-01 10:20:00"), 9, "click", 9.0))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select("window_start", "event_type", "n", "sum_value")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      assert(rows.contains((ts("2024-01-01 10:00:00"), "click", 2L, 3.0)))
      assert(!rows.exists { case (w, t, n, s) => t == "click" && n == 3 })
    } finally q.stop()
  }

  test("dedupWithinWatermark drops repeated event ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val dedup = EventStream.dedupWithinWatermark(
      mem.toDF().withColumn("props", lit("{}")))
    val q = dedup.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(1, ts("2024-01-01 10:00:01"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:00:02"), 1, "view", 1.0))
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() == 2)
    } finally q.stop()
  }

  test("sessionCounts merges events within gap (batch mode parity)") {
    // session_window works in batch too — verify merge semantics directly
    val events = Seq(
      Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
      Event(2, ts("2024-01-01 10:05:00"), 1, "click", 1.0),   // same session (gap 10m)
      Event(3, ts("2024-01-01 11:00:00"), 1, "click", 1.0),   // new session
      Event(4, ts("2024-01-01 10:00:00"), 2, "view", 1.0),
    ).toDF().withColumn("props", lit("{}"))
    val got = EventStream.sessionCounts(events)
      .select("user_id", "n_events").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("file-based readStream processes parquet drops as micro-batches") {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val q = EventStream.windowedCounts(
        EventStream.readStream(spark, dir), "1 hour", None, "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("file_win_out").start()
    try {
      import spark.implicits._
      // first file lands in the watched dir → first micro-batch
      Seq(Event(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0))
        .toDF().withColumn("props", lit("{}"))
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      // second drop advances the watermark and closes the 10:00 window
      Seq(Event(2, ts("2024-01-01 13:00:00"), 2, "view", 1.0))
        .toDF().withColumn("props", lit("{}"))
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val rows = spark.table("file_win_out")
        .select("window_start", "event_type", "n")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      assert(rows.contains((ts("2024-01-01 10:00:00"), "click", 1L)))
    } finally q.stop()
  }

  test("withParsedProps parses the JSON column once into a typed struct") {
    import spark.implicits._
    val df = Seq(Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0))
      .toDF().withColumn("props", lit("""{"k": 41}"""))
    val got = EventStream.withParsedProps(df)
      .select(col("props_parsed.k")).as[Long].head
    assert(got == 41L)
  }

  test("enriched: stream-static broadcast join attaches dim columns per batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val out = EventStream.enriched(
      mem.toDF().withColumn("props", lit("{}")), dim, "user_id")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("enriched_out").start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:00:01"), 3, "view", 1.0))  // no dim row
      q.processAllAvailable()
      val rows = spark.table("enriched_out")
        .select("event_id", "tier").as[(Long, Option[String])].collect().toMap
      assert(rows == Map(1L -> Some("gold"), 2L -> None))
    } finally q.stop()
  }

  test("dedupByFingerprint keeps one row per normalized content") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val docs = mem.toDF().toDF("ts", "text")
    val out = EventStream.dedupByFingerprint(docs, "ts", "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("fpdedup_out").start()
    try {
      mem.addData(
        (ts("2024-01-01 10:00:00"), "Hello   World"),
        (ts("2024-01-01 10:00:01"), "hello world"),   // same after clean+fold
        (ts("2024-01-01 10:00:02"), "different doc"))
      q.processAllAvailable()
      assert(spark.table("fpdedup_out").count() == 2)
    } finally q.stop()
  }

  test("nearDupPairsStream finds cross-batch near-dup pairs exactly once, matching the batch form") {
    implicit val sqlCtx = spark.sqlContext
    // corpus with planted near-dups: b is a ~1-word edit of a (same
    // trigram shingles mostly), c is unrelated, d repeats a verbatim
    val corpus = Seq(
      1L -> "the quick brown fox jumps over the lazy dog near the river bank today",
      2L -> "the quick brown fox jumps over the lazy dog near the river bank tonight",
      3L -> "completely different content about spark streaming state and watermarks here",
      4L -> "the quick brown fox jumps over the lazy dog near the river bank today",
      5L -> "yet another unrelated document discussing parquet file formats and codecs")
    val mem = MemoryStream[(Long, String)]
    val out = EventStream.nearDupPairsStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try {
      // batch 1: docs 1-3; batch 2: docs 4-5 (pair 1-4 crosses batches)
      mem.addData(corpus.take(3): _*)
      q.processAllAvailable()
      mem.addData(corpus.drop(3): _*)
      q.processAllAvailable()
      val got = spark.table("neardup_out")
        .as[(Long, Long, Int)].collect().toSeq
      // exactly-once: no pair emitted twice even though identical sigs
      // collide in all 4 bands
      assert(got.size == got.toSet.size, s"duplicate emissions: $got")
      // equivalence with the oracled batch operator on the same corpus
      val batch = graft.ext.Dedup.simhashNearDup(
          corpus.toDF("doc_id", "text"), col("doc_id"), col("text"))
        .as[(Long, Long, Int)].collect().toSeq
      assert(got.toSet == batch.toSet,
        s"stream ${got.toSet} != batch ${batch.toSet}")
      assert(batch.exists { case (a, b, _) => (a, b) == (1L, 4L) },
        "fixture must contain the planted cross-batch pair")
    } finally q.stop()
  }

  test("contaminationPairsStream ≡ batch contaminationPairs (stream-static decontamination)") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)
    // static eval set (the protected benchmark)
    val evalDocs = Seq(
      1L -> "alpha beta gamma delta epsilon zeta eta theta",
      3L -> "one two three four five six seven eight nine")
    // streamed train docs: 2 = verbatim eval leak, 4 = partial (first
    // 6 tokens of eval 3 → 4 shared trigrams), 6 = clean
    val trainDocs = Seq(
      (at(0), 2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (at(1), 4L, "one two three four five six unrelated tail words here"),
      (at(2), 6L, "totally clean content about compaction and codecs"))
    val evalDf = evalDocs.toDF("doc_id", "text")
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val out = EventStream.contaminationPairsStream(
      mem.toDF().toDF("ts", "doc_id", "text"), evalDf,
      "ts", "doc_id", "text", col("doc_id"), col("text"),
      k = 3, minOverlap = 3, lateness = "10 minutes")
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("decontam_out").start()
    try {
      mem.addData(trainDocs.take(2): _*)
      q.processAllAvailable()
      mem.addData(trainDocs.drop(2): _*)
      q.processAllAvailable()
      // flush: a clean far-future doc advances the watermark past
      // every real window so the append-mode aggregation emits
      mem.addData((at(120), 99L, "zz1 zz2 zz3 zz4 zz5 zz6 zz7 zz8"))
      q.processAllAvailable()
      val got = spark.table("decontam_out")
        .as[(Long, Long, Long, Double)].collect().toSet
      val batch = graft.ext.Dedup.contaminationPairs(
          trainDocs.toDF("ts", "doc_id", "text"), evalDf,
          col("doc_id"), col("text"), k = 3, minOverlap = 3)
        .as[(Long, Long, Long, Double)].collect().toSet
      assert(got == batch, s"stream $got != batch $batch")
      // the planted verdicts: verbatim leak + partial leak, clean doc absent
      assert(batch.exists { case (t, tr, _, f) => t == 1L && tr == 2L && f == 1.0 })
      assert(batch.exists { case (t, tr, _, _) => t == 3L && tr == 4L })
      assert(!batch.exists { case (_, tr, _, _) => tr == 6L })
    } finally q.stop()
  }

  test("pcaProjectStream ≡ batch pcaProject (stream-static spectral screen)") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // offline fit on the static corpus; the single-row state is the
    // broadcastable model a live ingest scores against
    val state = graft.ext.Spectral.fitState(corpus, col("vec_id"),
      col("embedding"), iterations = 4).cache()
    val rows = corpus.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val mem = MemoryStream[(Long, Seq[Double])]
    val out = EventStream.pcaProjectStream(
      mem.toDF().toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), state)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("pca_out").start()
    try {
      mem.addData(rows.take(rows.size / 2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(rows.size / 2): _*)
      q.processAllAvailable()
      val got = spark.table("pca_out")
        .as[(Long, Double, Double)].collect().toSet
      val batch = graft.ext.Spectral.pcaProject(corpus, col("vec_id"),
          col("embedding"), iterations = 4)
        .as[(Long, Double, Double)].collect().toSet
      assert(got == batch, "stream != batch on the same vectors")
      assert(got.size == rows.size)
    } finally { q.stop(); state.unpersist() }
  }

  test("denseLogisticScoreStream ≡ batch denseLogisticScore (stream-static classifier screen)") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .withColumn("__v", col("embedding").cast("array<double>"))
      .withColumn("y",
        (element_at(col("__v"), 1) + element_at(col("__v"), 2) > 0).cast("int"))
    val model = graft.ext.Classify.denseLogisticFit(
      corpus.filter(col("vec_id") % 10 =!= 0), col("y"), col("embedding"),
      lrNum = 16L)
    val batch = graft.ext.Classify.denseLogisticScore(model, corpus,
        col("vec_id"), col("embedding"))
      .as[(Long, Long, Boolean)].collect().toSet
    val rows = corpus.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val mem = MemoryStream[(Long, Seq[Double])]
    val out = EventStream.denseLogisticScoreStream(
      mem.toDF().toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), model)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("lr_out").start()
    try {
      mem.addData(rows.take(rows.size / 2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(rows.size / 2): _*)
      q.processAllAvailable()
      val got = spark.table("lr_out").as[(Long, Long, Boolean)].collect().toSet
      assert(got == batch, "stream != batch on the same vectors")
      assert(got.size == rows.size)
    } finally q.stop()
  }

  test("classifierCutStream ≡ batch classifier-gated cut (q260) with the offline boundary") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("embedding").isNotNull && size(col("embedding")) > 0)
      .withColumn("__v", col("embedding").cast("array<double>"))
      .withColumn("y",
        (element_at(col("__v"), 1) + element_at(col("__v"), 2) > 0).cast("int"))
    val model = graft.ext.Classify.denseLogisticFit(
      corpus.filter(col("vec_id") % 10 =!= 0), col("y"), col("embedding"),
      lrNum = 16L)
    val scored = graft.ext.Classify.denseLogisticScore(model, corpus,
      col("vec_id"), col("embedding"))
    // offline boundary: the q260 tercile over the static corpus
    val bound = scored
      .agg(percentile(col("margin_units"), lit(1.0 / 3))).head().getDouble(0)
    val batch = scored.filter(col("margin_units") >= lit(bound))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(batch.nonEmpty && batch.size < scored.count(),
      "the tercile cut must drop some rows and keep some")
    val rows = corpus.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val mem = MemoryStream[(Long, Seq[Double])]
    val out = EventStream.classifierCutStream(
      mem.toDF().toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), model, bound)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("cut_out").start()
    try {
      mem.addData(rows.take(rows.size / 2): _*)
      q.processAllAvailable()
      mem.addData(rows.drop(rows.size / 2): _*)
      q.processAllAvailable()
      val got = spark.table("cut_out").as[(Long, Long, Boolean)].collect().toSet
      assert(got == batch, "stream != batch on the same vectors and boundary")
    } finally q.stop()
  }

  test("spectralDecimateStream ≡ batch whitened-footprint semDedup (q253) under id-ordered arrival") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // offline: spectral fit + footprint k-means on the static corpus —
    // the two models a deployment hands to the live ingest
    val state = graft.ext.Spectral.fitState(corpus, col("vec_id"),
      col("embedding"), iterations = 4).cache()
    val wc = graft.ext.Spectral.projectWith(corpus, col("vec_id"),
        col("embedding"), state, roundTo = 4)
      .select(col("id"), array(col("proj"), sqrt(col("resid_sq"))).as("w"))
    val model = graft.ext.Similarity.ivfFit(wc, col("id"), col("w"),
      k = 16, iters = 2, quantize = Some(9))
    // batch truth: the exact q253 composition (semDedup refits the
    // identical deterministic k-means internally)
    val batch = graft.ext.Similarity.semDedup(wc, col("id"), col("w"),
        k = 16, iters = 2, tau = 0.9999, quantize = Some(9))
      .as[(Long, Int)].collect().toSet
    val rows = corpus.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    val mem = MemoryStream[(Long, Seq[Double])]
    val out = EventStream.spectralDecimateStream(
      mem.toDF().toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), state, model, tau = 0.9999)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("decim_out").start()
    try {
      mem.addData(rows.take(rows.size / 2): _*)
      q.processAllAvailable()
      // second micro-batch includes a re-delivery of an already-kept id
      mem.addData(rows.drop(rows.size / 2) ++ rows.take(1): _*)
      q.processAllAvailable()
      val got = spark.table("decim_out").as[(Long, Int)].collect().toSet
      assert(got == batch,
        s"stream-only: ${got.diff(batch)}; batch-only: ${batch.diff(got)}")
      assert(got.size < rows.size, "decimation should drop footprint classes")
    } finally { q.stop(); state.unpersist(); model.unpersist() }
  }

  test("spectralDecimateStream cap-bound: beyond-cap re-delivery never re-emits") {
    implicit val sqlCtx = spark.sqlContext
    // 8 distinct vectors, one cluster (k = 1), cap 4: rows 5..8 land in
    // overflow memory (id only, no footprint). tau > 1 disables the
    // dup ball entirely, isolating exactly the re-delivery membership
    // path the overflow array exists for.
    val corpus = (1L to 8L)
      .map(i => (i, Seq(math.cos(i * 0.7), math.sin(i * 0.7), 0.1 * i)))
      .toDF("vec_id", "embedding")
    val state = graft.ext.Spectral.fitState(corpus, col("vec_id"),
      col("embedding"), iterations = 4).cache()
    val model = graft.ext.Similarity.ivfFit(
      graft.ext.Spectral.projectWith(corpus, col("vec_id"), col("embedding"),
          state, roundTo = 4)
        .select(col("id"), array(col("proj"), sqrt(col("resid_sq"))).as("w")),
      col("id"), col("w"), k = 1, iters = 2, quantize = Some(9))
    val rows = corpus.as[(Long, Seq[Double])].collect().sortBy(_._1).toSeq
    val mem = MemoryStream[(Long, Seq[Double])]
    val out = EventStream.spectralDecimateStream(
      mem.toDF().toDF("vec_id", "embedding"),
      col("vec_id"), col("embedding"), state, model,
      tau = 1.1, maxPerCluster = 4)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("decim_cap_out").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      // re-deliver ONLY the beyond-cap rows: their footprints were
      // never stored, so only the overflow memory can suppress them
      mem.addData(rows.drop(4): _*)
      q.processAllAvailable()
      val got = spark.table("decim_cap_out").as[(Long, Int)].collect().toSeq
      assert(got.size == 8, s"each row must emit exactly once, got $got")
      assert(got.map(_._1).toSet == (1L to 8L).toSet)
    } finally { q.stop(); state.unpersist(); model.unpersist() }
  }

  test("dedupParagraphsStream ≡ batch dedupParagraphsIncremental under append-only arrival") {
    implicit val sqlCtx = spark.sqlContext
    // multi-paragraph docs drawn from a small paragraph pool so
    // cross-doc duplication is dense; deterministic construction
    val pool = Vector("alpha beta gamma", "delta epsilon zeta", "eta theta iota",
      "kappa lambda mu", "nu xi omicron", "pi rho sigma")
    val docs = (0L until 30L).map { id =>
      val ps = (0 until (2 + (id % 3).toInt)).map { j =>
        pool(((id * 7 + j * 5) % pool.size).toInt)
      }
      id -> ps.mkString("\n")
    }
    val history = docs.filter(_._1 < 15)
    val increment = docs.filter(_._1 >= 15)
    // batch reference: q199's operator on the same split
    val expected = graft.ext.TextAnalysis.dedupParagraphsIncremental(
        history.toDF("doc_id", "text"), increment.toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .as[(Long, Int, Int, String)].collect().toSet
    // streaming: history arrives as micro-batch 1, increment as 2; the
    // foreachBatch rebuild accumulates per-doc rows
    val mem = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int, String)]
    val out = EventStream.dedupParagraphsStream(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[EventStream.ParaOut], _: Long) =>
        got.synchronized {
          got ++= EventStream.rebuildParagraphDocs(b.toDF())
            .as[(Long, Int, Int, String)].collect()
        }
        ()
      }.start()
    try {
      mem.addData(history: _*)
      q.processAllAvailable()
      mem.addData(increment: _*)
      q.processAllAvailable()
      val incGot = got.synchronized { got.filter(_._1 >= 15).toSet }
      assert(incGot == expected, s"stream $incGot != batch $expected")
      // the proof is non-vacuous: some increment paragraphs must have
      // been suppressed by history state across the batch boundary
      assert(expected.exists(r => r._3 < r._2),
        "fixture must exercise cross-batch suppression")
    } finally q.stop()
  }

  // --- curateStream fixture (shared by the two equivalence tests) ---
  // exercises EVERY stage in both verdicts:
  //  - topic/blocklist row gates (und-topic and badword docs drop)
  //  - repetition gate (tripled-line doc drops)
  //  - exact dedup (byte-identical text, later id, LATER batch)
  //  - near-dup removal (one-token perturbations at J≈0.806,
  //    incl. an a<b<c chain where c pairs with b but not a)
  //  - the null-signature solo path (1-token doc: shingle set is
  //    empty AND every n-gram repetition rule passes vacuously — a
  //    2-token doc cannot reach it, its single 2-gram spans ~100%
  //    of the cleaned chars and the Gopher top2 cap drops it)
  private def curateDocText(seed: Int, topicWord: String): String = {
    val toks = topicWord +: (1 until 30).map(i => s"w${seed}x$i")
    toks.grouped(10).map(_.mkString(" ")).mkString("\n")
  }
  private def curatePerturb(text: String, at: Int, repl: String): String = {
    val toks = text.split("[\\s\\n]+").toVector.updated(at, repl)
    toks.grouped(10).map(_.mkString(" ")).mkString("\n")
  }
  private lazy val curateFixture: Seq[(Long, String, String)] = {
    val base0 = curateDocText(0, "query")
    val base8 = curateDocText(8, "disk")
    Seq(
      (0L, "srcA", base0),
      (2L, "srcA", curatePerturb(base0, 15, "mut")), // near-dup of 0, same batch
      (3L, "srcA", Seq.fill(4)("query alpha beta gamma").mkString("\n")),
      (4L, "srcB", curateDocText(4, "query").replace("w4x20", "badword")),
      (5L, "srcB", curateDocText(5, "neutral")),     // no topic word → und
      (6L, "srcB", "query"),                         // 1 token: solo path
      (7L, "srcB", curateDocText(7, "file")),
      // --- micro-batch 2 ---
      (8L, "srcC", base8),
      (9L, "srcC", base0),                           // exact dup of 0, cross-batch
      (10L, "srcC", curateDocText(10, "plan")),
      // --- micro-batch 3 ---
      (16L, "srcD", curatePerturb(base8, 20, "aaa")), // near-dup of 8, cross-batch
      (17L, "srcD", curatePerturb(curatePerturb(base8, 20, "aaa"), 25, "bbb")), // chain: ~16 only
      (18L, "srcD", curateDocText(18, "query")))
  }
  private val curateParams = graft.ext.Curation.Params(
    minTokens = 1, minQuality = 0.0,
    topics = Seq("exec", "storage"),
    lexicons = Seq("exec" -> Seq("query", "plan"), "storage" -> Seq("disk", "file")),
    blocklist = Seq("badword"), repetitionGate = true)

  /** Runs curateStream over the fixture in three id-ordered
    * micro-batches and asserts row-identity against the batch
    * `curate` with the same Params; returns (batchKept, streamKept).
    */
  private def curateEquivalence(p: graft.ext.Curation.Params, sink: String)
      : Set[EventStream.CurateDoc] = {
    implicit val sqlCtx = spark.sqlContext
    val df = curateFixture.toDF("doc_id", "source", "text")
    val expected = graft.ext.Curation.curate(
        df, col("doc_id"), col("source"), col("text"), p)
      .as[EventStream.CurateDoc].collect().toSet
    val mem = MemoryStream[(Long, String, String)]
    val out = EventStream.curateStream(
      mem.toDF().toDF("doc_id", "source", "text"),
      col("doc_id"), col("source"), col("text"), p)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName(sink).start()
    try {
      mem.addData(curateFixture.filter(_._1 < 8): _*)
      q.processAllAvailable()
      mem.addData(curateFixture.filter(r => r._1 >= 8 && r._1 < 16): _*)
      q.processAllAvailable()
      mem.addData(curateFixture.filter(_._1 >= 16): _*)
      q.processAllAvailable()
      val got = spark.table(sink).as[EventStream.CurateDoc].collect().toSet
      assert(got == expected,
        s"stream kept ${got.map(_.doc_id).toSeq.sorted} != " +
          s"batch kept ${expected.map(_.doc_id).toSeq.sorted}")
      expected
    } finally q.stop()
  }

  test("curateStream ≡ batch Curation.curate (q240's composed form) under append-only arrival") {
    val p = curateParams
    val df = curateFixture.toDF("doc_id", "source", "text")
    // the near-dup stage must be non-vacuous in BATCH terms: at least
    // one candidate pair passes the banding + exact-Jaccard verify
    val exactSurvivors = graft.ops.TopK.perGroupHead(
      graft.ext.Curation.rowStages(df, col("doc_id"), col("source"), col("text"), p)
        .join(graft.ext.TextAnalysis.gopherRepetitionGate(
            graft.ext.Curation.rowStages(df, col("doc_id"), col("source"), col("text"), p),
            col("doc_id"), col("text"))
          .filter(col("passes")).select(col("doc_id")), Seq("doc_id"), "left_semi"),
      col("fp"), col("doc_id"), 1)
    val batchPairs = graft.ext.Dedup.nearDupPairs(
      exactSurvivors, col("doc_id"), col("text"), threshold = p.jaccard).collect()
    assert(batchPairs.nonEmpty, "fixture must produce at least one " +
      "near-dup pair through the banding (re-seed the perturbations)")
    val expected = curateEquivalence(p, "curate_out")
    assert(!expected.exists(_.doc_id == 9L), "exact dup must drop")
    assert(!expected.exists(_.doc_id == 3L), "repetition doc must drop")
    assert(expected.exists(_.doc_id == 6L), "solo-path doc must survive")
    // cross-batch suppression is non-vacuous: the exact dup (id 9)
    // and at least one near-dup arrived AFTER their lower-id
    // counterpart's micro-batch and were still dropped
    val dropped = curateFixture.map(_._1).toSet -- expected.map(_.doc_id)
    assert(dropped.contains(9L) && dropped.exists(_ >= 16L),
      s"fixture must exercise cross-batch dedup state (dropped=$dropped)")
  }

  test("curateStream ≡ batch curate at the recall-derived banding geometry (targetRecall wired through Params)") {
    // the corpus-scale configuration: geometry derived from the
    // recall contract, shared by BOTH modes via Params.bandGeometry
    val p2 = curateParams.copy(jaccard = 0.5, targetRecall = Some(0.95))
    assert(p2.bandGeometry == (22, 2),
      s"(0.5, 0.95) must derive q239's 11×2 geometry, got ${p2.bandGeometry}")
    val expected = curateEquivalence(p2, "curate_out_auto")
    // at t=0.5 with 11 bands the chain pair (16,17 vs 8) and the
    // (0,2) pair are all in range — more drops than the fixed test
    assert(!expected.exists(_.doc_id == 2L), "J≈0.806 near-dup must drop at t=0.5")
  }

  test("funnelStream advances per-user steps across micro-batches, folding to the batch funnel counts") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1 completes in order across batches; user 2 purchases
    // before clicking (stops at click); user 3 clicks past the
    // horizon of its entry; user 4 never enters
    val batch1 = Seq(
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      (2L, ts("2024-01-01 10:10:00"), "purchase"),
      (3L, ts("2024-01-01 10:00:00"), "view"),
      (4L, ts("2024-01-01 10:00:00"), "error"))
    val batch2 = Seq(
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      (2L, ts("2024-01-01 11:00:00"), "click"),
      (3L, ts("2024-01-10 10:00:00"), "click"),  // 9 days after entry: out
      (4L, ts("2024-01-01 11:00:00"), "click"))  // never viewed: out
    val mem = MemoryStream[(Long, Timestamp, String)]
    val out = EventStream.funnelStream(
      mem.toDF().toDF("user_id", "ts", "event_type"),
      Seq("view", "click", "purchase"), horizonSec = 7 * 86400L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("funnel_out").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val advances = spark.table("funnel_out")
        .as[(Long, Int, String, Timestamp)].collect().toSeq
      // per-user progression is monotone 1..k with no duplicates
      advances.groupBy(_._1).foreach { case (u, rows) =>
        assert(rows.map(_._2).sorted === (1 to rows.size), s"user $u: $rows")
      }
      // folding advances by step reproduces the batch funnel curve
      val streamCounts = advances.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val batchDf = (batch1 ++ batch2).zipWithIndex
        .map { case ((u, t, et), i) => (i.toLong, u, t, et) }
        .toDF("event_id", "user_id", "ts", "event_type")
      val batchCounts = graft.ops.Funnel.funnelSteps(batchDf, col("user_id"),
          col("ts"), col("event_type"), Seq("view", "click", "purchase"))
        .as[(Int, String, Long)].collect()
        .map(r => r._1 -> r._3).toMap
      assert(batchCounts === Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
      (1 to 3).foreach { s =>
        assert(streamCounts.getOrElse(s, 0L) === batchCounts(s), s"step $s")
      }
    } finally q.stop()
  }

  test("attributionStream credits the last in-lookback touch across micro-batches, folding to the batch readout") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // user 1: touch in batch 1, converts in batch 2 (cross-batch state);
    // user 2: touch too old (> 3 days) → direct;
    // user 3: converts before any touch → direct;
    // user 4: same-ts touch with LOWER id credits (the batch tie rule)
    val batch1 = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), "click", 5.0),
      (2L, 20L, ts("2024-01-01 10:00:00"), "view", 7.0),
      (3L, 30L, ts("2024-01-02 09:00:00"), "purchase", 11.0))
    val batch2 = Seq(
      (1L, 40L, ts("2024-01-02 10:00:00"), "purchase", 13.0),
      (2L, 50L, ts("2024-01-05 10:00:01"), "purchase", 17.0),
      (4L, 60L, ts("2024-01-03 08:00:00"), "view", 0.0),
      (4L, 61L, ts("2024-01-03 08:00:00"), "purchase", 19.0))
    val mem = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val out = EventStream.attributionStream(
      mem.toDF().toDF("user_id", "event_id", "ts", "event_type", "value"),
      Seq("view", "click"), "purchase", lookbackSec = 3 * 86400L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("attr_out").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val hits = spark.table("attr_out")
        .as[(Long, Long, Timestamp, String, Double)].collect().toSeq
      assert(hits.map(h => h._1 -> h._4).toMap ===
        Map(1L -> "click", 2L -> "direct", 3L -> "direct", 4L -> "view"))
      // folding by channel reproduces the batch lastTouchAttribution rows
      val folded = hits.groupBy(_._4).view.mapValues(v =>
        (v.size.toLong, math.round(v.map(_._5).sum * 100) / 100.0)).toMap
      val batch = graft.ops.Funnel.lastTouchAttribution(
          (batch1 ++ batch2).toDF("user_id", "event_id", "ts", "event_type", "value"),
          col("user_id"), col("ts"), col("event_type"), col("event_id"),
          Seq("view", "click"), "purchase", col("value"), lookback = "3 days")
        .as[(String, Long, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(folded === batch)
    } finally q.stop()
  }

  test("quotaSampleStream enforces per-source token budgets across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, Long)]
    val out = EventStream.quotaSampleStream(
      mem.toDF().toDF("doc_id", "source", "n_tokens"), quotaTokens = 100L)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("quota_out").start()
    try {
      // batch 1: a fills 90 of 100; b fills 200 (straddles at doc 21)
      mem.addData((1L, "a", 50L), (2L, "a", 40L), (20L, "b", 80L), (21L, "b", 120L))
      q.processAllAvailable()
      // batch 2: a's doc 3 straddles (90 -> 160) and admits; doc 4 is
      // rejected; b is already over quota, nothing admits
      mem.addData((3L, "a", 70L), (4L, "a", 10L), (22L, "b", 5L))
      q.processAllAvailable()
      val got = spark.table("quota_out")
        .as[(Long, String, Long)].collect().map(_._1).toSet
      assert(got === Set(1L, 2L, 20L, 21L, 3L), s"admitted: $got")
      // equivalence with the batch prefix-sum rule on the full input
      val all = Seq((1L, "a", 50L), (2L, "a", 40L), (3L, "a", 70L), (4L, "a", 10L),
        (20L, "b", 80L), (21L, "b", 120L), (22L, "b", 5L))
      val batchKeep = all.groupBy(_._2).flatMap { case (_, docs) =>
        var used = 0L
        docs.sortBy(_._1).filter { d =>
          val ok = used < 100L; if (ok) used += d._3; ok
        }
      }.map(_._1).toSet
      assert(got === batchKeep, s"stream $got != batch rule $batchKeep")
    } finally q.stop()
  }

  test("parquet file sink + checkpoint: restart resumes exactly-once") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val base = java.nio.file.Files.createTempDirectory("ckpt_test").toFile.getAbsolutePath
    def start() = mem.toDF().withColumn("props", lit("{}"))
      .writeStream.format("parquet")
      .option("checkpointLocation", s"$base/ckpt")
      .option("path", s"$base/out")
      .outputMode("append").start()
    val q1 = start()
    try {
      mem.addData(
        Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 10:00:01"), 2, "view", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()
    // restart from the checkpoint: already-committed batches must not
    // be re-emitted; new data must flow
    val q2 = start()
    try {
      mem.addData(Event(3, ts("2024-01-01 10:00:02"), 3, "click", 3.0))
      q2.processAllAvailable()
    } finally q2.stop()
    val got = spark.read.parquet(s"$base/out")
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L), s"expected exactly-once 1,2,3; got $got")
  }

  test("stream-stream interval join pairs errors with recent same-user clicks, bounded window") {
    implicit val sqlCtx = spark.sqlContext
    val errs = MemoryStream[Event]
    val clicks = MemoryStream[Event]
    val out = EventStream.errorsWithRecentClicks(
      errs.toDF().withColumn("props", lit("{}")),
      clicks.toDF().withColumn("props", lit("{}")),
      windowSec = 600)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      clicks.addData(
        Event(100, ts("2024-01-01 09:56:00"), 1, "click", 1.0),  // in window (4m before)
        Event(101, ts("2024-01-01 09:40:00"), 1, "click", 1.0),  // too old (20m before)
        Event(102, ts("2024-01-01 09:57:00"), 2, "click", 1.0),  // wrong user
        Event(103, ts("2024-01-01 10:00:00"), 1, "click", 1.0))  // equal ts -> excluded ([t-w, t))
      errs.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "error", 0))
      q.processAllAvailable()
      // advance BOTH watermarks so the join emits/evicts
      clicks.addData(Event(199, ts("2024-01-01 12:00:00"), 9, "click", 1.0))
      errs.addData(Event(99, ts("2024-01-01 12:00:00"), 9, "error", 0))
      q.processAllAvailable()
      val got = spark.table("ssj_out")
        .select("error_id", "click_id").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 100L)))
    } finally q.stop()
  }

  test("errorAlertsV2 (transformWithState + RocksDB store) matches the v1 semantics") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // the v2 state API is RocksDB-only
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[Event]
    val alerts = EventStream.errorAlertsV2(mem.toDS(), every = 2)
    val q = alerts.writeStream.outputMode("append")
      .format("memory").queryName("alerts_v2_out").start()
    try {
      mem.addData(Event(1, ts("2024-01-01 10:00:00"), 7, "error", 0),
                  Event(2, ts("2024-01-01 10:00:01"), 7, "click", 0))
      q.processAllAvailable()
      mem.addData(Event(3, ts("2024-01-01 10:01:00"), 7, "error", 0),
                  Event(4, ts("2024-01-01 10:01:30"), 7, "error", 0),
                  Event(5, ts("2024-01-01 10:02:00"), 7, "error", 0))
      q.processAllAvailable()
      val got = spark.table("alerts_v2_out").as[(Long, Long)].collect().toSet
      assert(got == Set((7L, 2L), (7L, 4L)))
    } finally {
      q.stop()
      prevProvider.fold(spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    }
  }

  test("dedupParagraphsStreamV2 (transformWithState): ≡ v1 unbounded; TTL re-admits expired history") {
    implicit val sqlCtx = spark.sqlContext
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // unbounded (no TTL): same fold as the flatMapGroupsWithState form
      val docs = Seq(1L -> "pa\npb", 2L -> "pb\npc")
      val expected = graft.ext.TextAnalysis.dedupParagraphsIncremental(
          docs.take(1).toDF("doc_id", "text"), docs.drop(1).toDF("doc_id", "text"),
          col("doc_id"), col("text"))
        .as[(Long, Int, Int, String)].collect().toSet
      val mem = MemoryStream[(Long, String)]
      val got = scala.collection.mutable.ArrayBuffer.empty[(Long, Int, Int, String)]
      val q = EventStream.dedupParagraphsStreamV2(
          mem.toDF().toDF("doc_id", "text"), "doc_id", "text")
        .writeStream.outputMode("append")
        .foreachBatch { (b: org.apache.spark.sql.Dataset[EventStream.ParaOut], _: Long) =>
          got.synchronized {
            got ++= EventStream.rebuildParagraphDocs(b.toDF())
              .as[(Long, Int, Int, String)].collect()
          }
          ()
        }.start()
      try {
        mem.addData(docs.head); q.processAllAvailable()
        mem.addData(docs(1)); q.processAllAvailable()
        assert(got.synchronized(got.filter(_._1 >= 2).toSet) == expected)
      } finally q.stop()
      // TTL horizon: the same paragraph re-admits once its state expires.
      // The TTL form runs in TimeMode.ProcessingTime, where Spark's
      // TransformWithStateExec.shouldRunAnotherBatch is ALWAYS true —
      // so neither processAllAvailable nor Trigger.AvailableNow ever
      // settles (both wait for a "no more batches" signal that never
      // comes; measured, not assumed). Drive each run with a real
      // trigger interval, poll for the expected output, then stop() —
      // two runs over one checkpoint, state carried by RocksDB between
      // them, the second starting after the 1 s TTL has lapsed.
      val ckpt = java.nio.file.Files.createTempDirectory("paradedup_ttl_ckpt").toString
      val mem2 = MemoryStream[(Long, String)]
      val out2 = EventStream.dedupParagraphsStreamV2(
        mem2.toDF().toDF("doc_id", "text"), "doc_id", "text",
        ttlMs = Some(1000L))
      val kept2 = scala.collection.mutable.Set.empty[Long]
      def runUntil(expect: Long): Unit = {
        val q2 = out2.writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
          .foreachBatch { (b: org.apache.spark.sql.Dataset[EventStream.ParaOut], _: Long) =>
            val ids = b.filter(_.kept).collect().map(_.doc_id)
            kept2.synchronized { kept2 ++= ids }
            ()
          }.start()
        try {
          val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
          while (!kept2.synchronized(kept2.contains(expect)) && System.nanoTime() < deadline)
            Thread.sleep(50)
        } finally q2.stop()
      }
      mem2.addData(10L -> "px"); runUntil(10L)
      Thread.sleep(2500)  // let the 1s TTL lapse between runs
      mem2.addData(11L -> "px"); runUntil(11L)
      val kept = kept2.synchronized(kept2.toSet)
      assert(kept == Set(10L, 11L),
        s"expired paragraph must re-admit (the bounded-history trade), got $kept")
    } finally {
      prevProvider.fold(spark.conf.unset("spark.sql.streaming.stateStore.providerClass"))(
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", _))
    }
  }

  test("errorAlerts emits on every k-th error per user across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val alerts = EventStream.errorAlerts(mem.toDS(), every = 2)
    val q = alerts.writeStream.outputMode("append")
      .format("memory").queryName("alerts_out").start()
    try {
      mem.addData(Event(1, ts("2024-01-01 10:00:00"), 7, "error", 0),
                  Event(2, ts("2024-01-01 10:00:01"), 7, "click", 0))
      q.processAllAvailable()
      mem.addData(Event(3, ts("2024-01-01 10:01:00"), 7, "error", 0),
                  Event(4, ts("2024-01-01 10:01:30"), 7, "error", 0),
                  Event(5, ts("2024-01-01 10:02:00"), 7, "error", 0))
      q.processAllAvailable()
      val got = spark.table("alerts_out").as[(Long, Long)].collect().toSet
      assert(got == Set((7L, 2L), (7L, 4L)))
    } finally q.stop()
  }

  // (k, name, bal, seq, op, chg_id) — a CDC change record
  case class Change(k: Long, name: String, bal: Double,
                    seq: Long, op: String, chg_id: Long)

  test("applyChangesStream maintains the merged snapshot across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    val mem = MemoryStream[Change]
    val q = EventStream.applyChangesStream(mem.toDF(),
      s"$root/snap", s"$root/ckpt", "k", "seq", "op", "chg_id")
    try {
      mem.addData(
        Change(1L, "alice", 10.0, 100L, "I", 1L),
        Change(2L, "bob", 20.0, 100L, "I", 2L))
      q.processAllAvailable()
      val v1 = EventStream.currentSnapshot(spark, s"$root/snap").get
        .as[(Long, String, Double)].collect().toSet
      assert(v1 == Set((1L, "alice", 10.0), (2L, "bob", 20.0)))

      mem.addData(
        Change(1L, "alice_v2", 11.0, 200L, "U", 3L),
        Change(2L, "gone", 0.0, 200L, "D", 4L),
        Change(3L, "carol", 30.0, 200L, "I", 5L),
        Change(3L, "carol_v2", 31.0, 300L, "U", 6L)) // same-batch compaction
      q.processAllAvailable()
      val v2 = EventStream.currentSnapshot(spark, s"$root/snap").get
        .as[(Long, String, Double)].collect().toSet
      assert(v2 == Set((1L, "alice_v2", 11.0), (3L, "carol_v2", 31.0)))
    } finally q.stop()
  }

  test("CDC apply: crash-replay AFTER pointer swing short-circuits (no overwrite-while-reading wedge)") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_replay").toString
    val snapDir = s"$root/snap"
    val cols = Seq("k", "name", "bal", "seq", "op", "chg_id")
    val b0 = Seq((1L, "alice", 10.0, 100L, "I", 1L),
                 (2L, "bob", 20.0, 100L, "I", 2L)).toDF(cols: _*)
    val b1 = Seq((1L, "alice_v2", 11.0, 200L, "U", 3L)).toDF(cols: _*)
    EventStream.applyChangesBatch(spark, b0, 0L, snapDir, "k", "seq", "op", "chg_id")
    EventStream.applyChangesBatch(spark, b1, 1L, snapDir, "k", "seq", "op", "chg_id")
    val committed = EventStream.currentSnapshot(spark, snapDir).get
      .as[(Long, String, Double)].collect().toSet
    assert(committed == Set((1L, "alice_v2", 11.0), (2L, "bob", 20.0)))
    // Simulated crash between pointer swing and checkpoint commit:
    // foreachBatch re-delivers batch 1. Pointer already names v=1, so the
    // batch must no-op — before the short-circuit this threw "Cannot
    // overwrite a path that is also being read from" on EVERY restart.
    EventStream.applyChangesBatch(spark, b1, 1L, snapDir, "k", "seq", "op", "chg_id")
    assert(EventStream.currentSnapshotPath(spark, snapDir).contains(s"$snapDir/v=1"))
    val replayed = EventStream.currentSnapshot(spark, snapDir).get
      .as[(Long, String, Double)].collect().toSet
    assert(replayed == committed)
  }

  test("CDC apply: crash BETWEEN version write and pointer swing replays cleanly") {
    val root = java.nio.file.Files.createTempDirectory("graft_cdc_crash").toString
    val snapDir = s"$root/snap"
    val cols = Seq("k", "name", "bal", "seq", "op", "chg_id")
    val b0 = Seq((1L, "alice", 10.0, 100L, "I", 1L)).toDF(cols: _*)
    val b1 = Seq((1L, "alice_v2", 11.0, 200L, "U", 3L),
                 (2L, "bob", 20.0, 200L, "I", 4L)).toDF(cols: _*)
    EventStream.applyChangesBatch(spark, b0, 0L, snapDir, "k", "seq", "op", "chg_id")
    // Simulate batch 1 dying after its version write but BEFORE the pointer
    // swing: v=1 exists (even with different/garbage content from a partial
    // attempt) while _latest still names v=0.
    Seq((9L, "partial", 0.0)).toDF("k", "name", "bal")
      .write.mode("overwrite").parquet(s"$snapDir/v=1")
    assert(EventStream.currentSnapshotPath(spark, snapDir).contains(s"$snapDir/v=0"))
    // Replay of batch 1 must re-merge from v=0, overwrite the orphaned v=1,
    // and swing the pointer — converging to the same exactly-once result.
    EventStream.applyChangesBatch(spark, b1, 1L, snapDir, "k", "seq", "op", "chg_id")
    assert(EventStream.currentSnapshotPath(spark, snapDir).contains(s"$snapDir/v=1"))
    val got = EventStream.currentSnapshot(spark, snapDir).get
      .as[(Long, String, Double)].collect().toSet
    assert(got == Set((1L, "alice_v2", 11.0), (2L, "bob", 20.0)))
  }

  test("streaming windowedCounts == q20's oracled batch aggregation after watermark close") {
    // Ties the streaming path to the ORACLED batch semantics: the exact
    // events slice q20 is hash-checked on (sf0.01) is streamed through
    // windowedCounts, and every closed window must carry identical
    // (n, sum_value) to the batch groupBy(window(ts), event_type) form.
    val batchEvents = graft.sources.Tables.events(spark, "/root/testdata/sf0.01")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    val expected = batchEvents
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sum_value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    val dir = java.nio.file.Files.createTempDirectory("graft_bseq").toString
    batchEvents.write.mode("append").parquet(dir)
    val q = EventStream.windowedCounts(
        EventStream.readStream(spark, dir), "1 hour", None, "30 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("bseq_out").start()
    try {
      q.processAllAvailable()
      // sentinel a decade past max(ts): advances the watermark so EVERY
      // real window closes and is emitted; the sentinel's own window can
      // never close, so it cannot contaminate the comparison
      batchEvents.limit(1)
        .withColumn("ts", col("ts") + expr("INTERVAL 3650 DAYS"))
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.table("bseq_out")
        .select(col("window_start"), col("event_type"), col("n"), col("sum_value"))
        .as[(java.sql.Timestamp, String, Long, Double)].collect()
        .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
      assert(got.keySet == expected.keySet,
        s"windows differ: missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
      expected.foreach { case (k, (n, s)) =>
        val (gn, gs) = got(k)
        assert(gn == n, s"$k: count $gn != $n")
        // incremental (per-micro-batch) summation reassociates doubles
        assert(math.abs(gs - s) <= 1e-6 * math.max(1.0, math.abs(s)),
          s"$k: sum $gs != $s")
      }
    } finally q.stop()
  }

  test("Misra-Gries heavy hitters aggregate incrementally on a stream (exact mode ≡ batch)") {
    // the A6 mergeable-summary contract live: the typed Aggregator's
    // buffer IS the streaming state, so the trending-terms readout
    // updates per micro-batch with bounded memory; with distinct
    // items ≤ capacity the summary is exact and totally ordered
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val agg = mem.toDF().toDF("item")
      .agg(graft.functions.FreqItems.freqItems(16)(col("item")).as("hh"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("hh_out").start()
    try {
      mem.addData("a", "a", "b", "c", "a", "b")
      q.processAllAvailable()
      mem.addData("c", "c", "c", "d")
      q.processAllAvailable()
      val got = spark.table("hh_out").select(explode(col("hh")).as("e"))
        .select(col("e.item"), col("e.est")).as[(String, Long)].collect().toSeq
      assert(got == Seq(("c", 4L), ("a", 3L), ("b", 2L), ("d", 1L)))
    } finally q.stop()
  }
}
