package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: measure the dedup/ANN family's scaling slope from sf0.1
  * to a synthetic sf1 (10× documents + embeddings) and print a
  * sf0.1→sf1 ratio table for BASELINE.md. `SPARK_GRAFT_DECADE=2`
  * measures the SECOND decade instead (sf1 → sf10, a 100× blow-up of
  * sf0.1) for the spot-listed worst sf1 slopes — one more decade
  * distinguishes a flattening fixed cost from compounding super-root
  * growth (VERDICT r7 #2). sf10 holds only the tables those queries
  * scan (documents, embeddings, orders, lineitem).
  *
  * The sf1 fixtures are a deterministic 10× blow-up of the driver's
  * sf0.1 parquet (written under /tmp, never /root/testdata), built so
  * the workload SHAPE is preserved rather than degenerate:
  *  - documents: copy c ∈ 0..9 rewrites the text through a per-copy
  *    AFFINE CHAR CIPHER (letter i → a·i+b mod 26; bijective, spaces
  *    and lengths untouched), so each copy-group has EXACTLY sf0.1's
  *    internal gram/shingle structure (token lengths, window spans,
  *    n-gram diversity all preserved — a token SUFFIX, the previous
  *    design, lengthened tokens and collapsed the k-gram space of the
  *    tiny fixture vocabulary, which changed per-group near-dup
  *    density BETWEEN scales and confounded the q40 slope 49×) but NO
  *    cross-copy near-dups: two distinct affine maps agree on at most
  *    2 of 26 letters, so no real k-gram survives translation into
  *    another group. True pair count scales exactly 10×, the honest
  *    setting for a scaling-slope measurement.
  *  - embeddings: copy c circular-shifts the vector by c positions —
  *    norm and component distribution preserved, cross-copy cosine low,
  *    so the q25/q26 pair structure also replicates per copy-group.
  *
  * Timing protocol matches Bench: shared warmed session, count() as
  * the action, min of 3 passes per (query, sf).
  */
object ScaleBench {

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.ShortCircuitExists.install(spark)

    val sf01 = "/root/testdata/sf0.1"
    val sf1 = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
    val decade2 = sys.env.get("SPARK_GRAFT_DECADE").contains("2")
    buildIfMissing(spark, sf01, sf1)
    val sf10 = sys.env.getOrElse("SPARK_GRAFT_SF10_DIR", "/tmp/graft_sf10")
    if (decade2) buildSf10IfMissing(spark, sf01, sf10)

    // warm (JVM, codegen, parquet footers) — same as Bench
    graft.SparkEntry.entry(spark).count()
    graft.SparkEntry.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001").count()

    // The decade-2 run measures the five worst sf1 slopes (VERDICT r7
    // #2) in BOTH forms where a sized form exists: the registered
    // fixed-6-bit LSH queries (whose second decade is quadratic by
    // construction — kept to show the compounding) and the
    // bitsForCorpus-sized variants that are the actual 100 TB path.
    import org.apache.spark.sql.{DataFrame, SparkSession => SS}
    val sizedVariants: Map[String, (SS, String) => DataFrame] = Map(
      "q26_ann_lsh_SIZED" -> ((s: SS, dir: String) =>
        graft.ext.Similarity.annLshPairsSized(
          graft.sources.Tables.embeddings(s, dir),
          col("vec_id"), col("embedding"), threshold = 0.42)),
      "q66_embedding_dedup_SIZED" -> ((s: SS, dir: String) =>
        graft.ext.Dedup.dupClusters(
          graft.ext.Similarity.annLshPairsSized(
            graft.sources.Tables.embeddings(s, dir),
            col("vec_id"), col("embedding"), threshold = 0.42))),
      // kept for decade-2 continuity; since round 11 the sized form is
      // also registered as q146_semdedup_pq_sized (same library call)
      "q145_semdedup_pq_SIZED" -> ((s: SS, dir: String) =>
        graft.ext.Similarity.semDedupPqSized(
          graft.sources.Tables.embeddings(s, dir),
          col("vec_id"), col("embedding"), tau = 0.25)),
      // q220's IVF SIDE alone (fit + probe search, sized schedule) —
      // the full q220 is brute-ground-truth-bound at sf10 by design
      // (8k queries × 200k vectors × 3 passes ≈ hours), so decade-2
      // measures the deployment path and the brute side stays the
      // labeled-exact baseline it is
      "q220_IVF_SIDE" -> ((s: SS, dir: String) => {
        val em = graft.sources.Tables.embeddings(s, dir)
        val queries = em.filter(col("vec_id") % 25 === 0)
        val ivf = graft.ext.Similarity.ivfFitSized(em, col("vec_id"),
          col("embedding"), iters = 2, quantize = Some(9))
        val out = graft.ext.Similarity.ivfSearchDf(ivf, queries,
          col("vec_id"), col("embedding"), nprobe = 4, k = 10)
        out
      }),
      "q86_knn_graph_SIZED" -> ((s: SS, dir: String) => {
        import org.apache.spark.sql.expressions.Window
        val pairs = graft.ext.Similarity.annLshPairsSized(
          graft.sources.Tables.embeddings(s, dir),
          col("vec_id"), col("embedding"), threshold = 0.3)
        pairs.select(explode(array(
            struct(col("id_a").as("src"), col("id_b").as("nbr"), col("cos_sim")),
            struct(col("id_b").as("src"), col("id_a").as("nbr"), col("cos_sim")))).as("e"))
          .select(col("e.src").as("src"), col("e.nbr").as("nbr"), col("e.cos_sim").as("cos_sim"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("src")).orderBy(desc("cos_sim"), col("nbr"))))
          .filter(col("rn") <= 3)
      }))
    val allQueries = graft.SparkEntry.queries ++ sizedVariants

    // Size the session shuffle width to the decade under test
    // (Skew.partitionsForCorpus over the largest table in the dir —
    // raw rows, floor 32): a fixed 32 was the measured q107/q119
    // spill caveat at sf10. Recorded per dir so the table is
    // self-documenting.
    val partsByDir = scala.collection.mutable.Map[String, Int]()
    def partsFor(dir: String): Int = partsByDir.getOrElseUpdate(dir, {
      val rows = Seq("documents", "embeddings", "orders", "lineitem",
          "events", "customer")
        .map(t => new java.io.File(dir, s"$t.parquet"))
        .filter(_.exists())
        .map(f => spark.read.parquet(f.getAbsolutePath).count())
        .max
      val p = graft.ops.Skew.partitionsForCorpus(rows)
      println(s"[scalebench] $dir: largest table $rows rows -> " +
        s"spark.sql.shuffle.partitions=$p")
      p
    })

    // returns (min seconds, output rows) — the row count doubles as the
    // operating-point readout for dedup queries (kept = output rows;
    // the r18 verdict's q258 survivor-fraction ask)
    def minOf3(q: String, dir: String): (Double, Long) = {
      spark.conf.set("spark.sql.shuffle.partitions", partsFor(dir).toString)
      var rows = 0L
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        rows = allQueries(q)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      (t, rows)
    }

    // FULL suite by default (VERDICT r6 #1); SPARK_GRAFT_ONLY filters
    // by comma-separated name prefixes for iteration. Decade 2 defaults
    // to the five worst sf1 slopes plus the sized LSH variants — sf10
    // only carries the tables they scan.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
      .orElse(if (decade2)
        Some(Seq("q26", "q86", "q40", "q66", "q04", "q149", "q150", "q151"))
      else None)
    val universe =
      if (decade2) allQueries.keys.toSeq.sorted
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val selected = only.fold(universe) { ps =>
      universe.filter(n => ps.exists(n.startsWith))
    }
    val (loDir, hiDir, loName, hiName) =
      if (decade2) (sf1, sf10, "sf1", "sf10 (100x sf0.1)")
      else (sf01, sf1, "sf0.1", "sf1 (10x data)")
    val md = new StringBuilder
    md ++= s"| query | $loName | $hiName | time ratio | rows lo→hi |\n|---|---|---|---|---|\n"
    println(f"${"query"}%-24s ${loName}%8s ${"hi"}%8s ${"ratio"}%6s  rows")
    selected.foreach { q =>
      val (a, ra) = minOf3(q, loDir)
      val (b, rb) = minOf3(q, hiDir)
      println(f"$q%-24s $a%8.2f $b%8.2f ${b / a}%6.1fx  $ra%d -> $rb%d")
      md ++= f"| $q | $a%.2f s | $b%.2f s | ${b / a}%.1f× | $ra → $rb |%n"
    }
    // persist the table so the console record can't be lost/truncated
    val out = java.nio.file.Paths.get("target",
      if (decade2) "scalebench_sf10_last.md" else "scalebench_last.md")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, md.toString.getBytes("UTF-8"))
    spark.stop()
  }

  /** 100× deterministic blow-up of sf0.1 — documents, embeddings,
    * orders, lineitem only (what q26/q86/q40/q66/q04 scan). Built
    * DIRECTLY from sf0.1 with 100 copy groups, NOT by re-applying the
    * 10× transform to sf1: composing circular shifts would collide
    * (shift a + shift b ≡ shift a' + b' mod 64 makes identical
    * cross-group vectors, manufacturing near-dup pairs that don't
    * exist at 10×), which would change the workload shape between
    * decades. Copies 64..99 reuse shifts 0..35 NEGATED — negation
    * keeps norms and flips cosine to −1, which no near-dup/kNN
    * threshold accepts, so true pair count still scales exactly 100×.
    */
  def buildSf10IfMissing(spark: SparkSession, src: String, dst: String): Unit = {
    val fs = new java.io.File(dst)
    val copies = (0 until 100).map(lit(_))
    def hundred(df: DataFrame): DataFrame =
      df.select(col("*"), explode(array(copies: _*)).as("c"))
    if (!new java.io.File(fs, "documents.parquet").exists()) {
      fs.mkdirs()
      // Affine-cipher translation, NOT token suffixes: suffixes
      // lengthen tokens, which collapses the k-gram space of the tiny
      // fixture vocabulary and RAISES per-group fingerprint occupancy
      // with suffix width — measured as a phantom 49× pair blow-up on
      // q40 between the 3-char (sf1) and 4-char (sf10) suffix widths.
      // The cipher is a bijection on letters: token lengths, gram
      // diversity and within-group near-dup density are EXACTLY
      // sf0.1's in every copy group, and groups stay gram-disjoint.
      val docs10 = hundred(spark.read.parquet(s"$src/documents.parquet"))
        .select(
          (col("c") * 100000000L + col("doc_id")).as("doc_id"),
          cipherText(col("text"), col("c"), 100).as("text"),
          col("lang"), col("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
      docs10.repartition(32).write.mode("overwrite").parquet(s"$dst/documents.parquet")
      println(s"[scalebench] built $dst/documents.parquet: " +
        s"${spark.read.parquet(s"$dst/documents.parquet").count()} docs")
    }
    if (!new java.io.File(fs, "embeddings.parquet").exists()) {
      fs.mkdirs()
      val dim = 64
      val em10 = hundred(spark.read.parquet(s"$src/embeddings.parquet"))
        .select(
          (col("c") * 100000000L + col("vec_id")).as("vec_id"),
          transform(sequence(lit(0), lit(dim - 1)),
            i => try_element_at(col("embedding"), ((i + col("c") % 64) % dim) + 1)
              * when(col("c") >= 64, lit(-1.0f)).otherwise(lit(1.0f)))
            .cast("array<float>").as("embedding"),
          col("label"))
      em10.repartition(16).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
      println(s"[scalebench] built $dst/embeddings.parquet: " +
        s"${spark.read.parquet(s"$dst/embeddings.parquet").count()} vectors")
    }
    if (!new java.io.File(fs, "orders.parquet").exists()) {
      fs.mkdirs()
      hundred(spark.read.parquet(s"$src/orders.parquet")).select(
        (col("c") * 10000000L + col("o_orderkey")).as("o_orderkey"),
        (col("c") * 1000000L + col("o_custkey")).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
        .repartition(16).write.mode("overwrite").parquet(s"$dst/orders.parquet")
      hundred(spark.read.parquet(s"$src/lineitem.parquet")).select(
        (col("c") * 10000000L + col("l_orderkey")).as("l_orderkey"),
        (col("c") * 1000000L + col("l_partkey")).as("l_partkey"),
        col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
        .repartition(32).write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
      println(s"[scalebench] built $dst TPC-H tables: " +
        s"${spark.read.parquet(s"$dst/lineitem.parquet").count()} lineitems")
    }
    if (!new java.io.File(fs, "customer.parquet").exists()) {
      // q131/q133 second decade: key-offset copies, names re-derived
      // from the offset key (same rationale as the sf1 builder —
      // verbatim names would mass-duplicate the linkage corpus)
      hundred(spark.read.parquet(s"$src/customer.parquet"))
        .select((col("c") * 1000000L + col("c_custkey")).as("c_custkey"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
        .withColumn("c_name",
          concat(lit("Customer#"), lpad(col("c_custkey").cast("string"), 9, "0")))
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"))
        .repartition(8).write.mode("overwrite").parquet(s"$dst/customer.parquet")
      println(s"[scalebench] built $dst/customer.parquet: " +
        s"${spark.read.parquet(s"$dst/customer.parquet").count()} customers")
    }
  }

  /** Affine-cipher alphabet for copy `c`: letter index i →
    * (a·i + b) mod 26 with a coprime to 26 — a bijection that keeps
    * token lengths and therefore gram structure identical across copy
    * groups. Copy 0 is the identity (a=1, b=0): original text.
    */
  private val coprimes = Seq(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)
  def cipherAlphabet(c: Int): String = {
    val a = coprimes(c / 26 % coprimes.length)
    val b = c % 26
    (0 until 26).map(i => ('a' + (a * i + b) % 26).toChar).mkString
  }
  private val abc = "abcdefghijklmnopqrstuvwxyz"

  /** Per-copy text transform: translate through [[cipherAlphabet]],
    * dispatched on the copy column by a when-chain (translate needs
    * literal alphabets). Identity for copy 0.
    */
  def cipherText(text: org.apache.spark.sql.Column,
                 c: org.apache.spark.sql.Column, nCopies: Int): org.apache.spark.sql.Column =
    (1 until nCopies).foldLeft(when(c === 0, text)) { (acc, i) =>
      acc.when(c === i, translate(text, abc, cipherAlphabet(i)))
    }

  /** 10× deterministic blow-up of sf0.1 documents+embeddings+events. */
  def buildIfMissing(spark: SparkSession, src: String, dst: String): Unit = {
    val fs = new java.io.File(dst)
    // fixed dims (region 5 / nation 25 / supplier): copied verbatim —
    // dimension tables don't grow with fact data, and the fact-side
    // FK offsets are built so every copy group still joins cleanly
    for (t <- Seq("region", "nation", "supplier")
         if !new java.io.File(fs, s"$t.parquet").exists()) {
      fs.mkdirs()
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$dst/$t.parquet")
    }
    if (!new java.io.File(fs, "events.parquet").exists()) {
      fs.mkdirs()
      // events: 10× by user-offset copies — more USERS at the same
      // per-user event density, which is how event data actually
      // grows; per-key as-of/range work stays constant while key
      // count scales. Timestamps are kept verbatim.
      // Tables.events expects the fixture layout: ts as raw NANOSECOND
      // longs (it converts ns→µs at the reader), so write the copies
      // back in that shape.
      val ev = graft.sources.Tables.events(spark, src)
      val evCopies = (0 until 10).map(lit(_))
      val ev10 = ev.select(col("*"), explode(array(evCopies: _*)).as("c"))
        .select(
          (col("c") * 10000000L + col("event_id")).as("event_id"),
          (expr("unix_micros(ts)") * 1000L).as("ts"),
          (col("c") * 100000L + col("user_id")).as("user_id"),
          col("event_type"), col("value"), col("props"))
      ev10.repartition(8).write.mode("overwrite").parquet(s"$dst/events.parquet")
      println(s"[scalebench] built $dst/events.parquet: " +
        s"${spark.read.parquet(s"$dst/events.parquet").count()} events")
    }
    if (!new java.io.File(fs, "orders.parquet").exists()) {
      // TPC-H side (q70/q74/q75): 10× by KEY-OFFSET copies — more
      // customers/orders/parts at the same per-key density, join FKs
      // offset consistently so each copy group joins only within
      // itself (per-key work constant, key count 10×).
      val copies = (0 until 10).map(lit(_))
      def ten(df: DataFrame): DataFrame =
        df.select(col("*"), explode(array(copies: _*)).as("c"))
      ten(spark.read.parquet(s"$src/orders.parquet")).select(
        (col("c") * 10000000L + col("o_orderkey")).as("o_orderkey"),
        (col("c") * 1000000L + col("o_custkey")).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority"))
        .repartition(8).write.mode("overwrite").parquet(s"$dst/orders.parquet")
      ten(spark.read.parquet(s"$src/lineitem.parquet")).select(
        (col("c") * 10000000L + col("l_orderkey")).as("l_orderkey"),
        (col("c") * 1000000L + col("l_partkey")).as("l_partkey"),
        col("l_suppkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
        .repartition(8).write.mode("overwrite").parquet(s"$dst/lineitem.parquet")
      ten(spark.read.parquet(s"$src/part.parquet")).select(
        (col("c") * 1000000L + col("p_partkey")).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice"))
        .repartition(4).write.mode("overwrite").parquet(s"$dst/part.parquet")
      println(s"[scalebench] built $dst TPC-H tables: " +
        s"${spark.read.parquet(s"$dst/lineitem.parquet").count()} lineitems")
    }
    if (!new java.io.File(fs, "customer.parquet").exists()) {
      fs.mkdirs()
      // names re-derived from the OFFSET key (the TPC-H generator
      // rule), not copied verbatim: verbatim copies would plant 10
      // identical same-nation names per customer — a mass-duplicated
      // linkage corpus (the round-8 q101/q102 lesson) whose pair
      // output grows quadratically in the copy count by construction.
      // Re-derived names keep per-key-range variant density exactly
      // sf0.1's, the honest setting for the q131/q133 slopes.
      val copies10 = (0 until 10).map(lit(_))
      spark.read.parquet(s"$src/customer.parquet")
        .select(col("*"), explode(array(copies10: _*)).as("c"))
        .select((col("c") * 1000000L + col("c_custkey")).as("c_custkey"),
          col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
        .withColumn("c_name",
          concat(lit("Customer#"), lpad(col("c_custkey").cast("string"), 9, "0")))
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"), col("c_mktsegment"))
        .repartition(4).write.mode("overwrite").parquet(s"$dst/customer.parquet")
      println(s"[scalebench] built $dst/customer.parquet: " +
        s"${spark.read.parquet(s"$dst/customer.parquet").count()} customers")
    }
    if (new java.io.File(fs, "embeddings.parquet").exists()) return
    fs.mkdirs()
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val em = spark.read.parquet(s"$src/embeddings.parquet")
    val copies = (0 until 10).map(lit(_))
    val docs10 = docs.select(col("*"), explode(array(copies: _*)).as("c"))
      .select(
        (col("c") * 10000000L + col("doc_id")).as("doc_id"),
        // copy 0 keeps the original text; copies 1..9 translate it
        // through a bijective affine char cipher — identical gram/
        // shingle structure per group, zero cross-group grams
        cipherText(col("text"), col("c"), 10).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dim = 64
    val em10 = em.select(col("*"), explode(array(copies: _*)).as("c"))
      .select(
        (col("c") * 10000000L + col("vec_id")).as("vec_id"),
        // circular shift by c: same norm/distribution, low cross-copy
        // cosine, so pair structure replicates per copy group
        transform(sequence(lit(0), lit(dim - 1)),
          i => try_element_at(col("embedding"), ((i + col("c")) % dim) + 1))
          .cast("array<float>").as("embedding"),
        col("label"))
    docs10.repartition(8).write.mode("overwrite").parquet(s"$dst/documents.parquet")
    em10.repartition(4).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
    println(s"[scalebench] built $dst: ${spark.read.parquet(s"$dst/documents.parquet").count()} docs, " +
      s"${spark.read.parquet(s"$dst/embeddings.parquet").count()} vectors")
  }
}
