package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: measure the dedup/ANN family's scaling slope from sf0.1
  * to a synthetic sf1 (10× documents + embeddings) and print a
  * sf0.1→sf1 ratio table for BASELINE.md.
  *
  * The sf1 fixtures are a deterministic 10× blow-up of the driver's
  * sf0.1 parquet (written under /tmp, never /root/testdata), built so
  * the workload SHAPE is preserved rather than degenerate:
  *  - documents: copy c ∈ 0..9 suffixes every token with `_c<c>` (c>0),
  *    so each copy-group has exactly sf0.1's internal near-dup
  *    structure but NO cross-copy near-dups — true pair count scales
  *    exactly 10×, the honest setting for a scaling-slope measurement
  *    (identical copies would make every pair count grow 100×).
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
    buildIfMissing(spark, sf01, sf1)

    // warm (JVM, codegen, parquet footers) — same as Bench
    graft.SparkEntry.entry(spark).count()
    graft.SparkEntry.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001").count()

    def minOf3(q: String, dir: String): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }.min

    // FULL suite by default (VERDICT r6 #1); SPARK_GRAFT_ONLY filters
    // by comma-separated name prefixes for iteration.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only.fold(graft.SparkEntry.queries.keys.toSeq.sorted) { ps =>
      graft.SparkEntry.queries.keys.toSeq.sorted.filter(n => ps.exists(n.startsWith))
    }
    val md = new StringBuilder
    md ++= "| query | sf0.1 | sf1 (10x data) | time ratio |\n|---|---|---|---|\n"
    println(f"${"query"}%-24s ${"sf0.1"}%8s ${"sf1"}%8s ${"ratio"}%6s")
    selected.foreach { q =>
      val a = minOf3(q, sf01)
      val b = minOf3(q, sf1)
      println(f"$q%-24s $a%8.2f $b%8.2f ${b / a}%6.1fx")
      md ++= f"| $q | $a%.2f s | $b%.2f s | ${b / a}%.1f× |%n"
    }
    // persist the table so the console record can't be lost/truncated
    val out = java.nio.file.Paths.get("target", "scalebench_last.md")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, md.toString.getBytes("UTF-8"))
    spark.stop()
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
      ten(spark.read.parquet(s"$src/customer.parquet")).select(
        (col("c") * 1000000L + col("c_custkey")).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
        .repartition(4).write.mode("overwrite").parquet(s"$dst/customer.parquet")
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
    if (new java.io.File(fs, "embeddings.parquet").exists()) return
    fs.mkdirs()
    val docs = spark.read.parquet(s"$src/documents.parquet")
    val em = spark.read.parquet(s"$src/embeddings.parquet")
    val copies = (0 until 10).map(lit(_))
    val docs10 = docs.select(col("*"), explode(array(copies: _*)).as("c"))
      .select(
        (col("c") * 10000000L + col("doc_id")).as("doc_id"),
        // copy 0 keeps the original text; copies 1..9 suffix every
        // token so shingles (and therefore near-dup pairs) never cross
        // copy groups
        when(col("c") === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("$1_c"), col("c").cast("string"))))
          .as("text"),
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
