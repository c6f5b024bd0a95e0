package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

import scala.util.{Failure, Success, Try}

/** Parquet table readers over a scale-factor directory, plus the
  * error-tolerant multi-source union (SURVEY.md §2.1 S5, reference
  * `app.py:294-301` — iterate sources, skip the ones that fail) and the
  * session-level result cache (S8, `app.py:223`,
  * `devcontainer.json:19`).
  *
  * Scale note: each reader is a plain declarative parquet scan so
  * Catalyst can push filters/limits and prune columns into the source;
  * nothing here forces materialization on the driver.
  */
object Tables {

  /** `spark.read.parquet(s"$dir/$name.parquet")` — the single choke
    * point for table access so options (e.g. corrupt-file tolerance)
    * apply uniformly.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  /** `events.ts` has shipped with three different physical types across
    * fixture generations — parquet TIMESTAMP(NANOS) (which Spark 4
    * refuses to read natively, PARQUET_TYPE_ILLEGAL, so it surfaces as
    * a nanos `long` under `spark.sql.legacy.parquet.nanosAsLong`),
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as TIMESTAMP_NTZ),
    * and plain UTC-adjusted micros (TimestampType). Dispatch on the
    * decoded type so every consumer sees one canonical µs
    * TimestampType column regardless of which fixture generation is on
    * disk. The session timezone is UTC everywhere in this project, so
    * the NTZ→timestamp cast is instant-preserving and matches DuckDB's
    * reading of the same file.
    */
  /** Set `nanosAsLong` once per session, idempotently: the readers
    * below need it to DECODE TIMESTAMP(NANOS) fixtures at all, but a
    * reader should not re-write session state on every call — prefer
    * setting it at session init ([[graft.Verify]]/[[graft.Bench]]
    * builders do); this is the self-healing fallback for sessions
    * that didn't.
    */
  private def ensureNanosAsLong(spark: SparkSession): Unit = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(key).contains("true")) spark.conf.set(key, "true")
  }

  def events(spark: SparkSession, dir: String): DataFrame = {
    ensureNanosAsLong(spark)
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      // integral `div`, not Column./ — double division of a ~1.7e18 ns
      // epoch exceeds 2^53 and can shift values across a µs boundary
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => df
      case other =>
        throw new IllegalStateException(
          s"events.ts: unsupported physical type $other — expected nanos long, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")

  /** S5 — error-tolerant multi-source union: read every path that can
    * be read, silently skip the ones that can't (missing file, bad
    * footer, permission), and union the survivors by name. Mirrors the
    * reference's per-source `except (NotFound, Forbidden, BadRequest):
    * continue` loop (`app.py:294-301`).
    *
    * Returns None when no source was readable (reference yields an
    * empty result in that case, `app.py:303`).
    */
  def unionTolerant(spark: SparkSession, paths: Seq[String]): Option[DataFrame] = {
    val readable = paths.flatMap { p =>
      Try(spark.read.parquet(p)) match {
        case Success(df) => Some(df)
        case Failure(_)  => None
      }
    }
    readable.reduceOption(_.unionByName(_, allowMissingColumns = true))
  }

  /** S5 file-level analog: a single multi-path scan that tolerates
    * corrupt/missing files inside the glob (Spark-native form — one
    * scan node, full pushdown, instead of N unioned scans).
    */
  def readTolerant(spark: SparkSession, schema: Option[StructType], paths: String*): DataFrame = {
    val r0 = spark.read
      .option("ignoreCorruptFiles", "true")
      .option("ignoreMissingFiles", "true")
    val r = schema.fold(r0)(r0.schema)
    r.parquet(paths: _*)
  }

  /** S5 schema-level extension — schema-tolerant read: open `path` and
    * coerce each column to `expected`'s type when the on-disk physical
    * type is a compatible variant, failing LOUDLY with a full schema
    * diff otherwise. This is the engine-grade generalization of the
    * [[events]] dispatch: upstream producers legitimately re-encode
    * the same logical data across generations (ns vs µs timestamps,
    * UTC-adjusted vs NTZ, int32 vs int64), and a pipeline should
    * absorb those, not crash 30 queries downstream of the scan.
    *
    * Coercions applied (anything else is a hard error, never silent):
    *  - nanos-epoch `long` → TimestampType / TimestampNTZType
    *    (parquet TIMESTAMP(NANOS) surfaces as LongType under
    *    `spark.sql.legacy.parquet.nanosAsLong` — Spark 4 cannot decode
    *    it natively; integral `div 1000`, see [[events]])
    *  - TimestampNTZType ↔ TimestampType (session-TZ cast; this
    *    project pins the session to UTC so the cast is
    *    instant-preserving)
    *  - integral widening: byte → short → int → long
    *  - float → double
    *  - identical types pass through untouched
    *
    * Extra on-disk columns are pruned (the projection is `expected`'s
    * column list, in `expected`'s order — Catalyst pushes it into the
    * scan); a MISSING column is an error, since fabricating nulls would
    * silently corrupt downstream aggregates. Nullability is not
    * enforced (parquet stats can't prove it).
    */
  def readNormalized(spark: SparkSession, path: String, expected: StructType): DataFrame = {
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types._
    ensureNanosAsLong(spark)
    val df = spark.read.parquet(path)
    val actual = df.schema
    def fail(why: String): Nothing = throw new IllegalStateException(
      s"readNormalized($path): $why\n--- expected ---\n${expected.treeString}--- on disk ---\n${actual.treeString}")
    def widens(from: DataType, to: DataType): Boolean = (from, to) match {
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType)            => true
      case (IntegerType, LongType)                        => true
      case (FloatType, DoubleType)                        => true
      case _                                              => false
    }
    // match on-disk names with the session's resolver (case-insensitive
    // unless spark.sql.caseSensitive) — a producer that re-cases a
    // column ('ID' vs 'id') is a coercion case, not a missing column
    val caseSensitive =
      spark.conf.get("spark.sql.caseSensitive", "false").toBoolean
    def sameName(a: String, b: String): Boolean =
      if (caseSensitive) a == b else a.equalsIgnoreCase(b)
    val cols: Seq[Column] = expected.fields.toSeq.map { ef =>
      val af = actual.find(f => sameName(f.name, ef.name))
        .getOrElse(fail(s"column '${ef.name}' missing on disk"))
      (af.dataType, ef.dataType) match {
        case (a, e) if a == e => col(af.name).as(ef.name)
        case (LongType, TimestampType) =>
          timestamp_micros(expr(s"`${af.name}` div 1000")).as(ef.name)
        case (LongType, TimestampNTZType) =>
          timestamp_micros(expr(s"`${af.name}` div 1000")).cast(TimestampNTZType).as(ef.name)
        case (TimestampNTZType, TimestampType) | (TimestampType, TimestampNTZType) =>
          col(af.name).cast(ef.dataType).as(ef.name)
        case (a, e) if widens(a, e) => col(af.name).cast(e).as(ef.name)
        case (a, e) =>
          fail(s"column '${ef.name}': on-disk $a is not a supported coercion to expected $e")
      }
    }
    df.select(cols: _*)
  }

  /** S8 — in-memory result store: persist + register under a stable
    * name derived from normalized params (reference normalizes the
    * cache key by sorting the query tuple, `app.py:205`). Entries
    * registered here never expire; use [[cacheResultWithTtl]] for the
    * reference's TTL semantics.
    */
  def cacheResult(df: DataFrame, name: String, params: Seq[String] = Nil): DataFrame =
    cacheResultWithTtl(df, name, params, ttlSeconds = Long.MaxValue)

  /** The reference's cache TTL (`devcontainer.json:19` — 3600 s). */
  val DefaultTtlSeconds: Long = 3600L

  private def cacheKey(name: String, params: Seq[String]): String =
    (name +: params.sorted).mkString("_").replaceAll("[^A-Za-z0-9_]", "_")

  /** entry key → (createdAt ms, ttl s, the persisted plan) */
  private val cacheMeta =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, DataFrame)]()

  /** S8 with the reference's TTL policy: the entry is served by
    * [[cachedResult]] until `ttlSeconds` after creation, then evicted
    * LAZILY on the first access past the deadline (unpersist + view
    * drop) — expiry-on-read, exactly the reference's session-cache
    * behavior (`app.py:223`, ttl `devcontainer.json:19`). `now` is
    * injectable for deterministic tests; eviction never runs a
    * background thread.
    */
  def cacheResultWithTtl(df: DataFrame, name: String, params: Seq[String],
                         ttlSeconds: Long = DefaultTtlSeconds,
                         now: () => Long = () => System.currentTimeMillis()): DataFrame = {
    val key = cacheKey(name, params)
    // compute() serializes writers per key, so the persist → view swap →
    // old-entry unpersist sequence is atomic w.r.t. a concurrent
    // cacheResultWithTtl for the same key — without it the loser's
    // unpersist could release the DataFrame currently backing the view.
    // Replacing a live entry must release its persisted blocks — the
    // temp view swap alone would leak the old persist until shutdown.
    cacheMeta.compute(key, (_, old) => {
      val persisted = df.persist(StorageLevel.MEMORY_AND_DISK)
      persisted.createOrReplaceTempView(key)
      if (old != null && (old._3 ne persisted)) old._3.unpersist()
      (now(), ttlSeconds, persisted)
    })._3
  }

  /** Read path of the S8 store: Some(live entry), or None after lazy
    * TTL eviction (or if never cached). Callers recompute and
    * re-[[cacheResultWithTtl]] on None — the reference's
    * check-then-recompute loop.
    */
  def cachedResult(spark: SparkSession, name: String, params: Seq[String] = Nil,
                   now: () => Long = () => System.currentTimeMillis()): Option[DataFrame] = {
    val key = cacheKey(name, params)
    // Expiry runs INSIDE compute(): unpersist + view drop happen while
    // holding the same per-key bin that serializes writers, so a
    // concurrent cacheResultWithTtl can never install a fresh entry /
    // temp view between this reader's "expired" judgment and its view
    // drop (the earlier remove-then-drop form had exactly that window
    // and could drop the WRITER'S fresh view). Remapping to null
    // removes the entry atomically.
    Option(cacheMeta.compute(key, (_, entry) => {
      if (entry == null) null
      else {
        val (created, ttl, df) = entry
        // Compare in seconds: `ttl * 1000L` overflows for large non-
        // sentinel ttls, which would read as instant expiry.
        if (ttl != Long.MaxValue && (now() - created) / 1000L >= ttl) {
          df.unpersist()
          spark.catalog.dropTempView(key)
          null
        } else entry
      }
    })).map(_._3)
  }
}
