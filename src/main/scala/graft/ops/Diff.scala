package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ⊕ Snapshot diff — classify every key across two versions of a
  * corpus as added / removed / changed / unchanged, with column-level
  * change attribution. The inverse of [[Merge.applyChanges]] (which
  * folds a change log INTO a snapshot, this derives the change log
  * FROM two snapshots), and the primitive behind incremental
  * reprocessing: at 100 TB you re-run the expensive downstream stages
  * (dedup, embedding, quality scoring) over `added ∪ changed` only,
  * never the unchanged bulk.
  *
  * Scale shape: ONE full-outer equi-join on the key — each side
  * shuffles once on the key hash; with both snapshots bucketed by the
  * key (the layout [[graft.sinks.Layout]] writes and ScaleSpec's CDC
  * merge proves exchange-free) the join plans with zero Exchange.
  * Payload comparison is row-local null-safe equality per column —
  * no second pass, no driver state — and with the default
  * `includeUnchanged = false` the output is O(|delta|), which is the
  * whole point: a 0.1% daily churn on 100 TB yields a 100 GB diff,
  * not a second copy of the corpus.
  *
  * Requires `key` to be unique within each snapshot (it is a snapshot
  * key, not an event key); duplicate keys would fan out the full-outer
  * join and double-count changes. That requirement is ENFORCED by
  * default: each side carries a window count over the key and any
  * count > 1 raises at execution time naming the key and the first
  * offending value (`assumeUniqueKeys = true` skips the check for
  * pre-validated snapshots). The check shares the join's hash
  * partitioning on the key, so it costs a sort, not a shuffle.
  */
object Diff {

  /** Append a lazy uniqueness assertion on `key`: a window count over
    * the key (same hash partitioning the downstream join needs — no
    * extra Exchange) feeds an `assert_true` that names the side, the
    * key column, and the offending value. Kept in a Filter so column
    * pruning can't drop it.
    */
  private def requireUniqueKey(df: DataFrame, key: String, side: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col(key))
    df.withColumn("__kc", count(lit(1)).over(w))
      .filter(assert_true(col("__kc") <= 1,
        concat(lit(s"snapshotDiff: duplicate key in $side snapshot: $key="),
          col(key).cast("string"), lit(" appears "),
          col("__kc").cast("string"), lit(" times"))).isNull)
      .drop("__kc")
  }

  /** Diff `newDf` against `oldDf` on `key`.
    *
    * Output: `key`, `change_type` ('added' | 'removed' | 'changed' |
    * 'unchanged'), `changed_cols` (array of column names whose values
    * differ under null-safe equality, in alphabetical order; empty
    * unless `change_type = 'changed'`).
    *
    * `compareCols` defaults to every non-key column present in BOTH
    * snapshots (schema drift between versions is thus tolerated: a
    * column only one side carries can't be compared row-by-row and is
    * ignored rather than crashing the diff — the S5 tolerance stance).
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, key: String,
                   compareCols: Seq[String] = Nil,
                   includeUnchanged: Boolean = false,
                   assumeUniqueKeys: Boolean = false): DataFrame = {
    val payload: Seq[String] =
      (if (compareCols.nonEmpty) compareCols
       else oldDf.columns.toSeq.filterNot(_ == key)
         .intersect(newDf.columns.toSeq)).sorted
    require(payload.nonEmpty,
      s"snapshotDiff: no shared non-key columns to compare (key=$key)")
    val oChecked = if (assumeUniqueKeys) oldDf else requireUniqueKey(oldDf, key, "old")
    val nChecked = if (assumeUniqueKeys) newDf else requireUniqueKey(newDf, key, "new")
    val o = oChecked.select(col(key) +:
      payload.map(c => col(c).as(s"__o_$c")): _*).withColumn("__in_o", lit(true))
    val n = nChecked.select(col(key) +:
      payload.map(c => col(c).as(s"__n_$c")): _*).withColumn("__in_n", lit(true))
    def differs(c: String): Column = !(col(s"__o_$c") <=> col(s"__n_$c"))
    // array-of-whens + filter builds changed_cols directly — a column
    // name containing a comma (or any delimiter) round-trips intact,
    // where a concat_ws/split pair would silently mis-split it
    val changedArr = filter(
      array(payload.map(c => when(differs(c), lit(c))): _*), _.isNotNull)
    val out = o.join(n, Seq(key), "full_outer")
      .withColumn("change_type",
        when(col("__in_o").isNull, lit("added"))
          .when(col("__in_n").isNull, lit("removed"))
          .when(size(changedArr) > 0, lit("changed"))
          .otherwise(lit("unchanged")))
      .withColumn("changed_cols",
        when(col("change_type") === "changed", changedArr)
          .otherwise(array().cast("array<string>")))
      .select(col(key), col("change_type"), col("changed_cols"))
    if (includeUnchanged) out else out.filter(col("change_type") =!= "unchanged")
  }

  /** [[snapshotDiffBucketed]]'s result: the delta plus the pruning
    * evidence (how much of the corpus the row-level join never read).
    */
  final case class BucketedDiff(diff: DataFrame, totalBuckets: Int,
                                changedBuckets: Seq[Int], totalFiles: Int,
                                prunedFiles: Int)

  /** ⊕ File-stats fast path for snapshot diff over two BUCKETED
    * snapshots ([[graft.sinks.Bucketed]] layout, both bucketed by the
    * diff key with equal bucket counts — validated from catalog
    * metadata, not trusted): per-bucket file CONTENT hashes decide
    * which buckets churned, and the row-level [[snapshotDiff]] reads
    * ONLY those buckets' files. This is the real 100 TB diff
    * optimization: a 0.1% daily churn touches ~0.1% of buckets, so
    * the full-outer join scans gigabytes, not the corpus — the
    * unchanged bulk is never opened by the row diff (checksumming
    * reads bytes once, sequentially, with no decode and no shuffle).
    *
    * Correctness: a key's bucket is a pure function of (key, bucket
    * count), so a key cannot move between buckets across snapshots —
    * diffing the churned buckets is complete. Byte-equality is a
    * SUFFICIENT condition for row-equality (same sorted layout, same
    * writer): byte-identical buckets contain identical rows and
    * contribute only `unchanged` classifications, which the default
    * `includeUnchanged = false` output omits anyway (the fast path
    * therefore does not offer includeUnchanged). Byte inequality is
    * conservative — a bucket rewritten with different task splits
    * re-diffs at row level and contributes nothing if rows match.
    * The duplicate-key guard applies to the churned subset only;
    * byte-identical skipped buckets cannot produce a non-`unchanged`
    * row either way.
    *
    * Checksums are computed executor-side (`binaryFile` source +
    * md5); only (file, bucket, md5) triples — one per ~128 MB file —
    * reach the driver.
    */
  def snapshotDiffBucketed(spark: org.apache.spark.sql.SparkSession,
                           oldTable: String, newTable: String, key: String,
                           compareCols: Seq[String] = Nil): BucketedDiff = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val (oldLoc, oldSpec) = ColumnBridge.tableLayout(spark, oldTable)
    val (newLoc, newSpec) = ColumnBridge.tableLayout(spark, newTable)
    def demand(spec: Option[(Int, Seq[String])], t: String): Int = spec match {
      case Some((n, cols)) if cols == Seq(key) => n
      case Some((_, cols)) => throw new IllegalArgumentException(
        s"snapshotDiffBucketed: $t is bucketed by ${cols.mkString(",")}, not by diff key '$key'")
      case None => throw new IllegalArgumentException(
        s"snapshotDiffBucketed: $t is not bucketed — use snapshotDiff")
    }
    val nOld = demand(oldSpec, oldTable)
    val nNew = demand(newSpec, newTable)
    require(nOld == nNew,
      s"snapshotDiffBucketed: bucket counts differ ($oldTable=$nOld, $newTable=$nNew) — " +
        "keys would map to different buckets; rewrite one side or use snapshotDiff")

    val BucketRe = "_(\\d{5})\\.".r
    def listFiles(loc: String): Seq[(Int, String)] = {
      val p = new org.apache.hadoop.fs.Path(loc)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).toSeq
        .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
        .map { s =>
          val name = s.getPath.getName
          val b = BucketRe.findFirstMatchIn(name).map(_.group(1).toInt)
            .getOrElse(throw new IllegalStateException(
              s"snapshotDiffBucketed: no bucket id in file name '$name' under $loc"))
          (b, s.getPath.toString)
        }
    }
    val oldFiles = listFiles(oldLoc)
    val newFiles = listFiles(newLoc)

    def bucketHashes(files: Seq[(Int, String)]): Map[Int, Set[String]] = {
      if (files.isEmpty) Map.empty
      else {
        val byPath = files.map { case (b, p) => p -> b }.toMap
        spark.read.format("binaryFile").load(files.map(_._2): _*)
          .select(col("path"), md5(col("content")).as("h"))
          .collect()
          .map(r => byPath(r.getString(0)) -> r.getString(1))
          .groupBy(_._1).map { case (b, hs) => b -> hs.map(_._2).toSet }
      }
    }
    val oldHash = bucketHashes(oldFiles)
    val newHash = bucketHashes(newFiles)
    val allBuckets = (oldHash.keySet ++ newHash.keySet)
    val changed = allBuckets.filter(b =>
      oldHash.getOrElse(b, Set.empty) != newHash.getOrElse(b, Set.empty)).toSeq.sorted

    val schemaOld = spark.table(oldTable).schema
    val schemaNew = spark.table(newTable).schema
    def readSubset(files: Seq[(Int, String)],
                   schema: org.apache.spark.sql.types.StructType): DataFrame = {
      val paths = files.filter(f => changed.contains(f._1)).map(_._2)
      if (paths.isEmpty)
        spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
      else spark.read.schema(schema).parquet(paths: _*)
    }
    val diff = snapshotDiff(readSubset(oldFiles, schemaOld),
      readSubset(newFiles, schemaNew), key, compareCols)
    val total = oldFiles.size + newFiles.size
    val read = oldFiles.count(f => changed.contains(f._1)) +
      newFiles.count(f => changed.contains(f._1))
    BucketedDiff(diff, nOld, changed, total, total - read)
  }

  /** The incremental-reprocessing driver: the `added ∪ changed` rows
    * of `newDf`, i.e. exactly the keys whose downstream derivations
    * are stale. Composes [[snapshotDiff]] with a semi-join back to the
    * new snapshot (same key partitioning — AQE reuses the exchange).
    */
  def staleRows(oldDf: DataFrame, newDf: DataFrame, key: String,
                compareCols: Seq[String] = Nil,
                assumeUniqueKeys: Boolean = false): DataFrame = {
    val delta = snapshotDiff(oldDf, newDf, key, compareCols,
        includeUnchanged = false, assumeUniqueKeys = assumeUniqueKeys)
      .filter(col("change_type").isin("added", "changed"))
      .select(col(key))
    newDf.join(delta, Seq(key), "left_semi")
  }
}
