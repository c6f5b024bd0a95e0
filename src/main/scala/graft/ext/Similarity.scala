package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ⊕ X15 similarity search over embedding columns (north star):
  * brute-force cosine as the exact baseline, random-hyperplane LSH as
  * the scale path.
  *
  * Numeric portability: embeddings are `array<float>`; every kernel
  * first casts to `array<double>` so the multiply-accumulate happens in
  * double on both Spark and the DuckDB oracle, with the same
  * left-to-right fold order — results agree to the last bit, and
  * rounded outputs are hash-stable.
  *
  * Design for 100 TB:
  *  - Norms are computed once per row (projection), never per pair.
  *  - The exact pair scan is an explicit O(n²) baseline for small n /
  *    oracle use; [[annLsh]] replaces it at scale: per-table bucket
  *    keys from sign bits of hyperplane projections → shuffle on
  *    (table, bucket) → within-bucket join → exact verify on the
  *    (few) candidates. Tables/bits trade recall vs cost; both are
  *    row-local expressions until the bucket shuffle.
  *  - The kNN form broadcasts the (small) query set against the
  *    (huge) vector side, then per-query top-k via the W2 window
  *    pattern.
  */
object Similarity {

  /** Cast to array<double> for portable arithmetic. */
  def vecD(a: Column): Column = a.cast("array<double>")

  /** Sequential-fold dot product. Custom codegen'd expression
    * ([[graft.functions.DotProduct]]) — same fold order as the
    * `aggregate(zip_with(...))` HOF form (bit-equal results) but ~100×
    * cheaper per pair, which dominates similarity joins.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.DotProduct.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** L2-normalize; null for zero vectors (filtered by consumers).
    * Custom one-pass expression — see [[graft.functions.L2Normalize]]
    * for why the HOF form is quadratic per row.
    */
  def normalize(a: Column): Column = graft.functions.L2Normalize.l2_normalize(a)

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact all-pairs cosine ≥ threshold (id_a < id_b). O(n²) — the
    * small-n baseline and near-dup verifier; use [[annLsh]] at scale.
    */
  def cosinePairs(df: DataFrame, id: Column, vec: Column, threshold: Double,
                  roundTo: Int = 4): DataFrame = {
    val nv = df.select(id.as("id"), normalize(vecD(vec)).as("nv"))
      .filter(col("nv").isNotNull)
    val l = nv.select(col("id").as("id_a"), col("nv").as("nv_a"))
    val r = nv.select(col("id").as("id_b"), col("nv").as("nv_b"))
    l.crossJoin(r)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("nv_a"), col("nv_b")), roundTo).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** Exact brute-force k-nearest-neighbours of each query vector:
    * broadcast the query side, dot against every row, per-query top-k
    * (rank on the rounded similarity with id tie-break so ordering is
    * engine-portable).
    */
  def bruteForceKnn(vectors: DataFrame, id: Column, vec: Column,
                    queryIds: Seq[Long], k: Int, roundTo: Int = 4): DataFrame = {
    val nv = vectors.select(id.as("id"), normalize(vecD(vec)).as("nv"))
      .filter(col("nv").isNotNull)
    val q = nv.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("nv").as("q_nv"))
    val scored = nv.join(broadcast(q), col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(dot(col("q_nv"), col("nv")), roundTo).as("cos_sim"))
    graft.ops.TopK.perGroupTopK(scored,
        Seq(col("query_id")), Seq(desc("cos_sim"), asc("neighbor_id")), k)
      .orderBy(col("query_id"), desc("cos_sim"), col("neighbor_id"))
  }

  /** Deterministic hyperplanes: unit-free gaussian-ish components from
    * a seeded LCG (java.util.Random is stable across platforms).
    */
  private[ext] def planes(numTables: Int, bitsPerTable: Int, dim: Int): Seq[Seq[Array[Double]]] = {
    val rnd = new java.util.Random(42L)
    Seq.fill(numTables)(Seq.fill(bitsPerTable)(Array.fill(dim)(rnd.nextGaussian())))
  }

  // --- IVF (inverted-file) ANN ---------------------------------------------

  /** Deterministic k-means on normalized vectors: seeds = the k
    * lowest-id vectors, `iters` Lloyd rounds. Each round is one
    * DataFrame aggregation (assign = row-local argmax of centroid
    * similarity; recompute = per-cluster mean) with only the k×dim
    * centroid matrix collected to the driver — the vector table never
    * moves. Returns the centroids (normalized).
    */
  def ivfTrain(df: DataFrame, id: Column, vec: Column, k: Int, iters: Int = 3): Array[Array[Double]] = {
    val nv = df.select(id.as("id"), normalize(vecD(vec)).as("nv"))
      .filter(col("nv").isNotNull)
    var centroids = nv.orderBy(col("id")).limit(k)
      .select(col("nv")).collect()
      .map(_.getSeq[Double](0).toArray)
    for (_ <- 0 until iters) {
      val assigned = nv.withColumn("cluster", assignCluster(col("nv"), centroids))
      // componentwise mean, fully distributed: explode to (cluster,
      // pos, v), partial-aggregated avg per component, reassemble in
      // pos order (struct array_sort orders by first field)
      val means = assigned
        .select(col("cluster"), posexplode(col("nv")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos")).agg(avg(col("v")).as("m"))
        .groupBy(col("cluster"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("mean"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      centroids = centroids.indices.map { i =>
        means.get(i).map(normalizeLocal).getOrElse(centroids(i))
      }.toArray
    }
    centroids
  }

  private def normalizeLocal(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n <= 0) v else v.map(_ / n)
  }

  /** Row-local cluster assignment: argmax of dot(nv, centroid_i) over
    * the centroid literals (ties → lowest index, deterministic).
    */
  private[ext] def assignCluster(nv: Column, centroids: Array[Array[Double]]): Column = {
    val sims = array(centroids.map(c => dot(nv, array(c.map(lit(_)): _*))): _*)
    (array_position(sims, array_max(sims)) - 1).cast("int")
  }

  /** ⊕ IVF search: assign every vector to its nearest centroid (the
    * inverted file), pick each query's `nprobe` closest centroids on
    * the driver (centroid matrix is tiny), and brute-force only inside
    * the probed clusters. At scale the assignment column is the
    * partition/bucket key: a probe touches nprobe/k of the data.
    */
  def ivfSearch(df: DataFrame, id: Column, vec: Column,
                centroids: Array[Array[Double]], queryIds: Seq[Long],
                nprobe: Int, k: Int, roundTo: Int = 4): DataFrame = {
    val nv = df.select(id.as("id"), normalize(vecD(vec)).as("nv"))
      .filter(col("nv").isNotNull)
      .withColumn("cluster", assignCluster(col("nv"), centroids))
    val queries = nv.filter(col("id").isin(queryIds: _*))
      .select(col("id").as("query_id"), col("nv").as("q_nv")).collect()
    val probed = queries.map { r =>
      val q = r.getSeq[Double](1).toArray
      val order = centroids.zipWithIndex
        .map { case (c, i) => (i, c.zip(q).map { case (a, b) => a * b }.sum) }
        .sortBy { case (i, s) => (-s, i) }.take(nprobe).map(_._1)
      (r.getLong(0), q, order.toSet)
    }
    val perQuery = probed.map { case (qid, q, clusters) =>
      val qLit = array(q.map(lit(_)): _*)
      nv.filter(col("cluster").isin(clusters.toSeq: _*) && col("id") =!= qid)
        .select(lit(qid).as("query_id"), col("id").as("neighbor_id"),
          round(dot(col("nv"), qLit), roundTo).as("cos_sim"))
    }
    val scored = perQuery.reduce(_.unionByName(_))
    graft.ops.TopK.perGroupTopK(scored,
        Seq(col("query_id")), Seq(desc("cos_sim"), asc("neighbor_id")), k)
      .orderBy(col("query_id"), desc("cos_sim"), col("neighbor_id"))
  }

  /** ⊕ ANN via random-hyperplane LSH (Charikar 2002): for each of
    * `numTables` tables, a `bitsPerTable`-bit bucket key from
    * projection signs; same-bucket pairs are candidates; exact cosine
    * verifies. Recall for similarity s: 1-(1-p^b)^L with
    * p = 1 - arccos(s)/π.
    */
  def annLsh(df: DataFrame, id: Column, vec: Column, dim: Int,
             threshold: Double, numTables: Int = 16, bitsPerTable: Int = 6,
             roundTo: Int = 4): DataFrame = {
    val ps = planes(numTables, bitsPerTable, dim)
    val nv = df.select(id.as("id"), normalize(vecD(vec)).as("nv"))
      .filter(col("nv").isNotNull)
    val buckets = ps.zipWithIndex.map { case (tablePlanes, t) =>
      val key = tablePlanes.zipWithIndex.map { case (p, b) =>
        val planeLit = array(p.map(lit(_)): _*)
        when(dot(col("nv"), planeLit) >= 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
      struct(lit(t).as("table_idx"), key.as("bucket"))
    }
    val bucketed = nv.select(col("id"), col("nv"),
        explode(array(buckets: _*)).as("tb"))
      .select(col("id"), col("nv"), col("tb.table_idx"), col("tb.bucket"))
    val l = bucketed.select(col("table_idx"), col("bucket"), col("id").as("id_a"), col("nv").as("nv_a"))
    val r = bucketed.select(col("table_idx"), col("bucket"), col("id").as("id_b"), col("nv").as("nv_b"))
    l.hint("shuffle_hash").join(r.hint("shuffle_hash"), Seq("table_idx", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("nv_a"), col("nv_b")), roundTo).as("cos_sim"))
      .distinct()
      .filter(col("cos_sim") >= threshold)
      .orderBy(col("id_a"), col("id_b"))
  }
}
