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
    *
    * Guarded: refuses above `maxRows` input rows so the cartesian plan
    * cannot be reached accidentally at scale (the guard is an eager
    * count — acceptable for an explicitly small-n baseline). Raise the
    * limit consciously to override.
    */
  def cosinePairs(df: DataFrame, id: Column, vec: Column, threshold: Double,
                  roundTo: Int = 4, maxRows: Long = 100000L): DataFrame = {
    // bounded probe, not a full count: LocalLimit early-terminates the
    // scan at maxRows+1 rows, so the guard never pays more than the
    // limit it enforces
    val over = df.limit((maxRows + 1).min(Int.MaxValue.toLong).toInt).count() > maxRows
    require(!over,
      s"cosinePairs is an O(n^2) exact baseline; input exceeds maxRows=$maxRows. " +
        "Use annLsh/ivf for large inputs, or raise maxRows explicitly.")
    val nv = df.select(id.as("id"), normalize(vecD(vec)).as("nv"))
      .filter(col("nv").isNotNull)
    val l = nv.select(col("id").as("id_a"), col("nv").as("nv_a"))
    val r = nv.select(col("id").as("id_b"), col("nv").as("nv_b"))
    l.crossJoin(r)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(dot(col("nv_a"), col("nv_b")), roundTo).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      // Eager checkpoint before the sort: orderBy's range-partitioning
      // SAMPLING pass re-executes its child, and this child has no
      // shuffle boundary to reuse (broadcast-NL join is narrow), so
      // without it the whole O(n²) scan runs twice per action
      // (measured ~2× on q25). The tiny thresholded result
      // materializes once; the sort reads the blocks. (Eager, like
      // every checkpoint in-tree: lazy finalization from a broadcast
      // thread deadlocks against the DAG scheduler — round-17 bench.)
      // NOTE the eager trade-off: CONSTRUCTING this DataFrame runs the
      // O(n²) scan immediately — callers that build the query without
      // executing it (plan sweeps, registries) still pay the job. The
      // maxRows guard above bounds that cost; plan-only tooling should
      // prefer the banded/IVF paths.
      .localCheckpoint()
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

  /** [[bruteForceKnn]] with the query side as a DataFrame (the
    * ivfSearchDf batch shape) — the exact ground-truth generator for
    * [[recallAtK]]. Still the labeled O(n·q) baseline: broadcast the
    * query table, score every corpus row.
    */
  def bruteForceKnnDf(vectors: DataFrame, id: Column, vec: Column,
                      queries: DataFrame, qid: Column, qvec: Column,
                      k: Int, roundTo: Int = 4): DataFrame = {
    val nv = vectors.select(id.as("id"), normalize(vecD(vec)).as("nv"))
      .filter(col("nv").isNotNull)
    val q = queries.select(qid.as("query_id"), normalize(vecD(qvec)).as("q_nv"))
      .filter(col("q_nv").isNotNull)
    val scored = nv.join(broadcast(q), col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(dot(col("q_nv"), col("nv")), roundTo).as("cos_sim"))
    graft.ops.TopK.perGroupTopK(scored,
        Seq(col("query_id")), Seq(desc("cos_sim"), asc("neighbor_id")), k)
      .orderBy(col("query_id"), desc("cos_sim"), col("neighbor_id"))
  }

  /** ⊕ Recall@k of an approximate neighbor table against the exact
    * ground truth — the standard ANN index-quality measurement (the
    * number a FAISS deployment tunes nprobe against). Both inputs are
    * `(query_id, neighbor_id, ...)` tables; the query universe is the
    * EXACT side's distinct queries, so a query the index lost
    * entirely surfaces with recall 0 instead of vanishing. One
    * equi-semi-join + one count per query — nothing quadratic; with
    * deterministic tie-breaks on both input rankings the measurement
    * is exact and oracle-able, not a sampled estimate.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"recallAtK needs k > 0, got $k")
    val a = approx.select(col("query_id"), col("neighbor_id"))
    val e = exact.select(col("query_id"), col("neighbor_id"))
    val hits = e.join(a, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    e.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)) / lit(k.toDouble), 4).as("recall"))
  }

  /** ⊕ Ranking-quality metrics beyond recall — per-query MRR and
    * nDCG@k of an approximate neighbor ranking against the exact
    * ranking as graded ground truth (the IR-evaluation pair a
    * retrieval deployment reports next to [[recallAtK]]: recall says
    * whether the true neighbors are FOUND, these say whether they are
    * found EARLY). Relevance is graded by exact rank — `rel = k+1 −
    * exact_rank` for the exact top-k, 0 otherwise — so displacing the
    * true #1 costs more than displacing the true #10; IDCG is the
    * constant perfect-ordering fold, making nDCG comparable across
    * queries. Both inputs are `(query_id, neighbor_id, cos_sim)`
    * tables with deterministic tie-breaks (the q38/q24 chains); ranks
    * are re-derived here under the same `(cos_sim desc, neighbor_id)`
    * order, so the measurement is exact and oracle-able. The query
    * universe is the exact side's — a query the index loses entirely
    * surfaces at 0/0/0, never vanishes.
    *
    * Plan shape: both inputs are already model-sized (q·k rows — the
    * corpus never reaches this operator), so the two rank windows and
    * the metric join cost nothing at any corpus scale.
    */
  def rankingMetrics(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"rankingMetrics needs k > 0, got $k")
    import org.apache.spark.sql.expressions.Window
    def ranked(df: DataFrame, rankCol: String) =
      df.select(col("query_id"), col("neighbor_id"),
          row_number().over(Window.partitionBy(col("query_id"))
            .orderBy(desc("cos_sim"), asc("neighbor_id"))).as(rankCol))
        .filter(col(rankCol) <= k)
    val a = ranked(approx, "rank_a")
    val e = ranked(exact, "rank_e")
    val hits = e.join(a, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_hits"),
        max(lit(1.0) / col("rank_a")).as("__mrr"),
        sum((lit(k + 1) - col("rank_e")) / log2(col("rank_a") + 1)).as("__dcg"))
    val idcg = (1 to k).map(i => (k + 1 - i) / (math.log(i + 1.0) / math.log(2.0))).sum
    e.select(col("query_id")).distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("__mrr"), lit(0.0)), 4).as("mrr"),
        round(coalesce(col("__dcg"), lit(0.0)) / lit(idcg), 4).as("ndcg"))
  }

  /** Deterministic ±1 hyperplane component for (table, bit, dim-index):
    * sign from md5 parity of `"t|b|d"` (low bit of the first digest
    * byte). Rademacher sign projections are a standard SRP-LSH variant
    * (Achlioptas 2001, database-friendly random projections), and —
    * unlike seeded gaussians — the rule is re-computable in ANSI SQL,
    * so the whole bucketing pipeline is oracle-checkable. Single source
    * of truth lives in [[graft.functions.LshBuckets.planeComp]] (the
    * codegen expression that evaluates the planes per row).
    */
  private[ext] def planeComp(t: Int, b: Int, d: Int): Double =
    graft.functions.LshBuckets.planeComp(t, b, d)

  // --- IVF (inverted-file) ANN ---------------------------------------------

  /** Trained IVF index: the k×dim centroid matrix plus the
    * cluster-assigned (and cached) normalized vector table. The
    * assignment column is the partition key of the inverted file — at
    * scale it would be the bucketing/partition column of the stored
    * table, so a probe touches nprobe/k of the data.
    */
  final case class IvfModel(centroids: Array[Array[Double]], assigned: DataFrame) {
    def unpersist(): Unit = { assigned.unpersist(); () }
  }

  /** Deterministic k-means on normalized vectors: seeds = the k
    * lowest-id vectors, `iters` Lloyd rounds. Each round is one
    * DataFrame aggregation (assign = row-local argmax of centroid
    * similarity; recompute = per-cluster mean) with only the k×dim
    * centroid matrix collected to the driver — the vector table never
    * moves. The normalized table is persisted across the rounds (each
    * round is a separate action; without the cache every round re-reads
    * and re-normalizes the source), and the returned model carries the
    * final cluster assignment, also persisted, for [[ivfSearch]].
    */
  /** @param quantize when set, round every centroid component to this
    *   many decimals after each update (seeds, each Lloyd round). The
    *   cluster structure is insensitive to 1e-9 jitter, but summation
    *   order is engine-specific — quantized centroids make the whole
    *   train+assign+search pipeline reproducible in ANSI SQL, which is
    *   what lets the q38 oracle hash-compare the results.
    *
    *   Tie-mode caveat (applies to every 9-dp quantization site in
    *   this file): Scala's `math.rint` is half-to-even while DuckDB's
    *   `round()` is half-away-from-zero and Spark SQL `round()` is
    *   HALF_UP, so an EXACT .5 tie at the quantization decimal would
    *   diverge across engines. For doubles that have already been
    *   through products/means the tie set is measure-zero (no tie has
    *   ever surfaced across the oracled suite — 147/147 hash-green);
    *   the quantization guarantees reproducibility up to that caveat,
    *   not unconditional bit-identity.
    */
  def ivfFit(df: DataFrame, id: Column, vec: Column, k: Int, iters: Int = 3,
             quantize: Option[Int] = None): IvfModel = {
    def q(v: Array[Double]): Array[Double] = quantize.fold(v) { dp =>
      val scale = math.pow(10, dp)
      v.map(x => math.rint(x * scale) / scale)
    }
    val nv = df.select(id.as("id"), normalize(vecD(vec)).as("nv"))
      .filter(col("nv").isNotNull)
      .persist()
    var centroids = nv.orderBy(col("id")).limit(k)
      .select(col("nv")).collect()
      .map(r => q(r.getSeq[Double](0).toArray))
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
        means.get(i).map(m => q(normalizeLocal(q(m)))).getOrElse(centroids(i))
      }.toArray
    }
    val assigned = nv.withColumn("cluster", assignCluster(col("nv"), centroids)).persist()
    assigned.count()  // materialize before dropping the upstream cache
    nv.unpersist()
    IvfModel(centroids, assigned)
  }

  private def normalizeLocal(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n <= 0) v else v.map(_ / n)
  }

  /** Plan-size ceiling for the literal-centroid argmax: the flat form
    * embeds k · dim literal nodes into ONE projection (k=64 × 64 dims
    * ≈ 4k nodes — fine; k=5000 ≈ 320k — past what codegen tolerates,
    * the round-12 documented residual). Above this k,
    * [[assignCluster]] switches to [[graft.functions.CentroidArgmax]]
    * — one expression node carrying the matrix as a reference object,
    * bit-identical results (exact branch-and-bound, proved by
    * CentroidArgmaxSpec and the q188 oracle).
    */
  val FlatAssignMaxK = 64

  /** Row-local cluster assignment: argmax of dot(nv, centroid_i),
    * ties → lowest index, deterministic. Flat centroid literals up to
    * [[FlatAssignMaxK]]; the O(1)-plan-size indexed expression above
    * it — both produce identical assignments (and identical bits to
    * the SQL oracle's `list_position(sims, list_max(sims))` replay).
    */
  private[ext] def assignCluster(nv: Column, centroids: Array[Array[Double]]): Column =
    if (centroids.length <= FlatAssignMaxK) {
      val sims = array(centroids.map(c => dot(nv, array(c.map(lit(_)): _*))): _*)
      (array_position(sims, array_max(sims)) - 1).cast("int")
    } else graft.functions.CentroidArgmax.centroid_argmax(nv, centroids)

  /** ⊕ IVF search, single-pass: each query row computes its `nprobe`
    * closest centroids IN the plan (the centroid matrix is a literal),
    * explodes to (query, probed_cluster), and one broadcast join
    * against the cluster-assigned table scores only the probed
    * clusters. Plan size and scan count are constant in the number of
    * queries — no per-query driver-side plan assembly.
    */
  def ivfSearch(model: IvfModel, queryIds: Seq[Long],
                nprobe: Int, k: Int, roundTo: Int = 4): DataFrame =
    ivfSearchCore(model,
      model.assigned.filter(col("id").isin(queryIds: _*))
        .select(col("id").as("query_id"), col("nv").as("q_nv")),
      nprobe, k, roundTo)

  /** ⊕ [[ivfSearch]] with the query side as a DataFrame — the batch
    * shape ("nearest corpus neighbors for every new document today"):
    * `queries` is any (id, vector) table; vectors are L2-normalized
    * here, probe selection and scoring run per query ROW with no
    * driver-side id list, so the query side scales to a table, not an
    * `isin` literal. Neighbors whose corpus id equals the query id
    * are excluded (self-match, when querying the corpus by its own
    * vectors); null/zero query vectors are dropped.
    */
  def ivfSearchDf(model: IvfModel, queries: DataFrame, qid: Column, qvec: Column,
                  nprobe: Int, k: Int, roundTo: Int = 4): DataFrame =
    ivfSearchCore(model,
      queries.select(qid.as("query_id"), normalize(vecD(qvec)).as("q_nv"))
        .filter(col("q_nv").isNotNull),
      nprobe, k, roundTo)

  /** Shared core over a prepared `(query_id, q_nv)` side. */
  private def ivfSearchCore(model: IvfModel, qdf: DataFrame,
                            nprobe: Int, k: Int, roundTo: Int): DataFrame = {
    val cents = model.centroids
    // probe selection: (negated sim, idx) structs sort
    // lexicographically = sim desc, idx-asc tie-break — deterministic
    // probe order. Literal form up to FlatAssignMaxK; above it, the
    // O(1)-plan-size indexed top-p expression (bit-equal order —
    // CentroidArgmaxSpec)
    val probes =
      if (cents.length <= FlatAssignMaxK) {
        val ranked = array_sort(array(cents.indices.map(i =>
          struct((-dot(col("q_nv"), array(cents(i).map(lit(_)): _*))).as("neg_sim"),
            lit(i).as("idx"))): _*))
        transform(slice(ranked, 1, nprobe), s => s.getField("idx"))
      } else graft.functions.CentroidArgmax.centroid_topk(col("q_nv"), cents, nprobe)
    val probed = qdf.withColumn("cluster", explode(probes))
      .select(col("query_id"), col("q_nv"), col("cluster"))
    val scored = model.assigned.join(broadcast(probed), Seq("cluster"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        round(dot(col("q_nv"), col("nv")), roundTo).as("cos_sim"))
    graft.ops.TopK.perGroupTopK(scored,
        Seq(col("query_id")), Seq(desc("cos_sim"), asc("neighbor_id")), k)
      .orderBy(col("query_id"), desc("cos_sim"), col("neighbor_id"))
  }

  // --- Product quantization (IVF-PQ) ---------------------------------------

  /** Trained product quantizer: `codebooks(j)(c)` is codeword `c` of
    * subspace `j` (m subspaces × k codewords × (dim/m) components),
    * and `codes` carries each vector's m-byte encoding
    * `(id, nv, codes: array<int>)`. The codebook is m·k·(dim/m) = k·dim
    * doubles of driver state regardless of corpus size — broadcast-tier.
    */
  final case class PqModel(codebooks: Array[Array[Array[Double]]], codes: DataFrame) {
    def unpersist(): Unit = { codes.unpersist(); () }
  }

  /** ⊕ Product-quantization fit (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search" — the FAISS IVF-PQ
    * compression stage): split each normalized vector into `m`
    * subvectors and k-means each subspace independently; a vector is
    * then stored as m small codes (m=4, k=16 → 4 codes ≈ 2 bytes
    * vs 64 doubles = 512 bytes, a 128× index compression — the
    * difference between an embedding index that fits executor memory
    * at 100 TB corpus scale and one that doesn't).
    *
    * Determinism contract (the [[ivfFit]] convention): seeds are the
    * k lowest-id vectors' subvectors, Lloyd rounds recompute
    * componentwise means quantized to `quantize` decimals, code
    * assignment is argmin squared distance with lowest-index
    * tie-break via the same first-position-of-max trick both engines
    * share — so the q143 oracle replays the whole chain in SQL and
    * hash-matches.
    *
    * Shape: one subvector explosion (m rows per vector) persisted
    * across rounds; each Lloyd round is one distributed aggregation
    * keyed (subspace, code, component) with only the m·k×(dim/m)
    * codebook collected to the driver; final encoding is one
    * row-local assignment + one (id)-grouped pivot back to an
    * m-element code array. The vector table itself never moves.
    */
  def pqFit(df: DataFrame, id: Column, vec: Column, m: Int = 4, k: Int = 16,
            iters: Int = 1, quantize: Option[Int] = Some(9)): PqModel = {
    def q(v: Array[Double]): Array[Double] = quantize.fold(v) { dp =>
      val scale = math.pow(10, dp)
      v.map(x => math.rint(x * scale) / scale)
    }
    val nv = df.select(id.as("id"), normalize(vecD(vec)).as("nv"))
      .filter(col("nv").isNotNull).persist()
    val seeds = nv.orderBy(col("id")).limit(k).select(col("nv")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(seeds.nonEmpty, "pqFit: no non-null vectors")
    val d = seeds(0).length
    require(d % m == 0, s"pqFit: dim $d not divisible by m=$m subspaces")
    val sub = d / m
    var codebooks: Array[Array[Array[Double]]] =
      Array.tabulate(m)(j => seeds.map(s => q(s.slice(j * sub, (j + 1) * sub))))
    val subs = nv.select(col("id"), posexplode(array((0 until m).map(j =>
        slice(col("nv"), j * sub + 1, sub)): _*)).as(Seq("j", "s"))).persist()
    for (_ <- 0 until iters) {
      val assigned = subs.withColumn("code", assignCode(col("s"), col("j"), codebooks))
      // componentwise mean per (subspace, code) — the ivfFit explode/
      // reassemble, with the subspace id added to the grouping key; PQ
      // centroids are NOT re-normalized (subvectors aren't unit)
      val means = assigned
        .select(col("j"), col("code"), posexplode(col("s")).as(Seq("pos", "v")))
        .groupBy(col("j"), col("code"), col("pos")).agg(avg(col("v")).as("mn"))
        .groupBy(col("j"), col("code"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
          x => x.getField("mn")).as("mean"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2).toArray).toMap
      codebooks = Array.tabulate(m)(jj => Array.tabulate(k)(c =>
        means.get((jj, c)).map(q).getOrElse(codebooks(jj)(c))))
    }
    val coded = subs.withColumn("code", assignCode(col("s"), col("j"), codebooks))
      .groupBy(col("id"))
      .agg(transform(array_sort(collect_list(struct(col("j"), col("code")))),
        x => x.getField("code")).as("codes"))
    val codes = nv.join(coded, Seq("id")).persist()
    codes.count()  // materialize before dropping the upstream caches
    subs.unpersist(); nv.unpersist()
    PqModel(codebooks, codes)
  }

  /** ⊕ Encode vectors against an EXISTING codebook — no refit. The
    * fit-once / encode-increments path: a daily 100 TB increment is
    * encoded with yesterday's codebooks (one row-local projection —
    * no shuffle, no driver state beyond the k·d-double literal), so
    * the code table grows append-only and [[ivfPqSearch]] serves old
    * and new data uniformly. Bit-identical to the codes [[pqFit]]
    * itself assigns (PqSpec proves equality), and — being a pure
    * projection — directly usable on a streaming DataFrame.
    *
    * Returns `(id, nv, codes)`, the [[PqModel.codes]] schema.
    */
  def pqEncode(model: PqModel, df: DataFrame, id: Column, vec: Column): DataFrame =
    df.select(id.as("id"), normalize(vecD(vec)).as("nv"))
      .filter(col("nv").isNotNull)
      .withColumn("codes",
        graft.functions.PqAssign.pq_assign_all(col("nv"), model.codebooks))

  /** ⊕ Assign rows to an EXISTING coarse quantizer's centroids — the
    * pure projection underneath [[ivfExtend]], exposed for consumers
    * that need the increment's assignment ALONE (e.g. per-snapshot
    * cluster histograms for embedding-space drift, q180). No refit,
    * no shuffle, no new driver state.
    */
  def assignToCentroids(model: IvfModel, df: DataFrame, id: Column, vec: Column): DataFrame =
    df.select(id.as("id"), normalize(vecD(vec)).as("nv"))
      .filter(col("nv").isNotNull)
      .withColumn("cluster", assignCluster(col("nv"), model.centroids))

  /** ⊕ Append an increment to an existing coarse quantizer — the
    * other half of the fit-once maintenance path ([[pqEncode]] is
    * the code side): new vectors are assigned to YESTERDAY'S
    * centroids by the same row-local argmax the fit itself uses (a
    * pure projection — no refit, no shuffle, no new driver state),
    * and the returned model's `assigned` table is the union, so
    * [[ivfSearch]]/[[ivfPqSearch]] serve old and new rows uniformly.
    * Assignment is a pure function of (vector, centroids), so an
    * extended model is bit-identical to what a from-scratch
    * assignment over the full corpus would produce with the same
    * centroids (the pqEncode equality contract, proved in PqSpec).
    */
  def ivfExtend(model: IvfModel, df: DataFrame, id: Column, vec: Column): IvfModel = {
    val inc = assignToCentroids(model, df, id, vec)
    // persisted (lazily) so repeated searches don't re-encode the
    // increment and the extended model's unpersist() releases it; the
    // BASE model's cache stays caller-owned — unpersist both.
    IvfModel(model.centroids,
      model.assigned.select(col("id"), col("nv"), col("cluster"))
        .unionByName(inc).persist())
  }

  /** ⊕ [[ivfExtend]]'s PQ sibling: append [[pqEncode]]-coded rows to
    * the model's code table. Codebooks unchanged — the index grows
    * append-only.
    */
  def pqExtend(model: PqModel, df: DataFrame, id: Column, vec: Column): PqModel =
    PqModel(model.codebooks,
      model.codes.select(col("id"), col("nv"), col("codes"))
        .unionByName(pqEncode(model, df, id, vec)).persist())

  /** ⊕ PQ-accelerated SemDeDup — [[semDedup]]'s drop rule (within a
    * coarse cluster, any pair with similarity ≥ `tau` drops the
    * higher id; clusters above `maxCluster` skip pair generation)
    * with the pair scoring done by SYMMETRIC distance computation
    * (SDC) over PQ codes: `sim(x, y) ≈ Σ_j sdc(j)(x_j)(y_j)` where
    * `sdc(j)` is subspace `j`'s k×k codeword dot-product table — an
    * m·k² literal (4·16² = 1024 doubles here), so the within-cluster
    * pair scan reads 2·m small codes per pair and never touches a
    * vector. THAT is the 100 TB form of semantic dedup: the O(Σc²)
    * pair work runs over an index 128× smaller than the embeddings,
    * which stay in cold storage.
    *
    * Determinism: the SDC table is computed from the quantized
    * codebooks with the same ascending-component fold the oracle's
    * `list_sum` uses, each entry re-quantized to 9 dp, and the m
    * partials fold in fixed subspace order — bit-identical on both
    * engines (up to the exact-.5 tie-mode caveat documented on
    * [[ivfFit]]'s `quantize` param), so the q145 oracle hash-matches
    * survivors exactly.
    */
  def semDedupPq(ivf: IvfModel, pq: PqModel, tau: Double,
                 roundTo: Int = 4,
                 maxCluster: Int = Dedup.DefaultMaxBucket,
                 numPartitions: Option[Int] = None): DataFrame = {
    val m = pq.codebooks.length
    // m·k² codeword-dot table (ascending-component fold, 9-dp entries
    // — the oracle's list_sum mirror), carried as a reference object
    // into the codegen'd SDC fold rather than an m·k² literal tree
    val sdcTable: Array[Array[Array[Double]]] = Array.tabulate(m) { j =>
      val cb = pq.codebooks(j)
      Array.tabulate(cb.length) { a =>
        Array.tabulate(cb.length) { b =>
          val d = cb(a).zip(cb(b)).map { case (x, y) => x * y }.sum
          math.rint(d * 1e9) / 1e9
        }
      }
    }
    val t = ivf.assigned.select(col("id"), col("cluster"))
      .join(pq.codes.select(col("id"), col("codes")), Seq("id"))
    val okClusters = t.groupBy(col("cluster"))
      .agg(count(lit(1)).as("__csz"))
      .filter(col("__csz") <= maxCluster)
      .select(col("cluster"))
    val inCap0 = t.join(broadcast(okClusters), Seq("cluster"))
    val inCap = numPartitions.fold(inCap0)(p => inCap0.repartition(p, col("cluster")))
    // per-PAIR inner loop: one codegen expression, not an interpreted
    // HOF fold ([[graft.functions.CodeSum]] — same ascending-subspace
    // sum, bit-equal; PqSpec/SimilaritySpec pin the equality)
    val sdcSim = round(
      graft.functions.CodeSum.sdc_sum(col("ca"), col("cb"), sdcTable), roundTo)
    val dropped = inCap.select(col("cluster"), col("id").as("id_a"), col("codes").as("ca"))
      .join(inCap.select(col("cluster"), col("id").as("id_b"), col("codes").as("cb")),
        Seq("cluster"))
      .filter(col("id_a") < col("id_b") && sdcSim >= tau)
      .select(col("id_b").as("id")).distinct()
    t.select(col("id"), col("cluster"))
      .join(dropped, Seq("id"), "left_anti")
  }

  /** ⊕ Corpus-sized [[semDedupPq]]: coarse k from `clustersForCorpus`
    * so cluster occupancy — and the Σc² code-pair scan — stays
    * constant as the corpus grows; PQ codebook k stays fixed
    * (quantization fidelity, not bucket occupancy). Fixed coarse
    * k=16 was measured DEGENERATING at the second decade (every
    * cluster above the `maxCluster` backstop → pair generation
    * skipped, dedup finds nothing); the sized form holds 3.8× per
    * decade (BENCH_NOTES round 11). At every driver fixture size the
    * derived k equals the pinned 16, so q146 shares q145's oracle
    * bit-for-bit — the q112 convention.
    */
  def semDedupPqSized(df: DataFrame, id: Column, vec: Column, tau: Double,
                      m: Int = 4, codebookK: Int = 16,
                      targetCluster: Int = 200, roundTo: Int = 4,
                      maxCluster: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val kc = clustersForCorpus(df.count(), targetCluster)
    val ivf = ivfFit(df, id, vec, kc, iters = 2, quantize = Some(9))
    val pq = pqFit(df, id, vec, m, codebookK, iters = 1, quantize = Some(9))
    semDedupPq(ivf, pq, tau, roundTo, maxCluster)
  }

  /** ⊕ THE documented entry point for PQ-accelerated semantic dedup
    * at corpus scale ([[semDedupPqSized]] plus the sized pair-join
    * exchange — the [[semDedupAuto]] treatment applied to the PQ
    * path): one `count()` feeds [[clustersForCorpus]] (coarse k; PQ
    * codebook k stays fixed — quantization fidelity, not occupancy)
    * and [[graft.ops.Skew.partitionsForCorpus]]. Floors to the pinned
    * configuration at fixture scale, so q151 shares q145/q146's
    * oracle bit-for-bit.
    */
  def semDedupPqAuto(df: DataFrame, id: Column, vec: Column, tau: Double,
                     m: Int = 4, codebookK: Int = 16,
                     targetCluster: Int = 200, roundTo: Int = 4,
                     maxCluster: Int = Dedup.DefaultMaxBucket,
                     rowsPerPartition: Long = 1L << 18): DataFrame = {
    val n = df.count()
    val kc = clustersForCorpus(n, targetCluster)
    val ivf = ivfFit(df, id, vec, kc, iters = 2, quantize = Some(9))
    val pq = pqFit(df, id, vec, m, codebookK, iters = 1, quantize = Some(9))
    semDedupPq(ivf, pq, tau, roundTo, maxCluster,
      Some(graft.ops.Skew.partitionsForCorpus(n, rowsPerPartition)))
  }

  /** Row-local code assignment: argmin ‖s − c‖² over subspace `j`'s
    * codewords (ties → lowest code, via first-position-of-max on the
    * negated distances — the [[assignCluster]] trick). The distance
    * fold is ascending-index sequential, bit-matching the oracle's
    * `list_sum(list_transform(range...))`. One codegen expression
    * ([[graft.functions.PqAssign]]) — the earlier composable form was
    * m·k interpreted HOF folds per row, the measured dominant cost of
    * the fit (PqSpec pins expression ≡ HOF bit-equality).
    */
  private def assignCode(s: Column, j: Column,
                         codebooks: Array[Array[Array[Double]]]): Column =
    graft.functions.PqAssign.pq_assign_sub(s, j, codebooks)

  /** ⊕ IVF-PQ search — the FAISS composition: the coarse quantizer
    * ([[ivfFit]]) prunes the corpus to `nprobe` clusters, and
    * asymmetric-distance computation (ADC) scores the survivors from
    * their PQ codes alone: each query precomputes an m×k lookup table
    * of subspace partial dot products (row-local, against the literal
    * codebooks), and a candidate's approximate cosine is m table
    * lookups summed in fixed subspace order — no candidate vector is
    * ever read. At 100 TB that is the whole point: the scored side
    * touches only cluster + m codes per vector (~5 bytes), not the
    * embedding column.
    *
    * Plan: probe selection and the LUT ride the (tiny, broadcast)
    * query side; one equi-join on `cluster` against the
    * code-augmented inverted file; per-query top-k via the W2 window
    * pattern. Same single-pass shape as [[ivfSearch]] — constant in
    * the number of queries.
    */
  def ivfPqSearch(ivf: IvfModel, pq: PqModel, queryIds: Seq[Long],
                  nprobe: Int, k: Int, roundTo: Int = 4): DataFrame =
    ivfPqSearchCore(ivf, pq,
      ivf.assigned.filter(col("id").isin(queryIds: _*))
        .select(col("id").as("query_id"), col("nv").as("q_nv")),
      nprobe, k, roundTo)

  /** ⊕ [[ivfPqSearch]] with the query side as a DataFrame (the
    * [[ivfSearchDf]] batch shape): probe selection and the per-query
    * ADC lookup table are computed per query ROW against the literal
    * codebooks — the broadcast structure is unchanged, only the query
    * entry point scales from an id list to a table.
    */
  def ivfPqSearchDf(ivf: IvfModel, pq: PqModel, queries: DataFrame,
                    qid: Column, qvec: Column,
                    nprobe: Int, k: Int, roundTo: Int = 4): DataFrame =
    ivfPqSearchCore(ivf, pq,
      queries.select(qid.as("query_id"), normalize(vecD(qvec)).as("q_nv"))
        .filter(col("q_nv").isNotNull),
      nprobe, k, roundTo)

  /** Shared core over a prepared `(query_id, q_nv)` side. */
  private def ivfPqSearchCore(ivf: IvfModel, pq: PqModel, qdf: DataFrame,
                              nprobe: Int, k: Int, roundTo: Int): DataFrame = {
    val cents = ivf.centroids
    val m = pq.codebooks.length
    val sub = pq.codebooks(0)(0).length
    val ranked = array_sort(array(cents.indices.map(i =>
      struct((-dot(col("q_nv"), array(cents(i).map(lit(_)): _*))).as("neg_sim"),
        lit(i).as("idx"))): _*))
    val probes = transform(slice(ranked, 1, nprobe), s => s.getField("idx"))
    // lut[j][c] = round(dot(q_sub_j, codebook(j)(c)), 9) — partials are
    // quantized so the oracle's identical table is bit-equal before
    // the fixed-order ADC fold
    val lut = array((0 until m).map { j =>
      array(pq.codebooks(j).indices.map { c =>
        round(dot(slice(col("q_nv"), j * sub + 1, sub),
          array(pq.codebooks(j)(c).map(lit(_)): _*)), 9)
      }: _*)
    }: _*)
    val probed = qdf
      .withColumn("lut", lut)
      .withColumn("cluster", explode(probes))
      .select(col("query_id"), col("lut"), col("cluster"))
    val corpus = ivf.assigned.select(col("id"), col("cluster"))
      .join(pq.codes.select(col("id"), col("codes")), Seq("id"))
    val scored = corpus.join(broadcast(probed), Seq("cluster"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("neighbor_id"),
        // per-CANDIDATE inner loop: codegen'd ADC fold (same
        // ascending-subspace sum as the HOF form — bit-equal)
        round(graft.functions.CodeSum.adc_sum(col("lut"), col("codes")), roundTo)
          .as("adc_sim"))
    graft.ops.TopK.perGroupTopK(scored,
        Seq(col("query_id")), Seq(desc("adc_sim"), asc("neighbor_id")), k)
      .orderBy(col("query_id"), desc("adc_sim"), col("neighbor_id"))
  }

  /** ⊕ Symmetric int8 vector quantization — the 4×-smaller index
    * form a 100 TB ANN deployment stores: per-vector
    * `scale = max|x|/127`, `q_i = round(x_i/scale)` ∈ [−127, 127].
    * Returns `struct(scale, q)`. Properties the spec pins down:
    * reconstruction error per component is ≤ scale/2, and COSINE
    * between two quantized vectors needs no dequantization at all —
    * the scales cancel, so candidate scoring runs on pure integer
    * dot products (exactly reproducible across engines, which is
    * why the q110 oracle can hash-match integer norms). Row-local:
    * rides the scan, no shuffle.
    */
  def quantizeInt8(vec: Column): Column = {
    val v = vecD(vec)
    val sc = array_max(transform(v, x => abs(x))) / lit(127.0)
    val q = when(sc === 0, transform(v, _ => lit(0)))
      .otherwise(transform(v, x => round(x / sc, 0).cast("int")))
    struct(sc.as("scale"), q.as("q"))
  }

  /** ⊕ SemDeDup-style semantic dedup (Abbas et al. 2023, made
    * deterministic): cluster the embeddings with the [[ivfFit]]
    * k-means, then inside each cluster drop every vector that has a
    * LOWER-id neighbor with cosine ≥ `tau` — the ε-ball keep-one
    * policy with min-id as the (deterministic) representative choice
    * instead of the paper's random keeper. Returns the kept
    * `(id, cluster)` rows.
    *
    * The drop rule is one-shot, not transitive: j is dropped iff some
    * i<j in its cluster is within ε of j, whether or not i itself
    * survives — the same rule a `NOT EXISTS` mirrors exactly in SQL,
    * which is what makes the whole train+assign+dedup chain oracle-
    * checkable (q106) when centroids are quantized.
    *
    * Scale shape: pair work is Σ c² over clusters — constant
    * per-row when k grows with the corpus (size k ≈ n/targetCluster,
    * the IVF analogue of [[bitsForCorpus]]), and `maxCluster` is the
    * degenerate-cluster backstop: clusters above the cap skip pair
    * generation entirely (kept intact, never quadratic — mirror with
    * a HAVING on the cluster count). The within-cluster join
    * shuffles on the cluster key only; vectors never leave their
    * cluster partition. At corpus scale use [[semDedupAuto]] — the
    * documented default entry point — rather than picking k by hand:
    * fixed k was measured silently degenerating to a no-op at sf10.
    */
  def semDedup(df: DataFrame, id: Column, vec: Column, k: Int, iters: Int,
               tau: Double, quantize: Option[Int] = None, roundTo: Int = 4,
               maxCluster: Int = Dedup.DefaultMaxBucket,
               numPartitions: Option[Int] = None): DataFrame =
    semDedupParts(df, id, vec, k, iters, tau, quantize, roundTo,
      maxCluster, numPartitions)._2

  /** [[semDedup]] plus the `(id, cluster)` ASSIGNMENT it derived —
    * the datacard form: the q256 funnel measures its pair work
    * (Σ c·(c−1)/2 over under-cap clusters) from the assignment
    * table, which the kept-rows result alone cannot reconstruct.
    * Returns (assigned, kept); [[semDedup]] is the kept half.
    */
  def semDedupParts(df: DataFrame, id: Column, vec: Column, k: Int, iters: Int,
                    tau: Double, quantize: Option[Int] = None, roundTo: Int = 4,
                    maxCluster: Int = Dedup.DefaultMaxBucket,
                    numPartitions: Option[Int] = None): (DataFrame, DataFrame) = {
    val model = ivfFit(df, id, vec, k, iters, quantize)
    val a = model.assigned  // (id, nv, cluster), persisted by ivfFit
    val okClusters = a.groupBy(col("cluster"))
      .agg(count(lit(1)).as("__csz"))
      .filter(col("__csz") <= maxCluster)
      .select(col("cluster"))
    val inCap0 = a.join(broadcast(okClusters), Seq("cluster"))
    // sized dominant exchange: both sides of the within-cluster pair
    // join derive from this one repartition on the join key
    val inCap = numPartitions.fold(inCap0)(p => inCap0.repartition(p, col("cluster")))
    val dropped = inCap.select(col("cluster"), col("id").as("id_a"), col("nv").as("nv_a"))
      .join(inCap.select(col("cluster"), col("id").as("id_b"), col("nv").as("nv_b")),
        Seq("cluster"))
      .filter(col("id_a") < col("id_b") &&
        round(dot(col("nv_a"), col("nv_b")), roundTo) >= tau)
      .select(col("id_b").as("id")).distinct()
    (a.select(col("id"), col("cluster")),
      a.select(col("id"), col("cluster"))
        .join(dropped, Seq("id"), "left_anti"))
  }

  /** ⊕ Per-dimension standardization (z-score whitening) — the
    * embedding-preprocessing pass run before distance-based ops when
    * dimensions have wildly different variances: `z_i = (x_i − μ_i)
    * / σ_i` with per-dimension population statistics. Like
    * [[ivfFit]], only the d×2 stats matrix crosses to the driver
    * (one aggregation job); the transform itself is a row-local
    * codegen'd `zip_with` against literal arrays — the corpus never
    * shuffles. Stats are quantized (same reproducibility trick as
    * the k-means centroids) so the q122 oracle can re-derive them in
    * SQL; zero-variance dimensions pass through centered (σ=0 → z =
    * x − μ, documented).
    */
  def standardizeDims(df: DataFrame, id: Column, vec: Column,
                      quantizeTo: Int = 9): DataFrame = {
    val v = df.select(id.as("id"), vecD(vec).as("v"))
    val stats = v
      .select(posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(round(avg(col("x")), quantizeTo).as("mu"),
        // greatest(0, var): floating-point cancellation on a near-
        // constant dimension can make avg(x²)−avg(x)² slightly
        // negative → sqrt = NaN, which the σ=0 branch would NOT
        // catch (NaN ≠ 0) and the whole z vector would go NaN.
        round(sqrt(greatest(lit(0.0),
          avg(col("x") * col("x")) - avg(col("x")) * avg(col("x")))),
          quantizeTo).as("sigma"))
      .orderBy(col("pos"))
      .collect()
    val mu = array(stats.map(r => lit(r.getDouble(1))): _*)
    val sigma = array(stats.map(r => lit(r.getDouble(2))): _*)
    v.select(col("id"),
      zip_with(col("v"), zip_with(mu, sigma, (m, s) => struct(m.as("m"), s.as("s"))),
        (x, ms) => when(ms.getField("s") === 0, x - ms.getField("m"))
          .otherwise((x - ms.getField("m")) / ms.getField("s"))).as("z"))
  }

  /** Corpus-sized cluster count for [[semDedup]] — the IVF analogue
    * of [[bitsForCorpus]]: `k = max(minK, ceil(n/targetCluster))`
    * holds per-cluster occupancy (and the Σc² pair work per row)
    * constant as the corpus grows. The floor keeps the derived k at
    * the oracle-pinned 16 through every driver fixture size, exactly
    * like `bitsForCorpus`'s floor of 6 (q95's trick).
    *
    * Why fixed k does NOT scale (measured, BASELINE.md second
    * decade): at sf10 (200k vectors) fixed k=16 puts ~12.5k vectors
    * in every cluster — all above the `maxCluster = 10000` backstop,
    * so pair generation silently skips nearly every cluster and the
    * "dedup" degenerates toward a no-op (fast, but finding nothing).
    * The cap is doing its OOM job; the sized k is what keeps the
    * operator MEANINGFUL at scale.
    */
  def clustersForCorpus(n: Long, targetCluster: Int = 200, minK: Int = 16): Int =
    math.max(minK, math.ceil(n.toDouble / targetCluster.toDouble).toInt)

  /** ⊕ [[ivfFit]] with k derived from one `count()` via
    * [[clustersForCorpus]] — the corpus-scale coarse quantizer for
    * the SEARCH path. A fixed k is the measured q156 second-decade
    * wall: cluster occupancy grows linearly with the corpus, so every
    * probe scans O(n/k) candidates and a query BATCH does O(q·n/k)
    * work — 17.8× at 10× data for the fixed-16 incremental-index
    * composition. Sized k keeps occupancy (and so per-query probe
    * cost) constant; the derived k floors to 16 at every driver
    * fixture size, so sized compositions share the fixed-k oracles.
    */
  def ivfFitSized(df: DataFrame, id: Column, vec: Column, iters: Int = 3,
                  quantize: Option[Int] = None): IvfModel =
    ivfFit(df, id, vec, searchClustersForCorpus(df.count()), iters, quantize)

  /** Coarse-k schedule for the SEARCH path: `k ≈ √(n/balance)` (floor
    * `minK`) — the FAISS sizing rule. Assignment costs O(n·k) and a
    * probe batch O(q·n/k); k ∝ √n balances the two at O(n^1.5) where
    * either a fixed k (probe side, measured 17.8× per decade on q156)
    * or the dedup family's LINEAR k = n/target (assign side — the
    * measured residual super-linearity of the first q165 cut, 10.7×)
    * compounds quadratically. The dedup family keeps its linear rule
    * on purpose: there `targetCluster` is the SEMANTIC ε-ball
    * population, not a cost knob. `balance = 8` lands the schedule
    * exactly on the pinned k = 16 at every driver fixture size, so
    * sized search compositions share the fixed-k oracles.
    *
    * The round-12 residual — √n schedules eventually want k past what
    * literal-centroid plans tolerate — is CLOSED: [[assignCluster]]
    * and the probe selection dispatch to the O(1)-plan-size indexed
    * expressions above [[FlatAssignMaxK]] (exact, q188-oracled), so
    * this schedule is usable at any derived k.
    */
  def searchClustersForCorpus(n: Long, balance: Int = 8, minK: Int = 16): Int =
    math.max(minK, math.ceil(math.sqrt(n.toDouble / balance)).toInt)

  /** [[semDedup]] with k derived from one count() pass via
    * [[clustersForCorpus]] — the corpus-scale entry point (q112;
    * spec-proved identical to the fixed form at fixture sizes where
    * the derived k equals the pinned 16).
    */
  def semDedupSized(df: DataFrame, id: Column, vec: Column, iters: Int,
                    tau: Double, targetCluster: Int = 200,
                    quantize: Option[Int] = None, roundTo: Int = 4,
                    maxCluster: Int = Dedup.DefaultMaxBucket): DataFrame = {
    val k = clustersForCorpus(df.count(), targetCluster)
    semDedup(df, id, vec, k, iters, tau, quantize, roundTo, maxCluster)
  }

  /** ⊕ THE documented entry point for semantic dedup at corpus scale:
    * ONE `count()` derives the cluster count ([[clustersForCorpus]] —
    * fixed k degenerates to deduping NOTHING once every cluster
    * outgrows the `maxCluster` backstop, measured at sf10) and the
    * within-cluster pair join's partition count
    * ([[graft.ops.Skew.partitionsForCorpus]]). Both floor to the
    * pinned values (k=16, 32 partitions) at every driver fixture
    * size, so q150 shares q106/q112's oracle bit-for-bit. Prefer
    * this over [[semDedup]]/[[semDedupSized]] unless replaying a
    * pinned configuration.
    */
  def semDedupAuto(df: DataFrame, id: Column, vec: Column, iters: Int,
                   tau: Double, targetCluster: Int = 200,
                   quantize: Option[Int] = None, roundTo: Int = 4,
                   maxCluster: Int = Dedup.DefaultMaxBucket,
                   rowsPerPartition: Long = 1L << 18): DataFrame = {
    val n = df.count()
    semDedup(df, id, vec, clustersForCorpus(n, targetCluster), iters, tau,
      quantize, roundTo, maxCluster,
      Some(graft.ops.Skew.partitionsForCorpus(n, rowsPerPartition)))
  }

  /** md5-parity ±1 JL plane component — the [[planeComp]] derivation
    * in its own `"jl|t|d"` namespace (disjoint from the LSH planes),
    * so both engines re-derive the identical projection matrix from
    * nothing but the rule.
    */
  def jlPlaneComp(t: Int, d: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"jl|$t|$d".getBytes("UTF-8"))
    if ((h(0) & 1) == 0) 1.0 else -1.0
  }

  /** ⊕ Johnson–Lindenstrauss random projection (Achlioptas 2003 ±1
    * form): project `dim`-dimensional vectors to `outDim` coordinates
    * `y_t = (v · p_t)/√outDim` with deterministic md5-parity ±1
    * planes ([[jlPlaneComp]]). E‖ya − yb‖² = ‖a − b‖², so Euclidean
    * structure survives in expectation with relative spread
    * ≈ √(2/outDim) per pair — the cheap front-end that lets dedup /
    * ANN / clustering run on 16 doubles instead of 1024 (q251
    * MEASURES the distortion instead of citing the lemma). Entirely
    * row-local (the planes are literals folded by the codegen'd dot)
    * — a scan-speed projection, no shuffle, streamable.
    */
  def jlProject(df: DataFrame, id: Column, vec: Column,
                outDim: Int, dim: Int): DataFrame = {
    require(outDim > 0 && dim > 0,
      s"jlProject needs positive dims, got outDim=$outDim dim=$dim")
    val scale = math.sqrt(outDim.toDouble)
    val planes = (0 until outDim).map(t =>
      (0 until dim).map(d => jlPlaneComp(t, d)))
    df.select(id.as("id"), vecD(vec).as("v"))
      .filter(col("v").isNotNull && size(col("v")) > 0)
      .select(col("id"),
        array(planes.map(p => dot(col("v"), typedLit(p)) / lit(scale)): _*)
          .as("y"))
  }

  /** ⊕ ANN via random-hyperplane LSH (Charikar 2002, with ±1
    * Rademacher planes — [[planeComp]]): for each of `numTables`
    * tables, a `bitsPerTable`-bit bucket key from projection signs;
    * same-bucket pairs are candidates; exact cosine verifies. Recall
    * for similarity s: 1-(1-p^b)^L with p = 1 - arccos(s)/π.
    *
    * Candidate generation is the single-scan grouped form
    * ([[Dedup.bucketPairs]]): ALL numTables bucket keys come from ONE
    * pass over the vector ([[graft.functions.LshBuckets]] — a single
    * codegen expression, not numTables×bitsPerTable separate projection
    * expressions), one shuffle on (table_idx, bucket), in-bucket pair
    * expansion, threshold BEFORE the cross-table dedup.
    *
    * `maxBucket` (default 10000) is the skew/OOM backstop at scale: a
    * degenerate bucket of b members is b² candidate pairs AND one
    * b-element `collect_list` row, so buckets above the cap are
    * excluded from pair generation (mirror the cap in any SQL oracle
    * via a bucket-count HAVING).
    *
    * FIXED `bitsPerTable` DOES NOT SCALE (measured, BASELINE.md
    * §second-decade): candidate pairs are Σ b²/2 over buckets ≈
    * n²/2^(bits+1) per table, so at 6 bits the sf1→sf10 decade grew
    * pair work 100× for 10× data (5.49G candidates, 55× wall-clock).
    * Use [[annLshPairsAuto]] at corpus scale — the documented default
    * entry point: one count derives bits (constant per-bucket
    * occupancy) AND the dominant exchange's partition count; the
    * oracled q26/q66/q86 pin 6 bits only because the sf-fixture
    * oracle mirrors that constant.
    */
  def annLsh(df: DataFrame, id: Column, vec: Column,
             threshold: Double, numTables: Int = 16, bitsPerTable: Int = 6,
             roundTo: Int = 4, maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    annLshPairs(df, id, vec, threshold, numTables, bitsPerTable, roundTo, maxBucket)
      .orderBy(col("id_a"), col("id_b"))

  /** [[annLsh]] without the terminal global sort — the form
    * compositional consumers want: q66 re-aggregates the pairs into
    * clusters and q86 re-windows them per vector, so a presentation
    * `orderBy` (range-partition + sort) between pair generation and
    * the consumer's own shuffle is dead cost. The cross-table
    * `distinct` stays — it is semantics (a pair colliding in several
    * LSH tables must surface once), not presentation.
    */
  def annLshPairs(df: DataFrame, id: Column, vec: Column,
                  threshold: Double, numTables: Int = 16, bitsPerTable: Int = 6,
                  roundTo: Int = 4, maxBucket: Int = Dedup.DefaultMaxBucket,
                  numPartitions: Option[Int] = None): DataFrame = {
    val nv = df.select(id.as("id"), normalize(vecD(vec)).as("nv"))
      .filter(col("nv").isNotNull)
    val bucketed0 = nv.select(col("id"), col("nv"),
      posexplode(graft.functions.LshBuckets.lsh_buckets(col("nv"), numTables, bitsPerTable))
        .as(Seq("table_idx", "bucket")))
    // sized dominant exchange: repartition on the grouping keys so the
    // bucket aggregation reuses it at the derived width instead of the
    // session default (downstream exchanges — the cross-table distinct
    // — still follow spark.sql.shuffle.partitions)
    val bucketed = numPartitions.fold(bucketed0)(p =>
      bucketed0.repartition(p, col("table_idx"), col("bucket")))
    Dedup.bucketPairs(bucketed, Seq("table_idx", "bucket"),
        struct(col("id"), col("nv")), maxBucket)
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(dot(col("a.nv"), col("b.nv")), roundTo).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .distinct()
  }

  /** Bucket-key width that holds per-bucket occupancy ≈ `targetBucket`
    * rows at corpus size `n`: `ceil(log2(n / targetBucket))`, floored
    * at 6 (the fixture-scale default). Pair work per table is
    * Σ b²/2 ≈ n·targetBucket/2 — LINEAR in n once bits track log₂(n),
    * vs quadratic at any fixed width (measured: 6 bits at sf10 is
    * 5.49G candidate pairs; 10 bits — what this returns for n=200k,
    * targetBucket=200 — is 404M, back on the linear slope).
    *
    * The recall trade: P(true pair collides per table) = p^bits with
    * p = 1 − arccos(s)/π, so +1 bit costs ×p recall per table;
    * compensate with `numTables` (recall = 1-(1-p^bits)^L) or accept
    * it — at corpus scale near-dup thresholds sit at s ≥ 0.9
    * (p ≈ 0.86), where 10 bits × 16 tables still gives ~0.9 recall,
    * while the 0.42-threshold fixture setting is a small-corpus
    * choice that fixed bits serve fine.
    */
  def bitsForCorpus(n: Long, targetBucket: Int = 200): Int = {
    require(targetBucket > 0, s"targetBucket must be positive, got $targetBucket")
    val ratio = math.max(1.0, n.toDouble / targetBucket)
    math.max(6, math.ceil(math.log(ratio) / math.log(2.0)).toInt)
  }

  /** ⊕ [[annLshPairs]] with the bucket width derived from the corpus
    * size ([[bitsForCorpus]]) instead of a fixed constant — the
    * 100 TB form: one cheap `count()` pass, then bits = log₂(n/target),
    * which keeps candidate-pair work per input row constant as the
    * corpus grows (a fixed width is quadratic — see [[annLsh]] doc).
    * Like the auto skew wrappers ([[graft.ops.Time.trailingSumsAuto]]),
    * this makes the documented scale guidance executable instead of
    * advisory; cache `df` upstream if it is itself expensive.
    */
  def annLshPairsSized(df: DataFrame, id: Column, vec: Column,
                       threshold: Double, targetBucket: Int = 200,
                       numTables: Int = 16, roundTo: Int = 4,
                       maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame =
    annLshPairs(df, id, vec, threshold, numTables,
      bitsForCorpus(df.count(), targetBucket), roundTo, maxBucket)

  /** ⊕ THE documented entry point for LSH pair generation at corpus
    * scale: ONE `count()` derives BOTH scale knobs — the bucket width
    * ([[bitsForCorpus]]: fixed bits are measured quadratic past sf1)
    * and the dominant exchange's partition count
    * ([[graft.ops.Skew.partitionsForCorpus]] over the n·numTables
    * exploded bucket rows: a fixed partition count spills once
    * per-partition bytes outgrow executor memory). At every driver
    * fixture size both derivations floor to the pinned values
    * (6 bits, 32 partitions), so q149 shares q26/q95's oracle
    * bit-for-bit — the q112/q146 convention; the decade-2 ScaleBench
    * slopes are the scale evidence. Prefer this over [[annLshPairs]]
    * (fixed width) and [[annLshPairsSized]] (sized width, session
    * partitioning) unless replaying a pinned configuration; cache
    * `df` upstream if it is itself expensive.
    */
  def annLshPairsAuto(df: DataFrame, id: Column, vec: Column,
                      threshold: Double, targetBucket: Int = 200,
                      numTables: Int = 16, roundTo: Int = 4,
                      maxBucket: Int = Dedup.DefaultMaxBucket,
                      rowsPerPartition: Long = 1L << 18): DataFrame = {
    val n = df.count()
    annLshPairs(df, id, vec, threshold, numTables,
      bitsForCorpus(n, targetBucket), roundTo, maxBucket,
      Some(graft.ops.Skew.partitionsForCorpus(n * numTables, rowsPerPartition)))
  }

  /** ⊕ Margin-based mutual-kNN mining (Artetxe & Schwenk 2019,
    * "Margin-based Parallel Corpus Mining with Multilingual Sentence
    * Embeddings" — the CCMatrix/LASER alignment rule, applied to one
    * corpus): a raw cosine threshold cannot separate "globally high
    * similarity" (hub vectors score high against EVERYTHING) from
    * "specifically aligned pair", so each edge is scored RELATIVE to
    * its endpoint's neighborhood — `margin(a→b) = cos(a,b) /
    * mean(cos of a's top-k)` — and a pair is mined only when both
    * directions agree (mutual top-k membership). Hubs dilute their
    * own margins; genuine pairs stand above their neighborhoods on
    * both sides.
    *
    * Built entirely on the q86 kNN-graph shape: [[annLshPairs]]
    * candidates → symmetrize → per-source top-k (W2 window) → one
    * more aggregation on the SAME source key for the neighborhood
    * mean → a self-equi-join on (src, nbr) = (nbr, src) for
    * mutuality. No new shuffle keys — everything hangs off the
    * source id.
    *
    * Engine-exact margins: cos_sim is already a 4-dp multiple, so
    * `cu = round(cos·1e4)` is an exact integer, the neighborhood sum
    * `su` an exact integer sum, and the margin is ONE HALF_UP
    * division published in 1e-4 units via the boundary-free
    * `floor((2·cu·n·1e4 + su) / (2·su))` trick ([[graft.ext.Curation]]'s
    * stats convention) — bit-identical across engines and
    * partitionings.
    *
    * Returns `(id_a, id_b, cos_sim, margin_ab_e4, margin_ba_e4)` for
    * mutual pairs, id_a < id_b; threshold on the margins downstream
    * (margin ≥ 1e4 means "above its own neighborhood's mean").
    */
  def marginMutualKnn(df: DataFrame, id: Column, vec: Column,
                      threshold: Double = 0.3, k: Int = 3,
                      numTables: Int = 16, bitsPerTable: Int = 6,
                      roundTo: Int = 4,
                      maxBucket: Int = Dedup.DefaultMaxBucket,
                      numPartitions: Option[Int] = None): DataFrame = {
    // threshold > 0 guarantees every top-k cosine — and so the
    // neighborhood sum the margin divides by — is strictly positive;
    // a ≤ 0 threshold would let su hit 0 and the division emit
    // silent Infinity margins (loud here instead)
    require(threshold > 0,
      s"marginMutualKnn needs a positive cosine threshold, got $threshold")
    // margin numerator is 2·10^roundTo·k·10^roundTo + su; past 6 dp it
    // outgrows exact double range and the HALF_UP contract breaks
    require(roundTo >= 1 && roundTo <= 6,
      s"marginMutualKnn supports roundTo 1..6 (exact integer margins), got $roundTo")
    val pairs = annLshPairs(df, id, vec, threshold, numTables, bitsPerTable,
      roundTo, maxBucket, numPartitions)
    val sym = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("nbr"), col("cos_sim")),
        struct(col("id_b").as("src"), col("id_a").as("nbr"), col("cos_sim")))).as("e"))
      .select(col("e.src").as("src"), col("e.nbr").as("nbr"), col("e.cos_sim").as("cos_sim"))
    val top = graft.ops.TopK.perGroupTopK(sym,
      Seq(col("src")), Seq(desc("cos_sim"), asc("nbr")), k)
    val scale = math.pow(10, roundTo)
    val cu = round(col("cos_sim") * scale, 0).cast("long")
    val st = top.groupBy(col("src"))
      .agg(count(lit(1)).as("__n"), sum(cu).as("__su"))
    val m = top.join(st, Seq("src"))
      .select(col("src"), col("nbr"), col("cos_sim"),
        floor((lit(2) * cu * col("__n") * lit(scale.toLong) + col("__su")) /
          (lit(2.0) * col("__su"))).cast("long").as("margin_e4"))
    m.as("a").join(m.as("b"),
        col("a.src") === col("b.nbr") && col("a.nbr") === col("b.src"))
      .filter(col("a.src") < col("a.nbr"))
      .select(col("a.src").as("id_a"), col("a.nbr").as("id_b"),
        col("a.cos_sim").as("cos_sim"),
        col("a.margin_e4").as("margin_ab_e4"),
        col("b.margin_e4").as("margin_ba_e4"))
  }

  /** ⊕ THE corpus-scale entry point for margin mining — the
    * [[annLshPairsAuto]] treatment applied to [[marginMutualKnn]]'s
    * candidate stage (its measured decade-1 slope, 3.4×, is entirely
    * the fixed-6-bit pair-growth term): ONE `count()` derives the
    * bucket width ([[bitsForCorpus]]) and the dominant exchange's
    * partition count ([[graft.ops.Skew.partitionsForCorpus]]). Both
    * floor to the pinned values at fixture scale, so q176 shares
    * q174's oracle bit-for-bit — the q112/q149 convention.
    */
  def marginMutualKnnAuto(df: DataFrame, id: Column, vec: Column,
                          threshold: Double = 0.3, k: Int = 3,
                          targetBucket: Int = 200, numTables: Int = 16,
                          roundTo: Int = 4,
                          maxBucket: Int = Dedup.DefaultMaxBucket,
                          rowsPerPartition: Long = 1L << 18): DataFrame = {
    val n = df.count()
    marginMutualKnn(df, id, vec, threshold, k, numTables,
      bitsForCorpus(n, targetBucket), roundTo, maxBucket,
      Some(graft.ops.Skew.partitionsForCorpus(n * numTables, rowsPerPartition)))
  }

  /** ⊕ Embedding isolation screen — the kNN-distance outlier check
    * run before training on pooled embeddings (the neighborhood dual
    * of [[centroidScores]]' global-direction check, and the standard
    * kNN-distance form of LOF-lite): a vector whose BEST neighbor
    * cosine is low — or that has no candidate neighbor at all at the
    * LSH threshold — sits alone in embedding space: mislabeled,
    * noise, or out-of-domain. Built on the q86 kNN-graph shape; the
    * id universe is every non-null normalized vector, so the most
    * isolated vectors (zero candidates — the rows a join over the
    * pair graph would silently DROP) surface explicitly with
    * `n_nbrs = 0`.
    *
    * Returns `(vec_id, n_nbrs, best_cos, is_isolated)` with
    * `is_isolated = n_nbrs == 0 OR best_cos < tau`. NOTE: `n_nbrs`
    * is `min(k, #candidates)` — the retained top-k row count, NOT
    * the vector's true candidate-neighbor degree (it saturates at
    * `k`, default 3). It distinguishes "isolated" (0) from "has
    * neighbors" (> 0); do not consume it as a degree statistic — for
    * degrees, aggregate [[annLshPairs]] output directly.
    */
  def isolationScreen(df: DataFrame, id: Column, vec: Column,
                      threshold: Double = 0.3, k: Int = 3, tau: Double = 0.5,
                      numTables: Int = 16, bitsPerTable: Int = 6,
                      roundTo: Int = 4,
                      maxBucket: Int = Dedup.DefaultMaxBucket): DataFrame = {
    // membership check only: a vector normalizes to non-null iff its
    // self-dot is positive — one codegen pass, no second normalize of
    // the corpus (annLshPairs builds the real nv frame internally)
    val universe = df.select(id.as("vec_id"), vecD(vec).as("__v"))
      .filter(dot(col("__v"), col("__v")) > 0).select(col("vec_id"))
    val pairs = annLshPairs(df, id, vec, threshold, numTables, bitsPerTable,
      roundTo, maxBucket)
    val sym = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("nbr"), col("cos_sim")),
        struct(col("id_b").as("src"), col("id_a").as("nbr"), col("cos_sim")))).as("e"))
      .select(col("e.src").as("src"), col("e.nbr").as("nbr"), col("e.cos_sim").as("cos_sim"))
    val top = graft.ops.TopK.perGroupTopK(sym,
      Seq(col("src")), Seq(desc("cos_sim"), asc("nbr")), k)
    val agg = top.groupBy(col("src"))
      .agg(count(lit(1)).as("n_nbrs"), max(col("cos_sim")).as("best_cos"))
    universe.join(agg, universe("vec_id") === agg("src"), "left")
      .select(col("vec_id"),
        coalesce(col("n_nbrs"), lit(0L)).as("n_nbrs"),
        col("best_cos"),
        (col("n_nbrs").isNull || col("best_cos") < tau).as("is_isolated"))
  }

  /** ⊕ Per-group centroid + cosine-to-centroid scoring — embedding
    * quality control: vectors far from their group's mean direction
    * are mislabeled/degenerate candidates (the standard
    * "distance-to-centroid" outlier screen run before training on
    * pooled embeddings).
    *
    * Plan shape at scale:
    *  1. Centroids: one posexplode → groupBy(group, dim) average.
    *     The shuffle moves n·d scalar values once — the lower bound
    *     for exact mean pooling — and reduces to a groups×d table.
    *     Components are quantized to 9 decimals (the q38/ivfFit
    *     trick) so cross-engine summation-order ulps can't surface.
    *  2. Scoring: centroid table re-assembled per group (array_sort
    *     by dim index) and BROADCAST back; the cosine is the one-pass
    *     codegen'd [[dot]]/[[normalize]] pair — row-local, no second
    *     shuffle of the vectors.
    *
    * Appends `cos_centroid` (rounded to 6 dp); callers threshold it
    * for the outlier flag.
    */
  def centroidScores(df: DataFrame, idCol: String, groupCol: String,
                     vecCol: String): DataFrame = {
    val e = df.select(col(idCol), col(groupCol), vecD(col(vecCol)).as("__v"))
    val cent = e.select(col(groupCol), posexplode(col("__v")).as(Seq("__i", "__x")))
      .groupBy(col(groupCol), col("__i"))
      .agg(round(avg(col("__x")), 9).as("__cx"))
      .groupBy(col(groupCol))
      .agg(transform(array_sort(collect_list(struct(col("__i"), col("__cx")))),
        s => s.getField("__cx")).as("__cv"))
    e.join(broadcast(cent), groupCol)
      .withColumn("cos_centroid",
        round(dot(normalize(col("__v")), normalize(col("__cv"))), 6))
      .drop("__v", "__cv")
  }
}
