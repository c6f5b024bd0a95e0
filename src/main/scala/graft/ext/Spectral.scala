package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ⊕ Spectral embedding analysis (north-star X15 extension): the top
  * principal component of an embedding column by power iteration,
  * expressed entirely as Spark aggregations, plus the per-vector
  * projection/residual screen built on it. The training-data uses:
  * dominant-direction diagnostics (a corpus whose first PC explains
  * most variance is cluster-collapsed or template-dominated — see the
  * q180 drift and q226 sanity screens this complements), residual
  * outlier screening (off-manifold vectors: corrupt encodes, wrong
  * modality), and de-biasing/whitening preprocessing before cosine
  * dedup (SemDeDup-style pipelines whiten before clustering).
  *
  * Algorithm: k fixed power-iteration steps v ← C·v / ‖C·v‖ from the
  * deterministic all-ones start, where C = (1/n)Σ(x−μ)(x−μ)ᵀ is the
  * covariance. C is never materialized (d² doubles would be fine at
  * d=64 but the MATRIX-FREE form scales to any d): C·v folds as
  * (1/n)Σ cᵢ·(cᵢ·v) — one row-local dot per vector, then a per-dim
  * sum. The 1/n and the norm cancel in the normalization, so each
  * step aggregates raw Σ cᵢ·(cᵢ·v) and rescales once.
  *
  * Plan shape per step (round 19 — the optimization round's measured
  * re-cut): one row-local dot against the LITERAL current d-vector,
  * one posexplode to (dim, c_j·p), one groupBy(dim) that partially
  * aggregates map-side — the shuffle carries d rows per partition,
  * never corpus rows — and the d-row result is COLLECTED to the
  * driver (model-sized state, the k-means-centroid convention
  * [[Similarity.ivfFit]] already rides) where it normalizes and
  * re-enters the next step as a literal. The previous form kept each
  * step's vector as a single-row DataFrame consumed via nested
  * broadcast crossJoins; because a broadcast subtree re-executes per
  * REFERENCE (no cross-action exchange reuse), every consumer of the
  * fitted state replayed the whole iteration chain — measured at
  * round-19 start as 709 Exchange nodes in q262's one plan and
  * 57–120 Spark jobs per spectral-family query; the literal form cuts
  * q255 to ~12 jobs with bit-identical output (guide §2.4: remove
  * shuffles outright; §1.2: fix the algorithm before the config). The
  * centered corpus is still EAGERLY localCheckpoint'ed so the k steps
  * re-read materialized blocks instead of re-scanning the source (the
  * q25 convention; eager, because a lazy checkpoint can be finalized
  * by a broadcast-exchange thread and deadlock — hit in round 17's
  * bench). At 100 TB the fit side rides [[fitStateSized]]'s
  * deterministic hash-sampled cap (a principal direction needs ~10⁵
  * rows, not 10¹¹); the PROJECT side ([[pcaProject]]/[[projectWith]])
  * is one scan-speed row-local pass and runs on everything.
  *
  * Numeric portability: all arithmetic is in double with the q24
  * fold-order convention (row-local dots are sequential folds on both
  * engines; the driver-side normalization divides each component by
  * √(s·s) with the SAME left-to-right fold the in-plan
  * `transform(sv, x => x / sqrt(dot(sv, sv)))` used, so the collected
  * form is bit-identical to the broadcast form); cross-row sums round
  * only at publish (the q01 convention). Fixed iteration count +
  * deterministic start means the published component is a
  * well-defined function of the data, not an "until converged" loop
  * whose trip count could differ by engine.
  *
  * Convergence semantics, measured (SpectralSpec): per-step
  * contraction is λ₂/λ₁, so on a corpus WITH a dominant direction
  * (the collapse/outlier use case) a handful of steps pins the
  * eigenvector (synthetic gap fixture: 4 steps land within 1e-3 of
  * the axis). On a NEARLY FLAT spectrum the direction is
  * underdetermined — necessarily, there is nothing dominant to find —
  * but the published Rayleigh quotient is still a valid lower bound
  * on λ₁ within a bounded factor (measured 0.85× on the flat test
  * fixture, λ₁/trace ≈ 0.029), so the datacard verdict the numbers
  * exist for ("is this corpus collapsed?") reads identically.
  */
object Spectral {

  /** Driver-side mirror of [[graft.functions.DotProduct.compute]]'s
    * sequential left-to-right fold — same order, same bits.
    */
  private def dotLocal(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0
    var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Exact-double literal array column for a driver-side model vector
    * (empty arrays keep the double element type).
    */
  private def litArr(v: Array[Double]): Column =
    typedlit[Seq[Double]](v.toSeq)

  /** Collect a `(i, value)` aggregation to a dense i-ascending array —
    * the driver-side twin of the former
    * `array_sort(collect_list(struct(i, v)))` readout (same values,
    * same order; only the delivery changes from a single-row broadcast
    * to a model-sized collect).
    */
  private def collectByIndex(df: DataFrame): Array[Double] =
    df.collect().map(r => r.getInt(0) -> r.getDouble(1)).sortBy(_._1).map(_._2)

  /** Fitted state: `cent` = (id, c) centered vectors (eagerly
    * checkpointed), `comp` = the unit-norm component after
    * `iterations` steps, `mu` = the per-dim mean — both model-sized
    * driver arrays (d doubles).
    */
  private[ext] case class Fit(cent: DataFrame, comp: Array[Double], mu: Array[Double])

  /** Centering pass: per-dim mean → d-row aggregation collected to the
    * driver (d rows through the shuffle, map-side combined), then one
    * row-local subtraction against the literal mean, eagerly
    * checkpointed.
    */
  private def center(vectors: DataFrame, id: Column,
                     vec: Column): (DataFrame, Array[Double]) = {
    val pts = vectors
      .select(id.as("id"), Similarity.vecD(vec).as("v"))
      .filter(col("v").isNotNull && size(col("v")) > 0)
    val mu = collectByIndex(pts.select(posexplode(col("v")).as(Seq("i", "x")))
      .groupBy(col("i")).agg(avg(col("x")).as("m")))
    val cent = pts
      .select(col("id"), zip_with(col("v"), litArr(mu), (a, b) => a - b).as("c"))
      .localCheckpoint()
    (cent, mu)
  }

  /** `iterations` power steps over an (id, c) table from the
    * deterministic all-ones start; each step is ONE map-side-combined
    * d-row aggregation + a driver-side normalization whose fold order
    * mirrors the in-plan dot exactly.
    */
  private def powerComp(cent: DataFrame, dim: Int,
                        iterations: Int): Array[Double] = {
    var pc = Array.fill(dim)(1.0)
    for (_ <- 1 to iterations) {
      val sv = collectByIndex(cent
        .select(Similarity.dot(col("c"), litArr(pc)).as("p"), col("c"))
        .select(col("p"), posexplode(col("c")).as(Seq("i", "cj")))
        .groupBy(col("i")).agg(sum(col("cj") * col("p")).as("s")))
      val nrm = math.sqrt(dotLocal(sv, sv))
      pc = sv.map(_ / nrm)
    }
    pc
  }

  private[ext] def fit(vectors: DataFrame, id: Column, vec: Column,
                       iterations: Int): Fit = {
    require(iterations >= 1, s"power iteration needs >= 1 step, got $iterations")
    val (cent, mu) = center(vectors, id, vec)
    Fit(cent, powerComp(cent, mu.length, iterations), mu)
  }

  /** Nullable scalar readout (an aggregation over an empty corpus
    * yields NULL; callers only publish it alongside rows that then
    * don't exist, so NaN is a safe in-driver stand-in).
    */
  private def headDouble(df: DataFrame): Double = {
    val r = df.head()
    if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
  }

  /** One-row (component, dim, …) publish base from a driver-side
    * component vector: `(i, loading)` rows via posexplode of the
    * literal array — the same rows the former single-row-DataFrame
    * readout produced.
    */
  private def explodedComp(df: DataFrame, pc: Array[Double]): DataFrame =
    df.sparkSession.range(1)
      .select(posexplode(litArr(pc)).as(Seq("i", "loading")))

  /** Top `nComponents` principal components by DEFLATION: fit a
    * component, subtract each row's projection onto it (c ← c −
    * (c·v)v — row-local, so the deflated corpus is one more
    * checkpointed pass), fit the next from the same all-ones start.
    * Published per (component [1-based], dim): loading, Rayleigh
    * eigenvalue, and explained fraction against the SHARED covariance
    * trace — the spectrum readout (top-k explained fractions are the
    * whitening decision: how many coordinates carry the corpus).
    * Deflated data is exactly mean-zero analytically, so no
    * re-centering between components (the oracle mirrors this).
    */
  def pcaComponents(vectors: DataFrame, id: Column, vec: Column,
                    nComponents: Int = 2, iterations: Int = 4,
                    roundTo: Int = 6): DataFrame = {
    require(nComponents >= 1,
      s"pcaComponents needs nComponents >= 1, got $nComponents")
    require(iterations >= 1, s"power iteration needs >= 1 step, got $iterations")
    var (cent, mu) = center(vectors, id, vec)
    // one trace readout shared by every component (the former
    // single-row-broadcast form re-executed it per component)
    val tr = headDouble(
      cent.agg(avg(Similarity.dot(col("c"), col("c"))).as("trace")))
    val parts = (1 to nComponents).map { k =>
      val comp = powerComp(cent, mu.length, iterations)
      val eig = headDouble(cent
        .select(Similarity.dot(col("c"), litArr(comp)).as("p"))
        .agg(avg(col("p") * col("p")).as("eigenvalue")))
      val published = explodedComp(cent, comp)
        .select(lit(k.toLong).as("component"),
          (col("i") + 1).cast("long").as("dim"),
          round(col("loading"), roundTo).as("loading"),
          round(lit(eig), roundTo).as("eigenvalue"),
          round(lit(eig) / lit(tr), roundTo).as("explained_frac"))
      if (k < nComponents) {
        cent = cent
          .select(col("id"), col("c"),
            Similarity.dot(col("c"), litArr(comp)).as("p"))
          .select(col("id"),
            zip_with(col("c"), litArr(comp), (cj, vj) => cj - col("p") * vj)
              .as("c"))
          .localCheckpoint()
      }
      published
    }
    parts.reduce(_.unionByName(_)).orderBy(col("component"), col("dim"))
  }

  /** Top principal component, published per dimension: `(dim
    * [1-based], loading, eigenvalue, explained_frac)` — d rows.
    * `eigenvalue` is the Rayleigh quotient vᵀCv = mean(projection²)
    * at the final component; `explained_frac` divides it by the
    * covariance trace (= mean ‖c‖²), the "how collapsed is this
    * corpus" number a datacard reports.
    */
  def pcaTopComponent(vectors: DataFrame, id: Column, vec: Column,
                      iterations: Int = 4, roundTo: Int = 6): DataFrame = {
    val f = fit(vectors, id, vec, iterations)
    val eig = headDouble(f.cent
      .select(Similarity.dot(col("c"), litArr(f.comp)).as("p"))
      .agg(avg(col("p") * col("p")).as("eigenvalue")))
    val tr = headDouble(
      f.cent.agg(avg(Similarity.dot(col("c"), col("c"))).as("trace")))
    explodedComp(f.cent, f.comp)
      .select((col("i") + 1).cast("long").as("dim"),
        round(col("loading"), roundTo).as("loading"),
        round(lit(eig), roundTo).as("eigenvalue"),
        round(lit(eig) / lit(tr), roundTo).as("explained_frac"))
      .orderBy(col("dim"))
  }

  /** Per-vector projection onto the fitted component and squared
    * residual distance from the component line — `(id, proj,
    * resid_sq)`. High `resid_sq` = off-manifold outlier (the screen);
    * `proj` is the 1-d whitening coordinate. `resid_sq` clamps at 0
    * (an exactly-on-axis vector can land at −ε in doubles, and −0.0
    * must never publish). One row-local pass over the corpus after
    * the (sample-sized) fit.
    */
  def pcaProject(vectors: DataFrame, id: Column, vec: Column,
                 iterations: Int = 4, roundTo: Int = 4): DataFrame =
    projectWith(vectors, id, vec,
      fitState(vectors, id, vec, iterations), roundTo)

  /** The whitening readout the family's consumers cluster on: each
    * vector's coordinates along the top-2 principal directions plus
    * the off-plane residual — `(id, p1, p2, resid_sq)`, rounded at
    * `roundTo` so the published triplet is the engine-stable INPUT of
    * any downstream dedup/screen (the [[pcaProject]] convention at
    * two components). Derivation byte-shares [[pcaComponents]]'
    * deflation: p1 = c·v1, the corpus deflates row-locally (c ← c −
    * p1·v1 — exactly mean-zero analytically, no re-centering), v2
    * fits from the same all-ones start, p2 = c_defl·v2, and the
    * residual is ‖c_defl‖² − p2² clamped at 0 (the −0.0 rule). Two
    * d-row-shuffle fits over eagerly checkpointed centered blocks plus
    * one row-local readout pass; nothing corpus-sized crosses the
    * driver (the fitted directions are d doubles each).
    */
  def whitenedCoords(vectors: DataFrame, id: Column, vec: Column,
                     iterations: Int = 4, roundTo: Int = 4): DataFrame = {
    val (cent, mu) = center(vectors, id, vec)
    val v1 = powerComp(cent, mu.length, iterations)
    val defl = cent
      .select(col("id"), col("c"),
        Similarity.dot(col("c"), litArr(v1)).as("p1"))
      .select(col("id"), col("p1"),
        zip_with(col("c"), litArr(v1), (cj, vj) => cj - col("p1") * vj).as("c"))
      .localCheckpoint()
    val v2 = powerComp(defl.select(col("id"), col("c")), mu.length, iterations)
    defl
      .select(col("id"), col("p1"),
        Similarity.dot(col("c"), litArr(v2)).as("p2"),
        Similarity.dot(col("c"), col("c")).as("cc"))
      .select(col("id"),
        round(col("p1"), roundTo).as("p1"),
        round(col("p2"), roundTo).as("p2"),
        round(greatest(lit(0.0), col("cc") - col("p2") * col("p2")),
          roundTo).as("resid_sq"))
  }

  /** The fitted model as ONE broadcastable row `(mu, pc)` — the
    * static side of the stream-static deployment: fit offline (on a
    * sample), hand the state to [[projectWith]] /
    * [[graft.streaming.EventStream.pcaProjectStream]] for scoring
    * batches or streams that the fit never saw. The row is a literal
    * local relation (the fitted vectors live on the driver), so
    * scoring actions never re-execute the fit chain.
    */
  def fitState(vectors: DataFrame, id: Column, vec: Column,
               iterations: Int = 4): DataFrame = {
    val f = fit(vectors, id, vec, iterations)
    vectors.sparkSession.range(1)
      .select(litArr(f.mu).as("mu"), litArr(f.comp).as("pc"))
  }

  /** The TWO-component fitted model as ONE broadcastable row
    * `(mu, pc, pc2)` — [[fitState]] extended by [[pcaComponents]]'
    * deflation: v1 from the centered fit rows, the fit rows deflate
    * row-locally (c ← c − (c·v1)v1 — exactly mean-zero analytically,
    * no re-centering), v2 from the same all-ones start on the
    * deflated rows. The static side of the 3-d whitened readout's
    * fit/score split ([[whitenedWith]] consumes it).
    */
  def fitState2(vectors: DataFrame, id: Column, vec: Column,
                iterations: Int = 4): DataFrame = {
    val (cent, mu) = center(vectors, id, vec)
    val v1 = powerComp(cent, mu.length, iterations)
    val defl = cent
      .select(col("id"), col("c"),
        Similarity.dot(col("c"), litArr(v1)).as("p1"))
      .select(col("id"),
        zip_with(col("c"), litArr(v1), (cj, vj) => cj - col("p1") * vj).as("c"))
      .localCheckpoint()
    val v2 = powerComp(defl, mu.length, iterations)
    vectors.sparkSession.range(1)
      .select(litArr(mu).as("mu"), litArr(v1).as("pc"), litArr(v2).as("pc2"))
  }

  /** The 100 TB fit for the 3-d whitened readout: [[fitState2]] over
    * the SAME deterministic md5-hash sample [[fitStateSized]] uses —
    * both principal directions are corpus-level statistics, so the
    * q50 capped sample pins them and the full corpus only ever sees
    * the row-local scoring pass ([[whitenedWith]]). Below the cap the
    * sample is the corpus and this IS [[whitenedCoords]]'s fit
    * (spec-proven).
    */
  def fitState2Sized(vectors: DataFrame, id: Column, vec: Column,
                     iterations: Int = 4, maxFitRows: Long = 1L << 20,
                     salt: Long = 0L): DataFrame = {
    require(maxFitRows > 0, s"fitState2Sized needs maxFitRows > 0, got $maxFitRows")
    val pts = vectors
      .select(id.as("id"), Similarity.vecD(vec).as("v"))
      .filter(col("v").isNotNull && size(col("v")) > 0)
    val n = pts.count()
    val rate = math.min(1.0, maxFitRows.toDouble / math.max(n, 1L).toDouble)
    val sampled = graft.ops.Sampling.byHash(pts, "id", rate, salt)
    fitState2(sampled, col("id"), col("v"), iterations)
  }

  /** Score rows against an already-fitted [[fitState2]] row — the
    * 3-d whitening readout `(id, p1, p2, resid_sq)` as ONE row-local
    * pass after the single-row broadcast join: c = v − mu, p1 = c·v1,
    * the row deflates in place (c − p1·v1), p2 = c_defl·v2, residual
    * ‖c_defl‖² − p2² clamped at 0 (the −0.0 rule). Identical
    * arithmetic (and publish rounding) to [[whitenedCoords]], so the
    * full-corpus fit reproduces it bit-for-bit; with the
    * [[fitState2Sized]] state this is the sample-fitted/
    * full-scoring split the 100 TB deployment needs.
    */
  def whitenedWith(vectors: DataFrame, id: Column, vec: Column,
                   state: DataFrame, roundTo: Int = 4): DataFrame = {
    val keyed = state.withColumn("__k", lit(1))
    vectors
      .select(id.as("id"), Similarity.vecD(vec).as("v"))
      .filter(col("v").isNotNull && size(col("v")) > 0)
      .withColumn("__k", lit(1))
      .join(broadcast(keyed), "__k")
      .select(col("id"), zip_with(col("v"), col("mu"), (a, b) => a - b).as("c"),
        col("pc"), col("pc2"))
      .select(col("id"), Similarity.dot(col("c"), col("pc")).as("p1"),
        col("c"), col("pc"), col("pc2"))
      .select(col("id"), col("p1"),
        zip_with(col("c"), col("pc"), (cj, vj) => cj - col("p1") * vj).as("cd"),
        col("pc2"))
      .select(col("id"), col("p1"),
        Similarity.dot(col("cd"), col("pc2")).as("p2"),
        Similarity.dot(col("cd"), col("cd")).as("cc"))
      .select(col("id"),
        round(col("p1"), roundTo).as("p1"),
        round(col("p2"), roundTo).as("p2"),
        round(greatest(lit(0.0), col("cc") - col("p2") * col("p2")),
          roundTo).as("resid_sq"))
  }

  /** [[whitenedCoords]] on the sized fit path: both principal
    * directions from the capped hash sample, every row scored — the
    * q257 treatment applied to the 3-d readout (the genuine near-dup
    * operating point gets its 100 TB fit).
    */
  def whitenedCoordsSized(vectors: DataFrame, id: Column, vec: Column,
                          iterations: Int = 4, roundTo: Int = 4,
                          maxFitRows: Long = 1L << 20,
                          salt: Long = 0L): DataFrame =
    whitenedWith(vectors, id, vec,
      fitState2Sized(vectors, id, vec, iterations, maxFitRows, salt), roundTo)

  /** The 100 TB fit: [[fitState]] over a DETERMINISTIC hash sample of
    * the corpus capped at `maxFitRows` — the q50 md5 rule
    * ([[graft.ops.Sampling.byHash]]) on the id, so the fit set is
    * reproducible under any partitioning or cluster size. A principal
    * direction is a corpus-level statistic: ~10⁵–10⁶ rows pin it, and
    * fitting on 10¹¹ rows buys nothing but `iterations` extra full
    * scans. The rate derives from ONE corpus count (the sized-family
    * convention); below the cap the sample is the corpus and the
    * sized form IS the fixed form (spec-proven). Scoring still covers
    * every row — hand this state to [[projectWith]] /
    * [[graft.streaming.EventStream.pcaProjectStream]].
    */
  def fitStateSized(vectors: DataFrame, id: Column, vec: Column,
                    iterations: Int = 4, maxFitRows: Long = 1L << 20,
                    salt: Long = 0L): DataFrame = {
    require(maxFitRows > 0, s"fitStateSized needs maxFitRows > 0, got $maxFitRows")
    val pts = vectors
      .select(id.as("id"), Similarity.vecD(vec).as("v"))
      .filter(col("v").isNotNull && size(col("v")) > 0)
    val n = pts.count()
    val rate = math.min(1.0, maxFitRows.toDouble / math.max(n, 1L).toDouble)
    val sampled = graft.ops.Sampling.byHash(pts, "id", rate, salt)
    fitState(sampled, col("id"), col("v"), iterations)
  }

  /** [[pcaProject]] with the sized fit: sample-fitted component,
    * every row scored.
    */
  def pcaProjectSized(vectors: DataFrame, id: Column, vec: Column,
                      iterations: Int = 4, roundTo: Int = 4,
                      maxFitRows: Long = 1L << 20,
                      salt: Long = 0L): DataFrame =
    projectWith(vectors, id, vec,
      fitStateSized(vectors, id, vec, iterations, maxFitRows, salt), roundTo)

  /** Score rows against an already-fitted [[fitState]] row: center,
    * project, residual — stateless row-local arithmetic after the
    * single-row broadcast join, so the SAME code path serves batch
    * and streaming (batch ≡ streaming is structural, and
    * StreamingSpec still proves it). The join rides a constant key
    * (stream-static broadcast equi-join — supported in
    * micro-batches, unlike a bare cross join).
    */
  def projectWith(vectors: DataFrame, id: Column, vec: Column,
                  state: DataFrame, roundTo: Int = 4): DataFrame = {
    val keyed = state.withColumn("__k", lit(1))
    vectors
      .select(id.as("id"), Similarity.vecD(vec).as("v"))
      .filter(col("v").isNotNull && size(col("v")) > 0)
      .withColumn("__k", lit(1))
      .join(broadcast(keyed), "__k")
      .select(col("id"), zip_with(col("v"), col("mu"), (a, b) => a - b).as("c"),
        col("pc"))
      .select(col("id"), Similarity.dot(col("c"), col("pc")).as("p"),
        Similarity.dot(col("c"), col("c")).as("cc"))
      .select(col("id"),
        round(col("p"), roundTo).as("proj"),
        round(greatest(lit(0.0), col("cc") - col("p") * col("p")),
          roundTo).as("resid_sq"))
  }
}
