package graft

import org.apache.spark.sql.functions._
import graft.ext.{Spectral, TextRank}

class SpectralSpec extends SparkSuite {
  import spark.implicits._

  /** Synthetic corpus with a KNOWN dominant direction: dim 2 carries
    * variance ~25 (values ±5 alternating), dim 5 carries variance ~1,
    * everything else constant — PC1 must be ±e₂ up to the small mixing
    * the finite spectrum allows, and the exact answer is checkable by
    * a driver-side 100-step power iteration on the collected rows.
    */
  private def synth = {
    val d = 8
    (0 until 64).map { r =>
      val v = Array.fill(d)(0.0f)
      v(2) = if (r % 2 == 0) 5.0f else -5.0f
      v(5) = if (r % 4 < 2) 1.0f else -1.0f
      v(0) = 3.0f // constant: zero variance, zero loading
      (r.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  test("pcaTopComponent finds the dominant axis with the right eigenvalue") {
    val out = Spectral.pcaTopComponent(synth, col("vec_id"), col("embedding"),
        iterations = 4)
      .collect().sortBy(_.getLong(0))
    assert(out.length == 8)
    val loadings = out.map(r => math.abs(r.getDouble(1)))
    assert(loadings.indexOf(loadings.max) == 2, "dominant dim must be 2")
    assert(loadings(2) > 0.999, s"PC1 should be ~e2, got ${loadings.toSeq}")
    // eigenvalue = variance along dim 2 = 25 (population), and the
    // constant dim contributes nothing to the trace
    val eig = out.head.getDouble(2)
    assert(math.abs(eig - 25.0) < 0.01, s"eigenvalue $eig != ~25")
    val explained = out.head.getDouble(3)
    assert(math.abs(explained - 25.0 / 26.0) < 0.01,
      s"explained_frac $explained != ~25/26")
  }

  test("pcaTopComponent matches a driver-side exact power iteration") {
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val got = Spectral.pcaTopComponent(em, col("vec_id"), col("embedding"),
        iterations = 4)
      .collect().sortBy(_.getLong(0)).map(_.getDouble(1))
    // replay: collect the raw vectors and run the IDENTICAL 4 steps
    // (ones start, normalize each step) in plain Scala
    val rows = em.select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val d = rows.head.length
    val n = rows.length
    val mu = Array.tabulate(d)(j => rows.map(_(j)).sum / n)
    val c = rows.map(r => Array.tabulate(d)(j => r(j) - mu(j)))
    var v = Array.fill(d)(1.0)
    for (_ <- 1 to 4) {
      val s = Array.fill(d)(0.0)
      c.foreach { ci =>
        val p = (0 until d).map(j => ci(j) * v(j)).sum
        (0 until d).foreach(j => s(j) += ci(j) * p)
      }
      val nrm = math.sqrt(s.map(x => x * x).sum)
      v = s.map(_ / nrm)
    }
    (0 until d).foreach { j =>
      assert(math.abs(got(j) - v(j)) < 1e-6,
        s"loading mismatch at dim $j: ${got(j)} vs ${v(j)}")
    }
    // operating-point quality (the q198/q238 stance), measured on the
    // fixture's NEARLY FLAT spectrum (λ1/trace ≈ 0.029 vs 1/d ≈ 0.016
    // — measured; contraction per step λ2/λ1 ≈ 0.93, so 4 steps leave
    // the DIRECTION underdetermined, as power iteration must when
    // there is nothing dominant to find). The semantic contract that
    // must hold anyway: the published Rayleigh quotient never exceeds
    // the converged λ1, sits within a bounded factor of it, and both
    // render the same "not collapsed" verdict (explained ≪ 1).
    var vc = Array.fill(d)(1.0)
    var lam = 0.0
    for (_ <- 1 to 100) {
      val s = Array.fill(d)(0.0)
      c.foreach { ci =>
        val p = (0 until d).map(j => ci(j) * vc(j)).sum
        (0 until d).foreach(j => s(j) += ci(j) * p)
      }
      val nrm = math.sqrt(s.map(x => x * x).sum)
      vc = s.map(_ / nrm)
      lam = nrm / n
    }
    val ray4 = c.map { ci =>
      val p = (0 until d).map(j => ci(j) * v(j)).sum; p * p
    }.sum / n
    assert(ray4 <= lam * 1.0001, s"Rayleigh(v4)=$ray4 exceeds converged λ1=$lam")
    assert(ray4 >= 0.7 * lam,
      s"Rayleigh(v4)=$ray4 too far below converged λ1=$lam even for a flat spectrum")
    val trace = c.map(ci => ci.map(x => x * x).sum).sum / n
    assert(ray4 / trace < 0.1 && lam / trace < 0.1,
      "flat-spectrum fixture must read 'not collapsed' through both estimates")
  }

  test("pcaProject: on-axis vectors have ~zero residual, projections split by sign") {
    val out = Spectral.pcaProject(synth, col("vec_id"), col("embedding"),
        iterations = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.length == 64)
    // residual = only the dim-5 component (variance 1), never negative
    assert(out.forall(_._3 >= 0.0), "resid_sq must clamp at >= 0")
    assert(out.forall(t => math.abs(t._3 - 1.0) < 0.01),
      "every synthetic vector has exactly the unit dim-5 residual")
    // projections are ±5 (the dim-2 coordinate), sign split evenly
    assert(out.count(t => math.abs(math.abs(t._2) - 5.0) < 0.01) == 64)
    assert(out.count(_._2 > 0) == 32)
  }

  test("pcaComponents: deflation yields an orthogonal second component " +
      "with the subordinate eigenvalue") {
    val out = ext.Spectral.pcaComponents(synth, col("vec_id"), col("embedding"),
        nComponents = 2, iterations = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.length == 16)
    val pc1 = out.filter(_._1 == 1).sortBy(_._2).map(_._3)
    val pc2 = out.filter(_._1 == 2).sortBy(_._2).map(_._3)
    // PC1 = ±e2 (var 25), PC2 = ±e5 (var 1), orthogonal
    assert(pc1.map(math.abs).indexOf(pc1.map(math.abs).max) == 2)
    assert(pc2.map(math.abs).indexOf(pc2.map(math.abs).max) == 5)
    val ortho = pc1.zip(pc2).map { case (a, b) => a * b }.sum
    assert(math.abs(ortho) < 1e-6, s"components not orthogonal: $ortho")
    val ev1 = out.find(_._1 == 1).get._4
    val ev2 = out.find(_._1 == 2).get._4
    assert(math.abs(ev1 - 25.0) < 0.01 && math.abs(ev2 - 1.0) < 0.01,
      s"eigenvalues ($ev1, $ev2) != (~25, ~1)")
    // explained fractions share one trace: 25/26 and 1/26
    assert(math.abs(out.find(_._1 == 1).get._5 - 25.0 / 26.0) < 0.01)
    assert(math.abs(out.find(_._1 == 2).get._5 - 1.0 / 26.0) < 0.01)
    // component 1 rows replicate pcaTopComponent exactly (shared path)
    val single = ext.Spectral.pcaTopComponent(synth, col("vec_id"),
        col("embedding"), iterations = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    single.foreach { case (d, l) =>
      assert(out.find(t => t._1 == 1 && t._2 == d).get._3 == l) }
  }

  test("pca is partitioning-invariant at published precision") {
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val a = Spectral.pcaTopComponent(em, col("vec_id"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = Spectral.pcaTopComponent(em.repartition(7), col("vec_id"),
        col("embedding"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    a.zip(b).foreach { case ((d1, l1), (d2, l2)) =>
      assert(d1 == d2 && math.abs(l1 - l2) < 1e-5,
        s"partitioning changed dim $d1: $l1 vs $l2")
    }
  }

  test("fitStateSized: sized ≡ fixed below the cap; a binding cap still " +
      "recovers the dominant axis and scores every row") {
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // cap >= n: rate saturates at 1.0, byHash keeps every row -> the
    // sized state IS the fixed state, bit-for-bit
    val fixed = ext.Spectral.fitState(em, col("vec_id"), col("embedding"))
      .collect()(0)
    val sat = ext.Spectral.fitStateSized(em, col("vec_id"), col("embedding"),
        maxFitRows = 1000000L)
      .collect()(0)
    assert(fixed.getSeq[Double](0) == sat.getSeq[Double](0) &&
      fixed.getSeq[Double](1) == sat.getSeq[Double](1),
      "saturated sized fit must equal the fixed fit exactly")
    // binding cap on the known-axis synthetic: the fit sees a strict
    // subset, the component still lands on the planted axis
    val n = synth.count()
    val sizedRows = ext.Spectral.pcaProjectSized(synth, col("vec_id"),
        col("embedding"), maxFitRows = 24)
      .collect()
    assert(sizedRows.length == n, "every row must score, cap or no cap")
    val comp = ext.Spectral.fitStateSized(synth, col("vec_id"),
        col("embedding"), maxFitRows = 24)
      .collect()(0).getSeq[Double](1)
    assert(comp.map(math.abs).zipWithIndex.maxBy(_._1)._2 == 2,
      s"sample-fitted component must still find dim 2: $comp")
    assert(math.abs(comp(2)) > 0.999)
    // and the cap truly bound: the sample the fit used is smaller
    val kept = graft.ops.Sampling.byHash(
      synth.select(col("vec_id").as("id")), "id", 24.0 / n).count()
    assert(kept < n && kept > 0, s"cap should bind: kept $kept of $n")
  }

  test("whitenedCoords: p1 ≡ pcaProject proj, exact energy decomposition, " +
      "residual monotone, synth spectrum recovered") {
    val wc = Spectral.whitenedCoords(synth, col("vec_id"), col("embedding"),
        iterations = 4, roundTo = 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val pj = Spectral.pcaProject(synth, col("vec_id"), col("embedding"),
        iterations = 4, roundTo = 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(wc.keySet == pj.keySet && wc.size == 64)
    for ((id, (p1, p2, r2)) <- wc) {
      val (pp, rr) = pj(id)
      assert(math.abs(p1 - pp) < 1e-9, s"p1 must equal pcaProject proj at $id")
      assert(r2 <= rr + 1e-6, s"two-component residual must not exceed one-component at $id")
      // deflation removes exactly the p1 component (v1 unit), so
      // ‖c_defl‖² = ‖c‖² − p1² and resid_sq == (pcaProject resid) − p2²
      assert(math.abs((rr - p2 * p2) - r2) < 1e-4, s"energy decomposition at $id")
    }
    // synth's second axis is dim 5 (±1): |p2| ≈ 1 and the off-plane
    // residual vanishes for every row
    assert(wc.values.forall { case (_, p2, r2) =>
      math.abs(math.abs(p2) - 1.0) < 0.05 && r2 < 0.02 })
  }

  test("whitened-footprint semDedup (q253 composition): identical " +
      "footprints collapse to min-id; opposite-side footprints survive") {
    // synth's dominant axis (dim 2, ±5) plus three probe rows:
    // 100/101 are IDENTICAL vectors (identical (proj, resid)
    // footprint — 101 must drop to its lower-id twin), 103 sits on
    // the OPPOSITE side of the component (negative proj — cosine with
    // every positive-proj footprint is negative, so it must survive).
    // The probes are angularly ≥ ~0.997-cosine away from the corpus
    // footprints, far below the 0.9999 ball, so only the twin drops.
    val d = 8
    def mk(id: Long, v2: Float, v5: Float) = {
      val v = Array.fill(d)(0.0f); v(0) = 3.0f; v(2) = v2; v(5) = v5
      (id, v.toSeq)
    }
    val df = synth.union(
      Seq(mk(100L, 4.0f, 0.5f), mk(101L, 4.0f, 0.5f), mk(103L, -4.0f, 0.5f))
        .toDF("vec_id", "embedding"))
    val state = Spectral.fitState(df, col("vec_id"), col("embedding"),
      iterations = 4)
    val wc = Spectral.projectWith(df, col("vec_id"), col("embedding"),
        state, roundTo = 4)
      .select(col("id"), array(col("proj"), sqrt(col("resid_sq"))).as("w"))
    val kept = graft.ext.Similarity.semDedup(wc, col("id"), col("w"),
        k = 2, iters = 2, tau = 0.9999, quantize = Some(9))
      .select("id").as[Long].collect().toSet
    assert(kept.contains(100L), "min-id twin must survive")
    assert(!kept.contains(101L), "identical footprint must drop to its lower-id twin")
    assert(kept.contains(103L), "opposite-side footprint must survive")
    // and the dedup is real but not a decimation: the ±5 corpus rows
    // collapse within their two footprint classes, one survivor each
    val corpusKept = kept.filter(_ < 64L)
    assert(corpusKept.nonEmpty && corpusKept.size < 64,
      s"corpus footprint classes should collapse: ${corpusKept.size} kept")
  }

  test("sized whitened semDedup (q257 composition): sized fit below the " +
      "cap reproduces the fixed-fit composition exactly") {
    // Below the cap fitStateSized's sample IS the corpus (rate = 1.0,
    // every md5 bucket < 2^20), so the whole q257 chain must equal
    // q253's fixed-fit chain row for row — the sized-family spec
    // discipline (q149/q112) applied to the composition, not just the
    // fit. A BINDING cap is exercised by the q257 oracle at sf0.01
    // (500 vectors vs cap 256), where survivors legitimately differ.
    val d = 8
    def mk(id: Long, v2: Float, v5: Float) = {
      val v = Array.fill(d)(0.0f); v(0) = 3.0f; v(2) = v2; v(5) = v5
      (id, v.toSeq)
    }
    val df = synth.union(
      Seq(mk(100L, 4.0f, 0.5f), mk(101L, 4.0f, 0.5f), mk(103L, -4.0f, 0.5f))
        .toDF("vec_id", "embedding"))
    def chain(state: org.apache.spark.sql.DataFrame): Set[(Long, Int)] = {
      val wc = Spectral.projectWith(df, col("vec_id"), col("embedding"),
          state, roundTo = 4)
        .select(col("id"), array(col("proj"), sqrt(col("resid_sq"))).as("w"))
      graft.ext.Similarity.semDedup(wc, col("id"), col("w"),
          k = 2, iters = 2, tau = 0.9999, quantize = Some(9))
        .select(col("id"), col("cluster"))
        .as[(Long, Int)].collect().toSet
    }
    val fixed = chain(Spectral.fitState(df, col("vec_id"), col("embedding"),
      iterations = 4))
    val sized = chain(Spectral.fitStateSized(df, col("vec_id"), col("embedding"),
      iterations = 4, maxFitRows = 1000L))
    assert(sized == fixed,
      s"sized-below-cap must equal fixed: ${sized.diff(fixed)} / ${fixed.diff(sized)}")
    // and the FULLY-sized composition (q258: sized fit + semDedupAuto)
    // equals the explicit form below the derivation floors: on this
    // ~67-row corpus clustersForCorpus floors to k = 16 and
    // partitionsForCorpus to 32, so semDedupAuto must reproduce
    // semDedup(k = 16) row for row — the q150/q112 oracle-sharing
    // convention, proven at the composition level
    def footprints = {
      val state = Spectral.fitStateSized(df, col("vec_id"), col("embedding"),
        iterations = 4, maxFitRows = 1000L)
      Spectral.projectWith(df, col("vec_id"), col("embedding"),
          state, roundTo = 4)
        .select(col("id"), array(col("proj"), sqrt(col("resid_sq"))).as("w"))
    }
    val auto = graft.ext.Similarity.semDedupAuto(footprints,
        col("id"), col("w"), iters = 2, tau = 0.9999, quantize = Some(9))
      .select(col("id"), col("cluster")).as[(Long, Int)].collect().toSet
    val explicit16 = graft.ext.Similarity.semDedup(footprints,
        col("id"), col("w"), k = 16, iters = 2, tau = 0.9999, quantize = Some(9))
      .select(col("id"), col("cluster")).as[(Long, Int)].collect().toSet
    assert(auto == explicit16,
      "q258's fully-sized composition must equal the explicit k=16 form below the floors")
  }

  test("whitenedCoordsSized: saturated cap ≡ whitenedCoords bit-for-bit; " +
      "a binding cap still scores every row on the planted axes") {
    val em = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // cap >= n: the sample IS the corpus, both components fit on the
    // same rows in the same order, and the row-local scoring pass is
    // the same arithmetic whitenedCoords runs inline — bit-for-bit
    val fixed = Spectral.whitenedCoords(em, col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val sat = Spectral.whitenedCoordsSized(em, col("vec_id"), col("embedding"),
        maxFitRows = 1000000L)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(sat == fixed, "saturated sized readout must equal the fixed one exactly")
    // binding cap on the known-spectrum synthetic: every row still
    // scores, and both sample-fitted directions land on the planted
    // axes (dim 2 dominant, dim 5 second)
    val n = synth.count()
    val state2 = Spectral.fitState2Sized(synth, col("vec_id"), col("embedding"),
      maxFitRows = 24)
    val r0 = state2.collect()(0)
    val pc = r0.getSeq[Double](1)
    val pc2 = r0.getSeq[Double](2)
    assert(pc.map(math.abs).zipWithIndex.maxBy(_._1)._2 == 2,
      s"sample-fitted v1 must find dim 2: $pc")
    assert(pc2.map(math.abs).zipWithIndex.maxBy(_._1)._2 == 5,
      s"sample-fitted v2 must find dim 5: $pc2")
    val scoredRows = Spectral.whitenedWith(synth, col("vec_id"),
      col("embedding"), state2).count()
    assert(scoredRows == n, "every row must score, cap or no cap")
    val kept = graft.ops.Sampling.byHash(
      synth.select(col("vec_id").as("id")), "id", 24.0 / n).count()
    assert(kept < n && kept > 0, s"cap should bind: kept $kept of $n")
    // q263's fully-sized 3-d composition ≡ the explicit k=16 form
    // below the derivation floors (the q258/q150 oracle-sharing
    // convention, proven at the composition level on 3-d footprints)
    def footprints3 = Spectral.whitenedWith(em, col("vec_id"),
        col("embedding"), Spectral.fitState2Sized(em, col("vec_id"),
          col("embedding"), maxFitRows = 1000000L))
      .select(col("id"),
        array(col("p1"), col("p2"), sqrt(col("resid_sq"))).as("w"))
    val auto3 = graft.ext.Similarity.semDedupAuto(footprints3,
        col("id"), col("w"), iters = 2, tau = 0.9999, quantize = Some(9))
      .select(col("id"), col("cluster")).as[(Long, Int)].collect().toSet
    val explicit3 = graft.ext.Similarity.semDedup(footprints3,
        col("id"), col("w"), k = 16, iters = 2, tau = 0.9999,
        quantize = Some(9))
      .select(col("id"), col("cluster")).as[(Long, Int)].collect().toSet
    assert(auto3 == explicit3,
      "q263's fully-sized 3-d composition must equal the explicit k=16 form below the floors")
  }

  test("rrfFuse: exact integer units, per-list attribution, absent lists null") {
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val den = Seq((20L, 1), (40L, 2)).toDF("id", "rank")
    // output columns: id, rrf_units, rank_lex, rank_dense
    val rows = TextRank.rrfFuse(Seq("lex" -> lex, "dense" -> den), k0 = 60)
      .collect()
    val byId = rows.map(r => r.getLong(0) ->
      ((Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(1)))).toMap
    // doc 20 appears in both lists: 10^6//62 + 10^6//61
    assert(byId(20L) == ((Some(2L), Some(1L),
      1000000L / 62 + 1000000L / 61)))
    // single-list docs: the other rank is null
    assert(byId(10L) == ((Some(1L), None, 1000000L / 61)))
    assert(byId(40L) == ((None, Some(2L), 1000000L / 62)))
    assert(byId(30L) == ((Some(3L), None, 1000000L / 63)))
    assert(rows.length == 4)
  }

  test("rrfFuse rejects duplicate list names and negative k0") {
    val l = Seq((1L, 1)).toDF("id", "rank")
    intercept[IllegalArgumentException] {
      TextRank.rrfFuse(Seq("a" -> l, "a" -> l))
    }
    intercept[IllegalArgumentException] {
      TextRank.rrfFuse(Seq("a" -> l), k0 = -1)
    }
    intercept[IllegalArgumentException] { TextRank.rrfFuse(Seq.empty) }
  }
}
