package graft

import org.apache.spark.sql.functions._
import graft.functions.Pca

/** Pins the production (double-precision) half of the PCA family —
  * q122's quantized covariance is under the DuckDB gate; everything
  * float-valued is pinned here instead (house q100/q108 discipline). */
class PcaSpec extends SparkSpec {

  private lazy val vecs = Tables.embeddings(spark, sf)
  private lazy val model = Pca.fit(vecs, "embedding", 64, 8)

  test("jacobi: recovers a known symmetric spectrum") {
    // diag(5,2,1) rotated by a fixed Givens rotation in the (0,1) plane
    val c = math.cos(0.3); val s = math.sin(0.3)
    val d0 = Array(5.0, 2.0, 1.0)
    val r = Array(Array(c, -s, 0.0), Array(s, c, 0.0), Array(0.0, 0.0, 1.0))
    val m = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => r(i)(k) * d0(k) * r(j)(k)).sum)
    val (evals, evecs) = Pca.jacobiEigen(m)
    assert(evals.zip(Array(5.0, 2.0, 1.0)).forall { case (a, b) => math.abs(a - b) < 1e-10 })
    // eigen residual ‖Mv − λv‖ ≈ 0 for each pair
    evals.zip(evecs).foreach { case (l, v) =>
      val mv = m.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
      assert(mv.zip(v).map { case (a, b) => math.abs(a - l * b) }.max < 1e-10)
    }
  }

  test("fit: orthonormal basis, descending eigenvalues, eigen residual small") {
    val b = model.basis
    for (i <- b.indices; j <- i until b.length) {
      val dot = b(i).zip(b(j)).map { case (x, y) => x * y }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"<b$i,b$j> = $dot")
    }
    val ev = model.eigenvalues
    assert(ev.zip(ev.tail).forall { case (a, c) => a >= c - 1e-12 })
    assert(ev.forall(_ >= -1e-12))
  }

  test("fit: top-k eigenvalues bounded by total variance (trace)") {
    // trace of the covariance = total variance; the kept spectrum can't exceed it
    val full = Pca.fit(vecs, "embedding", 64, 64)
    val trace = full.eigenvalues.sum
    assert(model.eigenvalues.sum <= trace + 1e-9)
    assert(trace > 0.0)
    // and top-8 of the full spectrum IS the 8-component model's spectrum
    full.eigenvalues.take(8).zip(model.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12)
    }
  }

  test("project: per-component variance matches the eigenvalue, mean ~ 0") {
    val proj = Pca.project(vecs, model)
    val stats = proj.select((0 until 8).flatMap(i => Seq(
      avg(col("proj").getItem(i)).as(s"m$i"),
      var_pop(col("proj").getItem(i)).as(s"v$i"))): _*).head()
    (0 until 8).foreach { i =>
      val m = stats.getDouble(2 * i); val v = stats.getDouble(2 * i + 1)
      assert(math.abs(m) < 1e-9, s"component $i mean $m")
      val l = model.eigenvalues(i)
      assert(math.abs(v - l) <= 1e-9 + 1e-6 * l, s"component $i var $v != eigval $l")
    }
  }

  test("fit + project: deterministic across runs") {
    val m2 = Pca.fit(vecs, "embedding", 64, 8)
    assert(model.mean.sameElements(m2.mean))
    assert(model.eigenvalues.sameElements(m2.eigenvalues))
    assert(model.basis.zip(m2.basis).forall { case (a, b) => a.sameElements(b) })
    val p1 = Pca.project(vecs, model).orderBy("vec_id").collect()
    val p2 = Pca.project(vecs, m2).orderBy("vec_id").collect()
    p1.zip(p2).foreach { case (r1, r2) =>
      assert(r1.getSeq[Double](1) == r2.getSeq[Double](1))
    }
  }

  test("incremental fit: merged delta moments ≡ full-corpus fit (q73 discipline)") {
    // split the corpus into "yesterday" and "today's delta", accumulate
    // each half's sufficient statistics independently, merge, refit —
    // the daily-refresh path that never rescans the old corpus
    val old = vecs.filter(col("vec_id") % 3 =!= 0)
    val delta = vecs.filter(col("vec_id") % 3 === 0)
    val merged = Pca.fitFromMoments(
      Pca.moments(old, "embedding", 64).merge(Pca.moments(delta, "embedding", 64)), 8)
    val full = Pca.fit(vecs, "embedding", 64, 8)
    assert(merged.count === full.count)
    // double addition is grouped differently across the two paths, so
    // equality is to summation-reassociation tolerance, not bit-exact
    merged.mean.zip(full.mean).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
    merged.eigenvalues.zip(full.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"$a vs $b") }
    merged.basis.zip(full.basis).zipWithIndex.foreach { case ((a, b), i) =>
      // eigenvectors are sign-ambiguous; compare |<a,b>| ≈ 1
      val dot = math.abs(a.zip(b).map { case (x, y) => x * y }.sum)
      assert(math.abs(dot - 1.0) < 1e-6, s"basis $i: |dot| = $dot")
    }
  }

  test("prefilter top-k: recall vs the exact scan, and shortlist=n degenerates to exact") {
    import graft.functions.Similarity
    // this corpus is deliberately near-isotropic — PCA's worst case
    // (top-8 components hold only ~20 % of variance vs 12.5 % under
    // pure isotropy; measured knee: k=8/sl=80 → 0.51, k=16/sl=160 →
    // 0.89, k=24/sl=160 → 0.96). q132 registers the (24, 160) point.
    val m24 = Pca.fit(vecs, "embedding", 64, 24)
    val queries = vecs.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(vecs, queries, 10)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Pca.prefilterTopK(vecs, queries, m24, k = 10, shortlist = 160)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"prefilter recall $recall < 0.9 at (24, 160)")
    // with the shortlist covering every vector, the result IS the exact scan
    val full = Pca.prefilterTopK(vecs, queries, m24, k = 10,
        shortlist = vecs.count().toInt)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full === exact)
  }

  test("quantized covariance: diagonal numerators are non-negative, symmetric triangle complete") {
    val cov = Pca.quantizedCovariance(vecs, "embedding", 64).cache()
    assert(cov.count() === 64L * 65 / 2)
    assert(cov.filter(col("i") === col("j") && col("cov_num") < 0).isEmpty)
    // numerator / (n²·2³²) tracks the double covariance within quantizer error
    val n = vecs.count().toDouble
    val full = Pca.fit(vecs, "embedding", 64, 64)
    val mean = full.mean
    val got = cov.filter(col("i") === 0 && col("j") === 0).head().getLong(2)
    val approx = got / (n * n * math.pow(2, 32))
    val exact = full.eigenvalues.sum // not directly comparable; use element (0,0)
    val c00 = {
      val vs = vecs.select(col("embedding").getItem(0).cast("double")).collect().map(_.getDouble(0))
      vs.map(x => (x - mean(0)) * (x - mean(0))).sum / n
    }
    assert(math.abs(approx - c00) < 1e-3, s"quantized $approx vs exact $c00 (trace $exact)")
  }
}
