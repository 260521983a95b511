package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PCA over the embedding column — the dimensionality-reduction /
  * rotation step a large-scale vector pipeline runs before PQ (OPQ-style
  * energy compaction), semantic-dedup clustering, or visualization.
  *
  * Scale shape: the ONLY full-data pass is a single `mapPartitions`
  * sweep that accumulates (n, Σx, Σxxᵀ) per partition — d + d(d+1)/2
  * doubles each, d = 64 here — followed by a driver-side combine of one
  * bounded partial PER PARTITION (32 × ~2 KB on local[32]; ~1000 × 2 KB
  * on a big cluster — trivially bounded, same contract as the Lloyd
  * codebook collects). No n·d explode, no n·d² join, no shuffle at all:
  * the moment pass is embarrassingly parallel and the d×d eigenproblem
  * is driver-side Jacobi (d³ ≈ 260k flops — microseconds). Projection
  * is then one more map-only pass. This is the textbook distributed-PCA
  * recipe (MLlib's RowMatrix.computeCovariance has the same structure);
  * it holds unchanged at 100 TB because everything that grows with n is
  * a partial aggregate.
  *
  * Oracle strategy (house float discipline — see q66's floor note):
  * float covariance is a sum whose addition ORDER differs between
  * engines, so the gate runs a QUANTIZED twin: qx = floor(x·2¹⁶) is
  * exactly reproducible (f32→f64 cast is exact, ·2¹⁶ is exact — power
  * of two — and floor is deterministic), and all downstream moments are
  * int64 sums of int64 products — order-independent, bit-exact on both
  * engines. The numerator n·Σqxᵢqxⱼ − Σqxᵢ·Σqxⱼ stays inside int64 for
  * n ≲ 7·10⁴ vectors at this corpus's |x| ≤ 0.6 (gate scale is 500) —
  * and the quantized path accumulates native int64 with
  * addExact/multiplyExact, so leaving that envelope throws
  * ArithmeticException instead of silently losing exactness;
  * the PRODUCTION path ([[fit]]/[[project]]) uses double moments with
  * no such bound and is pinned by PcaSpec instead (orthonormality,
  * eigen-residual, variance accounting, determinism).
  */
object Pca {

  /** Fitted model: population mean, eigenvalues (descending) and the
    * matching orthonormal principal axes (rows of `basis`). */
  case class Model(dim: Int, count: Long, mean: Array[Double],
                   eigenvalues: Array[Double], basis: Array[Array[Double]])

  private def triSize(d: Int): Int = d * (d + 1) / 2
  private def triIdx(i: Int, j: Int, d: Int): Int = i * d - i * (i - 1) / 2 + (j - i)

  /** Sufficient statistics of a vector set: (n, Σx, Σxxᵀ upper
    * triangle). MERGEABLE — `merge` is element-wise addition — which is
    * the incremental-maintenance contract (q73's merge ≡ recompute
    * discipline applied to model fitting): at 100 TB the daily refresh
    * accumulates the delta batch's moments and refits the d×d
    * eigenproblem without rescanning the corpus. */
  case class Moments(n: Long, s: Array[Double], ss: Array[Double]) {
    def merge(o: Moments): Moments = {
      require(s.length == o.s.length, "dimension mismatch in Moments.merge")
      Moments(n + o.n,
        s.zip(o.s).map { case (a, b) => a + b },
        ss.zip(o.ss).map { case (a, b) => a + b })
    }
  }

  /** The one-pass moment sweep over a vector set (double precision) —
    * the building block [[fit]] uses, exposed for incremental callers:
    * `fitFromMoments(moments(old).merge(moments(delta)))`. */
  def moments(vectors: DataFrame, embCol: String, dim: Int): Moments = {
    val (n, s, ss) = momentPartials(vectors, embCol, dim)
    Moments(n, s, ss)
  }

  /** One-pass partial moments (double precision): per input partition,
    * (n, Σx, Σxxᵀ upper triangle). */
  private def momentPartials(vectors: DataFrame, embCol: String,
                             dim: Int): (Long, Array[Double], Array[Double]) = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val partials: Dataset[(Long, Array[Double], Array[Double])] =
      vectors.select(col(embCol).cast(ArrayType(FloatType))).as[Array[Float]]
        .mapPartitions { rows =>
          var n = 0L
          val s = new Array[Double](dim)
          val ss = new Array[Double](triSize(dim))
          val x = new Array[Double](dim)
          rows.foreach { e =>
            require(e.length == dim, s"embedding dim ${e.length} != $dim")
            var i = 0
            while (i < dim) { x(i) = e(i).toDouble; i += 1 }
            n += 1
            i = 0
            while (i < dim) {
              s(i) += x(i)
              var j = i
              while (j < dim) { ss(triIdx(i, j, dim)) += x(i) * x(j); j += 1 }
              i += 1
            }
          }
          Iterator.single((n, s, ss))
        }
    // one bounded row per partition — the driver combine is O(parts·d²)
    partials.collect().foldLeft(
      (0L, new Array[Double](dim), new Array[Double](triSize(dim)))) {
      case ((an, as, ass), (bn, bs, bss)) =>
        var i = 0
        while (i < dim) { as(i) += bs(i); i += 1 }
        i = 0
        while (i < ass.length) { ass(i) += bss(i); i += 1 }
        (an + bn, as, ass)
    }
  }

  /** Quantized partial moments: per partition (n, Σqx, Σqx·qxᵀ upper
    * triangle) with qx = floor(x·2^shift) accumulated as EXACT int64
    * sums — `Math.addExact`/`multiplyExact` throughout, so exceeding
    * the int64 envelope fails LOUDLY (ArithmeticException) instead of
    * silently rounding the way a double accumulator would past 2⁵³. */
  private def quantizedPartials(vectors: DataFrame, embCol: String, dim: Int,
                                shift: Int): (Long, Array[Long], Array[Long]) = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val scale = math.pow(2, shift)
    val partials: Dataset[(Long, Array[Long], Array[Long])] =
      vectors.select(col(embCol).cast(ArrayType(FloatType))).as[Array[Float]]
        .mapPartitions { rows =>
          var n = 0L
          val s = new Array[Long](dim)
          val ss = new Array[Long](triSize(dim))
          val x = new Array[Long](dim)
          rows.foreach { e =>
            require(e.length == dim, s"embedding dim ${e.length} != $dim")
            var i = 0
            while (i < dim) {
              val q = math.floor(e(i).toDouble * scale)
              require(math.abs(q) < 9.007199254740992e15, // 2^53: exact in the double before toLong
                s"quantized value $q exceeds the exact-double range at shift $shift")
              x(i) = q.toLong
              i += 1
            }
            n += 1
            i = 0
            while (i < dim) {
              s(i) = Math.addExact(s(i), x(i))
              var j = i
              while (j < dim) {
                val t = triIdx(i, j, dim)
                ss(t) = Math.addExact(ss(t), Math.multiplyExact(x(i), x(j)))
                j += 1
              }
              i += 1
            }
          }
          Iterator.single((n, s, ss))
        }
    partials.collect().foldLeft(
      (0L, new Array[Long](dim), new Array[Long](triSize(dim)))) {
      case ((an, as, ass), (bn, bs, bss)) =>
        var i = 0
        while (i < dim) { as(i) = Math.addExact(as(i), bs(i)); i += 1 }
        i = 0
        while (i < ass.length) { ass(i) = Math.addExact(ass(i), bss(i)); i += 1 }
        (an + bn, as, ass)
    }
  }

  /** Exact integer covariance NUMERATOR under the ·2^shift quantizer:
    * rows (i, j, n·Σqxᵢqxⱼ − Σqxᵢ·Σqxⱼ) for i ≤ j. Quantized sums are
    * exact int64 on both engines, so this sits under the DuckDB gate
    * (q122); cov = numerator / (n²·2^(2·shift)) when a float value is
    * wanted. */
  def quantizedCovariance(vectors: DataFrame, embCol: String, dim: Int,
                          shift: Int = 16): DataFrame = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val (n, s, ss) = quantizedPartials(vectors, embCol, dim, shift)
    // exact-arithmetic final combine too: overflow throws, never rounds
    val rows = for { i <- 0 until dim; j <- i until dim } yield
      (i.toLong, j.toLong,
        Math.subtractExact(Math.multiplyExact(n, ss(triIdx(i, j, dim))),
          Math.multiplyExact(s(i), s(j))))
    spark.createDataset(rows).toDF("i", "j", "cov_num")
  }

  /** Cyclic Jacobi eigensolver for a symmetric d×d matrix — the whole
    * problem is driver-local (d=64 → ~260k flops/sweep). Deterministic:
    * fixed sweep order, fixed convergence threshold. Returns
    * (eigenvalues, eigenvectors-as-rows), sorted descending. */
  def jacobiEigen(m: Array[Array[Double]], maxSweeps: Int = 96): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = Array.tabulate(d, d)((i, j) => m(i)(j))
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < maxSweeps && off > 1e-14) {
      off = 0.0
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          off += apq * apq
          if (math.abs(apq) > 1e-18) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case sg  => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    (order.map(i => a(i)(i)).toArray,
      order.map(i => Array.tabulate(d)(k => v(k)(i))).toArray)
  }

  /** Fit: double-precision moments (same one-pass shape), population
    * covariance, Jacobi. `k` top components are kept in the model. */
  def fit(vectors: DataFrame, embCol: String, dim: Int, k: Int): Model =
    fitFromMoments(moments(vectors, embCol, dim), k)

  /** Fit from pre-accumulated (possibly merged) sufficient statistics —
    * the incremental path: no data scan, just the d×d eigenproblem. */
  def fitFromMoments(m: Moments, k: Int): Model = {
    val dim = m.s.length
    require(k >= 1 && k <= dim, s"k=$k out of range 1..$dim")
    require(m.n > 0, "PCA fit on an empty vector set")
    val mean = m.s.map(_ / m.n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      val (lo, hi) = if (i <= j) (i, j) else (j, i)
      m.ss(triIdx(lo, hi, dim)) / m.n - mean(i) * mean(j)
    }
    val (evals, evecs) = jacobiEigen(cov)
    Model(dim, m.n, mean, evals.take(k), evecs.take(k))
  }

  /** Coarse-to-fine ANN: shortlist neighbors in the model's LOW-RANK
    * space (L2 over k doubles — top-k captures most of the variance,
    * so true neighbors survive the cut), then rerank ONLY the
    * shortlist with the exact full-dimension cosine. Per query the
    * expensive d-dim kernel runs `shortlist` times instead of n times
    * — the standard dimensionality-reduction prefilter, and the third
    * cost/recall point alongside IVF (partition pruning) and PQ (code
    * compression). Same broadcast contract as [[Similarity
    * .bruteForceTopK]]: the query set must be small. Recall vs the
    * exact scan is spec-pinned (PcaSpec); no value oracle by design
    * (float projections). */
  def prefilterTopK(vectors: DataFrame, queries: DataFrame, model: Model,
                    k: Int, shortlist: Int,
                    embCol: String = "embedding",
                    idCol: String = "vec_id"): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val pv = project(vectors, model, embCol, idCol)
      .select(col(idCol).as("neighbor_id"), col("proj").as("v_proj"))
    val pq = project(queries, model, embCol, idCol)
      .select(col(idCol).as("query_id"), col("proj").as("q_proj"))
    val coarse = pv.crossJoin(broadcast(pq))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        aggregate(zip_with(col("v_proj"), col("q_proj"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (a, v) => a + v).as("d2"))
    val short = graft.operators.Relational.topNPerGroup(
        coarse, shortlist, Seq(col("query_id")), -col("d2"), col("neighbor_id"))
      .select("query_id", "neighbor_id")
    val v = vectors.select(col(idCol).as("neighbor_id"),
      col(embCol).as("v_emb"), Similarity.norm(col(embCol)).as("v_norm"))
    val q = queries.select(col(idCol).as("query_id"),
      col(embCol).as("q_emb"), Similarity.norm(col(embCol)).as("q_norm"))
    val exact = short.join(v, Seq("neighbor_id")).join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (Similarity.dot(col("q_emb"), col("v_emb")) /
          (col("q_norm") * col("v_norm"))).as("cos_sim"))
    graft.operators.Relational.topNPerGroup(exact, k, Seq(col("query_id")),
      col("cos_sim"), col("neighbor_id"))
  }

  /** Projection: center and rotate onto the model's top-k axes — a
    * map-only pass. Each component is ⟨x, bₖ⟩ − ⟨μ, bₖ⟩ with the mean
    * offset folded into one literal per component, so the per-row work
    * is k codegen'd HOF dot products (k·d multiply-adds) and no
    * subtraction loop. Output: (idCol, proj array<double>[k]). */
  def project(vectors: DataFrame, model: Model,
              embCol: String = "embedding",
              idCol: String = "vec_id"): DataFrame = {
    val comps = model.basis.map { b =>
      val offset = b.zip(model.mean).map { case (bi, mi) => bi * mi }.sum
      val litB = array(b.toIndexedSeq.map(lit): _*)
      aggregate(zip_with(col(embCol).cast(ArrayType(FloatType)), litB,
          (x, y) => x.cast(DoubleType) * y),
        lit(0.0), (acc, v) => acc + v) - lit(offset)
    }
    vectors.select(col(idCol), array(comps.toIndexedSeq: _*).as("proj"))
  }
}
