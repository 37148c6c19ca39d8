package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sample-free PCA training over the FULL corpus, exactly reproducible on
  * any cluster layout — the data-dependent dimensionality reduction that
  * complements [[Embeddings.randomProjection]]'s data-free one.
  *
  * The trick that makes "trained on 100 TB" and "bit-equal to a single-node
  * oracle" compatible: all corpus-wide accumulation happens in the QUANTIZED
  * INTEGER domain (first and second moments via
  * [[graft.functions.VectorSumLong]] — long sums are associative-commutative,
  * so any partitioning yields the same bits), and everything AFTER the
  * moments is a deterministic driver-side double computation with pinned
  * fold orders (power iteration with deflation, the classic top-k
  * eigensolver). The moments collect is d + d² longs — O(1) in corpus size.
  *
  * Determinism contract (mirrored by the DuckDB recursive-CTE oracle twin):
  *   - covariance: cov[j][l] = g[j][l]/n − mean[j]·mean[l], mean[j] = s[j]/n
  *   - power iteration: v₀ = e_c; 20 × (w = A·v row-fold l-ascending,
  *     v = w / sqrt(Σ w_j² j-ascending)); λ = Σ v_j·w_j j-ascending
  *   - deflation: A ← A − λ·v·vᵀ elementwise
  * Float ops are IEEE and identically ordered in both engines.
  */
object PcaTrainer {
  /** Exact integer moments of the quantized corpus: (n, Σq, Σq·qᵀ).
    * One distributed aggregation; the collect is d + d² longs. */
  def moments(emb: DataFrame, dim: Int = 64, scaleQ: Long = 10000L,
      vecCol: String = "embedding"): (Long, Array[Long], Array[Array[Long]]) = {
    graft.functions.GraftFunctions.ensureRegistered(emb.sparkSession)
    val row = emb
      .select(Embeddings.quantized(col(vecCol), scaleQ).as("q"))
      .select(col("q"), flatten(transform(col("q"),
        xj => transform(col("q"), xl => xj * xl))).as("p"))
      .agg(count(lit(1)).as("n"),
        call_function("vector_sum_long", col("q")).as("s"),
        call_function("vector_sum_long", col("p")).as("g"))
      .collect()(0)
    val n = row.getLong(0)
    val s = row.getSeq[Long](1).toArray
    val flat = row.getSeq[Long](2).toArray
    (n, s, Array.tabulate(dim, dim)((j, l) => flat(j * dim + l)))
  }

  /** mean[j] = s[j]/n in doubles (the quantized-domain mean). */
  def meanOf(n: Long, s: Array[Long]): Array[Double] =
    s.map(_.toDouble / n)

  /** Top-k eigenvectors of the covariance by deterministic power iteration
    * with deflation. Returns k rows of `dim` doubles. */
  def trainPca(n: Long, s: Array[Long], g: Array[Array[Long]], k: Int = 4,
      iters: Int = 20): Array[Array[Double]] =
    trainPcaWithValues(n, s, g, k, iters)._1

  /** [[trainPca]] plus the eigenvalues captured at each deflation step —
    * λ_c = vᵀAv under the SAME pinned fold the deflation uses, so the
    * recursive-CTE oracle reproduces them bit for bit. Needed by
    * [[whiten]] (variance-normalized projection). */
  def trainPcaWithValues(n: Long, s: Array[Long], g: Array[Array[Long]],
      k: Int = 4, iters: Int = 20): (Array[Array[Double]], Array[Double]) = {
    val dim = s.length
    val mean = meanOf(n, s)
    val a = Array.tabulate(dim, dim)((j, l) =>
      g(j)(l).toDouble / n - mean(j) * mean(l))
    def matVec(v: Array[Double]): Array[Double] =
      Array.tabulate(dim) { j =>
        var acc = 0.0
        var l = 0
        while (l < dim) { acc += a(j)(l) * v(l); l += 1 }
        acc
      }
    val comps = Array.ofDim[Double](k, dim)
    val lams = Array.ofDim[Double](k)
    var c = 0
    while (c < k) {
      var v = Array.tabulate(dim)(j => if (j == c) 1.0 else 0.0)
      var t = 0
      while (t < iters) {
        val w = matVec(v)
        var nrm = 0.0
        var j = 0
        while (j < dim) { nrm += w(j) * w(j); j += 1 }
        nrm = math.sqrt(nrm)
        v = w.map(_ / nrm)
        t += 1
      }
      comps(c) = v
      // deflate: λ = vᵀAv via the SAME w = A·v fold, then A -= λ·v·vᵀ
      val w = matVec(v)
      var lam = 0.0
      var j = 0
      while (j < dim) { lam += v(j) * w(j); j += 1 }
      lams(c) = lam
      j = 0
      while (j < dim) {
        var l = 0
        while (l < dim) { a(j)(l) -= lam * v(j) * v(l); l += 1 }
        j += 1
      }
      c += 1
    }
    (comps, lams)
  }

  /** Project the corpus onto the trained components: center the quantized
    * vector on the quantized-domain mean, then one sequential-fold
    * `dot_product` per component, floored to longs and CSV-joined. Narrow
    * single pass — components and mean ride along as plan constants. */
  def project(emb: DataFrame, comps: Array[Array[Double]], mean: Array[Double],
      scaleQ: Long = 10000L, vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(emb.sparkSession)
    val centered = zip_with(
      Embeddings.quantized(col(vecCol), scaleQ), typedLit(mean.toSeq),
      (x, m) => x.cast("double") - m)
    val proj = comps.map { v =>
      floor(call_function("dot_product", col("c"), typedLit(v.toSeq)))
        .cast("long").cast("string")
    }
    emb.select(col("vec_id"), centered.as("c"))
      .select(col("vec_id"), concat_ws(",", proj: _*).as("pca"))
  }

  /** The composed operator: moments → eigenvectors → projection. */
  def pcaProjection(emb: DataFrame, k: Int = 4, dim: Int = 64,
      scaleQ: Long = 10000L, iters: Int = 20): DataFrame = {
    val (n, s, g) = moments(emb, dim, scaleQ)
    val comps = trainPca(n, s, g, k, iters)
    project(emb, comps, meanOf(n, s), scaleQ)
  }

  /** PCA WHITENING — the projection with each component variance-
    * normalized: wh_c = floor(vᶜ·(x−μ) / √λ_c · 1000), the standard
    * preprocessing before cosine-based semantic dedup / ANN (whitened
    * Euclidean ≈ Mahalanobis). √ is IEEE-exact in both engines, the
    * divide-then-scale chain is pinned left-to-right, and the floor
    * lands the output in exact integers — so the whitened values remain
    * bit-checkable against the recursive-CTE oracle. Same narrow
    * single-pass scale shape as [[project]]: components, mean, and the
    * k eigenvalue scalars all ride along as plan constants. */
  def whiten(emb: DataFrame, comps: Array[Array[Double]],
      lams: Array[Double], mean: Array[Double], scaleQ: Long = 10000L,
      vecCol: String = "embedding"): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(emb.sparkSession)
    val centered = zip_with(
      Embeddings.quantized(col(vecCol), scaleQ), typedLit(mean.toSeq),
      (x, m) => x.cast("double") - m)
    val proj = comps.zip(lams).map { case (v, lam) =>
      floor(call_function("dot_product", col("c"), typedLit(v.toSeq))
          / lit(math.sqrt(lam)) * lit(1000.0))
        .cast("long").cast("string")
    }
    emb.select(col("vec_id"), centered.as("c"))
      .select(col("vec_id"), concat_ws(",", proj: _*).as("whitened"))
  }

  /** Composed whitening operator: moments → eigenpairs → whitened
    * projection. */
  def whitenProjection(emb: DataFrame, k: Int = 4, dim: Int = 64,
      scaleQ: Long = 10000L, iters: Int = 20): DataFrame = {
    val (n, s, g) = moments(emb, dim, scaleQ)
    val (comps, lams) = trainPcaWithValues(n, s, g, k, iters)
    whiten(emb, comps, lams, meanOf(n, s), scaleQ)
  }
}
