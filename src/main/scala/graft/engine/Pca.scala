package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column.
  *
  * Distributed part: ONE aggregation pass over the corpus collecting
  * the d(d+1)/2 upper-triangle second-moment cells plus the d
  * coordinate sums and the row count (the same explode-then-partial-agg
  * shape as `embed_gram`: the shuffle carries O(d²) rows total,
  * independent of corpus size). Driver part: form the d×d covariance
  * C = E[xxᵀ] − μμᵀ (d=64 ⇒ 32 KiB — codebook-sized, like the IVF
  * centroids) and eigendecompose it with cyclic Jacobi rotations —
  * deterministic, quadratically convergent, no power-iteration stall
  * when the spectrum is near-flat (this corpus is measured-isotropic,
  * so the top eigengap is small by construction).
  *
  * The driver never sees row data — only the O(d²) moment summary, the
  * same scale posture as the k-means codebook and the Bloom sketch.
  */
object Pca {

  final case class Model(
      dim: Int,
      nRows: Long,
      mean: Array[Double],
      /** eigenvalues, descending */
      eigenvalues: Array[Double],
      /** components(m)(i): i-th coordinate of the m-th eigenvector */
      components: Array[Array[Double]],
      /** eigenvalue share of total variance (trace), descending */
      explained: Array[Double])

  /** Fit a PCA model from `(..., embCol array<float>)`. `k` top
    * components are reported; the full spectrum is computed (d is
    * driver-small by contract).
    */
  def fit(s: SparkSession, df: DataFrame, embCol: String, k: Int): Model = {
    // one compiled pass (functions.GramAgg): count + per-dim sums +
    // upper-triangle second-moment cells, every summand quantized to
    // integral nano-units and accumulated in exact longs — addition
    // is associative, so the fit is bit-identical across shuffle
    // orders and re-runs (double sums would make the model depend on
    // task completion order). The 10⁻⁹ quantization perturbs each
    // moment by ≤ 5·10⁻¹⁰, orders below PcaSpec's residual floor.
    val row = df
      .agg(graft.functions.GramAgg.gramAgg(s, col(embCol)).as("g"))
      .select(col("g.n"), col("g.sums"), col("g.cells"))
      .head()
    // the aggregate of zero rows is null — report it as the row-count
    // failure it is, not a NullPointerException
    require(!row.isNullAt(0), "PCA needs at least 2 rows, got 0")
    val n = row.getLong(0)
    require(n > 1, s"PCA needs at least 2 rows, got $n")
    val sums = row.getSeq[Long](1)
    val dim = sums.length

    val mean = Array.tabulate(dim)(i => sums(i) / 1e9 / n)
    val c = Array.ofDim[Double](dim, dim)
    row.getSeq[org.apache.spark.sql.Row](2).foreach { cell =>
      val (i, j, v) = (cell.getInt(0), cell.getInt(1), cell.getLong(2))
      val sv = v / 1e9
      c(i)(j) = sv / n; c(j)(i) = sv / n
    }
    var i = 0
    while (i < dim) {
      var j = 0
      while (j < dim) { c(i)(j) -= mean(i) * mean(j); j += 1 }
      i += 1
    }

    val (eigVals, eigVecs) = jacobiEigenSymmetric(c)
    val order = eigVals.indices.sortBy(m => -eigVals(m))
    val trace = eigVals.sum
    val comps = order.take(k).map { m =>
      val v = Array.tabulate(dim)(eigVecs(_)(m))
      // deterministic sign: the largest-magnitude coordinate is positive
      val lead = v.indices.maxBy(x => (math.abs(v(x)), -x))
      if (v(lead) < 0) v.map(-_) else v
    }.toArray
    Model(dim, n, mean,
      order.take(k).map(eigVals).toArray,
      comps,
      order.take(k).map(eigVals(_) / trace).toArray)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, column-eigenvector matrix). Deterministic sweep
    * order; converges when the off-diagonal Frobenius mass drops below
    * 1e-14 of the diagonal's (quadratic convergence ⇒ a handful of
    * sweeps at d=64).
    */
  private[engine] def jacobiEigenSymmetric(
      aIn: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = aIn.length
    val a = aIn.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val diagScale = math.max(a.indices.map(i => a(i)(i) * a(i)(i)).sum, 1e-300)
    var sweep = 0
    var off = Double.MaxValue
    while (off > 1e-14 * diagScale && sweep < 100) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case sg  => sg / (math.abs(theta) + math.sqrt(theta * theta + 1))
            }
            val cos = 1.0 / math.sqrt(t * t + 1)
            val sin = t * cos
            var r = 0
            while (r < d) {
              val arp = a(r)(p); val arq = a(r)(q)
              a(r)(p) = cos * arp - sin * arq
              a(r)(q) = sin * arp + cos * arq
              r += 1
            }
            r = 0
            while (r < d) {
              val apr = a(p)(r); val aqr = a(q)(r)
              a(p)(r) = cos * apr - sin * aqr
              a(q)(r) = sin * apr + cos * aqr
              val vrp = v(r)(p); val vrq = v(r)(q)
              v(r)(p) = cos * vrp - sin * vrq
              v(r)(q) = sin * vrp + cos * vrq
              r += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = 0.0
      var x = 0
      while (x < d) {
        var y = x + 1
        while (y < d) { off += 2 * a(x)(y) * a(x)(y); y += 1 }
        x += 1
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }
}
