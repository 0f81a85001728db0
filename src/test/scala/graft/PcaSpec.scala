package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{Pca, Tables}
import graft.operators.LlmVectorOps

/** Quality gates for the oracle-less `embed_pca_project`: the fitted
  * eigenpairs are checked against a covariance matrix computed
  * INDEPENDENTLY (driver-side, from the raw collected vectors — no
  * shared code with the one-pass moment aggregation), plus
  * orthonormality, spectrum ordering, projected-variance = λ, and
  * refit determinism.
  */
class PcaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = TestSpark.sf0001

  private lazy val model =
    Pca.fit(spark, Tables.embeddings(spark, d), "embedding", k = 2)

  /** Covariance recomputed the naive way from collected rows. */
  private lazy val (cov, nRows): (Array[Array[Double]], Long) = {
    val rows = Tables.embeddings(spark, d)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = rows.length
    val dim = rows.head.length
    val mean = Array.tabulate(dim)(i => rows.map(_(i)).sum / n)
    val c = Array.ofDim[Double](dim, dim)
    for (r <- rows; i <- 0 until dim; j <- 0 until dim)
      c(i)(j) += (r(i) - mean(i)) * (r(j) - mean(j))
    for (i <- 0 until dim; j <- 0 until dim) c(i)(j) /= n
    (c, n.toLong)
  }

  private def matVec(m: Array[Array[Double]], v: Array[Double]) =
    m.map(row => row.zip(v).map { case (a, b) => a * b }.sum)

  test("eigenpairs satisfy C·v = λ·v against the independent covariance") {
    assert(model.nRows == nRows)
    val frob = math.sqrt(cov.map(_.map(x => x * x).sum).sum)
    for (m <- 0 to 1) {
      val v = model.components(m)
      val lambda = model.eigenvalues(m)
      val resid = matVec(cov, v).zip(v)
        .map { case (cv, vi) => cv - lambda * vi }
      val residNorm = math.sqrt(resid.map(x => x * x).sum)
      // floor: the fit's 1e-9 moment quantization perturbs the
      // covariance by up to ~dim·5e-10 in Frobenius norm; 1e-6·‖C‖F
      // sits well above that and far below any real defect
      assert(residNorm <= 1e-6 * frob,
        s"component $m residual $residNorm vs Frobenius $frob")
    }
  }

  test("components are orthonormal and the spectrum is ordered") {
    val Array(v1, v2) = model.components
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm(v1) - 1.0) <= 1e-12)
    assert(math.abs(norm(v2) - 1.0) <= 1e-12)
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) <= 1e-10, s"components not orthogonal: $dot")
    assert(model.eigenvalues(0) >= model.eigenvalues(1))
    assert(model.eigenvalues(1) > 0.0)
    assert(model.explained.forall(e => e > 0.0 && e < 1.0))
    assert(model.explained(0) >= model.explained(1))
  }

  test("population variance of each projection equals its eigenvalue") {
    val pcs = LlmVectorOps.embedPcaProject(spark, d)
      .select("pc1", "pc2").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    for ((vals, lambda) <- Seq(pcs.map(_._1) -> model.eigenvalues(0),
        pcs.map(_._2) -> model.eigenvalues(1))) {
      val mu = vals.sum / vals.length
      val variance = vals.map(x => (x - mu) * (x - mu)).sum / vals.length
      // pc values are r6-rounded for output stability; 1e-4 relative
      // absorbs that quantization at unit-scale projections
      assert(math.abs(variance - lambda) <= 1e-4 * math.max(lambda, 1e-12),
        s"projected variance $variance vs eigenvalue $lambda")
    }
  }

  test("refit is deterministic") {
    val again = Pca.fit(spark, Tables.embeddings(spark, d), "embedding", k = 2)
    assert(again.eigenvalues.sameElements(model.eigenvalues))
    assert(again.components.zip(model.components)
      .forall { case (a, b) => a.sameElements(b) })
    assert(again.mean.sameElements(model.mean))
  }
}
