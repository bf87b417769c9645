package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GramianFunctions

/** Distributed PCA over an embedding column, Spark-first: the data pass
  * is ONE shuffle-free mergeable-moment aggregation (X^T X, mean and
  * count in a single `1 + d + d(d+1)/2`-double buffer —
  * plans/GramianExpressions.scala), and only the d x d covariance
  * matrix ever reaches the driver, where a cyclic Jacobi eigensolve
  * (public textbook algorithm: Golub & Van Loan §8.5, Rutishauser's
  * rotation formula) takes microseconds for d <= a few hundred. The
  * corpus is never shuffled, collected, or iterated over — the same
  * plan at 2k or 2B vectors.
  *
  * The reference engine has no linear algebra at all (SURVEY §2);
  * this is north-star surface for embedding curation: variance
  * profiling, whitening, and cheap 2-D projections for cluster
  * inspection. */
object Pca {

  /** Eigen decomposition of a symmetric matrix: (eigenvalues desc,
    * eigenvectors as ROWS aligned with the values). Cyclic Jacobi with
    * Rutishauser's stable rotation; converges quadratically — 30 sweeps
    * is far beyond need for d <= 512. */
  private[graft] def jacobiEig(sym: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = sym.length
    val m = sym.map(_.clone())
    // v accumulates the rotations; eigenvector i ends as COLUMN i
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    val fro = math.sqrt(m.map(_.map(x => x * x).sum).sum).max(1e-300)
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 30 && off > 1e-14 * fro) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = m(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (m(q)(q) - m(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0
              case sg => sg / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) { // G^T M: rows p, q
              val mpk = m(p)(k); val mqk = m(q)(k)
              m(p)(k) = c * mpk - s * mqk
              m(q)(k) = s * mpk + c * mqk
              k += 1
            }
            k = 0
            while (k < d) { // (G^T M) G: cols p, q
              val mkp = m(k)(p); val mkq = m(k)(q)
              m(k)(p) = c * mkp - s * mkq
              m(k)(q) = s * mkp + c * mkq
              k += 1
            }
            k = 0
            while (k < d) { // accumulate V G
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = math.sqrt((0 until d).map(i =>
        (i + 1 until d).map(j => 2.0 * m(i)(j) * m(i)(j)).sum).sum)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -m(i)(i)).toArray
    (order.map(i => m(i)(i)),
      order.map(i => (0 until d).map(k => v(k)(i)).toArray))
  }

  /** One-pass fitted model: sample count, per-dimension means, the
    * population covariance matrix, eigenvalues (desc) and matching
    * eigenvector rows. */
  final case class Model(n: Long, mean: Array[Double],
      cov: Array[Array[Double]], eigenvalues: Array[Double],
      components: Array[Array[Double]])

  /** Fit PCA on `vecCol` (array<float|double> of width d): one
    * distributed moment pass, then the driver-side d x d eigensolve. */
  def fit(df: DataFrame, vecCol: String, d: Int): Model = {
    val mom = df.agg(GramianFunctions.gramianAgg(col(vecCol), d).as("m"))
      .head().getSeq[Double](0).toArray
    val n = mom(0).toLong
    require(n > 0, s"pca: no rows with a $d-wide $vecCol")
    val mean = Array.tabulate(d)(i => mom(1 + i) / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      mom(1 + d + GramianFunctions.triIndex(a, b, d)) / n - mean(i) * mean(j)
    }
    val (ev, comps) = jacobiEig(cov)
    Model(n, mean, cov, ev, comps)
  }

  /** Projection of the centered vector onto component row `c` as a
    * Column expression (codegen'd zip_with dot product — executor-side,
    * the model broadcast as literals). */
  def projection(vecCol: Column, mean: Array[Double], comp: Array[Double]): Column = {
    val meanArr = array(mean.map(lit(_)).toIndexedSeq: _*)
    val compArr = array(comp.map(lit(_)).toIndexedSeq: _*)
    aggregate(
      zip_with(zip_with(vecCol, meanArr, (x, m) => x - m), compArr, (c, w) => c * w),
      lit(0.0), (acc, e) => acc + e)
  }

  /** Machine-checkable solver evidence for `Model`: max residual of
    * C v = lambda v over the top `k` components, worst orthonormality
    * defect, and the trace identity |sum(lambda) - tr(C)|. All exact
    * driver-side arithmetic on the fitted model. */
  private[graft] def solverDefects(m: Model, k: Int): (Double, Double, Double) = {
    val d = m.mean.length
    val resid = (0 until k).map { c =>
      val v = m.components(c)
      (0 until d).map { i =>
        val cv = (0 until d).map(j => m.cov(i)(j) * v(j)).sum
        math.abs(cv - m.eigenvalues(c) * v(i))
      }.max
    }.max
    val ortho = (0 until k).flatMap { a =>
      (a until k).map { b =>
        val dot = (0 until d).map(i => m.components(a)(i) * m.components(b)(i)).sum
        math.abs(dot - (if (a == b) 1.0 else 0.0))
      }
    }.max
    val trace = (0 until d).map(i => m.cov(i)(i)).sum
    (resid, ortho, math.abs(m.eigenvalues.sum - trace))
  }
}
