package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GramianFunctions

/** PCA contracts: the Jacobi eigensolver on matrices with known
  * spectra, the one-pass moment aggregate against direct covariance,
  * partitioning-insensitivity, and the projection expression's
  * variance identity (var of PC-i scores == eigenvalue i). */
class PcaSpec extends SparkSpecBase {
  import spark.implicits._

  test("jacobi recovers a known 2x2 spectrum") {
    val (ev, comps) = Pca.jacobiEig(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(ev(0) - 3.0) < 1e-12 && math.abs(ev(1) - 1.0) < 1e-12)
    // top eigenvector is ±[1,1]/sqrt(2)
    assert(math.abs(math.abs(comps(0)(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(comps(0)(0) - comps(0)(1)) < 1e-12)
  }

  test("jacobi residual and orthonormality on a random symmetric matrix") {
    val rnd = new scala.util.Random(7)
    val d = 16
    val half = Array.fill(d, d)(rnd.nextGaussian())
    val sym = Array.tabulate(d, d)((i, j) => half(i)(j) + half(j)(i))
    val (ev, comps) = Pca.jacobiEig(sym)
    assert(ev.zip(ev.tail).forall { case (a, b) => a >= b }, "sorted desc")
    val trace = (0 until d).map(i => sym(i)(i)).sum
    assert(math.abs(ev.sum - trace) < 1e-10)
    for (c <- 0 until d; i <- 0 until d) {
      val cv = (0 until d).map(j => sym(i)(j) * comps(c)(j)).sum
      assert(math.abs(cv - ev(c) * comps(c)(i)) < 1e-9, s"residual c=$c i=$i")
    }
  }

  test("fitted covariance equals the direct per-entry computation") {
    val rnd = new scala.util.Random(11)
    val data = Seq.fill(300)(Array.fill(4)(rnd.nextGaussian().toFloat))
    val df = data.map(v => Tuple1(v)).toDF("v").repartition(7)
    val m = Pca.fit(df, "v", 4)
    assert(m.n == 300)
    val mean = (0 until 4).map(i => data.map(_(i).toDouble).sum / 300)
    for (i <- 0 until 4; j <- 0 until 4) {
      val direct = data.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / 300
      assert(math.abs(m.cov(i)(j) - direct) < 1e-9, s"cov($i,$j)")
    }
  }

  test("moment buffer is partitioning-insensitive to rounding precision") {
    val df = spark.range(1000)
      .select(expr("transform(sequence(0, 3), k -> cast(id * (k + 1) % 97 as double))").as("v"))
    def momentsOf(parts: Int): Seq[Double] =
      df.repartition(parts).agg(GramianFunctions.gramianAgg(col("v"), 4).as("m"))
        .head().getSeq[Double](0).map(x => math.rint(x * 1e6) / 1e6)
    assert(momentsOf(2) == momentsOf(31))
  }

  test("projection scores have variance == eigenvalue (top component)") {
    val rnd = new scala.util.Random(3)
    // anisotropic cloud: dim 0 has 9x the variance of the rest
    val data = Seq.fill(500)(Array(3.0 * rnd.nextGaussian(), rnd.nextGaussian(),
      rnd.nextGaussian()).map(_.toFloat))
    val df = data.map(v => Tuple1(v)).toDF("v")
    val m = Pca.fit(df, "v", 3)
    val scores = df.select(
        Pca.projection(col("v"), m.mean, m.components(0)).as("s"))
      .agg(var_pop(col("s"))).head().getDouble(0)
    assert(math.abs(scores - m.eigenvalues(0)) < 1e-6 * m.eigenvalues(0) + 1e-9,
      s"var $scores vs lambda ${m.eigenvalues(0)}")
    // and the top component points (mostly) along dim 0
    assert(math.abs(m.components(0)(0)) > 0.95)
  }
}
