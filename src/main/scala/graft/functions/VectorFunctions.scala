package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives for similarity search over
  * `array<float>` columns. Everything is built from codegen'd
  * higher-order functions (`zip_with` + `aggregate`) — no UDFs, no
  * serialization boundary, and Catalyst keeps the expressions fused
  * with the surrounding projection.
  *
  * Math is done in DOUBLE with a strict left-to-right summation so
  * results are bit-reproducible across engines (the DuckDB oracle
  * computes the same sequential sum).
  */
object VectorFunctions {

  /** Dot product in double precision. */
  def dotd(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm2(a: Column): Column = sqrt(dotd(a, a))

  /** Cosine similarity. */
  def cosine(a: Column, b: Column): Column = dotd(a, b) / (norm2(a) * norm2(b))

  /** Deterministic random-hyperplane set for sign-LSH: `bits` planes of
    * `dim` gaussian weights, fixed seed so buckets are stable across
    * runs/executors. Returned as plain literals — the planes ride into
    * the plan as constants, no broadcast needed. */
  def signLshPlanes(bits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bits, dim)(rnd.nextGaussian())
  }

  /** Sign-LSH bucket id: bit p is set iff v . plane_p >= 0. Vectors
    * with a small angle agree on most bits, so bucket (or low-Hamming
    * bucket) equality is the candidate filter for approximate cosine
    * search: at cluster scale candidates come from a groupBy/join on
    * this bucket key instead of an all-pairs cross join. */
  def signLshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit).toIndexedSeq: _*)
      when(dotd(v, plane) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}
