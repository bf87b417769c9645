package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives for similarity search over
  * `array<float>` columns. The hot path (dot/cosine/LSH bucket) is
  * native Catalyst expressions — one compiled loop per row inside
  * whole-stage codegen. Spark evaluates array-lambda HOFs INTERPRETED
  * (~µs per lambda step), so the `zip_with`+`aggregate` formulations
  * kept here as `*Hof` cost ~3 interpreter dispatches per vector
  * element; they remain as the executable spec the natives are pinned
  * against (NativeExprSpec) and as the portable reference semantics.
  *
  * Math is done in DOUBLE with a strict left-to-right summation so
  * results are bit-reproducible across engines (the DuckDB oracle
  * computes the same sequential sum).
  */
object VectorFunctions {
  import org.apache.spark.sql.graft.NativeExpressions

  /** Dot product in double precision (native; one fused loop). */
  def dotd(a: Column, b: Column): Column = NativeExpressions.vecDot(a, b)

  /** L2 norm. */
  def norm2(a: Column): Column = sqrt(dotd(a, a))

  /** Cosine similarity (native; dot and both norms in one pass). */
  def cosine(a: Column, b: Column): Column = NativeExpressions.vecCosine(a, b)

  /** HOF reference formulation of `dotd` — spec pin for VecDotExpr. */
  def dotdHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** HOF reference formulation of `cosine` — spec pin for VecCosineExpr. */
  def cosineHof(a: Column, b: Column): Column =
    dotdHof(a, b) / (sqrt(dotdHof(a, a)) * sqrt(dotdHof(b, b)))

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
    * this bucket key instead of an all-pairs cross join. Native: all
    * `bits` dot products in one compiled pass over the vector (the HOF
    * version below walks it `bits` times, interpreted). */
  def signLshBucket(v: Column, planes: Array[Array[Double]]): Column =
    NativeExpressions.signLshBucket(v, planes)

  /** HOF reference formulation — spec pin for SignLshBucketExpr. */
  def signLshBucketHof(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val plane = array(p.map(lit).toIndexedSeq: _*)
      when(dotdHof(v, plane) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
}
