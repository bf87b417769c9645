package org.apache.spark.sql.graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, DoubleType}

/** Mergeable QUANTILE sketches (Apache DataSketches KLL), filling the
  * gap next to Spark's built-in `hll_sketch_agg`/`hll_union_agg` pair:
  * Spark exposes mergeable NDV sketches but no mergeable quantile
  * sketch — `percentile_approx` aggregates to a final number and its
  * internal digest cannot be stored, shipped, or merged later.
  *
  * At 100 TB that difference is the whole game: with KLL partials a
  * pipeline profiles each incoming shard ONCE (a few-KB binary row per
  * key), and any later question — "p99 latency over last week's
  * shards", "median doc length of this source slice" — is an
  * aggregation over sketch rows, never a rescan. KLL guarantees
  * normalized rank error ~1.65% at the default k=200 regardless of
  * stream size, and merge preserves the bound.
  *
  * Three pieces, mirroring the HLL trio:
  *   - [[KllSketchAggExpr]]  (raw doubles -> binary sketch)
  *   - [[KllMergeAggExpr]]   (binary sketches -> merged binary sketch)
  *   - [[KllQuantilesExpr]]  (binary sketch x quantile list -> values)
  *
  * KLL compaction flips a random coin (the estimator is randomized by
  * design, like every space-optimal quantile sketch), so estimates are
  * reproducible only in distribution — the operator surface treats
  * sketch bytes as opaque and SPECS pin rank-error contracts instead of
  * bit-equality; the `profile_quantiles` query gates correctness
  * through deterministic rank-audit booleans the DuckDB oracle
  * reproduces closed-form (the profile_sketch pattern).
  */
object KllFunctions {

  /** Default k: ~1.65% normalized rank error (two-sided, 99% conf),
    * ~3 KB serialized at typical shard sizes. */
  val DefaultK: Int = 200

  /** Published two-sided normalized rank-error bound for `k` (99%
    * confidence), straight from the library. */
  def normalizedRankError(k: Int): Double =
    org.apache.datasketches.kll.KllSketch.getNormalizedRankError(k, false)

  def kllSketchAgg(value: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      KllSketchAggExpr(ExpressionUtils.expression(value), k)
        .toAggregateExpression())

  def kllMergeAgg(sketch: Column, k: Int = DefaultK): Column =
    ExpressionUtils.column(
      KllMergeAggExpr(ExpressionUtils.expression(sketch), k)
        .toAggregateExpression())

  /** Quantile values at `qs` (each in [0, 1]) from a serialized sketch;
    * null for an empty sketch. */
  def kllQuantiles(sketch: Column, qs: Seq[Double]): Column =
    ExpressionUtils.column(
      KllQuantilesExpr(ExpressionUtils.expression(sketch), qs.toArray))
}

/** Builds a KLL doubles sketch over the input column; emits the
  * serialized sketch (BinaryType). Partial aggregation works the
  * natural way: per-partition sketches merge associatively, so this is
  * one partial-agg shuffle of ~3 KB buffers, the same shape as sum(). */
case class KllSketchAggExpr(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(k >= 8 && k <= 65535, s"kll_sketch_agg: k out of range: $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAggExpr =
    copy(child = newChild)
}

/** Merges serialized KLL sketches (the roll-up side: shard partials in,
  * one combined sketch out). `k` caps the result size — merging into a
  * k-sized buffer is the standard down-sampling merge. */
case class KllMergeAggExpr(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.wrap(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAggExpr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAggExpr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAggExpr =
    copy(child = newChild)
}

/** Quantile extraction from a serialized KLL sketch: array<double> of
  * the estimates at the requested ranks (inclusive rule, the library
  * default). Null input or an empty sketch yields null. */
case class KllQuantilesExpr(child: Expression, qs: Array[Double])
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    "kll_quantiles: ranks must be in [0, 1]")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // an EMPTY sketch yields null even when the input bytes are non-null
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles"

  override def nullSafeEval(input: Any): Any = {
    val sk = KllDoublesSketch.wrap(Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else new GenericArrayData(qs.map(q => sk.getQuantile(q): Any))
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantilesExpr =
    copy(child = newChild)
}
