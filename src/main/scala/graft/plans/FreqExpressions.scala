package org.apache.spark.sql.graft

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.ItemsSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items sketches (Apache DataSketches, Misra-Gries family):
  * mergeable heavy-hitter counters with a HARD deterministic error
  * guarantee — every estimate satisfies
  * `|estimate - true_count| <= getMaximumError()`, independent of
  * partitioning or merge order, and items whose true count exceeds the
  * max error are NEVER dropped. That hard bound is what the hash-gate
  * booleans ride: unlike a count-min sketch (probabilistic bound), the
  * within-bound check cannot flap across runs.
  *
  * Scale shape: a sketch is one fixed-size buffer (maxMapSize entries,
  * ~64 KB at 2^11) regardless of input size, so heavy hitters over
  * 100 TB of tokens is ONE partial-agg shuffle of bounded buffers — the
  * sum() shape — where an exact groupBy(token) shuffles every distinct
  * token. The `heavy_hitters` query gates the sketch against the exact
  * top-k; FreqSpec pins exactness below the purge threshold and the
  * error contract above it. */
object FreqFunctions {

  /** Default max map size: 2048 slots tracks ~1536 items; max error
    * <= 3.5 * N / maxMapSize ~= 0.17% of the stream at 2^11. */
  val DefaultMapSize: Int = 1 << 11

  private[graft] val serde = new ArrayOfStringsSerDe

  def freqSketchAgg(value: Column, maxMapSize: Int = DefaultMapSize): Column =
    ExpressionUtils.column(
      FreqSketchAggExpr(ExpressionUtils.expression(value), maxMapSize)
        .toAggregateExpression())

  /** Merges serialized frequent-items sketches (the roll-up side). */
  def freqMergeAgg(sketch: Column, maxMapSize: Int = DefaultMapSize): Column =
    ExpressionUtils.column(
      FreqMergeAggExpr(ExpressionUtils.expression(sketch), maxMapSize)
        .toAggregateExpression())

  /** Estimated count of one item from a serialized sketch. */
  def freqEstimate(sketch: Column, item: Column): Column =
    ExpressionUtils.column(FreqEstimateExpr(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(item)))

  /** The sketch's guaranteed maximum estimation error (0 = exact). */
  def freqMaxError(sketch: Column): Column =
    ExpressionUtils.column(FreqMaxErrorExpr(ExpressionUtils.expression(sketch)))
}

/** Frequent-items sketch over string values; emits the compact
  * serialized sketch. Fixed-size buffers through the partial agg. */
case class FreqSketchAggExpr(child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_sketch_agg"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    child.eval(input) match {
      case null => ()
      case s: UTF8String => buffer.update(s.toString)
    }
    buffer
  }

  override def merge(buffer: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(FreqFunctions.serde)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqFunctions.serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), FreqFunctions.serde)

  override def withNewMutableAggBufferOffset(n: Int): FreqSketchAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqSketchAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): FreqSketchAggExpr =
    copy(child = newChild)
}

/** Merges serialized frequent-items sketches (shard roll-up). */
case class FreqMergeAggExpr(child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "freq_merge_agg"

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    child.eval(input) match {
      case null => ()
      case b: Array[Byte] =>
        buffer.merge(ItemsSketch.getInstance(Memory.wrap(b), FreqFunctions.serde))
    }
    buffer
  }

  override def merge(buffer: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(FreqFunctions.serde)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqFunctions.serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), FreqFunctions.serde)

  override def withNewMutableAggBufferOffset(n: Int): FreqMergeAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): FreqMergeAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAggExpr =
    copy(child = newChild)
}

/** Estimated count of `item` from a serialized frequent-items sketch.
  * Guaranteed within getMaximumError of the true count. */
case class FreqEstimateExpr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "freq_estimate"

  override def nullSafeEval(sketch: Any, item: Any): Any = {
    val sk = ItemsSketch.getInstance(
      Memory.wrap(sketch.asInstanceOf[Array[Byte]]), FreqFunctions.serde)
    sk.getEstimate(item.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): FreqEstimateExpr =
    copy(left = l, right = r)
}

/** The sketch's guaranteed maximum estimation error: every estimate is
  * within this many counts of the truth; 0 while the sketch is exact
  * (no purge has happened). */
case class FreqMaxErrorExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "freq_max_error"

  override def nullSafeEval(input: Any): Any = {
    val sk = ItemsSketch.getInstance(
      Memory.wrap(input.asInstanceOf[Array[Byte]]), FreqFunctions.serde)
    sk.getMaximumError
  }

  override protected def withNewChildInternal(newChild: Expression): FreqMaxErrorExpr =
    copy(child = newChild)
}
