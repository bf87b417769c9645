package org.apache.spark.sql.graft

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, DoubleType, LongType, StringType, TypeCollection}
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches (Apache DataSketches): mergeable distinct-count
  * sketches that — unlike HLL — support SET INTERSECTION, answering
  * "how many users in BOTH segments" from per-segment sketches alone.
  * That is the audience-overlap / cross-shard-contamination question a
  * 100 TB profile store gets daily, and the one shape hll_* cannot
  * serve (inclusion-exclusion over HLL explodes its error on small
  * intersections).
  *
  * Theta is a KMV-style sketch: it retains the k smallest hashes of the
  * item set, so a sketch is a pure function of the SET — order- and
  * partitioning-insensitive, deterministic across runs (fixed default
  * seed). Below the nominal entry count it is exact. The
  * `profile_overlap` query gates it cross-engine via the bound-boolean
  * pattern; ThetaSpec pins the estimation-mode error contract. */
object ThetaFunctions {

  /** Default nominal entries: 4096 retained hashes, ~1.6% RSE in
    * estimation mode, exact below 4096 distinct items. */
  val DefaultNominal: Int = 1 << 12

  def thetaSketchAgg(value: Column, nominal: Int = DefaultNominal): Column =
    ExpressionUtils.column(
      ThetaSketchAggExpr(ExpressionUtils.expression(value), nominal)
        .toAggregateExpression())

  def thetaUnionAgg(sketch: Column, nominal: Int = DefaultNominal): Column =
    ExpressionUtils.column(
      ThetaUnionAggExpr(ExpressionUtils.expression(sketch), nominal)
        .toAggregateExpression())

  def thetaEstimate(sketch: Column): Column =
    ExpressionUtils.column(ThetaEstimateExpr(ExpressionUtils.expression(sketch)))

  /** Estimated distinct count of the INTERSECTION of two sketches. */
  def thetaIntersectEstimate(a: Column, b: Column): Column =
    ExpressionUtils.column(ThetaIntersectEstimateExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}

/** Distinct-count theta sketch over long or string values; emits the
  * compact serialized sketch. One partial-agg shuffle of <= ~32 KB
  * buffers — the sum() shape. */
case class ThetaSketchAggExpr(child: Expression, nominal: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(LongType, StringType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_sketch_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominal).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    child.eval(input) match {
      case null => ()
      case l: java.lang.Long => buffer.update(l.longValue())
      case s: UTF8String => buffer.update(s.toString)
      case other => buffer.update(other.toString)
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): Union =
    SetOperation.heapify(Memory.wrap(bytes)).asInstanceOf[Union]

  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAggExpr =
    copy(child = newChild)
}

/** Merges serialized theta sketches (the roll-up side). */
case class ThetaUnionAggExpr(child: Expression, nominal: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "theta_union_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominal).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    child.eval(input) match {
      case null => ()
      case b: Array[Byte] => buffer.union(Sketches.wrapSketch(Memory.wrap(b)))
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): Union =
    SetOperation.heapify(Memory.wrap(bytes)).asInstanceOf[Union]

  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAggExpr =
    copy(child = newChild)
}

/** Estimate of a serialized theta sketch. */
case class ThetaEstimateExpr(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_estimate"

  override def nullSafeEval(input: Any): Any =
    Sketches.wrapSketch(Memory.wrap(input.asInstanceOf[Array[Byte]])).getEstimate

  override protected def withNewChildInternal(newChild: Expression): ThetaEstimateExpr =
    copy(child = newChild)
}

/** Estimated |A ∩ B| from two serialized theta sketches — the
  * operation HLL cannot do. */
case class ThetaIntersectEstimateExpr(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "theta_intersect_estimate"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketches.wrapSketch(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    i.intersect(Sketches.wrapSketch(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    i.getResult.getEstimate
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ThetaIntersectEstimateExpr =
    copy(left = newLeft, right = newRight)
}
