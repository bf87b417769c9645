package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Mergeable second-moment (Gramian) aggregate over vector columns —
  * the distributed-PCA primitive: one fixed-size buffer of
  * `1 + d + d(d+1)/2` doubles (count, per-dimension sums, upper-
  * triangle raw second moments) accumulates X^T X in a single
  * shuffle-free partial-agg pass, the sum() shape. Covariance of a
  * 100 TB embedding store is then `moments -> d x d matrix` on the
  * driver — never an all-pairs or per-entry shuffle. The eigensolve
  * over the resulting d x d matrix is driver-scale by construction
  * (graft.operators.Pca). */
object GramianFunctions {

  /** Raw moment vector [n, s_0..s_{d-1}, m_00, m_01.., m_11..] (upper
    * triangle row-major) over an array<float|double> column. Rows whose
    * vector is null or of a different length are ignored. */
  def gramianAgg(vec: Column, d: Int): Column =
    ExpressionUtils.column(
      GramianAggExpr(ExpressionUtils.expression(vec), d).toAggregateExpression())

  /** Upper-triangle index of (i <= j) in a d-wide moment vector. */
  def triIndex(i: Int, j: Int, d: Int): Int =
    i * d - i * (i - 1) / 2 + (j - i)

  /** First-moment vector [n, s_0..s_{d-1}] over an array<float|double>
    * column — the per-cluster mean primitive k-means Lloyd rounds need:
    * one fixed-size (1+d)-double buffer per group, partial-aggregated
    * map-side, merged by elementwise add (the sum() shuffle shape, one
    * row per cluster on the wire instead of d rows from a posexplode
    * re-aggregation). */
  def vecSumAgg(vec: Column, d: Int): Column =
    ExpressionUtils.column(
      VecSumAggExpr(ExpressionUtils.expression(vec), d).toAggregateExpression())
}

/** Mergeable [count, per-dimension sums] aggregate (see
  * GramianFunctions.vecSumAgg). Rows whose vector is null or of a
  * different length are ignored, mirroring GramianAggExpr. */
case class VecSumAggExpr(child: Expression, d: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(d > 0 && d <= 65536, "vec_sum_agg: 1 <= d <= 65536")

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "vec_sum_agg"

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] = new Array[Double](1 + d)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == d) {
        buffer(0) += 1.0
        var i = 0
        while (i < d) {
          buffer(1 + i) += (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
          i += 1
        }
      }
    }
    buffer
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any =
    new GenericArrayData(buffer.map(x => x: Any))

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(n: Int): VecSumAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VecSumAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): VecSumAggExpr =
    copy(child = newChild)
}

case class GramianAggExpr(child: Expression, d: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with ExpectsInputTypes with UnaryLike[Expression] {

  require(d > 0 && d <= 4096, "gramian_agg: 1 <= d <= 4096")

  private val tri = d * (d + 1) / 2

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "gramian_agg"

  // lazy: child.dataType is only legal once the plan is resolved
  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): Array[Double] =
    new Array[Double](1 + d + tri)

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() == d) {
        val x = new Array[Double](d)
        var i = 0
        while (i < d) {
          x(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
          i += 1
        }
        buffer(0) += 1.0
        i = 0
        var k = 1 + d
        while (i < d) {
          buffer(1 + i) += x(i)
          var j = i
          while (j < d) {
            buffer(k) += x(i) * x(j)
            k += 1
            j += 1
          }
          i += 1
        }
      }
    }
    buffer
  }

  override def merge(buffer: Array[Double], other: Array[Double]): Array[Double] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Double]): Any =
    new GenericArrayData(buffer.map(x => x: Any))

  override def serialize(buffer: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(n: Int): GramianAggExpr =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): GramianAggExpr =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): GramianAggExpr =
    copy(child = newChild)
}
