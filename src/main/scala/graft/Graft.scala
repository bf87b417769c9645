package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Public entry points: constructors mirroring the reference's
  * `DataFrame::new` / `DataFrame::from_values`
  * (reference: src/dataframe/dataframe.rs:33-95).
  *
  * Scala values are mapped onto the reference's 5-type system
  * (Integer/Float/Boolean/String/DateTime -> Long/Double/Boolean/
  * String/Timestamp, SURVEY §1.2). Columns are homogeneous: the type is
  * unified column-wide (all-integral -> LongType, any fractional ->
  * DoubleType, any string -> StringType), which is the same widening
  * Spark's own readers apply.
  */
object Graft {

  /** Row-major literal rows -> DataFrame.
    * reference: from_values (dataframe.rs:58-95). */
  def fromValues(spark: SparkSession, names: Seq[String], rows: Seq[Seq[Any]]): DataFrame = {
    require(rows.forall(_.length == names.length),
      "from_values: every row must match the column list length")
    val cols = names.indices.map(i => rows.map(_(i)))
    fromColumns(spark, names.zip(cols).toMap, names)
  }

  /** Columnar map + ordered names -> DataFrame; validates equal lengths.
    * reference: DataFrame::new (dataframe.rs:33-54). */
  def fromColumns(spark: SparkSession, data: Map[String, Seq[Any]], names: Seq[String]): DataFrame = {
    require(names.forall(data.contains), "new: names must all be present in data")
    val lengths = names.map(n => data(n).length).distinct
    require(lengths.size <= 1, s"new: unequal column lengths $lengths")
    val n = lengths.headOption.getOrElse(0)
    val types = names.map(c => unify(data(c)))
    val schema = StructType(names.zip(types).map { case (c, t) => StructField(c, t, nullable = true) })
    val rows = (0 until n).map { i =>
      Row.fromSeq(names.zip(types).map { case (c, t) => coerce(data(c)(i), t) })
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, math.max(1, math.min(n / 10000, 200))), schema)
  }

  /** Column-wide type unification over heterogeneous literals (SURVEY
    * §1.2: the reference allows per-cell mixing; Spark columns cannot).
    * private[graft]: the xlsx V2 connector infers its schema with the
    * same rules so both read paths agree. */
  private[graft] def unify(values: Seq[Any]): DataType = {
    val dts = values.collect {
      case _: Int | _: Long | _: Short | _: Byte => LongType
      case _: Double | _: Float | _: BigDecimal  => DoubleType
      case _: Boolean                            => BooleanType
      case _: String                             => StringType
      case _: java.sql.Timestamp                 => TimestampType
      case _: java.time.Instant                  => TimestampType
    }.distinct
    dts match {
      case Seq()                                       => StringType
      case Seq(one)                                    => one
      case s if s.forall(t => t == LongType || t == DoubleType) => DoubleType
      case _                                           => StringType
    }
  }

  private[graft] def coerce(v: Any, t: DataType): Any = (v, t) match {
    case (null, _)                      => null
    case (x: Int, LongType)             => x.toLong
    case (x: Short, LongType)           => x.toLong
    case (x: Byte, LongType)            => x.toLong
    case (x: Long, LongType)            => x
    case (x: Int, DoubleType)           => x.toDouble
    case (x: Long, DoubleType)          => x.toDouble
    case (x: Float, DoubleType)         => x.toDouble
    case (x: BigDecimal, DoubleType)    => x.toDouble
    case (x: Double, DoubleType)        => x
    case (x: java.time.Instant, TimestampType) => java.sql.Timestamp.from(x)
    case (x, StringType)                => x.toString
    case (x, _)                         => x
  }
}
