package graft.sources

import java.io.File

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Dependency-free Avro container-file source/sink over the avro-core
  * library Spark already ships (the `spark-avro` DataSource module is
  * a separate artifact and absent in this environment — same situation
  * as xlsx, same answer: our own reader + a DataSource V2 connector,
  * `AvroDataSource`, for the executor-side scan path).
  *
  * Type coverage is the pragmatic interchange subset: boolean / int /
  * long / float / double / string / bytes, timestamp-micros and date
  * logical types, and one-level arrays of those. Nullable columns map
  * to `union {null, T}` — the standard Avro idiom, so files written
  * here read in any Avro tool and vice versa. Nested records/maps are
  * rejected loudly rather than half-supported.
  *
  * Scale shape: `write` runs one Avro container file per partition ON
  * THE EXECUTORS (foreachPartition; no driver collect, no shuffle —
  * layout follows the upstream partitioning like any file sink).
  * Reads plan one input partition per file via the V2 connector with
  * column pruning. */
object AvroSource {

  /** Spark -> Avro schema (nullable fields become union{null, T}). */
  def toAvroSchema(schema: StructType, recordName: String): Schema = {
    val fields = schema.fields.map { f =>
      val base = avroType(f.dataType, s"${recordName}_${f.name}")
      val t = if (f.nullable) Schema.createUnion(
        List(Schema.create(Schema.Type.NULL), base).asJava) else base
      new Schema.Field(f.name, t, null, null)
    }
    Schema.createRecord(recordName, null, "graft", false, fields.toList.asJava)
  }

  private def avroType(dt: DataType, name: String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case DateType =>
      org.apache.avro.LogicalTypes.date()
        .addToSchema(Schema.create(Schema.Type.INT))
    case _: TimestampType | _: TimestampNTZType =>
      org.apache.avro.LogicalTypes.timestampMicros()
        .addToSchema(Schema.create(Schema.Type.LONG))
    case ArrayType(e, containsNull) =>
      val el = avroType(e, name + "_item")
      Schema.createArray(if (containsNull)
        Schema.createUnion(List(Schema.create(Schema.Type.NULL), el).asJava) else el)
    case other => throw new IllegalArgumentException(
      s"graft-avro: unsupported Spark type $other (field $name)")
  }

  /** Avro -> Spark type for the supported subset. */
  def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"graft-avro: unsupported union $s")
      toSparkType(nonNull.head)
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT =>
      if (s.getLogicalType != null && s.getLogicalType.getName == "date") DateType
      else IntegerType
    case Schema.Type.LONG =>
      val lt = Option(s.getLogicalType).map(_.getName).getOrElse("")
      if (lt == "timestamp-micros" || lt == "timestamp-millis") TimestampType
      else LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.STRING => StringType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.ARRAY => ArrayType(toSparkType(s.getElementType))
    case other => throw new IllegalArgumentException(
      s"graft-avro: unsupported Avro type $other")
  }

  private def toAvroValue(v: Any, dt: DataType, avro: Schema): AnyRef = {
    if (v == null) return null
    val target = if (avro.getType == Schema.Type.UNION)
      avro.getTypes.asScala.find(_.getType != Schema.Type.NULL).get else avro
    (v, dt) match {
      case (x: java.sql.Timestamp, _) =>
        java.lang.Long.valueOf(
          org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(x))
      case (x: java.time.Instant, _) =>
        java.lang.Long.valueOf(
          org.apache.spark.sql.catalyst.util.DateTimeUtils.instantToMicros(x))
      case (x: java.time.LocalDateTime, _) => // TimestampNTZ external form
        java.lang.Long.valueOf(
          org.apache.spark.sql.catalyst.util.DateTimeUtils.localDateTimeToMicros(x))
      case (x: java.sql.Date, _) =>
        java.lang.Integer.valueOf(
          org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(x))
      case (x: java.time.LocalDate, _) =>
        java.lang.Integer.valueOf(x.toEpochDay.toInt)
      case (x: Array[Byte], BinaryType) => java.nio.ByteBuffer.wrap(x)
      // collection.Seq, not the immutable default: Row.get hands back
      // mutable.ArraySeq for array columns
      case (x: scala.collection.Seq[_], ArrayType(e, _)) =>
        val el = target.getElementType
        new GenericData.Array[AnyRef](target,
          x.map(i => toAvroValue(i, e, el)).asJava)
      case (x, _) => x.asInstanceOf[AnyRef]
    }
  }

  /** Write `df` as one Avro container file per partition under `dir`
    * (executor-side; local or any java.io-visible filesystem path). */
  def write(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    val avroJson = toAvroSchema(schema, "graft_row").toString
    new File(dir).mkdirs()
    // A fully-empty DataFrame has only empty partitions, which executors
    // skip below — without this driver-side schema-only container the
    // directory would hold zero files and a subsequent read/readSchema
    // would fail with "no .avro files" instead of an empty frame.
    if (df.isEmpty) {
      val avroSchema = new Schema.Parser().parse(avroJson)
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](avroSchema))
      w.create(avroSchema, new File(dir, "part-00000.avro"))
      w.close()
      return
    }
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val avroSchema = new Schema.Parser().parse(avroJson)
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSchema))
        w.create(avroSchema, new File(dir, f"part-$pid%05d.avro"))
        try rows.foreach { r =>
          val rec = new GenericData.Record(avroSchema)
          schema.fields.zipWithIndex.foreach { case (f, i) =>
            rec.put(f.name,
              toAvroValue(r.get(i), f.dataType, avroSchema.getField(f.name).schema()))
          }
          w.append(rec)
        } finally w.close()
      }
    }
  }

  /** List the .avro files of `dir` (or accept a single file path). */
  def listFiles(path: String): Seq[String] = {
    val f = new File(path)
    if (f.isDirectory) {
      // File.listFiles returns null on IO error (e.g. permission loss
      // between isDirectory and the scan) — fail with the path, not an NPE.
      val children = Option(f.listFiles()).getOrElse(
        throw new java.io.IOException(s"graft-avro: cannot list directory $path"))
      val avro = children.filter(_.getName.endsWith(".avro")).map(_.getPath).sorted.toSeq
      require(avro.nonEmpty, s"graft-avro: no .avro files under $path")
      avro
    } else if (f.isFile) Seq(path)
    else throw new java.io.FileNotFoundException(s"graft-avro: no such path $path")
  }

  /** Schema of an Avro container file, as Spark types. */
  def readSchema(path: String): StructType = {
    val r = new DataFileReader[GenericRecord](new File(listFiles(path).head),
      new GenericDatumReader[GenericRecord]())
    try {
      val s = r.getSchema
      require(s.getType == Schema.Type.RECORD, s"graft-avro: top level must be a record, got $s")
      StructType(s.getFields.asScala.map { f =>
        StructField(f.name, toSparkType(f.schema()),
          nullable = f.schema().getType == Schema.Type.UNION)
      }.toSeq)
    } finally r.close()
  }

  /** Read through the V2 connector (executor-side parse + pruning). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.format("graft-avro").load(path)
}
