package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for Avro container files:
  * `spark.read.format("graft-avro").load(dir)` — one input partition
  * per file, executor-side decode, column pruning (only the required
  * fields convert to Catalyst values; the rest are skipped at the
  * record boundary). Same V2 shape as the xlsx connector
  * (XlsxDataSource.scala), same reasoning: schema at plan time, no
  * driver-side data handling. */
class AvroDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-avro"
  override def supportsExternalMetadata(): Boolean = true

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val p = Option(options.get("path")).orElse(Option(options.get("paths")))
      .getOrElse(throw new IllegalArgumentException("graft-avro: path is required"))
    p.split(",").map(_.trim).filter(_.nonEmpty).flatMap(AvroSource.listFiles).toSeq
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AvroSource.readSchema(paths(options).head)

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    AvroTable(paths(opts), schema)
  }
}

case class AvroTable(files: Seq[String], tableSchema: StructType)
  extends Table with SupportsRead {

  override def schema(): StructType = tableSchema
  override def name(): String = s"graft-avro:${files.mkString(",")}"
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(files, tableSchema)
}

class AvroScanBuilder(files: Seq[String], full: StructType)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit = {
    val want = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => want.contains(f.name)))
  }

  override def build(): Scan = AvroScan(files, required)
}

case class AvroScan(files: Seq[String], required: StructType)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    files.map(p => AvroInputPartition(p): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    AvroReaderFactory(required)
}

case class AvroInputPartition(path: String) extends InputPartition

case class AvroReaderFactory(required: StructType) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[AvroInputPartition].path
    new PartitionReader[InternalRow] {
      private val reader = new DataFileReader[GenericRecord](
        new java.io.File(path), new GenericDatumReader[GenericRecord]())
      private var rec: GenericRecord = _

      override def next(): Boolean = {
        val has = reader.hasNext
        if (has) rec = reader.next(rec)
        has
      }

      override def get(): InternalRow = {
        val values = required.fields.map(f => toCatalyst(rec.get(f.name), f.dataType))
        new GenericInternalRow(values.asInstanceOf[Array[Any]])
      }

      override def close(): Unit = reader.close()
    }
  }

  private def toCatalyst(v: Any, t: DataType): Any = (v, t) match {
    case (null, _) => null
    // Avro strings arrive as org.apache.avro.util.Utf8
    case (s, StringType) => UTF8String.fromString(s.toString)
    case (b: java.nio.ByteBuffer, BinaryType) =>
      val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
    // timestamp-micros / date logicals are already Spark's internal form
    case (x: java.lang.Long, _: TimestampType) => x.longValue()
    case (x: java.lang.Integer, DateType) => x.intValue()
    case (a: java.util.Collection[_], ArrayType(e, _)) =>
      new GenericArrayData(a.asScala.map(i => toCatalyst(i, e)).toArray)
    case (x, _) => x
  }
}
