package graft.sources

import java.util

import graft.Graft
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the dependency-free xlsx reader:
  * `spark.read.format("graft-xlsx").option("sheet", "Data").load(path)`.
  *
  * Why a V2 Table and not just `ExcelSource.read`: the connector moves
  * the parse OFF the driver (each file is an input partition whose
  * PartitionReader unzips and parses on an executor), gives Catalyst a
  * real schema at plan time, and implements column PRUNING
  * (SupportsPushDownRequiredColumns) so `select(one_col)` never
  * materializes the other columns into rows. Multi-file directories
  * map naturally to one partition per file (comma-listed paths
  * supported here; a glob expansion is the obvious extension).
  *
  * Schema inference parses the first path once at plan time with the
  * SAME column-unification rules as `Graft.fromColumns` (all-integral →
  * long, any fractional → double, any string → string), so the V2 path
  * and `ExcelSource.read` agree cell-for-cell.
  */
class XlsxDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-xlsx"

  override def supportsExternalMetadata(): Boolean = true

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val p = Option(options.get("path")).orElse(Option(options.get("paths")))
      .getOrElse(throw new IllegalArgumentException("graft-xlsx: path is required"))
    p.split(",").map(_.trim).filter(_.nonEmpty).toSeq
  }

  private def sheet(options: CaseInsensitiveStringMap): Option[String] =
    Option(options.get("sheet"))

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (header, data) = ExcelSource.parseSheet(paths(options).head, sheet(options))
    StructType(header.map(h => StructField(h, Graft.unify(data(h)), nullable = true)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    XlsxTable(paths(opts), sheet(opts), schema)
  }
}

case class XlsxTable(paths: Seq[String], sheet: Option[String], tableSchema: StructType)
  extends Table with SupportsRead {

  override def schema(): StructType = tableSchema
  override def name(): String = s"graft-xlsx:${paths.mkString(",")}"
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(paths, sheet, tableSchema)
}

/** ScanBuilder with column pruning: Catalyst hands us the required
  * schema; readers emit only those fields. */
class XlsxScanBuilder(paths: Seq[String], sheet: Option[String], full: StructType)
  extends ScanBuilder with SupportsPushDownRequiredColumns {

  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve the connector's column order; keep only requested names
    val want = requiredSchema.fieldNames.toSet
    required = StructType(full.fields.filter(f => want.contains(f.name)))
  }

  override def build(): Scan = XlsxScan(paths, sheet, required)
}

case class XlsxScan(paths: Seq[String], sheet: Option[String], required: StructType)
  extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => XlsxInputPartition(p): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    XlsxReaderFactory(sheet, required)
}

case class XlsxInputPartition(path: String) extends InputPartition

case class XlsxReaderFactory(sheet: Option[String], required: StructType)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[XlsxInputPartition].path
    new PartitionReader[InternalRow] {
      // executor-side parse: the driver never touches cell data
      private val (header, data) = ExcelSource.parseSheet(path, sheet)
      private val byName = data
      private val n = header.headOption.map(h => byName(h).length).getOrElse(0)
      private var i = -1

      override def next(): Boolean = { i += 1; i < n }

      override def get(): InternalRow = {
        val values = required.fields.map { f =>
          val cell = byName.get(f.name).map(_(i)).orNull
          toCatalyst(Graft.coerce(cell, f.dataType), f.dataType)
        }
        new GenericInternalRow(values.asInstanceOf[Array[Any]])
      }

      override def close(): Unit = ()
    }
  }

  private def toCatalyst(v: Any, t: DataType): Any = (v, t) match {
    case (null, _)              => null
    case (s: String, StringType) => UTF8String.fromString(s)
    case (x, _)                  => x
  }
}
