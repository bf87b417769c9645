package graft

import graft.sources.ExcelSource
import org.apache.spark.sql.functions._

/** Interop check: read an xlsx produced by a DIFFERENT writer (the
  * reference repo's Excel-authored fixture, which uses sharedStrings,
  * styles, docProps — none of which our own writer emits). Guarded by
  * file existence so the suite still runs without the reference tree.
  * Expected content per reference read.rs:310-328: 4 data rows,
  * header Name/Age/Gender/xx. */
class ExcelInteropSpec extends SparkSpecBase {

  private val refXlsx = "/root/reference/examples/data.xlsx"

  test("read_excel parses a foreign-writer workbook (sharedStrings path)") {
    assume(new java.io.File(refXlsx).exists(), "reference fixture not present")
    val df = ExcelSource.read(spark, refXlsx)
    assert(df.count() == 4) // reference asserts 4 data rows (read.rs:317)
    assert(df.columns.length == 4) // 4 columns (read.rs:310-317)
    // the fixture's column A is a headerless pandas-style index column:
    // the reference names it "", we name it col0; the data columns match
    assert(df.columns.drop(1).toSeq == Seq("Name", "Age", "Gender"))
    // ages must be numeric (long after inference)
    val ages = df.select(col("Age").cast("long")).collect().map(_.getLong(0))
    assert(ages.forall(a => a > 0 && a < 120))
  }
}
