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

  // ---- DataSource V2 connector ---------------------------------------------

  test("spark.read.format(graft-xlsx) round-trips our writer's output") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_xlsx_v2")
    val path = s"$tmp/t.xlsx"
    try {
      val df = Seq((1L, "Ann", 3.5), (2L, "Bo", 10.25)).toDF("id", "name", "score")
      ExcelSource.write(df, path)
      val back = spark.read.format("graft-xlsx").load(path)
      assert(back.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq ==
        Seq(("id", "long"), ("name", "string"), ("score", "double")))
      assert(back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq ==
        Seq((1L, "Ann", 3.5), (2L, "Bo", 10.25)))
      // V2 agrees cell-for-cell with the driver-side reader
      assert(graft.operators.Display.dfEqual(back, ExcelSource.read(spark, path)))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }

  test("graft-xlsx scan prunes columns (required schema reaches the reader)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_xlsx_v2p")
    val path = s"$tmp/t.xlsx"
    try {
      ExcelSource.write(Seq((1L, "x", 2.0), (2L, "y", 4.0)).toDF("a", "b", "c"), path)
      val pruned = spark.read.format("graft-xlsx").load(path).select("c")
      // physical plan advertises the pruned read schema
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("ReadSchema") || plan.contains("graft-xlsx"), plan.take(400))
      assert(pruned.schema.fieldNames.toSeq == Seq("c"))
      assert(pruned.collect().map(_.getDouble(0)).sorted.toSeq == Seq(2.0, 4.0))
      val sheeted = spark.read.format("graft-xlsx").option("sheet", "Sheet1").load(path)
      assert(sheeted.count() == 2)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
  }
}
