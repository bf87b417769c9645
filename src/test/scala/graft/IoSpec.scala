package graft

import java.nio.file.Files

import graft.operators.Display
import graft.sources._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IO-layer coverage mirroring the reference's io tests
  * (reference: src/io/read.rs:300-428, write.rs:140-309): CSV fixture
  * shape and inference, JSON recursive flatten on the nested fixture,
  * parquet save/load, xlsx write->read round-trip, and a JDBC
  * round-trip through embedded Derby. */
class IoSpec extends SparkSpecBase {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def resource(name: String): String =
    getClass.getResource(s"/$name").getPath

  // --- CSV (read.rs test_read_csv :330-345) ---------------------------------

  test("read_csv infers string/long/string on the sample fixture") {
    val df = CsvSource.read(spark, resource("sample.csv"))
    assert(df.columns.toSeq == Seq("Name", "Age", "Gender"))
    assert(df.count() == 4)
    assert(df.schema("Age").dataType == IntegerType ||
      df.schema("Age").dataType == LongType)
    val john = df.filter(col("Name") === "John").collect()(0)
    assert(john.getAs[Number]("Age").longValue == 28L)
  }

  test("read_csv honors a custom delimiter and empty-as-null") {
    val dir = tmp("csv")
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"),
      "a;b\n1;x\n;y\n")
    val df = CsvSource.read(spark, s"$dir/t.csv", delimiter = ";")
    val r = df.orderBy(col("b")).collect()
    assert(r(0).isNullAt(0) == false && r(1).isNullAt(0))
  }

  test("to_csv -> read_csv round-trips") {
    val dir = tmp("csvrt") + "/out"
    val df = abc
    CsvSource.write(df, dir)
    val back = CsvSource.read(spark, dir)
    assert(Display.dfEqual(
      back.select(col("ID").cast("long"), col("Name"), col("Score")),
      df))
  }

  // --- JSON (read.rs test_read_json :390-428) -------------------------------

  test("read_json flattens nested objects to parent_child columns") {
    val df = JsonSource.read(spark, resource("sample.json"))
    val cols = df.columns.toSet
    // flatten per reference read.rs:143-184: address.city -> address_city,
    // phoneNumbers[] -> exploded rows with phoneNumbers_type/_number
    assert(Set("firstName", "lastName", "gender", "age",
      "address_city", "address_state", "address_streetAddress",
      "phoneNumbers_number", "phoneNumbers_type").subsetOf(cols))
    val r = df.collect()(0)
    assert(r.getAs[String]("address_city") == "San Diego")
    assert(r.getAs[String]("phoneNumbers_type") == "home")
    assert(r.getAs[Long]("age") == 28L)
  }

  test("flatten explodes arrays into one row per element") {
    val dir = tmp("json")
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.json"),
      """{"id": 1, "tags": [{"v": "a"}, {"v": "b"}, {"v": "c"}]}""")
    val df = JsonSource.read(spark, s"$dir/t.json")
    assert(df.count() == 3)
    assert(df.select("tags_v").collect().map(_.getString(0)).sorted.toSeq == Seq("a", "b", "c"))
  }

  test("to_json -> read_json(lines) round-trips") {
    val dir = tmp("jsonrt") + "/out"
    JsonSource.write(abc, dir)
    val back = JsonSource.read(spark, dir, multiLine = false)
    assert(back.count() == 3)
    assert(back.select("Name").orderBy("ID").collect().map(_.getString(0)).toSeq ==
      Seq("Alice", "Bob", "Charlie"))
  }

  // --- parquet persistence pair (dataframe.rs:767-781, test :1557) ----------

  test("save -> load parquet round-trips exactly") {
    val dir = tmp("pq") + "/df"
    ParquetSource.save(abc, dir)
    assert(Display.dfEqual(ParquetSource.load(spark, dir), abc))
  }

  test("save -> load ORC round-trips exactly") {
    val dir = tmp("orc") + "/df"
    ParquetSource.saveOrc(abc, dir)
    assert(Display.dfEqual(ParquetSource.loadOrc(spark, dir), abc))
  }

  test("avro write -> read round-trips arrays, nulls and ints exactly") {
    import graft.sources.AvroSource
    import spark.implicits._
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = tmp("avro") + "/emb"
    AvroSource.write(emb, dir)
    val back = AvroSource.read(spark, dir)
    // multiset equality on (id, exact float array, label)
    assert(back.count() == emb.count())
    assert(Display.dfEqual(back.orderBy("vec_id"), emb.orderBy("vec_id")))
    // null round-trip: a frame with a null string and a null array cell
    val withNulls = Seq(
      (1L, Option("x"), Option(Seq(1.0f, 2.0f))),
      (2L, None: Option[String], None: Option[Seq[Float]])
    ).toDF("id", "s", "v")
    val d2 = tmp("avro") + "/nulls"
    AvroSource.write(withNulls, d2)
    val b2 = AvroSource.read(spark, d2).orderBy("id").collect()
    assert(b2(1).isNullAt(1) && b2(1).isNullAt(2))
    assert(b2(0).getSeq[Float](2) == Seq(1.0f, 2.0f))
  }

  test("avro V2 scan prunes to the required columns") {
    import graft.sources.AvroSource
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = tmp("avro") + "/prune"
    AvroSource.write(emb, dir)
    val pruned = AvroSource.read(spark, dir).select("vec_id")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    assert(scan.schema.fieldNames.toSeq == Seq("vec_id"),
      s"scan should read only vec_id: ${scan.schema}")
    assert(pruned.count() == emb.count())
  }

  // --- Excel (read.rs test_read_excel :310-328, write.rs :197-214) ----------

  test("to_excel -> read_excel round-trips types and values") {
    val f = tmp("xlsx") + "/data.xlsx"
    val df = Graft.fromValues(spark,
      Seq("Name", "Age", "Score", "Active"),
      Seq(Seq("John", 28L, 1.5, true), Seq("Emily", 23L, 2.0, false),
        Seq("Mike", 35L, 3.25, true), Seq(null, 31L, null, false)))
    ExcelSource.write(df, f)
    val back = ExcelSource.read(spark, f)
    assert(back.columns.toSeq == Seq("Name", "Age", "Score", "Active"))
    assert(back.count() == 4) // 4 data rows, like the reference fixture assert
    val emily = back.filter(col("Name") === "Emily").collect()(0)
    assert(emily.getAs[Long]("Age") == 23L)
    assert(emily.getAs[Double]("Score") == 2.0)
    // booleans persist as TRUE/FALSE strings (reference write.rs:42-50)
    assert(emily.getAs[String]("Active") == "FALSE")
    // null cells come back as nulls
    assert(back.filter(col("Name").isNull).count() == 1)
  }

  test("read_excel resolves a named sheet and errors on a missing one") {
    val f = tmp("xlsx2") + "/data.xlsx"
    ExcelSource.write(abc, f, sheetName = "People")
    assert(ExcelSource.read(spark, f, Some("People")).count() == 3)
    intercept[IllegalArgumentException] {
      ExcelSource.read(spark, f, Some("Nope"))
    }
  }

  test("excel cell reference codec is self-inverse") {
    assert(ExcelSource.parseRef("A1") == (0, 0))
    assert(ExcelSource.parseRef("BC23") == (22, 54))
    assert(ExcelSource.colLetters(54) == "BC")
    assert(ExcelSource.colLetters(0) == "A")
  }

  // --- SQL via JDBC (read.rs test_read_sql :350-388, write.rs :216-309) -----

  test("to_sql -> read_sql round-trips through embedded Derby") {
    val url = s"jdbc:derby:${tmp("derby")}/db;create=true"
    val df = Graft.fromValues(spark, Seq("id", "name", "age"),
      Seq(Seq(1L, "Alice", 30L), Seq(2L, "Bob", 25L)))
    SqlSource.write(df, url, "people", ifExists = "replace")
    // Spark's JDBC writer creates quoted (case-exact) columns; Derby
    // uppercases unquoted identifiers, so the query quotes them.
    val back = SqlSource.read(spark, url, """SELECT "id", "name", "age" FROM people""")
    assert(back.count() == 2)
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq == Seq("Alice", "Bob"))
    // append mode adds rows; replace clears first
    SqlSource.write(df, url, "people", ifExists = "append")
    assert(SqlSource.readTable(spark, url, "people").count() == 4)
    SqlSource.write(df, url, "people", ifExists = "replace")
    assert(SqlSource.readTable(spark, url, "people").count() == 2)
  }

  // --- Display / PartialEq / scatter (dataframe.rs:888-1019) ----------------

  test("render draws a bounded fixed-width grid") {
    val s = Display.render(abc, 2, Seq(col("ID")))
    assert(s.contains("| Alice"))
    assert(s.contains("| ID")) // header
    assert(!s.contains("Charlie")) // bounded at 2 rows
  }

  test("render golden: exact grid incl. float formatting, NA cells and padding") {
    import spark.implicits._
    val df = Seq((1L, Some("Ann"), Some(3.5)), (2L, None, Some(10.25)), (3L, Some("Bo"), None))
      .toDF("id", "name", "score")
    val got = Display.render(df, 3, Seq(org.apache.spark.sql.functions.col("id")))
    val want =
      """+----+------+-------+
        || id | name | score |
        |+----+------+-------+
        || 1  | Ann  | 3.50  |
        || 2  | NA   | 10.25 |
        || 3  | Bo   | NA    |
        |+----+------+-------+""".stripMargin
    assert(got == want, s"\n--- got ---\n$got\n--- want ---\n$want")
  }

  test("dfEqual distinguishes equal and unequal frames") {
    assert(Display.dfEqual(abc, abc))
    assert(!Display.dfEqual(abc, abc.filterRowsHelper))
    assert(!Display.dfEqual(abc, abc.withColumnRenamed("ID", "Id")))
  }

  test("scatterPlot renders a grid with marks") {
    val s = Display.scatterPlot(abc, "ID", "Score", width = 20, height = 8)
    assert(s.linesIterator.size >= 10)
    assert(s.contains("."))
  }

  private implicit class AbcOps(df: org.apache.spark.sql.DataFrame) {
    def filterRowsHelper: org.apache.spark.sql.DataFrame = df.filter(col("ID") > 1)
  }
}
