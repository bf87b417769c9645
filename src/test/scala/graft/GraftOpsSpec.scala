package graft

import graft.operators.GraftOps
import graft.operators.GraftOps._
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** ScalaTest mirrors of the 27 reference operator tests
  * (reference: src/dataframe/dataframe.rs:1021-1691), with the exact
  * expected values the reference asserts. Divergences from the reference
  * are deliberate distributed-semantics choices and are noted inline.
  */
class GraftOpsSpec extends SparkSpecBase {

  private val byId = Seq(col("ID"))

  // --- constructors (test_dataframe_from_values :1066) ---------------------

  test("from_values builds 3x3 with the right columns and values") {
    val df = abc
    assert(df.columns.toSeq == Seq("ID", "Name", "Score"))
    val r = rows(df.orderBy("ID"))
    assert(r.map(_.getLong(0)) == Seq(1L, 2L, 3L))
    assert(r.map(_.getString(1)) == Seq("Alice", "Bob", "Charlie"))
    assert(r.map(_.getDouble(2)) == Seq(3.5, 4.0, 2.5))
  }

  test("new rejects unequal column lengths") {
    val e = intercept[IllegalArgumentException] {
      Graft.fromColumns(spark,
        Map("a" -> Seq(1, 2, 3), "b" -> Seq(1)), Seq("a", "b"))
    }
    assert(e.getMessage.contains("unequal column lengths"))
  }

  test("from_values rejects ragged rows") {
    intercept[IllegalArgumentException] {
      Graft.fromValues(spark, Seq("a", "b"), Seq(Seq(1, 2), Seq(3)))
    }
  }

  // --- access (test_get_method :1128, test_get_value :1204) ----------------

  test("get: cell at (1, Name) is Bob") {
    assert(singleValue(abc.cellAt(1L, "Name", byId)) == "Bob")
  }

  test("get on a nonexistent column errors") {
    intercept[IllegalArgumentException] { abc.cellAt(0L, "Nope", byId) }
  }

  // --- column (test_column_function :1153) ---------------------------------

  test("column returns the full value vector") {
    val vals = rows(abc.orderBy("ID").columnValues("Name")).map(_.getString(0))
    assert(vals == Seq("Alice", "Bob", "Charlie"))
  }

  test("column on a nonexistent name errors (ref returns None)") {
    intercept[IllegalArgumentException] { abc.columnValues("Nonexistent") }
  }

  // --- add/remove column (test_add_column :1235, test_remove_column :1265) --

  test("add_column appends a fourth column") {
    val df = abc.addColumn("Age", col("ID") * 10)
    assert(df.columns.length == 4)
    assert(rows(df.orderBy("ID")).map(_.getLong(3)) == Seq(10L, 20L, 30L))
  }

  test("add_column replacing an existing name keeps a single column") {
    val df = abc.addColumn("Score", lit(0.0))
    assert(df.columns.count(_ == "Score") == 1)
  }

  test("remove_column drops the column and errors on a missing one") {
    val df = abc.removeColumn("Score")
    assert(df.columns.toSeq == Seq("ID", "Name"))
    intercept[IllegalArgumentException] { abc.removeColumn("NonExistentColumn") }
  }

  // --- aggregations (:1288-1417) -------------------------------------------

  test("sum(Score) = 10.0 exactly") {
    assert(singleValue(abc.sumCol("Score")) == 10.0) // dataframe.rs:1293
  }

  test("sum of a non-numeric column is 0.0, like the reference") {
    assert(singleValue(abc.sumCol("Name")) == 0.0) // dataframe.rs:1297
  }

  test("sum of a nonexistent column errors (ref returns None)") {
    intercept[IllegalArgumentException] { abc.sumCol("Nonexistent") }
  }

  test("mean(Score) = 3.3333333333333335 bit-exact") {
    assert(singleValue(abc.meanCol("Score")) == 3.3333333333333335) // :1309
  }

  test("mean of a non-numeric column is null") {
    assert(singleValue(abc.meanCol("Name")) == null)
  }

  test("max: Score max is 4.0") {
    val r = rows(abc.select("Score").maxAll()).head
    assert(r.getDouble(0) == 4.0) // dataframe.rs:1323-1327
  }

  test("min: ID min 1, Score min 2.5") {
    val r = rows(abc.minAll()).head
    assert(r.getLong(0) == 1L && r.getDouble(1) == 2.5) // :1338-1343
  }

  test("variance(Score) is the sample variance 0.58333333...") {
    val v = singleValue(abc.varianceCol("Score")).asInstanceOf[Double]
    assert(math.abs(v - 0.5833333333333334) < 1e-12) // dataframe.rs:1351
  }

  test("std_dev(Score) = sqrt(variance)") {
    val s = singleValue(abc.stdDevCol("Score")).asInstanceOf[Double]
    assert(math.abs(s - math.sqrt(0.5833333333333334)) < 1e-12) // :1369
  }

  test("shape is (3, 3)") {
    assert(abc.shape2 == (3L, 3)) // dataframe.rs:1381-1382
  }

  test("count non-null is 3 for every column") {
    val r = rows(abc.countNonNull()).head
    assert((0 until 3).forall(i => r.getLong(i) == 3L)) // :1406-1417
  }

  test("describe(exact) yields the interpolated quartiles of Score") {
    val r = rows(abc.select("Score").describeStats(exact = true)).head
    assert(r.getAs[Long]("count") == 3L)
    assert(r.getAs[Double]("mean") == 3.3333333333333335)
    assert(r.getAs[Double]("min") == 2.5 && r.getAs[Double]("max") == 4.0)
    assert(r.getAs[Double]("p25") == 3.0)
    assert(r.getAs[Double]("p50") == 3.5)
    assert(r.getAs[Double]("p75") == 3.75)
  }

  test("describe default takes the exact path below the row-count gate") {
    // the frame is tiny, so the no-arg default must equal exact
    // bit-for-bit — including interpolated quartiles approx_percentile
    // cannot produce (it returns observed values only)
    val e = rows(abc.select("Score").describeStats(exact = true)).head
    val a = rows(abc.select("Score").describeStats()).head
    Seq("count", "mean", "min", "p25", "p50", "p75", "max").foreach { c =>
      assert(a.getAs[Any](c) == e.getAs[Any](c), c)
    }
    assert(a.getAs[Double]("p75") == 3.75) // interpolated => exact path taken
  }

  test("describe default falls back to the sketch above the row-count gate") {
    // 10,000,002 rows of 0..10000001: one over the gate. The exact path
    // would interpolate p25 to 2500000.25 (non-observed); the sketch
    // returns observed values only, so an integral p25 proves the
    // default actually switched branches on the big frame.
    val big = spark.range(GraftOps.DescribeExactMaxRows + 2).toDF("v")
    val a = rows(big.describeStats()).head
    assert(a.getAs[Long]("count") == GraftOps.DescribeExactMaxRows + 2)
    assert(a.getAs[Double]("p25") == math.floor(a.getAs[Double]("p25")))
  }

  // --- loc / iloc (:1466-1506) ----------------------------------------------

  test("loc selects positions 0 and 2 with a column subset") {
    val r = rows(abc.locRows(Seq(0L, 2L), Some(Seq("ID", "Name")), byId).orderBy("ID"))
    assert(r.map(x => (x.getLong(0), x.getString(1))) ==
      Seq((1L, "Alice"), (3L, "Charlie"))) // dataframe.rs:1466-1480
  }

  test("iloc (1, 1) is Bob") {
    assert(singleValue(abc.ilocCell(1L, 1, byId)) == "Bob") // :1483-1489
  }

  test("iloc row out of bounds yields an empty result (ref errors)") {
    // Distributed divergence: bounds need a count; empty result carries
    // the same information without an extra job.
    assert(rows(abc.ilocCell(99L, 1, byId)).isEmpty)
  }

  test("iloc column out of bounds errors") {
    intercept[IllegalArgumentException] { abc.ilocCell(0L, 9, byId) } // :1501-1506
  }

  // --- filters (:1510-1555, test_query :1682) -------------------------------

  test("boolean_index / filter keeps Score > 3.0 rows") {
    val r = rows(abc.filterRows(col("Score") > 3.0).orderBy("ID"))
    assert(r.map(_.getString(1)) == Seq("Alice", "Bob")) // :1510-1534
  }

  test("query string 'Score == 4.0' matches Bob") {
    val r = rows(abc.query("Score == 4.0"))
    assert(r.map(_.getString(1)) == Seq("Bob")) // :1682-1691
  }

  test("query on an unknown column raises AnalysisException (ref panics)") {
    intercept[AnalysisException] { abc.query("Nope == 1").collect() }
  }

  // --- missing data (test_dropna :1594, test_fillna :1639) ------------------

  test("dropna removes every row containing a null") {
    val r = rows(abcWithNulls.dropNa())
    assert(r.length == 1 && r.head.getString(1) == "Alice")
  }

  test("fillna fills one column's nulls with the scalar") {
    val r = rows(abcWithNulls.fillNa("Score", 0.0).orderBy("ID"))
    assert(r.map(_.getDouble(2)) == Seq(3.5, 4.0, 0.0))
    // other columns untouched
    assert(r(1).isNullAt(1))
  }

  // --- combining (concat, SURVEY §2.7) --------------------------------------

  test("concat_rows appends and errors on column mismatch") {
    assert(abc.concatRows(abc).count() == 6L)
    intercept[IllegalArgumentException] { abc.concatRows(abc.removeColumn("Score")) }
  }

  test("concat_columns zips positionally under the given orders") {
    val left = abc.select("ID", "Name")
    val right = abc.select(col("ID").as("ID2"), col("Score"))
    val z = left.concatColumns(right, Seq(col("ID")), Seq(col("ID2")))
    val r = rows(z.orderBy("ID"))
    assert(r.map(x => (x.getLong(0), x.getLong(2))) ==
      Seq((1L, 1L), (2L, 2L), (3L, 3L)))
    intercept[IllegalArgumentException] { left.concatColumns(abc, Seq(col("ID")), Seq(col("ID"))) }
  }

  // --- head / tail ----------------------------------------------------------

  test("head and tail respect the order") {
    assert(rows(abc.headRows(2, byId)).map(_.getLong(0)) == Seq(1L, 2L))
    assert(rows(abc.tailRows(2, byId)).map(_.getLong(0)) == Seq(2L, 3L))
  }
}
