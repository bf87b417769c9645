package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** randas-parity relational surface, re-expressed Spark-first.
  *
  * Each operator is a thin declarative wrapper over the DataFrame API so
  * Catalyst keeps full visibility (pushdown, pruning, codegen). The
  * reference semantics being mirrored are cited per method
  * (reference = Rusty-Gopher/randas at /root/reference).
  *
  * Scale notes:
  *  - Nothing here collects to the driver except the explicitly
  *    driver-scale ops (`tailRows` uses a bounded action).
  *  - Positional ops (loc/iloc/tail/zip) need a total order; callers
  *    pass the ordering columns so the sort distributes. A global row
  *    index is opt-in (`withRowIndex`), never ambient.
  */
object GraftOps {

  /** Row-count gate for `describeStats()`: at or below this the default
    * is exact sorted-position percentiles (all values of one column fit
    * comfortably in a single aggregation buffer — 10M doubles is 80 MB);
    * above it the mergeable approx sketch is the only safe shape. */
  val DescribeExactMaxRows: Long = 10000000L

  implicit class RichGraftDf(val df: DataFrame) extends AnyVal {

    // ----- §2.2 projection / access ------------------------------------

    /** reference: DataFrame::column (dataframe.rs:106-108). */
    def columnValues(name: String): DataFrame = {
      requireCols(name)
      df.select(col(name))
    }

    /** Cell by (row position under `order`, column). The prefix of
      * rowPos+1 rows is fetched with TakeOrderedAndProject (per-partition
      * heap + driver merge of rowPos+1 rows — no global sort, no RDD hop),
      * then the last row of the prefix is the target. Positions are
      * user-supplied small numbers, so the prefix is bounded.
      * reference: get/get_value (dataframe.rs:111-134). */
    def cellAt(rowPos: Long, name: String, order: Seq[Column]): DataFrame = {
      requireCols(name)
      // row_number over the bounded prefix (not "last row of the prefix"):
      // an out-of-range position then yields an empty result instead of
      // silently returning the final row of a shorter table.
      val w = Window.orderBy(order: _*)
      df.orderBy(order: _*).limit(rowPos.toInt + 1)
        .withColumn("_idx", row_number().over(w) - lit(1))
        .filter(col("_idx") === lit(rowPos))
        .select(col(name))
    }

    /** Subset by row positions x optional column list. Same bounded-prefix
      * strategy as cellAt: TakeOrderedAndProject fetches max(positions)+1
      * rows, then a row_number window over that small prefix (single
      * partition is fine — the prefix is bounded by the largest requested
      * position) assigns the 0-based index. Stays in Catalyst end to end.
      * reference: loc (dataframe.rs:392-438). */
    def locRows(positions: Seq[Long], cols: Option[Seq[String]], order: Seq[Column]): DataFrame = {
      require(positions.nonEmpty, "loc: empty position list")
      cols.foreach(cs => requireCols(cs: _*))
      val prefix = df.orderBy(order: _*).limit(positions.max.toInt + 1)
      val w = Window.orderBy(order: _*)
      val keep = prefix
        .withColumn("_idx", row_number().over(w) - lit(1))
        .filter(col("_idx").isin(positions: _*))
      cols.fold(keep.drop("_idx"))(cs => keep.select(cs.map(col): _*))
    }

    /** Single cell by (row pos, col pos). reference: iloc
      * (dataframe.rs:441-466). */
    def ilocCell(rowPos: Long, colPos: Int, order: Seq[Column]): DataFrame = {
      require(colPos >= 0 && colPos < df.columns.length,
        s"column position $colPos out of bounds for ${df.columns.length} columns")
      cellAt(rowPos, df.columns(colPos), order)
    }

    /** reference: head (dataframe.rs:553-570); deterministic under `order`. */
    def headRows(n: Int = 5, order: Seq[Column] = Nil): DataFrame =
      (if (order.isEmpty) df else df.orderBy(order: _*)).limit(n)

    /** reference: tail (dataframe.rs:573-596). Computed distributed: last
      * n under `order` = first n under the reversed order, re-sorted. */
    def tailRows(n: Int = 5, order: Seq[Column]): DataFrame =
      df.orderBy(order.map(_.desc): _*).limit(n).orderBy(order: _*)

    // ----- §2.3 schema mutation -----------------------------------------

    /** reference: add_column (dataframe.rs:137-165) — expression form;
      * replacing an existing name keeps a single column like the ref. */
    def addColumn(name: String, value: Column): DataFrame =
      df.withColumn(name, value)

    /** reference: remove_column (dataframe.rs:168-182) — errors on a
      * missing name (Spark's drop is silent, the reference is not). */
    def removeColumn(name: String): DataFrame = {
      requireCols(name)
      df.drop(name)
    }

    // ----- §2.4 aggregations --------------------------------------------

    /** Numeric view of any column: non-numeric cells -> null, mirroring
      * the reference's per-cell skip semantics (dataframe.rs:190-197). */
    def numericOnly(name: String): Column = expr(s"try_cast(`$name` AS DOUBLE)")

    /** reference: sum (dataframe.rs:186-201) — Some(0.0) even when no
      * numeric cells, hence the coalesce. */
    def sumCol(name: String): DataFrame = {
      requireCols(name)
      df.agg(coalesce(sum(numericOnly(name)), lit(0.0)).as(s"sum_$name"))
    }

    /** reference: mean (dataframe.rs:213-229) — null if no numeric cells. */
    def meanCol(name: String): DataFrame = {
      requireCols(name)
      df.agg(avg(numericOnly(name)).as(s"mean_$name"))
    }

    /** reference: variance (dataframe.rs:276-302) — sample variance. */
    def varianceCol(name: String): DataFrame = {
      requireCols(name)
      df.agg(var_samp(numericOnly(name)).as(s"var_$name"))
    }

    /** reference: std_dev (dataframe.rs:316-318) — sample stddev. */
    def stdDevCol(name: String): DataFrame = {
      requireCols(name)
      df.agg(stddev_samp(numericOnly(name)).as(s"std_$name"))
    }

    /** Per-column max over numeric columns, one row. reference: max
      * (dataframe.rs:232-262); non-numeric columns are omitted (the
      * reference yields None for them). */
    def maxAll(): DataFrame = aggAll(max, "max")

    /** reference: min (dataframe.rs:321-344). */
    def minAll(): DataFrame = aggAll(min, "min")

    /** Per-column non-null count, all columns, one row. reference: count
      * (dataframe.rs:354-368). */
    def countNonNull(): DataFrame =
      df.agg(count(col(df.columns.head)).as(s"count_${df.columns.head}"),
        df.columns.tail.toIndexedSeq.map(c => count(col(c)).as(s"count_$c")): _*)

    /** reference: shape (dataframe.rs:347-351). */
    def shape2: (Long, Int) = (df.count(), df.columns.length)

    /** Tidy per-numeric-column stats. reference: describe
      * (dataframe.rs:599-658) emits count/mean/std/min/25/50/75/max; the
      * reference's frame layout is broken (SURVEY §2.4) so we emit one
      * row per column instead. Sample stddev (the reference is internally
      * inconsistent, we pick one).
      *
      * Percentile mode: exact `percentile` is a TypedImperativeAggregate
      * that buffers every value of the column in one aggregation buffer —
      * with a single global group that is one executor holding the whole
      * column, an OOM at 100 TB. `approx_percentile` (a mergeable
      * t-digest-style sketch with bounded memory) is the only shape that
      * survives there. The no-arg overload picks per frame: exact (the
      * reference's naive sorted-position semantics) below
      * [[GraftOps.DescribeExactMaxRows]], sketch above — users of a
      * small frame get the numbers they expect, big frames never hit
      * the buffer trap. The one extra count() the gate pays is
      * parquet-metadata-cheap and negligible next to the stats pass. */
    def describeStats(): DataFrame =
      describeStats(exact = df.count() <= GraftOps.DescribeExactMaxRows)

    /** [[describeStats()]] with the percentile mode forced. */
    def describeStats(exact: Boolean): DataFrame = {
      val numCols = df.schema.fields.filter(f => isNumeric(f.dataType)).map(_.name)
      require(numCols.nonEmpty, "describe: no numeric columns")
      def pct(v: Column, p: Double): Column =
        if (exact) percentile(v, lit(p))
        else approx_percentile(v, lit(p), lit(10000)).cast(DoubleType)
      val perCol = numCols.toIndexedSeq.map { c =>
        val v = col(c).cast(DoubleType)
        struct(lit(c).as("column"), count(v).as("count"),
          avg(v).as("mean"), stddev_samp(v).as("stddev"),
          min(v).as("min"),
          pct(v, 0.25).as("p25"),
          pct(v, 0.5).as("p50"),
          pct(v, 0.75).as("p75"),
          max(v).as("max"))
      }
      // One distributed aggregate for all columns, then explode: a single
      // pass over the data regardless of column count.
      df.agg(array(perCol: _*).as("stats"))
        .select(explode(col("stats")).as("s"))
        .select(col("s.*"))
    }

    // ----- §2.5 filters ---------------------------------------------------

    /** reference: apply_condition + filter_by_condition
      * (dataframe.rs:514-550). Nulls -> false is native 3VL. */
    def filterRows(predicate: Column): DataFrame = df.filter(predicate)

    /** reference: query (dataframe.rs:822-885) — the reference grammar is
      * exactly `col == value`; Spark SQL's expression language is a strict
      * superset, so any reference query string parses here. Unknown
      * columns raise an AnalysisException (the reference panics). */
    def query(q: String): DataFrame = df.filter(expr(q))

    // ----- §2.6 missing data ----------------------------------------------

    /** reference: dropna (dataframe.rs:784-808) — any-null row drop. */
    def dropNa(): DataFrame = df.na.drop("any")

    /** reference: fillna (dataframe.rs:811-819) — one column, scalar fill. */
    def fillNa(name: String, value: Any): DataFrame = {
      requireCols(name)
      value match {
        case s: String => df.na.fill(s, Seq(name))
        case d: Double => df.na.fill(d, Seq(name))
        case l: Long   => df.na.fill(l, Seq(name))
        case i: Int    => df.na.fill(i.toLong, Seq(name))
        case b: Boolean => df.na.fill(b, Seq(name))
        case other => throw new IllegalArgumentException(s"fillNa: $other")
      }
    }

    // ----- §2.7 combining ---------------------------------------------------

    /** reference: concat_rows (dataframe.rs:680-717) — requires identical
      * column lists in identical order. Plain union: no shuffle, the two
      * scans just append. */
    def concatRows(other: DataFrame): DataFrame = {
      require(df.columns.sameElements(other.columns),
        s"concat_rows: column mismatch ${df.columns.toSeq} vs ${other.columns.toSeq}")
      df.union(other)
    }

    /** reference: concat_columns (dataframe.rs:720-744) — positional zip.
      * No positional zip exists in a distributed engine without an order,
      * so both sides are ranked under their `order` columns and joined on
      * the synthetic index (one shuffle each side, co-partitioned join). */
    def concatColumns(other: DataFrame, leftOrder: Seq[Column], rightOrder: Seq[Column]): DataFrame = {
      val overlap = df.columns.toSet.intersect(other.columns.toSet)
      require(overlap.isEmpty, s"concat_columns: overlapping names $overlap")
      val l = df.withRowIndex("_idx", leftOrder)
      val r = other.withRowIndex("_idx", rightOrder)
      l.join(r, "_idx").drop("_idx")
    }

    // ----- positional index util (SURVEY §1.3) ------------------------------

    /** Opt-in full row index: sorts under `order` (distributed range
      * sort), then zipWithIndex (no extra shuffle; one lightweight job to
      * count partition sizes). The RDD hop drops out of whole-stage
      * codegen, so this is reserved for ops that genuinely need an index
      * on EVERY row (`concatColumns`' positional zip); bounded positional
      * access (cellAt/locRows) uses the TakeOrdered prefix path instead. */
    def withRowIndex(idxName: String, order: Seq[Column]): DataFrame = {
      val sorted = if (order.isEmpty) df else df.orderBy(order: _*)
      val schema = StructType(sorted.schema.fields :+ StructField(idxName, LongType, nullable = false))
      val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
      df.sparkSession.createDataFrame(rdd, schema)
    }

    // ----- helpers ---------------------------------------------------------

    private def aggAll(f: Column => Column, prefix: String): DataFrame = {
      val numCols = df.schema.fields.filter(x => isNumeric(x.dataType)).map(_.name)
      require(numCols.nonEmpty, s"$prefix: no numeric columns")
      df.agg(f(col(numCols.head)).as(s"${prefix}_${numCols.head}"),
        numCols.tail.toIndexedSeq.map(c => f(col(c)).as(s"${prefix}_$c")): _*)
    }

    private def requireCols(names: String*): Unit = {
      val missing = names.filterNot(df.columns.contains)
      require(missing.isEmpty, s"column(s) not found: ${missing.mkString(", ")}")
    }
  }

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }
}
