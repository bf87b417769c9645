package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Presentation + equality utilities (SURVEY §2.8):
  *  - `render` mirrors the reference's `Display` impl
  *    (reference: src/dataframe/dataframe.rs:888-960 — fixed-width
  *    column grid with a header rule);
  *  - `dfEqual` mirrors the reference's `PartialEq`
  *    (dataframe.rs:962-985 — same columns, same cells);
  *  - `scatterPlot` mirrors `scatter_plot` (dataframe.rs:987-1019 —
  *    an x/y chart of two numeric columns), rendered as a text grid.
  *
  * All three are driver-bounded by construction: `render` fetches only
  * the first `n` rows, `dfEqual` reduces to two distributed anti-joins
  * with a LIMIT 1, and `scatterPlot` aggregates points into a fixed
  * width x height bin grid before collecting (the collect is O(grid),
  * never O(rows)).
  */
object Display {

  /** Fixed-width table string of the first n rows under `order`.
    * Cell formatting mirrors the reference Display impl
    * (dataframe.rs:997-1012): floats at 2 decimals, nulls as "NA". */
  def render(df: DataFrame, n: Int = 10, order: Seq[Column] = Nil): String = {
    val head = (if (order.isEmpty) df else df.orderBy(order: _*)).limit(n).collect()
    val cols = df.columns
    def fmt(v: Any): String = v match {
      case null      => "NA"
      case d: Double => f"$d%.2f"
      case f: Float  => f"$f%.2f"
      case x         => x.toString
    }
    val cells: Array[Array[String]] =
      Array(cols.map(identity)) ++ head.map(r =>
        cols.indices.map(i => fmt(r.get(i))).toArray)
    val widths = cols.indices.map(i => cells.map(_(i).length).max)
    def line(row: Array[String]): String =
      row.zip(widths).map { case (s, w) => s.padTo(w, ' ') }.mkString("| ", " | ", " |")
    val rule = widths.map("-" * _).mkString("+-", "-+-", "-+")
    (Seq(rule, line(cells.head), rule) ++ cells.tail.map(line) :+ rule).mkString("\n")
  }

  /** Set-equality of two frames (schema names/types + multiset of rows).
    * Distributed: two exceptAll probes that stop at the first witness. */
  def dfEqual(a: DataFrame, b: DataFrame): Boolean = {
    val sa = a.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val sb = b.schema.fields.map(f => (f.name, f.dataType)).toSeq
    sa == sb &&
      a.exceptAll(b).isEmpty &&
      b.exceptAll(a).isEmpty
  }

  /** Text scatter plot of y over x. Points are binned distributed
    * (groupBy on the scaled cell) so only the bounded grid reaches the
    * driver. Returns the rendered grid, y growing upward. */
  def scatterPlot(df: DataFrame, xCol: String, yCol: String,
                  width: Int = 60, height: Int = 20): String = {
    val binned = scatterBins(df, xCol, yCol, width, height).collect()
    val grid = Array.fill(height, width)(' ')
    binned.foreach { r =>
      val c = r.getLong(2)
      grid(r.getInt(1))(r.getInt(0)) = if (c >= 10) '#' else if (c > 1) '+' else '.'
    }
    val rows = (height - 1 to 0 by -1).map(i => "|" + new String(grid(i)) + "|")
    val frame = "+" + "-" * width + "+"
    (Seq(s"$yCol ^", frame) ++ rows ++ Seq(frame, s"${" " * (width - xCol.length)}$xCol >"))
      .mkString("\n")
  }

  /** The distributed half of `scatterPlot`: the (bx, by) -> point-count
    * grid, as a frame. Kept separate so the binning itself is
    * oracle-checkable (the render above is just a driver-side paint of
    * these ≤ width*height rows). Two scans (bounds, then bins) — the
    * bounds row is O(1) and the bin grid is O(width*height), never
    * O(rows), regardless of input size. */
  def scatterBins(df: DataFrame, xCol: String, yCol: String,
                  width: Int = 60, height: Int = 20): DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    val b = df.agg(min(x).as("xmin"), max(x).as("xmax"),
      min(y).as("ymin"), max(y).as("ymax")).collect()(0)
    val (xmin, xmax, ymin, ymax) =
      (b.getDouble(0), b.getDouble(1), b.getDouble(2), b.getDouble(3))
    val xspan = if (xmax > xmin) xmax - xmin else 1.0
    val yspan = if (ymax > ymin) ymax - ymin else 1.0
    df.select(
        least(floor((x - lit(xmin)) / lit(xspan) * lit(width)), lit(width - 1)).cast("int").as("bx"),
        least(floor((y - lit(ymin)) / lit(yspan) * lit(height)), lit(height - 1)).cast("int").as("by"))
      .where(col("bx").isNotNull && col("by").isNotNull)
      .groupBy("bx", "by").count()
  }
}
