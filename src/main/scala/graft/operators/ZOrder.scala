package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of 2-4 key columns
  * so rows close in EVERY dimension land close in the one-dimensional
  * sort order, then range-partition + sort the write by that code.
  *
  * Why it matters at 100 TB: parquet row-group min/max statistics prune
  * on the SORT column only. A table sorted by `a` answers `a = ?` with
  * few row groups but scans everything for `b = ?`. Z-ordering by
  * (a, b) gives BOTH predicates sub-linear scans — each row group
  * covers a small rectangle of (a, b) space, so a point or range filter
  * on either dimension touches only the row groups whose rectangle
  * intersects it. The classic multi-dimensional clustering trade:
  * neither dimension is as tight as a dedicated sort, all are far
  * better than the unsorted worst case. Real layout tuning wants 3-4
  * dimensions (e.g. date x customer x region); pruning power per
  * dimension dilutes as N grows, so N is capped at 4.
  *
  * The code is built from built-in shift/mask/or expressions only —
  * one flat codegen'd expression tree, no UDF, no custom Expression —
  * and `interleaveSql` emits the identical arithmetic as ANSI SQL so
  * external engines (and the DuckDB oracle) can recompute it verbatim.
  */
object ZOrder {

  private def checkDims(n: Int, bits: Int): Unit = {
    require(n >= 2 && n <= 4, s"interleave: 2-4 columns, got $n")
    require(bits >= 1 && n * bits <= 62,
      s"interleave: need 1 <= bits and $n*bits <= 62, got bits=$bits")
  }

  /** Morton code of the low `bits` bits of each column (non-negative;
    * values are masked to `bits`). Bit b of column i lands at position
    * N*b + i — a LongType column usable for sorting,
    * range-partitioning, or bucketing. */
  def interleave(cols: Seq[Column], bits: Int): Column = {
    checkDims(cols.size, bits)
    val n = cols.size
    val terms = (0 until bits).flatMap { b =>
      cols.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), n * b + i)
      }
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** Two-column Morton code: bit b of x at position 2b, of y at 2b+1. */
  def interleave2(x: Column, y: Column, bits: Int = 16): Column =
    interleave(Seq(x, y), bits)

  /** The same Morton arithmetic as engine-portable SQL text (shift via
    * integer division/multiplication by powers of two, mask via `% 2`),
    * for oracles and external readers of z-ordered layouts. */
  def interleaveSql(cols: Seq[String], bits: Int): String = {
    checkDims(cols.size, bits)
    val n = cols.size
    val terms = (0 until bits).flatMap { b =>
      cols.zipWithIndex.map { case (c, i) =>
        s"((($c // ${1L << b}) % 2) * ${1L << (n * b + i)})"
      }
    }
    terms.mkString("(", " + ", ")")
  }

  def interleaveSql(x: String, y: String, bits: Int): String =
    interleaveSql(Seq(x, y), bits)

  def interleaveSql(x: String, y: String): String =
    interleaveSql(Seq(x, y), 16)

  /** Write `df` z-ordered by `keyCols` (2-4 columns): range-partition
    * on the Morton code (range, not hash — partition file boundaries
    * then align with code ranges) and sort each partition by it, so
    * every parquet row group covers a compact N-dimensional box. The
    * code column itself is dropped — it's a layout device, not data;
    * readers recompute it from `interleaveSql` if they need it. */
  def writeZOrdered(df: DataFrame, path: String, keyCols: Seq[String],
                    numFiles: Int, bits: Int): Unit =
    df.withColumn("__z", interleave(keyCols.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    numFiles: Int, bits: Int): Unit =
    writeZOrdered(df, path, Seq(xCol, yCol), numFiles, bits)
}
