package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of two key columns
  * so rows close in BOTH dimensions land close in the one-dimensional
  * sort order, then range-partition + sort the write by that code.
  *
  * Why it matters at 100 TB: parquet row-group min/max statistics prune
  * on the SORT column only. A table sorted by `a` answers `a = ?` with
  * few row groups but scans everything for `b = ?`. Z-ordering by
  * (a, b) gives BOTH predicates sub-linear scans — each row group
  * covers a small rectangle of (a, b) space, so a point or range filter
  * on either dimension touches only the row groups whose rectangle
  * intersects it. The classic multi-dimensional clustering trade:
  * neither dimension is as tight as a dedicated sort, both are far
  * better than the unsorted worst case.
  *
  * The code is built from built-in shift/mask/or expressions only —
  * one flat codegen'd expression tree, no UDF, no custom Expression —
  * and `interleaveSql` emits the identical arithmetic as ANSI SQL so
  * external engines (and the DuckDB oracle) can recompute it verbatim.
  */
object ZOrder {

  /** Morton code of the low `bits` bits of `x` and `y` (both
    * non-negative; values are masked to `bits`). Bit b of x lands at
    * position 2b, bit b of y at 2b+1 — a LongType column usable for
    * sorting, range-partitioning, or bucketing. */
  def interleave2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "interleave2: bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { b =>
      Seq(
        shiftleft(shiftright(x.cast("long"), b).bitwiseAND(lit(1L)), 2 * b),
        shiftleft(shiftright(y.cast("long"), b).bitwiseAND(lit(1L)), 2 * b + 1))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** The same Morton arithmetic as engine-portable SQL text (shift via
    * integer division/multiplication by powers of two, mask via `% 2`),
    * for oracles and external readers of z-ordered layouts. */
  def interleaveSql(x: String, y: String, bits: Int = 16): String = {
    require(bits >= 1 && bits <= 31, "interleaveSql: bits must be in [1, 31]")
    val terms = (0 until bits).flatMap { b =>
      Seq(
        s"((($x // ${1L << b}) % 2) * ${1L << (2 * b)})",
        s"((($y // ${1L << b}) % 2) * ${1L << (2 * b + 1)})")
    }
    terms.mkString("(", " + ", ")")
  }

  /** Write `df` z-ordered by (`xCol`, `yCol`): range-partition on the
    * Morton code (range, not hash — partition file boundaries then
    * align with code ranges) and sort each partition by it, so every
    * parquet row group covers a compact (x, y) rectangle. The code
    * column itself is dropped — it's a layout device, not data; readers
    * recompute it from `interleaveSql` if they need it. */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
                    numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", interleave2(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
