package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra over keyed [start, end) spans — the sweep-line
  * merge every usage-metering / session-coverage / speech-segment
  * pipeline needs ("how much wall-clock does this user's activity
  * actually cover once overlaps collapse?").
  *
  * Shape: ONE window shuffle on the key. The classic sweep — order by
  * start, flag a new group whenever start exceeds the running max of
  * end, prefix-sum the flags into group ids — is two stacked window
  * functions over the SAME (partitionBy key, orderBy start) spec, so
  * Catalyst evaluates both in a single WindowExec after a single
  * exchange; the per-group min/max aggregation then reuses that
  * partitioning. Per-key state is one running long, never a buffer of
  * intervals — a key with 10⁹ spans streams through.
  *
  * All arithmetic is integer (epoch micros), so coverage sums are exact
  * and engine-portable — no FP rounding anywhere.
  */
object Intervals {

  /** Collapse overlapping/touching [startUs, endUs) spans per key.
    * Returns one row per merged span: (key, span_start, span_end).
    * Touching spans (next.start == prev.end) merge, as [a,b)∪[b,c)=[a,c).
    */
  def mergeSpans(df: DataFrame, key: Column, startUs: Column, endUs: Column): DataFrame = {
    val byStart = Window.partitionBy(col("k")).orderBy(col("s"), col("e"))
    df.select(key.as("k"), startUs.as("s"), endUs.as("e"))
      // running max of end over PRECEDING rows only: a new group starts
      // where this span begins strictly after everything seen so far ended
      .withColumn("new_grp",
        when(col("s") > coalesce(
          max(col("e")).over(byStart.rowsBetween(Window.unboundedPreceding, -1)),
          lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("grp", sum(col("new_grp")).over(byStart))
      .groupBy(col("k"), col("grp"))
      .agg(min(col("s")).as("span_start"), max(col("e")).as("span_end"))
      .drop(col("grp"))
      .withColumnRenamed("k", "key")
  }

  /** Total covered micros and merged-span count per key. */
  def coverage(df: DataFrame, key: Column, startUs: Column, endUs: Column): DataFrame =
    mergeSpans(df, key, startUs, endUs)
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_end") - col("span_start")).as("covered_us"))

  /** Interval-overlap JOIN: all (left, right) pairs of half-open spans
    * [s, e) sharing a key that overlap (l.s < r.e AND r.s < l.e) —
    * WITHOUT the cross join a naive overlap predicate forces.
    *
    * Both sides explode into coarse time bins (floor(s/bin)..floor(
    * (e-1)/bin)); overlapping spans necessarily share at least one bin,
    * so candidates meet in a plain (key, bin) equi-join, the exact
    * predicate prunes false bin-neighbors, and a distinct collapses
    * pairs that shared several bins. Pick `binUs` near the typical span
    * length: fan-out per row is len/binUs + 1 while longer bins make
    * fatter candidate buckets — the usual interval-binning trade
    * (the same one RangeJoin.pointInRange makes for points).
    *
    * Left columns must not collide with right columns; both frames need
    * (key, s, e). */
  def overlapJoin(left: DataFrame, lKey: String, lS: String, lE: String,
                  right: DataFrame, rKey: String, rS: String, rE: String,
                  binUs: Long): DataFrame = {
    require(binUs > 0)
    // Drop empty/inverted spans (e <= s) BEFORE the explode: a half-open
    // [s, e) with e <= s matches nothing by the overlap predicate anyway,
    // but a wildly inverted row (e << s) would make `sequence(s div bin,
    // (e-1) div bin)` emit a huge descending range — an OOM from one bad
    // row. The filter enforces the documented contract at the boundary.
    // `div`, not `/`: micros divided as doubles can round across a bin
    // boundary at epoch magnitudes
    val l = left.filter(col(lE) > col(lS)).withColumn("_lbin",
      explode(sequence(expr(s"$lS div ${binUs}L"), expr(s"($lE - 1) div ${binUs}L"))))
    val r = right.filter(col(rE) > col(rS)).withColumn("_rbin",
      explode(sequence(expr(s"$rS div ${binUs}L"), expr(s"($rE - 1) div ${binUs}L"))))
    l.join(r, col(lKey) === col(rKey) && col("_lbin") === col("_rbin"))
      .filter(col(lS) < col(rE) && col(rS) < col(lE))
      .drop("_lbin", "_rbin")
      .distinct()
  }
}
