package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse maintenance operators: slowly-changing-dimension (SCD2)
  * merge and CDC change-log materialization — the two standard shapes
  * for keeping dimension/state tables current under a stream of
  * updates, re-expressed as single-pass Spark plans.
  */
object Warehouse {

  val EndOfTime = "9999-12-31"

  /** SCD type-2 merge: fold a new attribute snapshot into a versioned
    * dimension, closing changed rows and appending their successors.
    *
    * `dim` is an SCD2 table (business key `key`, tracked attributes
    * `trackCols`, plus `valid_from`/`valid_to`/`is_current`); `updates`
    * is the incoming snapshot (`key` + `trackCols`). For each key:
    *
    *  - attributes changed  → the current row closes
    *    (`valid_to = effectiveDate`, `is_current = false`) and a new
    *    current row opens at `effectiveDate`;
    *  - attributes unchanged → the current row passes through;
    *  - key absent from `updates` → current row passes through
    *    (snapshot-missing keys are NOT implicitly deleted — deletions
    *    are a CDC concern, see `applyChangeLog`);
    *  - key new in `updates` → a new current row opens.
    *
    * Plan shape: ONE join (current rows ⋈ updates, full outer so new
    * keys surface; Spark broadcasts the snapshot when it's small) and
    * ONE generate — each join row explodes into its 0-2 output rows via
    * an inline array, so the join never re-executes per output branch.
    * History rows (`is_current = false`) union straight through without
    * touching the join. Change detection compares every tracked column
    * null-safely (`<=>`).
    *
    * At 100 TB the dimension is the big side and this is one shuffle of
    * the CURRENT slice only (history never moves), which is the minimum
    * any SCD2 merge can do.
    *
    * CONTRACT: `updates` must carry ONE row per key — a full-outer join
    * against a multi-row snapshot would silently fan every matching dim
    * row out. A multi-update CDC feed folds to one-row-per-key first
    * with `applyChangeLog` (WarehouseSpec pins the composition). */
  def scd2Merge(dim: DataFrame, updates: DataFrame, key: String,
                trackCols: Seq[String], effectiveDate: String): DataFrame = {
    val validFrom = "valid_from"; val validTo = "valid_to"; val isCurrent = "is_current"
    val outCols = Seq(key) ++ trackCols ++ Seq(validFrom, validTo, isCurrent)

    val cur = dim.filter(col(isCurrent))
    val hist = dim.filter(!col(isCurrent)).select(outCols.map(col): _*)

    val u = updates.select(col(key).as("__u_key") +: trackCols.map(c => col(c).as(s"__u_$c")): _*)
    val joined = cur.join(u, col(key) === col("__u_key"), "full_outer")

    val inDim = col(key).isNotNull
    val inUpd = col("__u_key").isNotNull
    val changed = trackCols.map(c => !(col(c) <=> col(s"__u_$c"))).reduce(_ || _)

    def rowStruct(k: Column, track: Seq[Column], from: Column, to: Column, current: Column) =
      struct((k.as(key) +: track.zip(trackCols).map { case (c, n) => c.as(n) }) ++
        Seq(from.as(validFrom), to.as(validTo), current.as(isCurrent)): _*)

    // each joined row contributes 0-2 output rows, emitted through one
    // inline array so the join executes exactly once
    val emitted = joined.select(explode(array(
      // surviving current row: unchanged, or closed at effectiveDate
      when(inDim, rowStruct(col(key), trackCols.map(col), col(validFrom),
        when(inUpd && changed, lit(effectiveDate)).otherwise(col(validTo)),
        !(inUpd && changed))),
      // successor row: changed attributes or a brand-new key
      when(inUpd && (!inDim || changed),
        rowStruct(col("__u_key"), trackCols.map(c => col(s"__u_$c")),
          lit(effectiveDate), lit(EndOfTime), lit(true)))
    )).as("__r")).filter(col("__r").isNotNull).select(outCols.map(c => col(s"__r.$c")): _*)

    hist.union(emitted)
  }

  /** Snapshot reconciliation: row-level diff of two keyed table
    * versions — the audit step before publishing a regenerated table
    * ("what did this pipeline change?"). One full-outer join on the
    * key; every compared column is checked null-safely (`<=>`), and
    * changed rows report WHICH columns moved (sorted array, so the
    * output is deterministic). Status ∈ added | removed | changed |
    * unchanged.
    *
    * One shuffle each side (or broadcast when one snapshot is small) —
    * the minimum for a keyed diff; the column comparison itself is a
    * codegen'd projection on the joined row.
    *
    * CONTRACT: `key` must be unique in each snapshot (it is a table
    * version's primary key); duplicate keys would fan the join out. */
  /** Point-in-time lookup against an SCD2 dimension: each fact row
    * fetches the dimension version that was valid at its as-of date —
    * "what did we believe about this key WHEN the fact happened", the
    * reproducibility primitive for training-data snapshots (features
    * must come from the world as of the label's timestamp, or the
    * pipeline leaks the future).
    *
    * Shape: an EQUI-join on the key (the validity-range predicate rides
    * along as a join filter, not a range-join problem — each key has
    * few versions, so the fan-out before filtering is the version
    * count, not the row count). Broadcasts or shuffles like any keyed
    * join; [valid_from, valid_to) half-open intervals mean exactly one
    * version matches any date within the dimension's history.
    *
    * ISO yyyy-MM-dd strings compare lexicographically in date order, so
    * the range filter needs no date parsing on either engine. */
  def pitLookup(facts: DataFrame, factKey: Column, asOf: Column,
                dim: DataFrame, dimKey: String): DataFrame =
    facts.join(dim,
      factKey === col(dimKey) && asOf >= col("valid_from") && asOf < col("valid_to"),
      "left")

  def tableDiff(before: DataFrame, after: DataFrame, key: String,
                compareCols: Seq[String]): DataFrame = {
    val b = before.select(col(key) +: compareCols.map(c => col(c).as(s"__b_$c")): _*)
    val a = after.select(col(key).as("__a_key") +: compareCols.map(c => col(c).as(s"__a_$c")): _*)
    val joined = b.join(a, col(key) === col("__a_key"), "full_outer")
    val inB = col(key).isNotNull
    val inA = col("__a_key").isNotNull
    val changedCols = array_sort(filter(array(compareCols.map(c =>
      when(!(col(s"__b_$c") <=> col(s"__a_$c")), lit(c))): _*), _.isNotNull))
    joined.select(
      coalesce(col(key), col("__a_key")).as(key),
      when(!inB, "added")
        .when(!inA, "removed")
        .when(size(changedCols) > 0, "changed")
        .otherwise("unchanged").as("diff_status"),
      when(inB && inA, changedCols).otherwise(array().cast("array<string>"))
        .as("changed_cols"))
  }

  /** CDC change-log materialization: collapse an (upsert|delete) event
    * log to the latest live state per key.
    *
    * `op` must evaluate to "U" (upsert) or "D" (delete tombstone); the
    * latest entry per key — ordered by `seq`, ties broken by the later
    * `tieBreak` — wins, and keys whose winning entry is a tombstone
    * drop out entirely.
    *
    * Plan shape: row_number over (key, seq desc) then rank = 1 — the
    * same top-1-per-group shape as `Dedup.keepBest`, which Spark
    * executes with WindowGroupLimit pushdown: each shuffle partition
    * keeps only its per-key leader, so state never exceeds one row per
    * key per partition. One shuffle on the key — the minimum for a
    * per-key fold. */
  def applyChangeLog(log: DataFrame, key: Column, seq: Seq[Column],
                     op: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(seq.map(_.desc): _*)
    log.withColumn("__op", op)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("__op") === "U")
      .drop("__rn", "__op")
  }
}
