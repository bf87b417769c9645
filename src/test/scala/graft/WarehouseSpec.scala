package graft

import graft.operators.Warehouse
import org.apache.spark.sql.functions._

/** Contracts for the warehouse-maintenance operators: SCD2 merge row
  * accounting (close/open/pass-through/insert) and CDC change-log
  * folding (latest-wins, tombstone removal), plus the plan shape that
  * keeps them one-shuffle operations. */
class WarehouseSpec extends SparkSpecBase {
  import spark.implicits._

  private def dim = Seq(
    // key, attr, valid_from, valid_to, is_current
    (1L, "a", "2024-01-01", "9999-12-31", true),
    (2L, "b", "2024-01-01", "9999-12-31", true),
    (3L, "c", "2024-01-01", "2024-03-01", false), // history row
    (3L, "c2", "2024-03-01", "9999-12-31", true)
  ).toDF("k", "attr", "valid_from", "valid_to", "is_current")

  test("scd2Merge closes changed rows and opens successors") {
    val updates = Seq((1L, "a9"), (2L, "b")).toDF("k", "attr")
    val out = Warehouse.scd2Merge(dim, updates, "k", Seq("attr"), "2024-06-01")
      .orderBy("k", "valid_from").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      (1L, "a", "2024-01-01", "2024-06-01", false),   // closed
      (1L, "a9", "2024-06-01", "9999-12-31", true),   // successor
      (2L, "b", "2024-01-01", "9999-12-31", true),    // unchanged snapshot row
      (3L, "c", "2024-01-01", "2024-03-01", false),   // history passes through
      (3L, "c2", "2024-03-01", "9999-12-31", true)))  // absent from snapshot: kept
  }

  test("scd2Merge inserts brand-new keys as open rows") {
    val updates = Seq((9L, "z")).toDF("k", "attr")
    val out = Warehouse.scd2Merge(dim, updates, "k", Seq("attr"), "2024-06-01")
    assert(out.count() == 5)
    val nine = out.filter($"k" === 9L).collect().map(r =>
      (r.getString(1), r.getString(2), r.getString(3), r.getBoolean(4)))
    assert(nine.toSeq == Seq(("z", "2024-06-01", "9999-12-31", true)))
  }

  test("scd2Merge treats null attributes null-safely (null -> value is a change)") {
    val d = Seq((1L, null.asInstanceOf[String], "2024-01-01", "9999-12-31", true))
      .toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val changed = Warehouse.scd2Merge(d, Seq((1L, "x")).toDF("k", "attr"),
      "k", Seq("attr"), "2024-06-01")
    assert(changed.count() == 2) // closed null row + successor
    val same = Warehouse.scd2Merge(d,
      Seq((1L, null.asInstanceOf[String])).toDF("k", "attr"),
      "k", Seq("attr"), "2024-06-01")
    assert(same.count() == 1)    // null == null: no-op
  }

  test("scd2Merge executes its join once (single-pass explode, no per-branch re-join)") {
    val plan = Warehouse.scd2Merge(dim, Seq((1L, "a9")).toDF("k", "attr"),
      "k", Seq("attr"), "2024-06-01").queryExecution.executedPlan.toString
    val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)".r
      .findAllIn(plan).length
    assert(joins == 1, s"expected exactly 1 join in the merge plan, got $joins:\n$plan")
    assert(plan.contains("Generate explode"), s"expected explode emission:\n$plan")
  }

  test("a multi-update CDC feed folds through applyChangeLog into an SCD2 merge") {
    // the documented composition for feeds with several updates per key:
    // fold latest-wins first, then merge the one-row-per-key snapshot
    val feed = Seq(
      (1L, 10L, "U", "a1"), (1L, 20L, "U", "a2"),  // two updates: a2 wins
      (2L, 10L, "D", "-")                           // tombstone: key absent from snapshot
    ).toDF("k", "seq", "typ", "attr")
    val snapshot = Warehouse.applyChangeLog(feed, col("k"), Seq(col("seq")),
      when(col("typ") === "D", "D").otherwise("U")).select("k", "attr")
    val out = Warehouse.scd2Merge(dim, snapshot, "k", Seq("attr"), "2024-06-01")
      .orderBy("k", "valid_from").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getBoolean(4)))
    // k1: closed + successor a2 (one pair, not one per feed row);
    // k2 absent from snapshot: passes through untouched (no implicit delete)
    assert(out.toSeq == Seq(
      (1L, "a", false), (1L, "a2", true),
      (2L, "b", true),
      (3L, "c", false), (3L, "c2", true)))
  }

  test("tableDiff classifies added/removed/changed/unchanged and names changed columns") {
    val before = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0), (4L, null.asInstanceOf[String], 4.0))
      .toDF("k", "s", "v")
    val after = Seq((1L, "a", 1.0), (2L, "B", 9.0), (4L, "d", 4.0), (5L, "e", 5.0))
      .toDF("k", "s", "v")
    val out = Warehouse.tableDiff(before, after, "k", Seq("s", "v"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2).toList))
    assert(out.toSeq == Seq(
      (1L, "unchanged", Nil),
      (2L, "changed", List("s", "v")),
      (3L, "removed", Nil),
      (4L, "changed", List("s")),   // null -> "d" is a change (null-safe compare)
      (5L, "added", Nil)))
  }

  private def log = Seq(
    // key, seq, op-ish type, payload
    (1L, 10L, "set", "v1"), (1L, 20L, "set", "v2"),
    (2L, 10L, "set", "v1"), (2L, 30L, "del", "-"),
    (3L, 15L, "del", "-"), (3L, 25L, "set", "v9")
  ).toDF("k", "seq", "typ", "payload")

  test("applyChangeLog keeps the latest upsert per key and drops tombstoned keys") {
    val out = Warehouse.applyChangeLog(log, col("k"), Seq(col("seq")),
        when(col("typ") === "del", "D").otherwise("U"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
    // key 1: latest is v2; key 2: latest is a tombstone (gone);
    // key 3: deleted THEN re-inserted — resurrection wins
    assert(out.toSeq == Seq((1L, 20L, "v2"), (3L, 25L, "v9")))
  }

  test("applyChangeLog plans the WindowGroupLimit top-1 shape") {
    val plan = Warehouse.applyChangeLog(log, col("k"), Seq(col("seq")),
      lit("U")).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"latest-per-key should push the group limit into the shuffle:\n$plan")
  }

  test("pitLookup resolves each as-of date to exactly one version, half-open") {
    val dim = Seq(
      (1L, "old", "2024-01-01", "2024-06-01", false),
      (1L, "new", "2024-06-01", "9999-12-31", true),
      (2L, "only", "2024-01-01", "9999-12-31", true)
    ).toDF("k", "attr", "valid_from", "valid_to", "is_current")
    val facts = Seq(
      (10L, 1L, "2024-03-15"), // inside the old version
      (11L, 1L, "2024-06-01"), // ON the boundary: half-open => new
      (12L, 1L, "2024-05-31"), // last day of old
      (13L, 2L, "2025-01-01"), // single-version key
      (14L, 9L, "2024-03-01")  // unknown key => null attrs
    ).toDF("fid", "fk", "as_of")
    val got = Warehouse.pitLookup(facts, col("fk"), col("as_of"), dim, "k")
      .orderBy("fid").collect()
      .map(r => (r.getAs[Long]("fid"), r.getAs[String]("attr")))
    assert(got.toSeq == Seq((10L, "old"), (11L, "new"), (12L, "old"),
      (13L, "only"), (14L, null)))
  }
}
