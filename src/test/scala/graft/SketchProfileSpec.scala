package graft

import java.nio.file.Files

import graft.operators.SketchProfile
import org.apache.spark.sql.functions._

/** The incremental-profiling contract: per-shard sketch partials must
  * merge to EXACTLY the one-pass result (HLL registers are per-item
  * maxima — sharding and order cannot change them), and the partials
  * must survive a parquet round trip, because landing next to the data
  * and rolling up later is the whole point. */
class SketchProfileSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("merged shard partials stay within HLL error of exact NDV") {
    val li = Tables(spark, dir, "lineitem")
    val keys = Seq("l_returnflag")
    val cols = Seq("l_orderkey", "l_partkey")
    // shard by an arbitrary hash — deliberately unrelated to the keys.
    // (Sparse-to-dense promotion during union means merge != direct
    // bit-for-bit on small keys; the contract is the error bound.)
    val partials = SketchProfile.partials(
      li, pmod(col("l_suppkey"), lit(7)), keys, cols)
    val merged = SketchProfile.merge(partials, keys, cols).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("no"),
        countDistinct(col("l_partkey")).as("np")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    exact.foreach { case (k, (no, np)) =>
      assert(math.abs(merged(k)._1 - no).toDouble / no <= 0.05,
        s"$k orders: ${merged(k)._1} vs $no")
      assert(math.abs(merged(k)._2 - np).toDouble / np <= 0.05,
        s"$k parts: ${merged(k)._2} vs $np")
    }
    // deterministic for a fixed sharding: a second evaluation agrees
    val again = SketchProfile.merge(partials, keys, cols).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(again == merged)
  }

  test("estimates stay within HLL error of exact NDV") {
    val li = Tables(spark, dir, "lineitem")
    val est = SketchProfile.direct(li, Seq("l_returnflag"), Seq("l_orderkey"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      // lgK=12 => rse ~1.6%; 5% is > 3 sigma
      assert(math.abs(est(k) - n).toDouble / n <= 0.05, s"$k: ${est(k)} vs $n")
    }
  }

  test("partials round-trip through parquet and merge incrementally") {
    val li = Tables(spark, dir, "lineitem")
    val out = Files.createTempDirectory("sketch").toString
    val keys = Seq("l_returnflag")
    val cols = Seq("l_orderkey")
    // "day 1" and "day 2" shards written independently — the append-only
    // operational shape — then merged from disk
    val day1 = li.filter(col("l_orderkey") % 2 === 0)
    val day2 = li.filter(col("l_orderkey") % 2 =!= 0)
    SketchProfile.partials(day1, lit(1), keys, cols)
      .write.mode("append").parquet(s"$out/partials")
    SketchProfile.partials(day2, lit(2), keys, cols)
      .write.mode("append").parquet(s"$out/partials")
    val merged = SketchProfile.merge(
      spark.read.parquet(s"$out/partials"), keys, cols).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = li.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(merged(k) - n).toDouble / n <= 0.05,
        s"$k: ${merged(k)} vs $n")
    }
  }
}
