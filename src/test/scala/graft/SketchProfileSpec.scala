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

  // ----- KLL quantile partials -----------------------------------------

  /** Observed normalized rank error of estimate `v` for target rank `q`
    * over `sorted` values: distance from q to the [lt, le] rank window
    * v occupies, in fractions of n. */
  private def rankError(sorted: Array[Double], v: Double, q: Double): Double = {
    val n = sorted.length.toDouble
    val lt = sorted.count(_ < v) / n
    val le = sorted.count(_ <= v) / n
    if (q < lt) lt - q else if (q > le) q - le else 0.0
  }

  test("merged KLL shard partials stay within rank-error bound of exact") {
    val li = Tables(spark, dir, "lineitem")
    val keys = Seq("l_returnflag")
    val cols = Seq("l_extendedprice")
    val qs = Seq(0.1, 0.5, 0.9, 0.99)
    val eps = org.apache.spark.sql.graft.KllFunctions
      .normalizedRankError(SketchProfile.DefaultKllK)
    val partials = SketchProfile.quantilePartials(
      li, pmod(col("l_suppkey"), lit(7)), keys, cols)
    val merged = SketchProfile.mergeQuantiles(partials, keys, cols, qs)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val direct = SketchProfile.directQuantiles(li, keys, cols, qs)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val byKey = li.select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    byKey.foreach { case (k, sorted) =>
      qs.zipWithIndex.foreach { case (q, i) =>
        // merge of partials pays the bound twice at most (merge is
        // error-preserving; 2x is generous headroom, still ~3%)
        assert(rankError(sorted, merged(k)(i), q) <= 2 * eps,
          s"$k q=$q merged ${merged(k)(i)}")
        assert(rankError(sorted, direct(k)(i), q) <= 2 * eps,
          s"$k q=$q direct ${direct(k)(i)}")
      }
    }
  }

  test("KLL partials round-trip through parquet and answer slice queries") {
    val li = Tables(spark, dir, "lineitem")
    val out = Files.createTempDirectory("kll").toString
    val keys = Seq("l_returnflag")
    val cols = Seq("l_extendedprice")
    val eps = org.apache.spark.sql.graft.KllFunctions
      .normalizedRankError(SketchProfile.DefaultKllK)
    val day1 = li.filter(col("l_orderkey") % 2 === 0)
    val day2 = li.filter(col("l_orderkey") % 2 =!= 0)
    SketchProfile.quantilePartials(day1, lit(1), keys, cols)
      .write.mode("append").parquet(s"$out/partials")
    SketchProfile.quantilePartials(day2, lit(2), keys, cols)
      .write.mode("append").parquet(s"$out/partials")
    val stored = spark.read.parquet(s"$out/partials")
    // full roll-up within bound of the full data
    val merged = SketchProfile.mergeQuantiles(stored, keys, cols, Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).head).toMap
    val all = li.select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    all.foreach { case (k, sorted) =>
      assert(rankError(sorted, merged(k), 0.5) <= 2 * eps, s"$k full")
    }
    // shard-slice roll-up (day 1 only) within bound of day-1 data —
    // the "any shard combination, no rescan" contract
    val sliced = SketchProfile.mergeQuantiles(
      stored.filter(col("shard") === 1), keys, cols, Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).head).toMap
    val d1 = day1.select(col("l_returnflag"), col("l_extendedprice").cast("double"))
      .collect().groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
    d1.foreach { case (k, sorted) =>
      assert(rankError(sorted, sliced(k), 0.5) <= 2 * eps, s"$k slice")
    }
  }
}
