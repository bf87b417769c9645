package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.FreqFunctions

/** Frequent-items sketch contracts: exactness below the purge
  * threshold, the HARD error bound above it (|est - true| <= maxError
  * for EVERY item, guaranteed — not probabilistic), heavy-hitter
  * completeness, and shard-partial merge equivalence to the one-pass
  * sketch's guarantees. */
class FreqSpec extends SparkSpecBase {
  import spark.implicits._

  test("sketch is exact (maxError 0) while no purge has happened") {
    // 500 distinct items < map capacity at maxMapSize 2048
    val df = spark.range(5000).select((col("id") % 500).cast("string").as("s"))
    val row = df.agg(
      FreqFunctions.freqMaxError(FreqFunctions.freqSketchAgg(col("s"))).as("me"),
      FreqFunctions.freqEstimate(
        FreqFunctions.freqSketchAgg(col("s")), lit("42")).as("est")).head()
    assert(row.getLong(0) == 0L, "no purge => exact")
    assert(row.getLong(1) == 10L)
  }

  test("hard error bound holds for every item under heavy purging") {
    // Zipf-ish stream: item k appears ~ 60000/k times, tiny map forces
    // purges; the bound must hold for hot AND cold items regardless.
    val rows = (1 to 400).flatMap(k => Seq.fill(60000 / k / 100 + 1)(k.toString))
    val df = rows.toDF("s").repartition(13)
    val sk = df.agg(FreqFunctions.freqSketchAgg(col("s"), 64).as("sk"))
    val exact = rows.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val checked = df.select(col("s")).distinct()
      .crossJoin(broadcast(sk))
      .select(col("s"),
        FreqFunctions.freqEstimate(col("sk"), col("s")).as("est"),
        FreqFunctions.freqMaxError(col("sk")).as("me"))
      .collect()
    val me = checked.head.getLong(2)
    assert(me > 0L, "tiny map must have purged")
    checked.foreach { r =>
      val (item, est) = (r.getString(0), r.getLong(1))
      assert(math.abs(est - exact(item)) <= me,
        s"item $item est $est true ${exact(item)} bound $me")
    }
  }

  test("merged shard partials keep the hard bound on the true heavy hitter") {
    val df = spark.range(100000)
      .select(when(col("id") % 3 === 0, lit("hot"))
        .otherwise(col("id").cast("string")).as("s"),
        pmod(col("id"), lit(7)).as("shard"))
    val partials = df.groupBy(col("shard"))
      .agg(FreqFunctions.freqSketchAgg(col("s"), 256).as("sk"))
    val merged = partials.agg(FreqFunctions.freqMergeAgg(col("sk"), 256).as("sk"))
      .select(FreqFunctions.freqEstimate(col("sk"), lit("hot")).as("est"),
        FreqFunctions.freqMaxError(col("sk")).as("me"))
      .head()
    val truth = 100000L / 3 + 1
    assert(math.abs(merged.getLong(0) - truth) <= merged.getLong(1),
      s"est ${merged.getLong(0)} true $truth bound ${merged.getLong(1)}")
  }
}
