package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental NDV profiling via mergeable HLL sketches — THE 100 TB
  * profiling pattern: profile each shard/day/partition ONCE into
  * tiny binary sketch rows, persist them, and answer "distinct count
  * per key over any shard combination" later by merging sketches —
  * never rescanning the corpus.
  *
  * Merging is lossless in dense HLL mode (registers are element-wise
  * maxima, so shard order cannot matter and unions are commutative/
  * associative), but DataSketches keeps small sketches in an exact
  * sparse mode and PROMOTES them to dense during union — so
  * `merge(partials(...))` can differ from `direct(...)` by estimator
  * noise on small keys. The spec therefore pins the operational
  * contract: merged estimates stay within the same HLL error bound of
  * the exact NDV (~1.6%/sqrt at lgK=12) as one-pass estimates, for any
  * sharding, and are deterministic for a fixed sharding.
  *
  * Complements `profile_sketch` (one-shot approximate profiling in
  * Curation): this is the operational form — partials land next to the
  * data they describe, roll up across arbitrary slices, and new shards
  * append without touching old ones.
  */
object SketchProfile {

  /** Default lgK: 2^12 registers = 4 KiB dense sketch, ~1.6% NDV error. */
  val DefaultLgK: Int = 12

  private def sketchName(c: String) = s"hll_$c"

  /** One row per (shard, key...) carrying a binary HLL sketch per
    * profiled column. The output is tiny (keys x shards rows, ~4 KiB
    * per sketch) and writes to parquet as plain binary columns. */
  def partials(df: DataFrame, shardCol: Column, keyCols: Seq[String],
               cols: Seq[String], lgK: Int = DefaultLgK): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = cols.map(c => hll_sketch_agg(col(c), lit(lgK)).as(sketchName(c)))
    df.groupBy((shardCol.as("shard") +: keyCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Roll partial sketches up to per-key NDV estimates. Accepts any
    * subset of shards (filter first for slice queries); merging is a
    * keyed aggregation over sketch rows, never over raw data. */
  def merge(partialRows: DataFrame, keyCols: Seq[String],
            cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c =>
      hll_sketch_estimate(hll_union_agg(col(sketchName(c)), lit(false)))
        .as(s"ndv_$c"))
    partialRows.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** One-pass estimates straight from the data — the shard-free form,
    * and the equality reference for the partial/merge path. */
  def direct(df: DataFrame, keyCols: Seq[String], cols: Seq[String],
             lgK: Int = DefaultLgK): DataFrame = {
    val aggs = cols.map(c =>
      hll_sketch_estimate(hll_sketch_agg(col(c), lit(lgK))).as(s"ndv_$c"))
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  // ----- quantiles (KLL) ------------------------------------------------
  // Spark ships mergeable NDV sketches (hll_*) but no mergeable
  // quantile sketch — percentile_approx's digest cannot be stored or
  // merged later. The KLL trio (plans/KllExpressions.scala) closes
  // that: per-shard quantile partials land once, any later percentile
  // question over any shard slice is an aggregation over ~3 KB rows.

  import org.apache.spark.sql.graft.KllFunctions

  /** Default KLL k: ~1.65% normalized rank error, ~3 KB per sketch. */
  val DefaultKllK: Int = KllFunctions.DefaultK

  private def kllName(c: String) = s"kll_$c"

  /** One row per (shard, key...) carrying a binary KLL quantile sketch
    * per profiled numeric column — the quantile companion of
    * [[partials]]. */
  def quantilePartials(df: DataFrame, shardCol: Column, keyCols: Seq[String],
                       cols: Seq[String], k: Int = DefaultKllK): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = cols.map(c =>
      KllFunctions.kllSketchAgg(col(c).cast("double"), k).as(kllName(c)))
    df.groupBy((shardCol.as("shard") +: keyCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Quantile estimates at `qs` per key from stored partials — merge
    * any shard subset, never rescan. Output: one array<double> column
    * `q_<col>` per profiled column, positions matching `qs`. */
  def mergeQuantiles(partialRows: DataFrame, keyCols: Seq[String],
                     cols: Seq[String], qs: Seq[Double],
                     k: Int = DefaultKllK): DataFrame = {
    val aggs = cols.map(c =>
      KllFunctions.kllQuantiles(
        KllFunctions.kllMergeAgg(col(kllName(c)), k), qs).as(s"q_$c"))
    partialRows.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** One-pass quantile estimates straight from the data — the
    * shard-free form and the bound reference for the
    * partial/merge path. */
  def directQuantiles(df: DataFrame, keyCols: Seq[String],
                      cols: Seq[String], qs: Seq[Double],
                      k: Int = DefaultKllK): DataFrame = {
    val aggs = cols.map(c =>
      KllFunctions.kllQuantiles(
        KllFunctions.kllSketchAgg(col(c).cast("double"), k), qs).as(s"q_$c"))
    df.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  // ----- set overlap (theta) --------------------------------------------
  // HLL answers "how many distinct per segment"; theta sketches also
  // answer "how many distinct in BOTH segments" from the per-segment
  // sketches alone (KMV retention supports intersection) — audience
  // overlap, cross-shard contamination, feature co-occurrence. Sketch
  // bytes are a pure function of the item SET (order- and
  // partitioning-insensitive, fixed seed), exact below the nominal
  // entry count.

  import org.apache.spark.sql.graft.ThetaFunctions

  /** Pairwise distinct-overlap estimates between segments: one theta
    * sketch per `segCol` value over `idCol`, then estimates for every
    * segment pair (a < b) — |A|, |B| and the |A ∩ B| HLL cannot give.
    * The per-segment sketch table is tiny (one row per segment), so the
    * pair stage is a broadcast self-join regardless of corpus size. */
  def overlapMatrix(df: DataFrame, segCol: String, idCol: String,
                    nominal: Int = ThetaFunctions.DefaultNominal): DataFrame = {
    val sk = df.groupBy(col(segCol).as("seg"))
      .agg(ThetaFunctions.thetaSketchAgg(col(idCol), nominal).as("sk"))
    sk.as("a")
      .join(broadcast(sk.as("b")), col("a.seg") < col("b.seg"))
      .select(col("a.seg").as("seg_a"), col("b.seg").as("seg_b"),
        ThetaFunctions.thetaEstimate(col("a.sk")).as("ndv_a"),
        ThetaFunctions.thetaEstimate(col("b.sk")).as("ndv_b"),
        ThetaFunctions.thetaIntersectEstimate(col("a.sk"), col("b.sk"))
          .as("ndv_both"))
  }

  // ----- heavy hitters (frequent-items) ---------------------------------
  // The frequency companion: "what are the most common values and how
  // often" from fixed-size mergeable Misra-Gries buffers
  // (plans/FreqExpressions.scala). Unlike HLL/KLL/theta, the error
  // bound here is HARD (|est - true| <= maxError always), so merged
  // partials keep a machine-checkable guarantee whatever the sharding.

  import org.apache.spark.sql.graft.FreqFunctions

  /** Default map size: 2048 slots, max error <= ~3.5 N / 2048. */
  val DefaultFreqMapSize: Int = FreqFunctions.DefaultMapSize

  private def freqName(c: String) = s"freq_$c"

  /** One row per (shard, key...) carrying a binary frequent-items
    * sketch per profiled string column plus the shard row weight
    * `freq_n` (needed to state the merged error bound in stream terms). */
  def freqPartials(df: DataFrame, shardCol: Column, keyCols: Seq[String],
                   cols: Seq[String],
                   maxMapSize: Int = DefaultFreqMapSize): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    val aggs = cols.map(c =>
      FreqFunctions.freqSketchAgg(col(c), maxMapSize).as(freqName(c))) :+
      count(lit(1)).as("freq_n")
    df.groupBy((shardCol.as("shard") +: keyCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Per-key estimate + hard bound for one item from stored partials —
    * merge any shard subset, never rescan. Output columns per profiled
    * column: `est_<col>` and `maxerr_<col>`. */
  def mergeFreq(partialRows: DataFrame, keyCols: Seq[String],
                cols: Seq[String], item: String,
                maxMapSize: Int = DefaultFreqMapSize): DataFrame = {
    val aggs = cols.flatMap { c =>
      val merged = FreqFunctions.freqMergeAgg(col(freqName(c)), maxMapSize)
      Seq(FreqFunctions.freqEstimate(merged, lit(item)).as(s"est_$c"),
        FreqFunctions.freqMaxError(merged).as(s"maxerr_$c"))
    }
    partialRows.groupBy(keyCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
