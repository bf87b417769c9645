package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling — the reproducible alternative to
  * `df.sample()` for pipeline runs: membership depends only on the key,
  * so the same rows are sampled on every run, on any cluster, at any
  * partitioning, and a re-run after adding data keeps the previously
  * sampled rows (stable holdouts / train-test splits).
  *
  * Mechanics: the first 4 hex digits of md5(key) are a uniform draw
  * from [0, 65536); keep rows whose draw falls below
  * floor(fraction * 65536). The comparison is done lexicographically on
  * the fixed-width hex prefix, which equals the numeric comparison and
  * runs verbatim in any engine with md5 + substr (the DuckDB oracle
  * does exactly that). One codegen'd filter over the scan — no shuffle,
  * no state, trivially pushed next to the parquet reader.
  */
object Sampling {

  /** Keep ~`fraction` of rows, keyed by `key`. Granularity is 1/65536;
    * fraction is clamped to [0, 1]. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame = {
    val t = math.max(0, math.min(65536, math.floor(fraction * 65536).toInt))
    if (t >= 65536) df
    else df.filter(substring(md5(key.cast("string")), 1, 4) < lit(f"$t%04x"))
  }

  /** The hex-prefix threshold for `fraction` — exposed so oracle SQL /
    * tests can restate the identical predicate. */
  def hexThreshold(fraction: Double): String =
    f"${math.max(0, math.min(65536, math.floor(fraction * 65536).toInt))}%04x"

  /** Deterministic train/val/test assignment: every row gets a split
    * label from contiguous md5-prefix ranges sized by `weights`
    * (cumulative thresholds). Key-stable: a row's split never changes
    * across runs, clusters, or table growth — the property a reusable
    * holdout needs. One codegen'd CASE; no shuffle, no state. */
  def splitByHash(df: DataFrame, key: Column, weights: Seq[(String, Double)],
                  splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "splitByHash: weights must sum to 1")
    val prefix = substring(md5(key.cast("string")), 1, 4)
    val cum = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w }.tail
    val cases = weights.map(_._1).zip(cum.map(hexThreshold)).dropRight(1)
    val expr = cases.foldRight(lit(weights.last._1): Column) {
      case ((name, thr), els) => when(prefix < thr, name).otherwise(els)
    }
    df.withColumn(splitCol, expr)
  }

  /** Deterministic k-fold assignment (cross-validation): every row gets
    * a fold in [0, k) from its md5 draw — key-stable like `splitByHash`
    * (a row's fold never changes as the table grows), one codegen'd
    * projection. Draw granularity is 1/65536, so the per-fold bias for
    * k << 65536 is negligible (≤ k/65536). */
  def foldByHash(df: DataFrame, key: Column, k: Int, foldCol: String = "fold"): DataFrame = {
    require(k >= 2 && k <= 1000, "foldByHash: k in [2, 1000]")
    val draw = conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")
    df.withColumn(foldCol, (draw % k).cast("int"))
  }

  /** Greedy budgeted selection: walk rows in `orderCols` order and keep
    * each row while the EXCLUSIVE running sum of `weight` before it is
    * under `budget` — "take the best documents until the token budget
    * is spent", the corpus-selection primitive.
    *
    * A naive global cumulative sum is a single-partition window — the
    * classic scale-killer. This runs it distributed in two passes:
    * range-partition by the order key (global order across partitions),
    * per-partition exclusive window sums, then one tiny per-partition
    * totals frame (numPartitions rows) turns into broadcast offsets
    * added back to each row's local sum. The global prefix sum is
    * boundary-invariant — WHERE the range partitioner cuts changes
    * nothing about any row's cumulative value — so the selection is
    * deterministic as long as `orderCols` is a total order.
    *
    * Weights are summed as LONGs (token/byte counts are integral):
    * integer addition is associative, so the partitioned two-pass sum
    * is BIT-equal to a sequential scan — float weights would drift in
    * the last ulp between groupings and make boundary rows flip.
    *
    * The returned frame carries `cumCol` = tokens consumed BEFORE each
    * kept row. */
  def takeWhileBudget(df: DataFrame, orderCols: Seq[Column], weight: Column,
                      budget: Long, cumCol: String = "cum_before",
                      partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
            else df.sparkSession.sparkContext.defaultParallelism
    val ranged = df.repartitionByRange(n, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__w", weight.cast("long"))
    val local = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = ranged.withColumn("__lcum",
      coalesce(sum(col("__w")).over(local), lit(0L)))
    // numPartitions rows: the one place a single-partition window is
    // legitimate — its input is bounded by the partition count
    val offW = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withLocal.groupBy(col("__pid")).agg(sum(col("__w")).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(offW), lit(0L)))
      .select(col("__pid"), col("__off"))
    withLocal.join(broadcast(offsets), "__pid")
      .withColumn(cumCol, col("__lcum") + col("__off"))
      .filter(col(cumCol) < budget)
      .drop("__pid", "__w", "__lcum", "__off")
  }

  /** Weighted deterministic sampling: row `i` is kept with probability
    * p_i = min(1, rate * w_i) — inclusion probability proportional to
    * its weight (probability-proportional-to-size Bernoulli sampling,
    * the corpus-reweighting primitive: upsample long/high-quality
    * documents without a shuffle). Membership is key-stable like
    * `hashSample`: the uniform draw is the first 4 hex digits of
    * md5(key) read as an integer in [0, 65536), compared against
    * p_i * 65536. Everything is a codegen'd scan-level filter — no
    * shuffle, no state, no aggregate.
    *
    * `rate` is an explicit constant (kept / unit weight), NOT a target
    * fraction: deriving it from avg(weight) inside the operator would
    * make membership depend on a floating-point aggregate whose
    * summation order varies run-to-run. Calibrate once
    * (rate = targetFraction / avgWeight) and pin the constant; rows
    * with null weights are dropped. */
  def weightedSample(df: DataFrame, key: Column, weight: Column, rate: Double): DataFrame = {
    val draw = conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")
    df.filter(draw < least(lit(1.0), lit(rate) * weight) * 65536.0)
  }

  /** Stratified deterministic sampling: a different fraction per
    * stratum value (rebalancing a corpus by language/source is the
    * training-data use). Same md5-prefix mechanics as `hashSample`, the
    * threshold just varies by stratum via one codegen'd CASE — still a
    * single scan-level filter, no shuffle, and membership stays
    * key-stable per stratum. Strata not in `fractions` use `default`. */
  def stratifiedHashSample(df: DataFrame, key: Column, strata: Column,
                           fractions: Map[String, Double],
                           default: Double): DataFrame = {
    val thr = fractions.foldLeft(lit(hexThreshold(default)): Column) {
      case (acc, (value, f)) => when(strata === value, lit(hexThreshold(f))).otherwise(acc)
    }
    df.filter(substring(md5(key.cast("string")), 1, 4) < thr)
  }

  /** Temperature-scaled source mixing — the multi-source corpus-mixing
    * rule of the T5/mT5 lineage: source s with n_s documents gets
    * sampling weight n_s^alpha; alpha < 1 flattens the source
    * distribution, so oversized crawls are downsampled hardest while
    * small high-value sources keep (nearly) everything. A target corpus
    * fraction fixes the scale:
    * rate_s = min(1, target * N * w_s / Σw / n_s), membership is the
    * key-stable md5 draw — the mixture is fully deterministic and any
    * engine recomputes it.
    *
    * Cross-engine determinism is engineered, not hoped for: w_s is
    * 6-dp-rounded (pow differs in the last ulp across libms — the bm25
    * ln precedent), Σw is a PREFIX-SUM FOLD in source order (a plain
    * aggregate sum's order is engine-chosen), the rate is 6-dp-rounded,
    * and the membership compare is integer draw < integer
    * floor(rate × 65536).
    *
    * Scale shape: per-source stats are a tiny aggregate (single-row
    * window over #sources rows — bounded by construction) broadcast
    * back onto the corpus; membership is a codegen'd scan-level filter.
    * Returns the kept rows with their columns unchanged. */
  /** Weighted top-k sampling WITHOUT replacement per group — the
    * Efraimidis-Spirakis A-ES scheme: each row draws u in (0,1) and
    * ranks by u^(1/w); the k largest keys per group are a bona fide
    * weighted sample without replacement. Engineered engine-portable
    * like every sampler here: u is the key-stable salted md5 draw
    * ((draw + 0.5)/65536 — the +0.5 keeps u strictly inside (0,1)),
    * and the rank key is the MONOTONE-equivalent ln(u)/w (u^(1/w) at
    * large w collapses onto 1.0 at any fixed rounding; the log form
    * keeps 5+ significant digits), 9-dp rounded with the key column
    * as tiebreak so both engines rank identically.
    *
    * Scale shape: one codegen'd projection + one per-group top-k
    * window (WindowGroupLimit pushes the k filter into the sort) — no
    * self-joins, no global sort, no driver state. */
  def weightedTopK(df: DataFrame, key: Column, weight: Column, k: Int,
                   group: Column, salt: String = "wsamp:"): DataFrame = {
    require(k > 0, "weightedTopK: k must be positive")
    val draw = conv(substring(md5(concat(lit(salt), key.cast("string"))), 1, 4),
      16, 10).cast("double")
    val u = (draw + lit(0.5)) / lit(65536.0)
    df.withColumn("wkey", round(log(u) / weight, 9))
      .withColumn("rk", row_number().over(
        Window.partitionBy(group).orderBy(col("wkey").desc, key)))
      .filter(col("rk") <= k)
  }

  def temperatureMix(df: DataFrame, key: Column, source: Column,
                     alpha: Double, targetFraction: Double): DataFrame = {
    val counts = df.groupBy(source.as("__src")).agg(count(lit(1)).as("__n"))
    val w = counts.withColumn("__w", round(pow(col("__n"), alpha), 6))
    val fold = Window.orderBy(col("__src")).rowsBetween(Window.unboundedPreceding, 0)
    val tot = w.withColumn("__ps", sum(col("__w")).over(fold))
      .agg(max(col("__ps")).as("__sumw"), sum(col("__n")).as("__nn"))
    val rates = w.crossJoin(broadcast(tot))
      .select(col("__src"), round(least(lit(1.0),
        lit(targetFraction) * col("__nn") * col("__w") / col("__sumw") / col("__n")), 6)
        .as("__rate"))
    val draw = conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("long")
    df.join(broadcast(rates), source === col("__src"))
      .filter(draw < floor(col("__rate") * 65536.0).cast("long"))
      .drop("__src", "__rate")
  }
}
