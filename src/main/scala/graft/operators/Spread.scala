package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** CPU-spreading repartition that SURVIVES AQE partition coalescing.
  *
  * The engine's per-row-expensive stages (shingle/minhash HOFs, the
  * JDK codec family) spread their work with a keyed repartition —
  * but `df.repartition(col)` is a REPARTITION_BY_COL exchange, which
  * adaptive execution is free to coalesce BY BYTES. For these stages
  * the bytes are tiny (often just doc_id projections) while the
  * downstream per-row cost is enormous, so AQE's 64 MiB advisory
  * folds the exchange to ONE partition and the whole stage runs on a
  * single core: measured in the round-13 30× sweep, media_resize's
  * PNG chain and media_pcm's sample walk each pinned one core for
  * minutes with 31 idle (the repartition was in the plan — and
  * coalesced away).
  *
  * `df.repartition(n, col)` is REPARTITION_BY_NUM: an explicit user
  * width AQE must respect. Width = `defaultParallelism` (local cores,
  * or total executor cores on a cluster) — the natural unit for
  * CPU-bound work; data-sized widths belong to the byte-bound stages
  * AQE already handles well.
  */
object Spread {

  /** `df` hash-partitioned on `key` as a coalesce-proof exchange. Use
    * ONLY in front of per-row-expensive work; byte-bound stages should
    * stay AQE-managed.
    *
    * Width = max(defaultParallelism, spark.sql.shuffle.partitions):
    * defaultParallelism alone is captured at PLAN-BUILD time, and on a
    * cluster with dynamic allocation (executors not yet up) it can be
    * a tiny number that AQE is then FORBIDDEN to widen — the inverse
    * of the single-core coalesce problem this exists to fix. The
    * shuffle-partitions floor is the user's own statement of intended
    * width and is allocation-independent; locally the two agree (32),
    * so the bench envelope is unchanged. */
  def byKey(df: DataFrame, key: String): DataFrame = {
    val spark = df.sparkSession
    val width = math.max(spark.sparkContext.defaultParallelism,
      spark.conf.get("spark.sql.shuffle.partitions", "200").toInt)
    df.repartition(width, col(key))
  }

  /** [[byKey]], but ONLY when the input's scan parallelism is actually
    * starved — fewer planned partitions than cores. The round-16 stage
    * profile found the single-row-group fixture parquets feed
    * per-row-expensive generators (lang_id's trigram explode,
    * time_interpolate's pre-aggregate) as ONE task holding the whole
    * row while 31 cores idle; at production scale the same scans plan
    * thousands of splits and a forced repartition would be a pure
    * corpus-sized shuffle tax. Deciding on the PLANNED partition count
    * makes the spread scale-adaptive: it engages exactly when the scan
    * cannot feed the cores (guide §2 — derive partitioning from the
    * input, don't constant-tune it). rdd.getNumPartitions plans the
    * physical scan but runs no job. */
  def ifNarrow(df: DataFrame, key: String): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) byKey(df, key) else df
  }
}
