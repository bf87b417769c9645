package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's session tuning, used by Verify/Bench and
  * recommended for users. Values are chosen for the 100 TB deployment
  * story and are all safe at laptop scale:
  *
  *  - AQE + skew-join splitting stay explicitly on (runtime re-plans,
  *    post-shuffle coalescing, skewed-partition splitting);
  *  - shuffle partitions are a parameter: ~2-3x the executor-core count
  *    at cluster scale so AQE can coalesce down, never the 200 default
  *    on a laptop;
  *  - 128 MiB file split size keeps scan tasks balanced;
  *  - UTC session time zone (cross-engine timestamp determinism);
  *  - nanos-as-long parquet handling for TIMESTAMP(NANOS) inputs;
  *  - the graft SQL extension (native sketch expressions).
  */
object GraftSession {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "134217728")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
}
