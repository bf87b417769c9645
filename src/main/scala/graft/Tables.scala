package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loader for the driver-generated TPC-H-ish parquet data.
  *
  * All queries receive a scale-factor directory (e.g.
  * `/root/testdata/sf0.01`) and read one parquet file per table. At
  * cluster scale the same call reads a partitioned directory; nothing
  * here assumes single-file inputs.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects outright (PARQUET_TYPE_ILLEGAL). Read it as raw nanos via
    * the legacy conf and surface a microsecond TimestampType column —
    * the same truncation DuckDB applies when casting TIMESTAMP_NS to
    * TIMESTAMP. `ts div 1000` keeps the math in integer space (a double
    * division would lose precision on epoch-nanos magnitudes).
    *
    * The legacy conf should be set at session build (Verify/Bench do);
    * the guarded set below only covers foreign sessions (tests) and
    * never mutates a session that already has it. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    if (spark.conf.getOption(k).forall(_ != "true")) spark.conf.set(k, "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }
}
