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

  /** Schema-adaptive `events` loader. The driver has generated
    * `events.ts` both as parquet TIMESTAMP(NANOS) (which Spark's
    * reader rejects outright — PARQUET_TYPE_ILLEGAL — unless the
    * legacy nanos-as-long conf surfaces it as raw `LongType` nanos)
    * and as plain microsecond TIMESTAMP. Branch on the type the
    * reader actually produces rather than pinning either physical
    * layout:
    *   - `LongType`  → legacy-conf nanos: truncate to micros
    *     (`ts div 1000`, integer math — a double division would lose
    *     precision at epoch-nanos magnitudes) and surface
    *     TimestampType, matching DuckDB's TIMESTAMP_NS → TIMESTAMP
    *     cast.
    *   - `TimestampType` → pass through untouched.
    *   - `TimestampNTZType` (micros with isAdjustedToUTC=false) →
    *     cast to TimestampType. All graft sessions run with
    *     `spark.sql.session.timeZone=UTC` (GraftSession.scala:28), so
    *     the cast is value-preserving and every downstream consumer
    *     keeps seeing the single timestamp type it was written for.
    *
    * The legacy conf is set defensively before the read so a NANOS
    * file never hard-fails; it is a no-op for micros files. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val k = "spark.sql.legacy.parquet.nanosAsLong"
    if (spark.conf.getOption(k).forall(_ != "true")) spark.conf.set(k, "true")
    normalizeEventsTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** The type-adaptive `ts` normalization, shared by the batch loader
    * above and streaming readers (which must build their own
    * `readStream` but want identical semantics). Works on any plan —
    * batch or streaming — because it only inspects the analyzed
    * schema. */
  def normalizeEventsTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType      => raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => raw
      case _             => raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
}
