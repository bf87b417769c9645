package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.MessageTypeParser
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}

/** The events loader must survive the driver regenerating the fixture
  * with a different physical timestamp layout — it has shipped both
  * TIMESTAMP(NANOS) and plain microsecond TIMESTAMP across rounds, and
  * a loader pinned to either breaks every events consumer on the next
  * flip (round 7 lost 18 queries this way). Both branches are pinned
  * here with real parquet files of each physical type. */
class TablesSpec extends SparkSpecBase {

  /** 2024-01-15T12:00:00.123456789 UTC as epoch nanos. */
  private val nanos  = 1705320000123456789L
  private val micros = nanos / 1000L

  test("events loader: legacy TIMESTAMP(NANOS) file surfaces micros TimestampType") {
    val dir = Files.createTempDirectory("graft-ev-nanos").toString
    // Spark cannot author TIMESTAMP(NANOS) parquet; write the fixture
    // with parquet-mr directly, exactly the layout the round-1..6
    // driver testdata used.
    val schema = MessageTypeParser.parseMessageType(
      "message events { required int64 ts (TIMESTAMP(NANOS,true)); required int64 event_id; }")
    val out = HadoopOutputFile.fromPath(
      new org.apache.hadoop.fs.Path(s"$dir/events.parquet"), new Configuration())
    val writer = ExampleParquetWriter.builder(out).withType(schema).build()
    val f = new SimpleGroupFactory(schema)
    writer.write(f.newGroup().append("ts", nanos).append("event_id", 1L))
    writer.close()

    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(unix_micros(col("ts"))).collect()(0).getLong(0)
    assert(got == micros, s"expected $micros got $got")
  }

  test("events loader: plain microsecond TIMESTAMP file passes through") {
    val dir = Files.createTempDirectory("graft-ev-micros").toString
    spark.range(1).select(
        timestamp_micros(lit(micros)).as("ts"), lit(7L).as("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(unix_micros(col("ts"))).collect()(0).getLong(0)
    assert(got == micros, s"expected $micros got $got")
  }

  test("events loader: micros TIMESTAMP_NTZ file is normalized to TimestampType") {
    val dir = Files.createTempDirectory("graft-ev-ntz").toString
    spark.range(1).select(
        timestamp_micros(lit(micros)).cast(TimestampNTZType).as("ts"),
        lit(7L).as("event_id"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val df = Tables.events(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    // UTC session => NTZ->TZ cast is value-preserving
    val got = df.select(unix_micros(col("ts"))).collect()(0).getLong(0)
    assert(got == micros, s"expected $micros got $got")
  }
}
