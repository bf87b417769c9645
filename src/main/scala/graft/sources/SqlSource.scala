package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** SQL database read/write, mirroring the reference's rusqlite-based
  * `read_sql` (reference: src/io/read.rs:246-290 — arbitrary query,
  * column names from the statement, Integer/Real/Text cells) and
  * `to_sql` (write.rs:85-132 — row inserts with an `if_exists` mode).
  *
  * Built on Spark's JDBC source: any database with a JDBC driver on the
  * classpath works (the test suite round-trips through embedded Derby,
  * which ships with Spark). At cluster scale, `partitionColumn` +
  * `numPartitions` splits the read into parallel range queries instead
  * of one connection dragging the whole table.
  */
object SqlSource {

  /** Run `query` against the database and return the result frame.
    * Optional partitioning options parallelize the read. */
  def read(spark: SparkSession, url: String, query: String,
           options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("query", query)
    options.foldLeft(r)((acc, kv) => acc.option(kv._1, kv._2)).load()
  }

  /** Read a whole table, optionally split into `numPartitions` parallel
    * range scans over `partitionColumn` (reads min/max automatically
    * when bounds are not given). */
  def readTable(spark: SparkSession, url: String, table: String,
                partitionColumn: Option[String] = None,
                numPartitions: Int = 1): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    partitionColumn match {
      case Some(c) if numPartitions > 1 =>
        // bounds query runs once on the driver; the read then fans out
        val bounds = read(spark, url, s"SELECT MIN($c) lo, MAX($c) hi FROM $table").collect()(0)
        base.option("partitionColumn", c)
          .option("lowerBound", bounds.get(0).toString)
          .option("upperBound", bounds.get(1).toString)
          .option("numPartitions", numPartitions)
          .load()
      case _ => base.load()
    }
  }

  /** `if_exists` semantics follow the reference: "replace" clears the
    * table first, anything else appends (write.rs:96-105). */
  def write(df: DataFrame, url: String, table: String,
            ifExists: String = "append"): Unit = {
    val mode = if (ifExists == "replace") SaveMode.Overwrite else SaveMode.Append
    df.write.mode(mode).jdbc(url, table, new Properties())
  }
}
