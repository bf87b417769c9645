package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV ingest/egress mirroring the reference's `read_csv` options
  * (reference: src/io/read.rs:91-128 — delimiter + encoding + header,
  * per-field int/float/string inference) on Spark's native CSV source.
  *
  * The reference decodes the whole file on one thread and then parses
  * record chunks with rayon; Spark's CSV reader instead splits the file
  * into input partitions and schema-infers with a sampled pass, which is
  * the shape that holds at 100 TB (no single-node decode step). Type
  * inference matches: integral -> long, fractional -> double, otherwise
  * string, with empty fields as null (read.rs:129-140).
  */
object CsvSource {

  def read(spark: SparkSession, path: String,
           delimiter: String = ",",
           encoding: String = "UTF-8",
           header: Boolean = true,
           inferSchema: Boolean = true): DataFrame =
    spark.read
      .option("sep", delimiter)
      .option("encoding", encoding)
      .option("header", header)
      .option("inferSchema", inferSchema)
      .option("nullValue", "")
      .csv(path)

  /** `to_csv` — the reference README claims it but never shipped it
    * (reference README.md:23; SURVEY §2.10 says close the gap). */
  def write(df: DataFrame, path: String,
            delimiter: String = ",",
            header: Boolean = true): Unit =
    df.write
      .option("sep", delimiter)
      .option("header", header)
      .mode("overwrite")
      .csv(path)
}
