package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The persistence pair, mirroring the reference's `save_to_file` /
  * `read_from_file` (reference: src/dataframe/dataframe.rs:767-781 —
  * bincode serialization of the whole frame). The Spark-first story is
  * parquet: columnar, compressed, splittable, statistics for pushdown —
  * the format the rest of the engine already scans.
  */
object ParquetSource {
  def save(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
