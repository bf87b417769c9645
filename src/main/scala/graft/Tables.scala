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
    spark.read.parquet(s"$dir/$name.parquet")
}
