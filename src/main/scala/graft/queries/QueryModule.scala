package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registry entry per operator in SURVEY.md §2 (+ north-star ops).
  *
  * Contract (driver-enforced):
  *  - `queries(name)(spark, sfDir)` returns the operator's result on the
  *    tables under `sfDir`;
  *  - `oracle(name)` is equivalent ANSI SQL DuckDB runs over the same
  *    parquet tables; column names must match the Spark result exactly.
  *  - Results are deterministically ordered and FP-noisy aggregates are
  *    rounded identically on both sides, so value hashes compare stably.
  */
trait QueryModule {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]
}
