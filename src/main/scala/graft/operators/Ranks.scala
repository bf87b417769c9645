package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking.
  *
  * `row_number().over(Window.orderBy(...))` with no partitionBy is the
  * classic scale-killer: Spark moves EVERY row into one partition and
  * sorts it on a single core (the "No Partition Defined for Window
  * operation" warning). A global dense row number does not need a
  * global sort on one machine — the same two-pass construction as
  * [[Sampling.takeWhileBudget]]'s prefix sum applies with weight = 1:
  *
  *   1. `repartitionByRange` on the order key — a distributed range
  *      sort: partition i holds keys strictly below partition i+1, so
  *      a per-partition rank plus the count of all earlier partitions
  *      IS the global rank.
  *   2. per-partition `row_number` (parallel, partition-local sort),
  *   3. one numPartitions-row totals frame turned into broadcast
  *      exclusive offsets added back to each row's local rank.
  *
  * Counts are integers, so the two-pass sum is exactly the sequential
  * rank — no float drift, and WHERE the range partitioner cuts changes
  * nothing about any row's global rank (boundary-invariant). The one
  * single-partition window left is over the numPartitions-row offsets
  * frame, the legitimate bounded case.
  *
  * `orderCols` must be a total order (add a unique id tiebreak) or
  * ranks within ties are partitioner-dependent.
  */
object Ranks {

  /** Global 1-based row number over `orderCols`, computed with range
    * partitioning + per-partition windows + broadcast offsets — never
    * a single-partition WindowExec over the input. Returns `df` plus
    * a long column `rkCol`. */
  def globalRowNumber(df: DataFrame, orderCols: Seq[Column], rkCol: String = "rk",
                      partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
            else df.sparkSession.sparkContext.defaultParallelism
    val ranged = df.repartitionByRange(n, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
    val local = Window.partitionBy(col("__pid")).orderBy(orderCols: _*)
    val withLocal = ranged.withColumn("__lrk", row_number().over(local).cast("long"))
    // numPartitions rows — bounded input, the one place an
    // unpartitioned window is legitimate
    val offW = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withLocal.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(offW), lit(0L)))
      .select(col("__pid"), col("__off"))
    withLocal.join(broadcast(offsets), "__pid")
      .withColumn(rkCol, col("__off") + col("__lrk"))
      .drop("__pid", "__lrk", "__off")
  }
}
