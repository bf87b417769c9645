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

  /** PER-GROUP 1-based row number over `orderCols` — the distributed
    * escalation of `row_number().over(Window.partitionBy(group)
    * .orderBy(...))` for LOW-CARDINALITY groups over corpus-scale
    * input, where the plain window sorts each group's entire slice in
    * one partition (5 event types on 1000 executors = 5 working
    * cores). Same construction as [[globalRowNumber]] with the range
    * partitioner keyed on (group, order): a group spans a contiguous
    * run of partitions, so per-(partition, group) local ranks plus the
    * group's exclusive prefix of earlier-partition counts IS the
    * in-group rank. The offsets frame (~numPartitions + numGroups
    * rows, aggregated) carries a per-GROUP window — bounded input,
    * partitioned spec. `groupCols` are names (they become join keys);
    * `orderCols` must totally order rows within a group. */
  def groupRowNumber(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
                     rkCol: String = "rk", partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
            else df.sparkSession.sparkContext.defaultParallelism
    val keys = groupCols.map(col) ++ orderCols
    val ranged = df.repartitionByRange(n, keys: _*)
      .withColumn("__pid", spark_partition_id())
    val local = Window.partitionBy(col("__pid") +: groupCols.map(col): _*)
      .orderBy(orderCols: _*)
    val withLocal = ranged.withColumn("__lrk", row_number().over(local).cast("long"))
    val offW = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withLocal.groupBy(col("__pid") +: groupCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(offW), lit(0L)))
      .select(col("__pid") +: groupCols.map(col) :+ col("__off"): _*)
    withLocal.join(broadcast(offsets), "__pid" +: groupCols)
      .withColumn(rkCol, col("__off") + col("__lrk"))
      .drop("__pid", "__lrk", "__off")
  }

  /** PER-GROUP EXCLUSIVE running sum of `weight` (cast to long) over
    * `orderCols` — [[Sampling.takeWhileBudget]]'s distributed prefix
    * sum generalized to groups, for running sums whose group key has
    * LOW cardinality (a 4-shard packing run on 1000 executors = 4
    * working cores under the plain window). Same two-pass shape as
    * [[groupRowNumber]]: range partition on (group, order),
    * per-(partition, group) local exclusive sums, per-group broadcast
    * offsets. Integer weights make the partitioned sum BIT-equal to a
    * sequential scan (float weights would drift in the last ulp
    * between groupings). Adds `cumCol` = weight mass BEFORE each row
    * within its group. */
  def groupRunningSum(df: DataFrame, groupCols: Seq[String], orderCols: Seq[Column],
                      weight: Column, cumCol: String = "cum_before",
                      partitions: Int = 0): DataFrame = {
    val n = if (partitions > 0) partitions
            else df.sparkSession.sparkContext.defaultParallelism
    val keys = groupCols.map(col) ++ orderCols
    val ranged = df.repartitionByRange(n, keys: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__w", weight.cast("long"))
    val local = Window.partitionBy(col("__pid") +: groupCols.map(col): _*)
      .orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val withLocal = ranged.withColumn("__lcum",
      coalesce(sum(col("__w")).over(local), lit(0L)))
    val offW = Window.partitionBy(groupCols.map(col): _*).orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withLocal.groupBy(col("__pid") +: groupCols.map(col): _*)
      .agg(sum(col("__w")).as("__tot"))
      .withColumn("__off", coalesce(sum(col("__tot")).over(offW), lit(0L)))
      .select(col("__pid") +: groupCols.map(col) :+ col("__off"): _*)
    withLocal.join(broadcast(offsets), "__pid" +: groupCols)
      .withColumn(cumCol, col("__lcum") + col("__off"))
      .drop("__pid", "__w", "__lcum", "__off")
  }
}
