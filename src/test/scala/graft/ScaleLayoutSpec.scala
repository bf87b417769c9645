package graft

import java.nio.file.Files

import graft.sources.ParquetSource
import org.apache.spark.sql.functions._

/** Physical-layout levers for the 100 TB story, asserted at the PLAN
  * level (not just results): partition pruning on hive-layout writes
  * and exchange-free joins on co-bucketed tables. */
class ScaleLayoutSpec extends SparkSpecBase {
  import spark.implicits._

  test("partitioned write prunes directories on partition filters") {
    val dir = Files.createTempDirectory("part").toString + "/t"
    val df = (1 to 100).map(i => (i.toLong, s"g${i % 4}", i * 1.5)).toDF("id", "grp", "v")
    ParquetSource.savePartitioned(df, dir, Seq("grp"))
    val pruned = ParquetSource.load(spark, dir).filter(col("grp") === "g1")
    assert(pruned.count() == 25)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("g1"),
      s"partition filter not pushed:\n$scan")
  }

  test("co-bucketed tables join without an exchange") {
    val a = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"n$i")).toDF("k", "vb")
    ParquetSource.saveBucketed(a, "bkt_a", "k", 4)
    ParquetSource.saveBucketed(b, "bkt_b", "k", 4)
    // merge hint: at test scale the planner would broadcast (and skip
    // bucketing entirely); at 100 TB both sides are too big to
    // broadcast and sort-merge is what the planner picks on its own
    val joined = spark.table("bkt_a").hint("merge").join(spark.table("bkt_b"), "k")
    assert(joined.count() == 1000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange"), s"bucketed join still shuffles:\n$plan")
    assert(plan.contains("Bucketed: true"), s"scan did not use buckets:\n$plan")
  }
}
