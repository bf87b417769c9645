package graft.tools

import graft.{GraftSession, SparkEntry}

/** Execute one registered query through the noop sink at any sf dir and
  * print the AQE-final physical plan — on success or failure. The plan
  * a failing 10x run actually executed is otherwise invisible
  * (DebugPlan shows only the static plan at sf0.001).
  * Usage: runMain graft.tools.DebugExec <sfDir> <query>
  */
object DebugExec {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DebugExec <sfDir> <query>...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt, args.headOption).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { name =>
      // plan construction inside the try too: fail-fast guards (the
      // dedup disk-budget refusal) throw before a plan exists
      var df: Option[org.apache.spark.sql.DataFrame] = None
      try {
        df = Some(SparkEntry.queries(name)(spark, args.head))
        df.get.write.format("noop").mode("overwrite").save()
        println(s"[exec] $name SUCCEEDED")
      } catch {
        case e: Throwable =>
          println(s"[exec] $name FAILED: ${e.getMessage}")
          df.foreach(d => println(d.queryExecution.executedPlan.toString))
      }
      // post-query leak audit: anything still pinned in the block
      // manager shows up here (cached RDDs, lingering localCheckpoints)
      val rdds = spark.sparkContext.getRDDStorageInfo
      println(s"[storage] ${rdds.length} persisted RDDs after $name")
      rdds.sortBy(-_.memSize).take(10).foreach { i =>
        println(f"[storage]   rdd=${i.id}%6d mem=${i.memSize / 1048576.0}%9.1f MB " +
          f"disk=${i.diskSize / 1048576.0}%9.1f MB parts=${i.numCachedPartitions} ${i.name}")
      }
      val mem = spark.sparkContext.getExecutorMemoryStatus
      mem.foreach { case (k, (max, free)) =>
        println(f"[storage]   blockmgr $k max=${max / 1048576.0}%9.1f MB free=${free / 1048576.0}%9.1f MB")
      }
    }
    spark.stop()
  }
}
