package graft.tools

import graft.{GraftSession, SparkEntry}

/** Row-count (and optional explain) probe for any registered query at
  * any sf dir — the scale-debugging counterpart of DebugPlan, which is
  * pinned to sf0.001. Usage:
  *   runMain graft.tools.DebugCount <sfDir> <query> [<query> ...]
  */
object DebugCount {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DebugCount <sfDir> <query>...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt, args.headOption).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try args.tail.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, args.head).count()
      println(f"[count] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    } finally spark.stop()
  }
}
