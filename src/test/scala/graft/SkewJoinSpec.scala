package graft

import graft.operators.{Dedup, SkewJoin}
import graft.operators.Display
import org.apache.spark.sql.functions._

/** Salted-join contract: identical results to the plain join, for any
  * salt count, including heavily skewed keys. */
class SkewJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedJoin result equals the plain join on skewed data") {
    // 90% of left rows share one hot key
    val left = (1 to 200).map(i => (if (i <= 180) 1L else i.toLong, i.toDouble)).toDF("k", "v")
    val right = Seq((1L, "hot"), (190L, "cold"), (999L, "unmatched")).toDF("rk", "name")
    val plain = left.join(right, col("k") === col("rk")).drop("rk")
    for (salts <- Seq(1, 4, 16)) {
      val salted = SkewJoin.saltedJoin(left, right, "k", "rk", salts)
      assert(Display.dfEqual(salted, plain), s"mismatch at numSalts=$salts")
    }
  }

  test("saltedJoin spreads a hot key across salt partitions") {
    val left = (1 to 1000).map(i => (1L, i)).toDF("k", "v") // single key
    val salted = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(8)))
    val buckets = salted.groupBy("_salt").count().collect()
    assert(buckets.length == 8) // all salts used
    assert(buckets.map(_.getLong(1)).max < 1000) // no single bucket holds everything
  }
}
