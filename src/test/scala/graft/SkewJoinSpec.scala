package graft

import graft.operators.{Display, SkewJoin}
import org.apache.spark.sql.functions._

/** Salted-join contract: identical results to the plain join, for any
  * salt count and any hot threshold, including heavily skewed keys —
  * and replication confined to the hot path. */
class SkewJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private val left =
    (1 to 200).map(i => (if (i <= 180) 1L else i.toLong, i.toDouble)).toDF("k", "v")
  private val right = Seq((1L, "hot"), (190L, "cold"), (999L, "unmatched")).toDF("rk", "name")
  private val plain = left.join(right, col("k") === col("rk")).drop("rk")

  test("saltedJoin result equals the plain join on skewed data") {
    for (salts <- Seq(1, 4, 16); threshold <- Seq(1L, 50L, 1000000L)) {
      val salted = SkewJoin.saltedJoin(left, right, "k", "rk", salts, threshold)
      assert(Display.dfEqual(salted, plain), s"mismatch at numSalts=$salts threshold=$threshold")
    }
  }

  test("saltedJoin with explicit knownHotKeys equals the plain join") {
    val salted = SkewJoin.saltedJoin(left, right, "k", "rk", 8,
      knownHotKeys = Some(Seq(1L)))
    assert(Display.dfEqual(salted, plain))
  }

  test("cold path carries no replication explode; hot path exactly one") {
    // threshold above every key count -> everything cold: the hot branch
    // is empty and the only Generate in the plan feeds zero rows, so
    // shuffle volume equals the plain join's. threshold=1 -> everything
    // hot: exactly one Generate replicates the (tiny) hot right side.
    for (threshold <- Seq(1L, 1000000L)) {
      val planStr = SkewJoin.saltedJoin(left, right, "k", "rk", 8, threshold)
        .queryExecution.optimizedPlan.toString
      val generates = "(?m)^\\s*[+:]?-* ?Generate ".r.findAllIn(planStr).size +
        (if (planStr.startsWith("Generate ")) 1 else 0)
      assert(generates == 1, s"expected exactly 1 Generate (hot path only), got $generates:\n$planStr")
      // the explode input must be semi-join-bounded (hot rows only),
      // never the raw right relation
      assert(planStr.contains("LeftSemi"), planStr)
    }
  }

  test("positional salt spreads IDENTICAL duplicate rows of one hot key") {
    // 1000 bit-identical rows: a content-derived salt (the old design)
    // would put them all in one bucket; the positional salt must not.
    val dup = (1 to 1000).map(_ => (1L, 7)).toDF("k", "v")
    val salted = dup.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(8L)))
    val buckets = salted.groupBy("_salt").count().collect()
    assert(buckets.length > 1, "all duplicate rows landed on one salt")
    assert(buckets.map(_.getLong(1)).max < 1000)
  }
}
