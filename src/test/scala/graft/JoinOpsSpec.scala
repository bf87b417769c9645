package graft

import java.sql.Timestamp

import graft.operators.{AsofJoin, RangeJoin}
import org.apache.spark.sql.functions._

/** Edge semantics of the time/range join operators (the registered
  * asof_join / range_join queries cover the DuckDB-oracle path). */
class JoinOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofJoinLast attaches the latest right row at or before each left ts") {
    val quotes = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 00:05:00"), 11.0),
      (2L, ts("2024-01-01 00:03:00"), 20.0)).toDF("k", "ts", "px")
    val trades = Seq(
      (100L, 1L, ts("2024-01-01 00:04:00")), // between quotes -> 10.0
      (101L, 1L, ts("2024-01-01 00:05:00")), // simultaneous -> inclusive 11.0
      (102L, 2L, ts("2024-01-01 00:01:00")), // before any quote -> null
      (103L, 3L, ts("2024-01-01 00:09:00"))  // key with no quotes -> null
    ).toDF("id", "k", "ts")
    val got = AsofJoin.asofJoinLast(trades, quotes, "k", "ts", Seq("px"))
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(got(100L) == 10.0)
    assert(got(101L) == 11.0)
    assert(got(102L) == null)
    assert(got(103L) == null)
  }

  test("pointInRange matches BETWEEN semantics incl. bounds and overlaps") {
    val points = Seq((1L, 5.0), (2L, 10.0), (3L, 25.0)).toDF("id", "p")
    val ranges = Seq((10L, 0.0, 10.0), (20L, 10.0, 20.0), (30L, 0.0, 30.0))
      .toDF("rid", "lo", "hi")
    val got = RangeJoin.pointInRange(points, "p", ranges, "lo", "hi", binWidth = 7.0)
      .select("id", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // p=5 in [0,10] and [0,30]; p=10 on the shared bound of three ranges;
    // p=25 only in [0,30]
    assert(got == Set((1L, 10L), (1L, 30L), (2L, 10L), (2L, 20L), (2L, 30L), (3L, 30L)))
  }

  test("bpeish tokenizer splits contractions, words, numbers, punct runs") {
    import graft.functions.TextFunctions._
    val got = Seq("it's 42 degrees!!").toDF("t")
      .select(bpeishTokens(col("t"))).collect()(0).getSeq[String](0)
    assert(got == Seq("it", "'s", " 42", " degrees", "!!"))
  }
}
