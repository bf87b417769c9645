package graft

import graft.operators.Quality
import org.apache.spark.sql.functions._

/** Contracts for the data-quality audit: null predicates are
  * violations, all rules of one audit evaluate in a single aggregate
  * (no per-rule re-scan), and the uniqueness/referential checks count
  * exactly the offending rows. */
class QualitySpec extends SparkSpecBase {
  import spark.implicits._

  private def t = Seq(
    (1L, 10.0, "a"), (2L, -5.0, "b"), (3L, 7.0, null.asInstanceOf[String]),
    (4L, Double.NaN, "a"), (5L, 3.0, "zz")
  ).toDF("id", "v", "cat")

  test("audit counts failures and NULL predicate results as violations") {
    val out = Quality.audit(t, "t", Seq(
        "v_positive" -> (col("v") > 0),
        "cat_present" -> col("cat").isNotNull,
        "cat_short" -> (length(col("cat")) <= 1)))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    // -5 fails; NaN passes (Spark orders NaN greater than any value)
    assert(out("t.v_positive") == 1L)
    assert(out("t.cat_present") == 1L)    // the null cat
    // length(null) is NULL -> violation; "zz" fails outright
    assert(out("t.cat_short") == 2L)
  }

  test("audit evaluates all rules in one aggregate over one scan") {
    val plan = Quality.audit(t, "t", Seq(
        "a" -> (col("v") > 0), "b" -> col("cat").isNotNull, "c" -> (col("id") < 100)))
      .queryExecution.executedPlan.toString
    // one partial + one final aggregate, regardless of rule count
    assert("HashAggregate".r.findAllIn(plan).length == 2, s"plan re-aggregates:\n$plan")
    assert(!plan.contains("Union"), s"plan re-scans per rule:\n$plan")
  }

  test("uniqueKeys counts rows beyond the first per key") {
    val d = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val r = Quality.uniqueKeys(d, "d", Seq("k")).collect()(0)
    assert(r.getLong(1) == 6L && r.getLong(2) == 3L) // 2 extra 1s + 1 extra 3
  }

  test("orphans counts unmatched and NULL foreign keys, ignoring parent duplicates") {
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val parent = Seq(1L, 1L, 2L).toDF("pk") // duplicated pk must not inflate counts
    val r = Quality.orphans(child, "c", "fk", parent, "pk").collect()(0)
    assert(r.getLong(1) == 4L, s"n_rows ${r.getLong(1)}")
    assert(r.getLong(2) == 2L, s"violations ${r.getLong(2)}") // the 9 and the NULL
  }
}
