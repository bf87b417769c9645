package graft

import graft.operators.PlanAudit
import org.apache.spark.sql.functions._

/** PlanAudit reads the physical plan, so every fixture here goes
  * through real parquet scans (in-memory DataFrames have no
  * FileSourceScan to audit). */
class PlanAuditSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def find(df: org.apache.spark.sql.DataFrame, check: String) =
    PlanAudit.audit(df).collect()
      .find(_.getString(0) == check).get

  test("broadcast-joined star query audits clean") {
    val q = Tables(spark, dir, "lineitem")
      .join(broadcast(Tables(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name")).agg(sum(col("l_quantity")).as("q"))
    val cart = find(q, "cartesian_products")
    assert(cart.getString(1) == "ok" && cart.getLong(2) == 0L)
    assert(find(q, "broadcast_joins").getLong(2) >= 1L)
    assert(PlanAudit.clean(q))
  }

  test("a deliberate cross join fails the audit") {
    // force the genuinely two-sided-streamed form: with auto-broadcast
    // off, a no-condition inner join plans CartesianProductExec
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val q = Tables(spark, dir, "region").crossJoin(Tables(spark, dir, "nation"))
      val cart = find(q, "cartesian_products")
      assert(cart.getString(1) == "fail" && cart.getLong(2) >= 1L)
      assert(!PlanAudit.clean(q))
    } finally spark.conf.set(key, prev)
  }

  test("a bounded corpus x broadcast-probe product warns, not fails") {
    // the brute-force k-NN shape: every row against a small broadcast
    // probe set — linear with a small constant, legitimate by design
    val emb = Tables(spark, dir, "embeddings")
    val probes = broadcast(emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("p"), col("embedding").as("pv")))
    val q = emb.crossJoin(probes).filter(col("vec_id") =!= col("p"))
    val b = find(q, "broadcast_nested_loops")
    assert(b.getString(1) == "warn" && b.getLong(2) >= 1L)
    assert(find(q, "cartesian_products").getLong(2) == 0L)
    assert(PlanAudit.clean(q)) // warn does not fail the gate
  }

  test("column pruning is visible: narrow projection vs select-star scan") {
    val narrow = Tables(spark, dir, "documents").select(col("doc_id"))
    assert(find(narrow, "unpruned_scans").getLong(2) == 0L)
    val wide = Tables(spark, dir, "documents")
    val w = find(wide, "unpruned_scans")
    assert(w.getLong(2) >= 1L && w.getString(3).contains("documents"))
  }

  test("pushed filters clear the unfiltered-scan count") {
    val filtered = Tables(spark, dir, "orders")
      .filter(col("o_totalprice") > 100000.0).select(col("o_orderkey"))
    assert(find(filtered, "unfiltered_wide_scans").getLong(2) == 0L)
  }

  test("scalar cross-joins (global-aggregate broadcast side) are not flagged as cartesian") {
    // the deliberate "cross-join a total in" pattern: output cardinality
    // equals the streamed side, so it must audit clean
    val docs = Tables(spark, dir, "documents")
    val total = docs.agg(count(lit(1)).as("n"))
    val q = docs.crossJoin(broadcast(total))
      .select(col("doc_id"), (col("doc_id") / col("n")).as("f"))
    val cart = find(q, "cartesian_products")
    assert(cart.getString(1) == "ok" && cart.getLong(2) == 0L, cart.toString)
  }

  test("the FULL query surface sweeps clean of cartesian products") {
    // Every registered query: none may plan a genuine row-product join
    // at sf0.001 (scalar/one-row cross joins are already excluded by
    // the check itself; corpus x broadcast-set products surface as
    // `warn`, not `fail`). This replaces the round-10 join-shaped
    // subset — the manual claim "crossJoin only against broadcast
    // one-row/probe/centroid frames" is now a machine check over the
    // whole surface, like the window sweep below. (PlanSpec pins
    // chosen shapes in detail; this is the breadth gate.)
    val names = SparkEntry.queries.keys.toSeq.sorted
    val dirty = names.filterNot { n =>
      PlanAudit.clean(SparkEntry.queries(n)(spark, dir))
    }
    assert(dirty.isEmpty, s"cartesian-product plans: $dirty")
  }

  test("unpartitioned corpus-scale windows are flagged; bounded shapes are not") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables(spark, dir, "documents")
    // the scale-killer shape: a global rank over unbounded input
    val bad = docs.select(col("doc_id"))
      .withColumn("rk", row_number().over(Window.orderBy(col("doc_id"))))
    val flagged = find(bad, "single_partition_windows")
    assert(flagged.getString(1) == "warn" && flagged.getLong(2) >= 1L)
    // rank-the-survivors: a limit below the window bounds it
    val limited = docs.select(col("doc_id")).orderBy(col("doc_id")).limit(100)
      .withColumn("rk", row_number().over(Window.orderBy(col("doc_id"))))
    assert(find(limited, "single_partition_windows").getLong(2) == 0L)
    // the distributed-rank construction: its one unpartitioned window
    // sits over the __pid-grouped offsets frame — recognized as bounded
    val ranked = graft.operators.Ranks.globalRowNumber(
      docs.select(col("doc_id")), Seq(col("doc_id")))
    assert(find(ranked, "single_partition_windows").getLong(2) == 0L)
    // an aggregate on an ARBITRARY key does not bound anything — this is
    // exactly the pre-fix record_linkage shape (rank over a groupBy of a
    // vocabulary-sized key) and must stay flagged
    val aggBad = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(Window.orderBy(col("source"))))
    assert(find(aggBad, "single_partition_windows").getLong(2) >= 1L)
  }

  test("the full query surface is free of unproven single-partition windows") {
    // Bounded in fact but not provable in the plan — each whitelisted
    // window runs over an aggregate of a SMALL-DOMAIN key:
    //  - vocab_growth: cumsum over 10 decile rows (floor(x*10/n) in 0..10)
    //  - mix_temperature / curation_pipeline_v2: temperatureMix's
    //    deterministic prefix-sum fold over the per-SOURCE frame (the
    //    source column's domain is the handful of corpus sources; the
    //    ordered fold is deliberate — float summation order pins rates)
    val whitelist = Set("vocab_growth", "mix_temperature", "curation_pipeline_v2")
    val dirty = SparkEntry.queries.keys.toSeq.sorted.flatMap { n =>
      val r = find(SparkEntry.queries(n)(spark, dir), "single_partition_windows")
      if (r.getLong(2) > 0 && !whitelist.contains(n)) Some(s"$n${r.getString(3)}")
      else None
    }
    assert(dirty.isEmpty, s"unbounded single-partition windows: $dirty")
  }

  test("shuffle and join counters reflect the plan shape") {
    // big-big equi-join: at least one shuffled join or (under AQE
    // stats) a broadcast join; either way no cartesian and >= 1
    // exchange feeding the aggregation
    val q = Tables(spark, dir, "lineitem")
      .join(Tables(spark, dir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
    val joins = find(q, "shuffled_joins").getLong(2) +
      find(q, "broadcast_joins").getLong(2)
    assert(joins >= 1L)
    assert(find(q, "shuffle_exchanges").getLong(2) >= 1L)
    assert(find(q, "cartesian_products").getLong(2) == 0L)
  }
}
