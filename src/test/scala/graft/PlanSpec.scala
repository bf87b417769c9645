package graft

/** Plan-shape regression guards for the queries whose PHYSICAL strategy
  * is the point: a refactor that silently turns a broadcast join into a
  * shuffle, or a top-k into a global sort, would keep results green
  * while ruining the 100 TB story — these specs fail instead. */
class PlanSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q1_agg aggregates map-side before the exchange") {
    val p = planOf("q1_agg")
    assert(p.contains("partial_sum"), p.take(500))
  }

  test("join_star broadcasts every dimension") {
    val p = planOf("join_star")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(800))
  }

  test("sort_topk and knn_cosine use TakeOrderedAndProject, not a global sort") {
    assert(planOf("sort_topk").contains("TakeOrderedAndProject"))
    assert(planOf("knn_cosine").contains("TakeOrderedAndProject"))
  }

  test("positional access stays in Catalyst (no RDD scan)") {
    val p = planOf("parity_cell_get")
    assert(!p.contains("Scan ExistingRDD"), p.take(500))
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
  }

  test("dedup scans filter on the cheap token-count predicate only") {
    // the expensive chain (shingles/signatures) must not appear in a
    // scan-level filter (the InferFiltersFromGenerate trap)
    val p = planOf("dedup_minhash")
    val scanFilters = p.linesIterator.filter(_.contains("Filter")).mkString("\n")
    assert(!scanFilters.contains("minhash_signature"), scanFilters.take(600))
  }
}
