package graft

/** Driver-contract invariants. These catch integration mistakes that
  * would otherwise surface only as a silently weaker correctness round:
  * a query name colliding across modules shadows one of them in the
  * flattened map; an oracle key without a query never gets compared. */
class ContractSpec extends SparkSpecBase {

  // the real module list — using SparkEntry's own, so this spec cannot
  // drift when a module is added
  private val modules = SparkEntry.modules

  test("no query name is shadowed across modules") {
    val all = modules.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"shadowed query names: $dups")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle key has a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL without a query: $dangling")
  }

  test("oracle coverage: only the approximate-by-design ops are rows-only") {
    // dedup_simhash left this set in round 6: md5-derived shingle hashes
    // made the fingerprints engine-portable, so DuckDB rebuilds them and
    // the pair list is hash-checked like everything else.
    // bpe_merges: the per-round argmax is inherently sequential — no
    // closed-form SQL oracle exists; BpeSpec pins it against a
    // sequential reference implementation instead.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("ann_cosine_lsh", "profile_sketch", "bpe_merges"),
      rowsOnly.toString)
  }

  test("query names are stable identifiers") {
    assert(SparkEntry.queries.keys.forall(_.matches("[a-z0-9_]+")))
  }

  test("flagship entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
