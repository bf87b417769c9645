package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative PageRank over an edge list, in FIXED-POINT integer
  * arithmetic so the result is bit-exact across engines and cluster
  * topologies.
  *
  * Floating-point PageRank is not reproducible on a cluster: the
  * per-destination contribution sum is order-dependent, and partial
  * aggregation visits rows in a different order on every run. Scaling
  * ranks to long integers (SCALE = 1e12) makes every operation — the
  * out-degree division, the damping multiply, the contribution sum —
  * exact 64-bit arithmetic with one defined answer. Overflow headroom:
  * total mass is ~SCALE (1e12); a single node's summed contribution is
  * bounded by total mass, and the damping step multiplies by 85 before
  * dividing — max intermediate ~8.5e13, far under Long.MaxValue (9.2e18).
  *
  * Scale shape: each iteration is ONE shuffle-join of ranks against the
  * edge list on `src` plus ONE keyed aggregation on `dst` — the same
  * join+groupBy round the connected-components operators use
  * (ConnectedComponents.scala:31). Edges are never collected; the rank
  * table is one row per node. For the default small iteration counts the
  * unrolled lineage is fine; callers looping to convergence at 100 TB
  * should snapshot the rank table every few rounds exactly as
  * `ConnectedComponents.connectedComponents` checkpoints its label table.
  *
  * Dangling nodes (no out-edges) keep their rank out of circulation —
  * the classic simplified formulation; both this and the SQL oracle drop
  * the same mass, so the results agree. Reference scope: the reference
  * engine has no graph operators at all (SURVEY.md §2.11); this is part
  * of the north-star surface (duplicate-cluster authority scoring,
  * domain-graph weighting for crawl curation).
  */
object PageRank {

  val Scale: Long = 1000000000000L // 1e12 fixed-point scale

  /** Local-endgame threshold (edge count), same rationale as
    * ConnectedComponents.LocalFinishEdges but sized for PageRank's
    * costs: the driver loop is iters × edges hash operations (~20M ops
    * per iteration at this cap — well under a second) over ~4M
    * collected pairs (~100s of MB with object overhead, comfortable in
    * any driver). Below it, every distributed round — a join plus a
    * keyed aggregation — is pure scheduling overhead. */
  val LocalFinishEdges: Long = 1L << 22

  /** Ranks after `iters` rounds over `edges(src, dst)` (string node ids,
    * duplicate edges ignored). Returns (node, rank_scaled) where
    * rank_scaled is the fixed-point rank; ranks sum to ≤ SCALE (dangling
    * leakage). The node count feeding the base rank is read once off
    * the persisted node set and folded in as a literal — one tiny count
    * job against disk blocks the loop reuses anyway, instead of a
    * broadcast-nested-loop stage per round for a number that never
    * changes.
    *
    * CACHE CONTRACT: the returned plan reads two DISK_ONLY-persisted
    * invariants (degree-annotated edges, node set) that stay registered
    * for the session so the lazy result can be executed any number of
    * times. Callers that invoke this repeatedly (loops, services)
    * should use [[withRanks]], which releases them deterministically.
    *
    * LOCAL ENDGAME (same pattern, threshold and rationale as
    * ConnectedComponents.LocalFinishEdges): when the deduped edge list
    * fits trivially on the driver, every distributed round is pure
    * scheduling overhead — one collect plus the identical fixed-point
    * loop replaces iters×(join+agg). The arithmetic is the same
    * integer expression, so local and distributed paths are bit-equal
    * (spec-pinned); pass `localFinishEdges = 0` to force the
    * distributed path.
    */
  def ranks(edges: DataFrame, iters: Int,
            localFinishEdges: Long = LocalFinishEdges,
            assumeDistinct: Boolean = false): DataFrame =
    buildRanks(edges, iters, localFinishEdges, assumeDistinct)._1

  /** Materialize-and-release bracket around [[ranks]]: runs `action`
    * on the rank table (collect it, write it, aggregate it — whatever
    * consumes the result), then unpersists the loop invariants before
    * returning. After this returns, no RDD persisted by this call is
    * still registered — the leak-free variant for repeated calls. */
  def withRanks[T](edges: DataFrame, iters: Int)(action: DataFrame => T): T = {
    val (rank, pinned) = buildRanks(edges, iters, LocalFinishEdges, assumeDistinct = false)
    try action(rank)
    finally pinned.foreach(_.unpersist(blocking = true))
  }

  /** Driver-side fixed-point loop over a collected edge list — the
    * identical integer arithmetic as the distributed plan, expression
    * for expression ([[ranksSql]] documents the shared formula).
    * Integer addition is exactly associative, so the HashMap
    * accumulation order cannot diverge from the distributed sum — the
    * same property that makes the operator reproducible at all.
    * Node ids stay whatever type the input column had. */
  private def localRanks(spark: org.apache.spark.sql.SparkSession,
                         nodeType: org.apache.spark.sql.types.DataType,
                         edges: Array[(Any, Any)], iters: Int): DataFrame = {
    // Node ids interned to dense ints once; the loop then runs on
    // primitive Long arrays. The arithmetic is expression-for-expression
    // the distributed plan's (`rank div deg` per edge, damp per node) —
    // integer ops on a different container cannot change a bit, and the
    // local-vs-distributed equivalence spec pins that. The array form
    // exists because a boxed HashMap loop over millions of edges was
    // the measurable half of the endgame's cost at the 4M-edge cap.
    val index = new java.util.HashMap[Any, Integer]()
    val nodeBuf = scala.collection.mutable.ArrayBuffer.empty[Any]
    def intern(v: Any): Int = {
      val got = index.get(v)
      if (got != null) got.intValue()
      else { val i = nodeBuf.length; index.put(v, Integer.valueOf(i)); nodeBuf += v; i }
    }
    val m = edges.length
    val esrc = new Array[Int](m)
    val edst = new Array[Int](m)
    var i = 0
    while (i < m) { esrc(i) = intern(edges(i)._1); edst(i) = intern(edges(i)._2); i += 1 }
    val nn = nodeBuf.length.toLong
    val deg = new Array[Long](nodeBuf.length)
    i = 0; while (i < m) { deg(esrc(i)) += 1L; i += 1 }
    var rank = Array.fill(nodeBuf.length)(Scale / nn)
    for (_ <- 1 to iters) {
      val contrib = new Array[Long](nodeBuf.length)
      i = 0
      while (i < m) { contrib(edst(i)) += rank(esrc(i)) / deg(esrc(i)); i += 1 }
      val next = new Array[Long](nodeBuf.length)
      var v = 0
      while (v < next.length) {
        next(v) = (15L * (Scale / nn)) / 100L + (85L * contrib(v)) / 100L
        v += 1
      }
      rank = next
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", nodeType, nullable = true),
      org.apache.spark.sql.types.StructField("rank_scaled",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val rows: java.util.List[org.apache.spark.sql.Row] =
      scala.jdk.CollectionConverters.SeqHasAsJava(
        nodeBuf.indices.map(v => org.apache.spark.sql.Row(nodeBuf(v), rank(v)))).asJava
    spark.createDataFrame(rows, schema)
  }

  private def buildRanks(edges: DataFrame, iters: Int,
                         localFinishEdges: Long,
                         assumeDistinct: Boolean): (DataFrame, Seq[DataFrame]) = {
    require(iters >= 1)
    // The loop invariants — the deduped edge list, the degree-annotated
    // edge list (one row per edge carrying its source's out-degree) and
    // the node set — are persisted DISK_ONLY and re-scanned per
    // iteration. Disk-persisted blocks keep their lineage (an executor
    // loss recomputes, unlike localCheckpoint) and are NOT subject to
    // memory-pressure eviction: MEMORY_AND_DISK here jittered 2.6× in a
    // busy session when the store evicted edge blocks back into
    // recomputation, while a 100 TB edge list was never going to live
    // in executor memory anyway — disk-resident scans per round are the
    // honest steady state.
    val lvl = org.apache.spark.storage.StorageLevel.DISK_ONLY
    // the endgame decision rides the SAME materialization the
    // distributed path needs anyway (the e cache serves both ed builds
    // below), so probing costs nothing extra — the CC pattern
    // `assumeDistinct` skips the dedup shuffle for callers whose edge
    // construction is distinct by construction (e.g. a distinct pair
    // set unioned in two disjoint directions) — the degree counts and
    // contribution sums would silently double-count duplicates, so the
    // default stays the safe full distinct.
    val e0 = edges.select(col("src"), col("dst"))
    val e = (if (assumeDistinct) e0 else e0.distinct()).persist(lvl)
    if (localFinishEdges > 0 && e.count() <= localFinishEdges) {
      val collected = e.collect().map(r => (r.get(0), r.get(1)))
      val nodeType = e.schema.head.dataType
      e.unpersist(blocking = false)
      return (localRanks(edges.sparkSession, nodeType, collected, iters), Nil)
    }
    val ed = e.join(e.groupBy(col("src")).agg(count(lit(1)).as("deg")), "src")
      .persist(lvl)
    // node set derived from the persisted edge list, not from `e` — the
    // upstream distinct is paid once, the disk blocks serve both
    val nodes = ed.select(col("src").as("node"))
      .union(ed.select(col("dst"))).distinct()
      .persist(lvl)

    // rank' = (15 * (SCALE div N)) div 100  +  (85 * Σ contrib) div 100,
    // contrib = rank div deg. Every div is integer; the oracle repeats
    // the identical expression text. N is read once off the persisted
    // node set (the count rides disk blocks the loop reuses anyway) and
    // folded in as a literal: the former per-round one-row crossJoin
    // cost a broadcast-nested-loop stage every iteration for a number
    // that never changes.
    //
    // Per-iteration shape: the rank table is one SMALL row per node while
    // `ed` is one row per edge, so the join wants rank on the build side
    // (AQE picks broadcast from runtime stats; no hardcoded hint — at
    // billions of nodes it degrades gracefully to a shuffled join).
    // Missing destinations get their zero via the union of explicit zero
    // rows instead of a post-hoc left join: one join + one keyed
    // aggregation per round, nothing else.
    //
    // Each round's rank table is persisted (DISK_ONLY, same rationale
    // as the invariants): the cache boundary stops Catalyst from
    // re-analyzing and re-optimizing an iters-deep nested join tree as
    // one enormous plan — planning cost goes linear in iters instead of
    // superlinear, which at the 10× fixture was most of the ~11s/round
    // fixed overhead. The intermediate caches are handed back in the
    // pinned list, so `withRanks` (and the operator specs) release them
    // deterministically; the BPE learner's deferred handover
    // (BpeTrainer.scala) is the same pattern with an eager per-round
    // action, which PageRank deliberately avoids — the caller's single
    // action materializes the whole chain bottom-up.
    val nn = nodes.count()
    // An empty edge list would otherwise surface as a raw
    // ArithmeticException from Scale / nn at plan-build time.
    require(nn > 0, "pagerank: empty node set (no edges)")
    var rank = nodes
      .select(col("node"), lit(Scale / nn).as("rank"))
    val base = (15L * (Scale / nn)) / 100L
    val rounds = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (_ <- 1 to iters) {
      // `div`, not `/`: long / long in Spark is DOUBLE division, and at
      // rank ~1e12 a double's ulp (~1.2e-4) exceeds 1/deg for large
      // degrees — the cast-back could round across an integer boundary.
      val contribs = ed.join(rank, col("src") === col("node"))
        .select(col("dst"), expr("rank div deg").as("contrib"))
      rank = contribs
        .union(nodes.select(col("node").as("dst"), lit(0L).as("contrib")))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("c"))
        .select(col("dst").as("node"),
          expr(s"${base}L + (85 * c) div 100").as("rank"))
        .persist(lvl)
      rounds += rank
    }
    (rank.withColumnRenamed("rank", "rank_scaled"),
      Seq(e, ed, nodes) ++ rounds.toSeq)
  }

  /** The identical computation as chained SQL CTEs (aggregates are not
    * allowed in a recursive CTE's recursive term in most engines, so the
    * fixed iteration count is unrolled). `edgesSql` must yield (src, dst)
    * without duplicates; `nNodesSql` a scalar subquery for N.
    */
  def ranksSql(edgesSql: String, iters: Int): String = {
    val prelude =
      s"""WITH e AS ($edgesSql),
         nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         nn AS (SELECT count(*) AS n FROM nodes),
         deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
         r0 AS (SELECT node, $Scale // (SELECT n FROM nn) AS rank FROM nodes)"""
    val steps = (1 to iters).map { i =>
      s""" r$i AS (
           SELECT nodes.node,
                  (15 * ($Scale // (SELECT n FROM nn))) // 100
                  + (85 * coalesce(s.c, 0)) // 100 AS rank
           FROM nodes LEFT JOIN (
             SELECT e.dst, sum(r.rank // deg.deg) AS c
             FROM r${i - 1} r JOIN deg ON r.node = deg.src
                              JOIN e ON r.node = e.src
             GROUP BY e.dst) s ON nodes.node = s.dst)"""
    }
    (prelude +: steps).mkString(",\n") +
      s"\nSELECT node, CAST(rank AS BIGINT) AS rank_scaled FROM r$iters"
  }
}
