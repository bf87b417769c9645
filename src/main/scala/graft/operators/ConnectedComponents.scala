package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the step a dedup pipeline runs AFTER pair generation: near-duplicate
  * PAIRS (i, j) become duplicate CLUSTERS (doc, cluster = min reachable
  * id), so "keep one per cluster" is a groupBy instead of an ad-hoc
  * keep-the-lower-id rule that breaks on chains (a~b, b~c must collapse
  * to ONE kept doc even when (a, c) was never emitted as a pair).
  *
  * Each round is fully distributed: one shuffle join (edge messages) +
  * one groupBy (min per node); the driver only orchestrates the loop.
  * Rounds needed = graph diameter, the right trade for dedup graphs
  * (near-dup clusters are small cliques/chains, diameter ~ 1-3). For
  * high-diameter graphs at 100 TB the known upgrade is star-contraction
  * (large-star/small-star, Kiveris et al.), which converges in
  * O(log^2 n) rounds with the same per-round join+groupBy shape.
  *
  * Convergence test costs one tiny aggregate, not a diff join: labels
  * only ever decrease, so an unchanged sum(label) is proof of a global
  * fixpoint (sum in DECIMAL so the proof can't be fooled by overflow or
  * FP cancellation at cluster scale).
  *
  * Lineage policy (fault tolerance at cluster scale), two different
  * treatments for two different roles:
  *
  *  - LOOP INVARIANTS (edge/node sets — reread every round, never
  *    change): `persist(MEMORY_AND_DISK)` with lineage INTACT,
  *    materialized once, UNPERSISTED before returning. Cached blocks
  *    serve every round; a lost executor recomputes its blocks from
  *    the upstream plan — fault-tolerant at zero snapshot cost. The
  *    prompt unpersist matters: cached entries are consulted by every
  *    later query's planning (`sameResult` scans against the enormous
  *    near-dup pipeline plan measurably taxed the whole session), so
  *    nothing may outlive the call. Alternatives measured and
  *    rejected: `Dataset.checkpoint()` re-executes the full lineage in
  *    a second non-AQE job (50x the round 5 bench figure); an eager
  *    parquet snapshot of the input re-runs pair generation once per
  *    operator call (3-10x).
  *  - ITERATED STATE (labels / contracted edges): lineage MUST be
  *    truncated every round (plans would otherwise nest `iterations`
  *    deep), which forfeits recompute — so `localCheckpoint` between
  *    rounds and a durable PARQUET snapshot into the checkpoint dir
  *    every `ReliableEvery`-th round (the write IS the materialization;
  *    the state is small — one row per node/edge of the duplicate
  *    graph). A lost executor costs at most `ReliableEvery` rounds of
  *    replay from the last durable snapshot, not the whole job. On a
  *    cluster, point `sparkContext.setCheckpointDir` at HDFS/object
  *    storage; if unset, a local temp dir is provisioned so local runs
  *    work out of the box.
  */
object ConnectedComponents {

  /** Reliable-checkpoint cadence: rounds between durable snapshots of
    * the iterated state. Dedup graphs converge in 3-4 rounds, so the
    * default takes exactly one durable snapshot per typical run —
    * bounded replay at one checkpoint's cost. */
  val ReliableEvery: Int = 3

  /** Local-endgame threshold (edge count): when the — possibly already
    * contracted — edge set fits comfortably on the driver, one collect
    * plus an in-memory union-find replaces the remaining distributed
    * rounds. Every per-round shuffle costs fixed scheduling latency
    * regardless of data volume, so below this size the distributed loop
    * is pure overhead; this is the same endgame the MapReduce CC papers
    * apply to their final rounds (finish locally once the frontier is
    * small). 1M edges ≈ 16 MB of long pairs — far below any driver
    * budget, far above every dedup graph a 100 TB corpus produces AFTER
    * pair generation (duplicate clusters are sparse by construction).
    * Both algorithms take it as a parameter; pass 0 to force the fully
    * distributed path (the equivalence specs do). */
  val LocalFinishEdges: Long = 1L << 20

  /** Driver-side min-label union-find over a collected edge list:
    * path-halving find, union by attaching the larger root to the
    * smaller (labels must be the component MINIMUM, so the smaller id
    * always wins root). Returns (node, cluster) rows. */
  private def localComponents(edges: Array[(Long, Long)]): Seq[(Long, Long)] = {
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) { // path-halving
        val gp = parent.getOrElse(p, p)
        parent(x) = gp; x = gp; p = parent.getOrElse(x, x)
      }
      x
    }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { if (ru < rv) parent(rv) = ru else parent(ru) = rv }
      else { parent.getOrElseUpdate(u, ru); parent.getOrElseUpdate(v, rv) }
    }
    val nodes = edges.iterator.flatMap(e => Iterator(e._1, e._2)).toSet
    nodes.toSeq.map(n => (n, find(n)))
  }

  private def finishLocally(edgePairs: DataFrame): DataFrame = {
    val spark = edgePairs.sparkSession
    import spark.implicits._
    val collected = edgePairs.as[(Long, Long)].collect()
    localComponents(collected).toDF("node", "cluster")
  }

  private def ensureCheckpointDir(df: DataFrame): Unit = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.setCheckpointDir(
        java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString)
  }

  /** Durable snapshot: parquet round-trip into the checkpoint dir (see
    * the object scaladoc for why not checkpoint()/persist()). One write
    * job materializes the plan; the returned frame reads the files. */
  private def durable(df: DataFrame, tag: String): DataFrame = {
    ensureCheckpointDir(df)
    val spark = df.sparkSession
    val path = spark.sparkContext.getCheckpointDir.get +
      s"/graft-cc-$tag-${java.util.UUID.randomUUID()}"
    df.write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  /** Loop-invariant materialization: cached with lineage intact; the
    * CALLER must unpersist before returning (see object scaladoc). */
  private def invariant(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }

  /** Per-round barrier for the iterated state: durable every
    * ReliableEvery-th round, fast executor-local otherwise. `round` is
    * 0-based. */
  private def roundBarrier(df: DataFrame, round: Int, tag: String): DataFrame =
    if (round % ReliableEvery == ReliableEvery - 1) durable(df, tag)
    else df.localCheckpoint(true)

  /** Edge list (srcCol, dstCol; undirected, ids long) -> one row per
    * distinct node: (node, cluster), cluster = min node id reachable. */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 20,
                          localFinishEdges: Long = LocalFinishEdges): DataFrame = {
    // loop-invariant: one materialization of the (typically expensive)
    // upstream pair pipeline. Bidirectionalizing via explode, NOT
    // union(pairs, pairs.reversed): a union re-executes the whole pair
    // pipeline for its second branch whenever exchange reuse doesn't
    // apply, doubling the dominant cost; the explode emits both
    // directions from ONE pass over the pairs.
    val bidir = invariant(
      edges.select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
        .select(explode(array(
          struct(col("u"), col("v")),
          struct(col("v").as("u"), col("u").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .distinct())
    // local endgame: below the threshold the remaining rounds are pure
    // scheduling overhead — collect once, union-find, done
    if (bidir.count() <= localFinishEdges) {
      val result = finishLocally(bidir)
      bidir.unpersist(blocking = false)
      return result
    }
    var labels = bidir.select(col("u").as("node"), col("u").as("cluster")).distinct()
      .localCheckpoint(true)
    var lastSum: java.math.BigDecimal = null
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbor messages: node v hears u's current label for every edge (u, v)
      val msgs = bidir.join(labels, col("u") === col("node"))
        .select(col("v").as("node"), col("cluster"))
      val next = roundBarrier(
        labels.union(msgs)
          .groupBy(col("node")).agg(min(col("cluster")).as("cluster")),
        iter, "labels")
      val sum = next.agg(org.apache.spark.sql.functions.sum(col("cluster").cast("decimal(38,0)")))
        .first().getDecimal(0)
      converged = lastSum != null && sum.compareTo(lastSum) == 0
      lastSum = sum
      labels = next
      iter += 1
    }
    // labels is already materialized by its round barrier, so the
    // invariant cache can go now — nothing may outlive the call
    bidir.unpersist(blocking = false)
    labels
  }

  /** Star-contraction connected components (alternating large-star /
    * small-star, Kiveris et al., "Connected Components in MapReduce and
    * Beyond"): converges in O(log^2 n) rounds REGARDLESS of graph
    * diameter — the upgrade over min-label propagation (diameter-bound)
    * for path-heavy graphs at cluster scale. Each half-round is one
    * groupBy (per-node min) + one join (re-point edges at the min):
    *
    *  - large-star: every neighbor LARGER than u re-points to
    *    m = min(N(u) ∪ u) — strictly shrinks long tails upward;
    *  - small-star: orient edges so u >= v; u and its smaller
    *    neighbors all re-point to the minimum — contracts stars.
    *
    * Terminates when the edge set is stable (exact exceptAll check, two
    * anti-joins over the shrinking edge set). Same output contract as
    * `connectedComponents`: (node, cluster = min reachable id). */
  def connectedComponentsStar(edges: DataFrame, srcCol: String, dstCol: String,
                              maxIter: Int = 30,
                              localFinishEdges: Long = LocalFinishEdges): DataFrame = {
    // loop-invariant: ONE materialization of the upstream pair
    // pipeline; nodes and the seeded edge set both derive from it
    val base = invariant(
      edges.select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v")))
    // used once, in the final join — stays lazy over the cached base
    val nodes = base.select(col("u").as("n"))
      .union(base.select(col("v").as("n"))).distinct()
    // drop self-loops; normalize to a distinct undirected pair set.
    // e is ITERATED state (reassigned every round), so its round-0 seed
    // enters the same barrier discipline as the loop body.
    var e = base
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(true)

    def largeStar(cur: DataFrame): DataFrame = {
      val nbrs = cur.union(cur.select(col("v").as("u"), col("u").as("v")))
      val mins = nbrs.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      nbrs.join(mins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    def smallStar(cur: DataFrame): DataFrame = {
      // cur is already oriented u >= v (largeStar emits v = min <= u).
      // Both re-pointed edges (v->m and u->m) come out of ONE explode
      // over the joined row — a union of two selects would re-execute
      // the join per branch.
      val mins = cur.groupBy("u").agg(min(col("v")).as("m"))
      cur.join(mins, "u")
        .select(explode(array(
          struct(col("v").as("u"), col("m").as("v")),
          struct(col("u"), col("m").as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var iter = 0
    var converged = false
    var eCount = e.count()
    // the edge set CONTRACTS every round, so the local-endgame check
    // runs before each round, not just once: a graph too big to collect
    // at round 0 usually shrinks under the threshold within a round or
    // two, and the collect replaces the remaining O(log^2 n) rounds
    while (iter < maxIter && !converged && eCount > localFinishEdges) {
      val next = roundBarrier(
        smallStar(largeStar(e))
          .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
          .distinct(),
        iter, "star")
      // both sides are distinct sets, so equal counts + empty one-way
      // difference proves set equality (no second exceptAll needed)
      val nextCount = next.count()
      converged = nextCount == eCount && next.exceptAll(e).isEmpty
      e = next
      eCount = nextCount
      iter += 1
    }
    if (!converged && eCount <= localFinishEdges && eCount > 0) {
      // local union-find emits node -> component-min directly: exactly
      // the star edges (u >= v = root) the converged loop would reach
      val spark = e.sparkSession
      import spark.implicits._
      val local = localComponents(e.as[(Long, Long)].collect())
      e = local.filter { case (n, r) => n != r }.toDF("u", "v")
    }
    // stars: every non-root points at its component min; roots get
    // themselves. Materialized HERE (one cheap barrier over tiny
    // frames) so the invariant cache can be dropped before returning.
    val result = nodes
      .join(e.select(col("u").as("n"), col("v").as("c")), Seq("n"), "left")
      .groupBy(col("n"))
      .agg(min(col("c")).as("mc"))
      .select(col("n").as("node"), least(coalesce(col("mc"), col("n")), col("n")).as("cluster"))
      .localCheckpoint(true)
    base.unpersist(blocking = false)
    result
  }
}
