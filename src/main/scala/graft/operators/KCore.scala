package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling — the graph-quality gate
  * next to degrees/PageRank/triangles (ConnectedComponents' siblings):
  * repeatedly delete every node of degree < k until the remaining
  * subgraph (the k-core) is stable. Crawl curation uses it to separate
  * the densely-interlinked head of a domain graph from tail pages; the
  * same peel finds the stable "community core" of any entity graph.
  *
  * Scale shape: each round is one degree aggregation + two semi-joins
  * (keyed shuffles, no all-pairs anything); the number of rounds is the
  * peel DEPTH of the graph (how far deletions cascade), not its size —
  * degree-homogeneous graphs converge in 2-3 rounds. Monotonicity gives
  * a free convergence proof: the edge set only ever shrinks, so an
  * unchanged count is a global fixpoint (the ConnectedComponents
  * sum-of-labels argument, simpler because counts are exact). Iterated
  * state is localCheckpoint'ed every round so plans do not nest
  * `rounds` deep (the CC lineage policy; the state here is the shrinking
  * edge list itself).
  *
  * `edges` must contain BOTH directions of every undirected edge (the
  * degrees/PageRank convention in this repo); the result is then
  * (node, core_deg) for every node of the k-core, where core_deg is the
  * node's degree WITHIN the core. */
object KCore {

  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
            maxIter: Int = 50): DataFrame = {
    require(k >= 1, "kCore: k must be >= 1")
    var e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .localCheckpoint()
    var nEdges = e.count()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter && nEdges > 0) {
      val keep = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("node"))
      val next = e
        .join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint()
      val n = next.count()
      converged = n == nEdges
      e = next
      nEdges = n
      iter += 1
    }
    // A partially-peeled edge set is NOT a k-core (nodes of degree < k
    // can remain), so an exhausted iteration budget must be loud, not a
    // silently-wrong answer. Peel depth is a structural property (how
    // far deletions cascade), so maxIter is a safety valve, never a
    // tuning knob — a graph that hits it needs a bigger budget.
    if (!converged && nEdges > 0)
      throw new IllegalStateException(
        s"kCore: peel did not converge within maxIter=$maxIter rounds " +
          s"($nEdges edges still shrinking) — raise maxIter; a truncated " +
          "peel is not a k-core")
    e.groupBy(col("src").as("node")).agg(count(lit(1)).cast("long").as("core_deg"))
  }

  /** [[kCore]] specialized to BIPARTITE graphs given as ONE row per
    * undirected (a, b) pair — the trade-graph shape. Identical
    * fixpoint: in the both-directions formulation a pair (a, b)
    * survives a round iff deg(a) >= k AND deg(b) >= k, which is
    * exactly the two per-side degree filters below — at HALF the row
    * mass per shuffle, checkpoint and count (the both-directions edge
    * list exists only as a view the caller never materializes).
    * KCoreSpec pins pair-list == both-directions output on random
    * bipartite graphs. Returns (node, core_deg) for both sides. */
  def kCoreBipartite(pairs: DataFrame, aCol: String, bCol: String, k: Int,
                     maxIter: Int = 50): DataFrame = {
    require(k >= 1, "kCoreBipartite: k must be >= 1")
    var e = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .localCheckpoint()
    var nPairs = e.count()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter && nPairs > 0) {
      val keepA = e.groupBy(col("a")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("a"))
      val keepB = e.groupBy(col("b")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("b"))
      val next = e
        .join(keepA, Seq("a"), "left_semi")
        .join(keepB, Seq("b"), "left_semi")
        .localCheckpoint()
      val n = next.count()
      converged = n == nPairs
      e = next
      nPairs = n
      iter += 1
    }
    if (!converged && nPairs > 0)
      throw new IllegalStateException(
        s"kCoreBipartite: peel did not converge within maxIter=$maxIter rounds " +
          s"($nPairs pairs still shrinking) — raise maxIter; a truncated " +
          "peel is not a k-core")
    e.groupBy(col("a").as("node")).agg(count(lit(1)).cast("long").as("core_deg"))
      .unionByName(
        e.groupBy(col("b").as("node")).agg(count(lit(1)).cast("long").as("core_deg")))
  }
}
