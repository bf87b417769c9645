package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting over an undirected graph given as canonical
  * (src < dst) edge rows — the density diagnostic that tells duplicate
  * CLIQUES apart from transitive-closure chains in a near-dup graph,
  * and the standard first structural metric on any entity graph.
  *
  * Each triangle a<b<c is enumerated exactly once: a wedge join pairs
  * (a,b) with (b,c) on the shared middle node, and a closure join
  * checks (a,c). With canonical edges this is the compact enumeration
  * whose cost is the graph's wedge count; degree-ordering the
  * orientation (point each edge at its higher-degree endpoint) is the
  * standard escalation when web-scale degree skew concentrates wedges
  * on hub nodes.
  *
  * The edge list is materialized ONCE as a parquet snapshot before the
  * three-way self-join (same rationale as ConnectedComponents' durable
  * checkpoints: `persist` pins executor blocks the caller must
  * remember to release, and leaving the lineage intact would re-execute
  * the — typically expensive — upstream edge derivation once per join
  * branch; exchange reuse does not fire across the aliased branches).
  * The snapshot is edge-sized, columnar, and read three times instead.
  */
object Triangles {

  private def snapshot(df: DataFrame, tag: String): DataFrame = {
    val path = java.nio.file.Files.createTempDirectory(s"graft-$tag").toString
    df.write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Per-node triangle participation counts: one row per node that is a
    * corner of at least one triangle, `(node, n_triangles)`. Input
    * edges must be canonical (srcCol < dstCol per row, no duplicates);
    * rows violating canonicality are dropped rather than silently
    * double-counted. */
  def perNodeCounts(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = snapshot(
      edges.select(col(srcCol).as("i"), col(dstCol).as("j")).filter(col("i") < col("j")),
      "tri-edges")
    val tri = e.as("ab")
      .join(e.as("bc"), col("ab.j") === col("bc.i"))
      .join(e.as("ac"), col("ac.i") === col("ab.i") && col("ac.j") === col("bc.j"))
      .select(col("ab.i").as("a"), col("ab.j").as("b"), col("bc.j").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).cast("long").as("n_triangles"))
  }
}
