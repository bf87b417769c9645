package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The supplier↔customer trade graph the graph family (degrees,
  * PageRank, k-core — and any future centrality) runs over: distinct
  * (supplier, customer) pairs from lineitem⋈orders.
  *
  * Why this exists: the pair EXTRACTION (a fact-fact join plus a
  * distinct over the result) costs more than most of the algorithms
  * that consume it — the round-11 30× sweep attributed the bulk of
  * graph_kcore's 12× ratio to exactly this stage, rebuilt per query.
  * The extraction now runs ONCE per (session, sf-dir) and is
  * lineage-persisted (MEMORY_AND_DISK — the edge list is orders of
  * magnitude smaller than the fact tables it came from; DISK spill
  * keeps it safe at scale), so a session running the whole graph
  * family pays it a single time. This is the PageRank per-round
  * persistence discipline applied ACROSS queries; at 100 TB the same
  * role is played by materializing the edge list to parquet once per
  * corpus snapshot.
  *
  * Oracles are untouched: persistence changes when the extraction
  * runs, never what it produces. */
object TradeGraph {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Distinct ("s"+suppkey, "c"+custkey) trade pairs — the UNDIRECTED
    * edge set, one row per pair, supplier side in `a`. Persisted on
    * first use per (session, sf-dir). */
  def pairs(s: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate((s, dir),
      Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("s"), col("l_suppkey")).as("a"),
          concat(lit("c"), col("o_custkey")).as("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))

  /** Both directions as (src, dst) — the degrees/PageRank/kCore edge
    * convention. Duplicate-free by construction: the two directions
    * are disjoint ("s*"→"c*" vs "c*"→"s*"), so consumers may skip
    * their own dedup shuffle (PageRank's assumeDistinct). */
  def edges(s: SparkSession, dir: String): DataFrame = {
    val p = pairs(s, dir)
    p.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
  }
}
