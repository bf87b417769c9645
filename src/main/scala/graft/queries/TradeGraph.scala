package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Node ids are LONG-ENCODED in the store (even = 2·suppkey for
  * suppliers, odd = 2·custkey+1 for customers) and decoded to the
  * display strings ("s123"/"c456") only at query OUTPUT: iterative
  * algorithms shuffle and checkpoint the node key every round, and an
  * 8-byte long against a formatted string is the difference between a
  * peel that spills and one that doesn't (measured at the 30×
  * fixture: the string-keyed k-core peel spilled 17 GB of execution
  * memory; long keys cut the round payload to a fraction). The same
  * rule a 100 TB graph pipeline applies at ingest: dictionary-encode
  * once, compute on integers, format never.
  *
  * Oracles are untouched: persistence changes when the extraction
  * runs, and key encoding changes what shuffles — never what either
  * produces. */
object TradeGraph {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]

  /** Release cached edge extractions. A scale sweep over many sf
    * dirs (or many short-lived sessions) would otherwise accumulate
    * MEMORY_AND_DISK storage indefinitely and pin stopped
    * SparkSession objects through the cache keys. `dir = None`
    * clears everything; a specific dir evicts just that fixture.
    * Safe to call mid-session: the next graph query re-extracts and
    * re-persists. */
  def evict(dir: Option[String] = None): Unit = {
    val keys = cache.keys.filter(k => dir.forall(_ == k._2)).toSeq
    keys.foreach { k =>
      cache.remove(k).foreach { df =>
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () } // session may already be stopped
      }
    }
  }

  /** Distinct trade pairs, LONG-encoded: `a` = 2·suppkey (supplier,
    * even), `b` = 2·custkey+1 (customer, odd) — one row per undirected
    * pair. Persisted on first use per (session, sf-dir). */
  def pairsKeyed(s: SparkSession, dir: String): DataFrame =
    cache.getOrElseUpdate((s, dir),
      Tables(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
        .join(Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("l_suppkey").cast("long") * 2).as("a"),
          (col("o_custkey").cast("long") * 2 + 1).as("b"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK))

  /** Decode a long node key back to the display id ("s"+suppkey /
    * "c"+custkey) — applied once, at query output. */
  def decode(node: Column): Column =
    concat(when(node % 2 === 0, lit("s")).otherwise(lit("c")),
      shiftright(node, 1).cast("string"))

  /** Both directions as long-keyed (src, dst) — the edge convention
    * the iterative operators consume. Duplicate-free by construction:
    * the two directions are disjoint (even→odd vs odd→even), so
    * consumers may skip their own dedup shuffle (PageRank's
    * assumeDistinct). */
  def edgesKeyed(s: SparkSession, dir: String): DataFrame = {
    val p = pairsKeyed(s, dir)
    p.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
  }

  /** The string-keyed edge view (both directions), for consumers that
    * want display ids end to end — plan guards, ad-hoc exploration.
    * Same persisted store, decode is a projection. */
  def edges(s: SparkSession, dir: String): DataFrame =
    edgesKeyed(s, dir)
      .select(decode(col("src")).as("src"), decode(col("dst")).as("dst"))
}
