package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.NativeExpressions

/** Bloom-prefiltered exact semi/anti join — the scan-side pruning shape
  * for "filter 100 TB against a membership set" (blocklist scrubbing,
  * benchmark decontamination, id-set extraction).
  *
  * A plain semi join shuffles BOTH sides on the key (or broadcasts the
  * whole build side's rows). At 100 TB the probe-side shuffle dominates:
  * every row travels even though almost none survive. The bloom path
  * ships a fixed-size bit array instead:
  *
  *   1. build: one pass over the (small) membership side aggregates
  *      xxhash64(key) into a BloomFilter sketch (mergeable, so the build
  *      is a tree aggregation — no single-point collection bottleneck
  *      beyond the final fixed-size bitset);
  *   2. prune: `might_contain(bloom, xxhash64(key))` runs as a
  *      codegen'd filter NEXT TO THE SCAN on the large side — no
  *      shuffle, no join, false-positive rate `fpp`;
  *   3. confirm: the few surviving rows flow into an exact semi join,
  *      so the RESULT is exact — the bloom only prunes rows that are
  *      provably absent (a bloom has no false negatives).
  *
  * The confirm join still shuffles, but its input is |matches| +
  * fpp·|large| rows instead of |large| — at fpp=1% the probe-side
  * shuffle shrinks ~100x for a selective membership set. (Spark's own
  * runtime-filter optimization injects the same shape when statistics
  * permit; this operator makes it explicit and unconditional.)
  *
  * Anti joins cannot prune the probe side this way — a bloom proves
  * absence, never membership, and absent rows are exactly what an anti
  * join keeps — so `antiJoin` flips the bloom onto the build side
  * instead (see its scaladoc).
  */
object BloomPrune {

  /** Serialized bloom filter over xxhash64 of `key` rows of `build`.
    * `expectedItems`/`fpp` size the bitset (m = -n·ln(fpp)/ln(2)^2). */
  private def bloomBytes(build: DataFrame, key: Column,
                         expectedItems: Long, fpp: Double): Array[Byte] = {
    val bf = build.select(xxhash64(key).as("h"))
      .stat.bloomFilter("h", expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Exact semi join of `probe` against `build`'s key set, with a bloom
    * prefilter on the probe scan. Result == `probe SEMI JOIN build` —
    * bit-exact, because the bloom only removes guaranteed non-members;
    * the surviving candidates are confirmed by a real semi join. */
  def semiJoin(probe: DataFrame, probeKey: Column,
               build: DataFrame, buildKey: Column,
               expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bytes = bloomBytes(build, buildKey, expectedItems, fpp)
    val pruned = probe.filter(NativeExpressions.bloomMightContain(bytes, xxhash64(probeKey)))
    pruned.join(build.select(buildKey.as("__bp_key")).distinct(),
      probeKey === col("__bp_key"), "left_semi")
  }

  /** Exact anti join (rows of `probe` NOT in `build`'s key set). A bloom
    * cannot prune the probe side here — `might_contain = false` rows are
    * exactly the rows an anti join must KEEP — so the probe scans in
    * full. The bloom's role flips to the build side: distinct() before
    * the shuffle bounds the build input, and rows whose keys the probe's
    * OWN bloom rejects can be dropped from the build entirely (they
    * cannot eliminate anything). Worth it when the build side is large
    * and mostly misses; both sides stay exact. */
  def antiJoin(probe: DataFrame, probeKey: Column,
               build: DataFrame, buildKey: Column,
               expectedItems: Long = 1000000L, fpp: Double = 0.01): DataFrame = {
    val bytes = bloomBytes(probe, probeKey, expectedItems, fpp)
    val prunedBuild = build.select(buildKey.as("__bp_key")).distinct()
      .filter(NativeExpressions.bloomMightContain(bytes, xxhash64(col("__bp_key"))))
    probe.join(prunedBuild, probeKey === col("__bp_key"), "left_anti")
  }
}
