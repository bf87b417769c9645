package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salting for the case where a handful of
  * hot keys would otherwise funnel into a few reducers and dominate the
  * stage (AQE's skew-join split handles many cases at runtime, but it
  * only splits partitions AFTER a skewed shuffle is materialized and
  * cannot help when a single KEY exceeds one task's memory; salting
  * restructures the key space itself).
  *
  * Mechanics: the large/skewed left side gets a uniform salt in
  * [0, numSalts); the right side is replicated once per salt value; the
  * join key becomes (key, salt). Each hot key now spreads over numSalts
  * reducers. The result is EXACTLY the plain join's result — the salt
  * is internal — which is how the oracle verifies it.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on leftKey == rightKey with
    * left-side salting. Cost model: right side is replicated numSalts
    * times (keep numSalts modest for large right sides, or pre-filter
    * the replication to the known-hot keys). */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 numSalts: Int = 8): DataFrame = {
    require(numSalts > 0, "saltedJoin: numSalts must be positive")
    // xxhash64 over the whole row spreads rows of the SAME key across
    // salts (a key-derived salt would defeat the purpose); deterministic
    // per row content, so reruns produce identical plans and results.
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(numSalts)))
    val replicatedRight = right
      .withColumn("_salt", explode(array((0 until numSalts).map(lit).toIndexedSeq: _*)))
      .withColumnRenamed(rightKey, "_rkey")
    saltedLeft
      .join(replicatedRight,
        col(leftKey) === col("_rkey") && saltedLeft("_salt") === replicatedRight("_salt"))
      .drop("_salt", "_rkey")
  }
}
