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
  * Hot/cold split: only keys whose left-side row count reaches
  * `hotThreshold` are salted. Cold keys take a plain join with ZERO
  * replication; hot keys get a positional salt on the left and a
  * numSalts× replication of ONLY the hot right rows — at 8 salts and a
  * handful of hot keys that is a few dozen replicated rows, not 8× the
  * right side. The union of both paths is EXACTLY the plain join's
  * result — the salt is internal — which is how the oracle verifies it.
  *
  * Cost model: one extra map-side-combined count over the left (cheap
  * relative to the shuffle it prevents) and a driver-bounded broadcast
  * of the hot-key set (few by definition — a key must exceed a reducer
  * to qualify). When the hot keys are already known (stats, AQE metrics,
  * a prior profile), pass them via `knownHotKeys` and the counting scan
  * disappears entirely.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on leftKey == rightKey with
    * hot-key-only left-side salting. */
  def saltedJoin(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 numSalts: Int = 8,
                 hotThreshold: Long = 1000000L,
                 knownHotKeys: Option[Seq[Any]] = None): DataFrame = {
    require(numSalts > 0, "saltedJoin: numSalts must be positive")
    require(hotThreshold > 0, "saltedJoin: hotThreshold must be positive")
    val hotKeys = knownHotKeys match {
      case Some(ks) =>
        val s = left.sparkSession
        import scala.jdk.CollectionConverters._
        s.createDataFrame(
          ks.map(k => org.apache.spark.sql.Row(k)).asJava,
          org.apache.spark.sql.types.StructType(Seq(
            left.schema(leftKey).copy(name = "_hotkey"))))
      case None =>
        left.groupBy(col(leftKey).as("_hotkey"))
          .agg(count(lit(1)).as("_kcnt"))
          .filter(col("_kcnt") >= hotThreshold)
          .select("_hotkey")
    }
    val bHot = broadcast(hotKeys)
    val rightRen = right.withColumnRenamed(rightKey, "_rkey")

    // Cold path: plain shuffle join, no salt, no replication.
    val leftCold = left.join(bHot, col(leftKey) === col("_hotkey"), "left_anti")
    val cold = leftCold.join(rightRen, col(leftKey) === col("_rkey"))

    // Hot path: positional salt (NOT derived from row content — identical
    // duplicate rows of a hot key must still spread across salts), and
    // replication restricted to the hot right rows by a broadcast semi.
    val leftHot = left.join(bHot, col(leftKey) === col("_hotkey"), "left_semi")
    val rightHot = rightRen.join(bHot, col("_rkey") === col("_hotkey"), "left_semi")
    val saltedLeft = leftHot.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(numSalts.toLong)))
    val replicatedRight = rightHot.withColumn("_salt",
      explode(array((0 until numSalts).map(i => lit(i.toLong)).toIndexedSeq: _*)))
    val hot = saltedLeft
      .join(replicatedRight,
        col(leftKey) === col("_rkey") && saltedLeft("_salt") === replicatedRight("_salt"))
      .drop("_salt")

    cold.unionByName(hot.select(cold.columns.toIndexedSeq.map(col): _*)).drop("_rkey")
  }
}
