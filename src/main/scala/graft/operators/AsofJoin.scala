package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the LATEST right row with
  * right.ts <= left.ts within the same key — the time-series join
  * (trades->quotes, clicks->views) relational engines ship natively and
  * Spark lacks.
  *
  * Implementation is the union+window formulation, not a nested-loop
  * theta join: tag both sides, union on (key, ts, side), and one window
  * pass per key carries the last-seen right payload forward onto left
  * rows. Cost = ONE shuffle on the key + a sort within partitions —
  * the same plan shape as any windowed aggregation, so it scales the
  * same way (skewed keys -> salt or AQE, like any window).
  */
object AsofJoin {

  /** Both frames must share `keyCol` and `tsCol` names (rename before
    * calling); `payload` are right-only columns to attach. Rows with
    * equal timestamps on both sides match INCLUSIVELY (right sorts
    * before left at the same instant). The right side must be unique
    * per (key, ts) — pre-aggregate it otherwise, or ties would be
    * nondeterministic in any engine. */
  def asofJoinLast(left: DataFrame, right: DataFrame,
                   keyCol: String, tsCol: String,
                   payload: Seq[String]): DataFrame =
    asofJoinLast(left, right, keyCol, tsCol, payload, None)

  /** As-of join with a TOLERANCE (pandas merge_asof semantics): the
    * match is discarded — payload nulled — when the matched right row
    * is older than `toleranceMicros`. The matched right timestamp rides
    * the same window as the payload, so tolerance is one more projected
    * predicate, not a second join. */
  def asofJoinLast(left: DataFrame, right: DataFrame,
                   keyCol: String, tsCol: String,
                   payload: Seq[String],
                   toleranceMicros: Option[Long]): DataFrame = {
    require(payload.nonEmpty, "asofJoinLast: no payload columns to attach")
    val l = left.select(
      (left.columns.map(col).toIndexedSeq
        ++ payload.map(c => lit(null).cast(right.schema(c).dataType).as(c))
        ++ Seq(lit(null).cast("long").as("_rts"), lit(1).as("_side"))): _*)
    val r = right.select(
      (left.columns.map(c =>
        if (c == keyCol || c == tsCol) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)).toIndexedSeq
        ++ payload.map(col)
        ++ Seq(unix_micros(col(tsCol)).as("_rts"), lit(0).as("_side"))): _*)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val attached = (payload :+ "_rts").foldLeft(l.unionByName(r)) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    val gated = toleranceMicros match {
      case None => attached
      case Some(tol) =>
        val inTol = unix_micros(col(tsCol)) - col("_rts") <= tol
        payload.foldLeft(attached) { (d, c) =>
          d.withColumn(c, when(inTol, col(c)))
        }
    }
    gated.filter(col("_side") === 1).drop("_side", "_rts")
  }
}
