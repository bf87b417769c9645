package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join. Spark plans a raw
  * `p BETWEEN lo AND hi` join as a nested-loop — O(|points| x |ranges|)
  * — because there is no equi-key. Binning manufactures one: intervals
  * explode into the fixed-width bins they cover, points hash to their
  * bin, the join runs as a plain shuffle/broadcast equi-join on the bin
  * id, and an exact predicate removes the bin-boundary false positives.
  * Cost scales with |points| + Σ interval_width/binWidth instead of the
  * cross product. Pick binWidth near the median interval width so each
  * interval covers O(1) bins.
  */
object RangeJoin {

  /** Inner join of points to every interval containing them
    * (inclusive bounds, SQL BETWEEN semantics). */
  def pointInRange(points: DataFrame, pointCol: String,
                   ranges: DataFrame, loCol: String, hiCol: String,
                   binWidth: Double): DataFrame = {
    require(binWidth > 0, "pointInRange: binWidth must be positive")
    val binnedPoints = points.withColumn("_bin", floor(col(pointCol) / binWidth))
    val binnedRanges = ranges.withColumn("_bin",
      explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    binnedPoints.join(binnedRanges, "_bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("_bin")
  }
}
