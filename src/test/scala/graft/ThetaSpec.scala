package graft

import graft.operators.SketchProfile
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ThetaFunctions

/** Theta-sketch contracts: error bound in estimation mode,
  * partitioning-insensitivity (sketch bytes are a pure function of the
  * item set), exact mode below nominal, lossless union of partials,
  * and the intersection estimate HLL cannot provide. */
class ThetaSpec extends SparkSpecBase {

  test("theta sketch is exact below nominal and in-bound above it") {
    val small = spark.range(3000).toDF("id")
      .agg(ThetaFunctions.thetaEstimate(
        ThetaFunctions.thetaSketchAgg(col("id"))).as("e"))
      .collect()(0).getDouble(0)
    assert(small == 3000.0, s"below nominal must be exact, got $small")
    val big = spark.range(100000).toDF("id")
      .agg(ThetaFunctions.thetaEstimate(
        ThetaFunctions.thetaSketchAgg(col("id"))).as("e"))
      .collect()(0).getDouble(0)
    // nominal 4096 => ~1.6% RSE; 5% is > 3 sigma
    assert(math.abs(big - 100000.0) / 100000.0 <= 0.05, s"estimate $big")
  }

  test("theta sketch bytes are partitioning-insensitive") {
    def bytesOf(parts: Int): Seq[Byte] = spark.range(50000).toDF("id")
      .repartition(parts)
      .agg(ThetaFunctions.thetaSketchAgg(col("id")).as("sk"))
      .collect()(0).getAs[Array[Byte]](0).toSeq
    assert(bytesOf(2) == bytesOf(17),
      "sketch must be a pure function of the item set")
  }

  test("union of shard partials equals the one-pass sketch") {
    val df = spark.range(50000).toDF("id")
      .withColumn("shard", pmod(col("id"), lit(7)))
    val merged = df.groupBy(col("shard"))
      .agg(ThetaFunctions.thetaSketchAgg(col("id")).as("sk"))
      .agg(ThetaFunctions.thetaEstimate(
        ThetaFunctions.thetaUnionAgg(col("sk"))).as("e"))
      .collect()(0).getDouble(0)
    val direct = df
      .agg(ThetaFunctions.thetaEstimate(
        ThetaFunctions.thetaSketchAgg(col("id"))).as("e"))
      .collect()(0).getDouble(0)
    assert(merged == direct, s"merged $merged vs direct $direct")
  }

  test("overlapMatrix estimates segment intersections within bound") {
    import spark.implicits._
    // A = [0, 60k), B = [40k, 100k) -> |A ∩ B| = 20k, both in
    // estimation mode at nominal 4096
    val df = ((0L until 60000L).map(i => ("A", i)) ++
      (40000L until 100000L).map(i => ("B", i))).toDF("seg", "id")
    val r = SketchProfile.overlapMatrix(df, "seg", "id").collect()(0)
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(math.abs(r.getDouble(2) - 60000.0) / 60000.0 <= 0.05, s"ndv_a ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 60000.0) / 60000.0 <= 0.05, s"ndv_b ${r.getDouble(3)}")
    // intersection compounds two sketches' error: 10% is still > 3
    // sigma of the combined bound at this overlap fraction
    assert(math.abs(r.getDouble(4) - 20000.0) / 20000.0 <= 0.10, s"ndv_both ${r.getDouble(4)}")
  }
}
