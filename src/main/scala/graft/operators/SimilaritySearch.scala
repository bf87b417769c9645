package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float|double>`):
  * exact brute-force cosine top-k as the baseline, and a multi-table
  * sign-LSH variant as the scale path for HIGH-similarity retrieval.
  *
  * Scale shape: both are single scans with a broadcast one-row probe and
  * a TakeOrderedAndProject top-k — no shuffle of the embedding table.
  * The LSH variant drops ~3/4 of the corpus before any cosine math; at
  * cluster scale (batch probes) the bucket ids become join keys so each
  * probe only meets its bucket-mates.
  */
object SimilaritySearch {

  /** Exact cosine top-k against the row whose `idCol` equals probeId. */
  def topKCosine(emb: DataFrame, idCol: String, vecCol: String,
                 probeId: Long, k: Int): DataFrame = {
    val probe = emb.filter(col(idCol) === probeId).select(col(vecCol).as("_probe"))
    emb.crossJoin(broadcast(probe))
      .filter(col(idCol) =!= probeId)
      .select(col(idCol), round(cosine(col(vecCol), col("_probe")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Approximate cosine top-k: `tables` independent sign-LSH tables of
    * `bits` hyperplanes each; a row is a candidate iff its bucket is
    * within Hamming `radius` of the probe's bucket in >= 1 table, then
    * survivors are reranked with the exact cosine. Multiple tables are
    * what controls recall variance: P(miss) ~ p_miss_one_table^tables.
    * Designed for high-similarity neighbors (cos >= ~0.9); for
    * weak-similarity top-k use `topKCosine` — no bucketing scheme can
    * prune and recall simultaneously at wide angles. */
  def topKCosineLsh(emb: DataFrame, idCol: String, vecCol: String,
                    probeId: Long, k: Int,
                    bits: Int = 8, radius: Int = 2, tables: Int = 2): DataFrame = {
    val bucketCols: Seq[(String, Column)] = (0 until tables).map { t =>
      s"_bk$t" -> signLshBucket(col(vecCol), signLshPlanes(bits, dimOf(emb, vecCol), seed = 42L + t))
    }
    val withB = bucketCols.foldLeft(emb) { case (d, (name, c)) => d.withColumn(name, c) }
    val probe = withB.filter(col(idCol) === probeId)
      .select((col(vecCol).as("_probe") +: bucketCols.map { case (n, _) => col(n).as(s"_p$n") }): _*)
    val anyClose = bucketCols.map { case (n, _) =>
      bit_count(col(n).bitwiseXOR(col(s"_p$n"))) <= radius
    }.reduce(_ || _)
    withB.crossJoin(broadcast(probe))
      .filter(col(idCol) =!= probeId)
      .filter(anyClose)
      .select(col(idCol), round(cosine(col(vecCol), col("_probe")), 6).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }

  /** Embedding dimensionality, from the first row (driver-side, one
    * value). The plane constants need it at plan-build time. */
  private def dimOf(emb: DataFrame, vecCol: String): Int =
    emb.select(size(col(vecCol))).first().getInt(0)
}
