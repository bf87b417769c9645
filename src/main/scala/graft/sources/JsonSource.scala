package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

/** JSON ingest with recursive flattening, mirroring the reference's
  * `read_json_to_dataframe` (reference: src/io/read.rs:143-244): nested
  * object keys become `parent_child` columns and arrays multiply rows.
  *
  * The flatten itself is pure Catalyst — struct expansion is a
  * projection, array expansion is `explode_outer` — so pushdown/pruning
  * still reach the scan and nothing leaves the optimized plan. The loop
  * runs over the SCHEMA (driver-side, bounded by nesting depth), never
  * over data.
  */
object JsonSource {

  /** Read one JSON document (or an array of documents) per file, then
    * flatten. `multiLine` handles the reference's pretty-printed single
    * object; JSON-Lines files work with multiLine = false. */
  def read(spark: SparkSession, path: String, multiLine: Boolean = true): DataFrame =
    flatten(spark.read.option("multiLine", multiLine).json(path))

  /** Recursively flatten every struct to `parent_child` columns and
    * explode every array (explode_outer: an empty/null array keeps its
    * row with nulls, it does not silently drop records). */
  def flatten(df: DataFrame): DataFrame = {
    var cur = df
    var changed = true
    while (changed) {
      changed = false
      val fields = cur.schema.fields
      fields.find(_.dataType.isInstanceOf[StructType]) match {
        case Some(f) =>
          val st = f.dataType.asInstanceOf[StructType]
          val expanded: Seq[Column] = fields.toSeq.flatMap { g =>
            if (g.name == f.name)
              st.fields.toSeq.map(c => col(s"`${f.name}`.`${c.name}`").as(s"${f.name}_${c.name}"))
            else Seq(col(s"`${g.name}`"))
          }
          cur = cur.select(expanded: _*)
          changed = true
        case None =>
          fields.find(_.dataType.isInstanceOf[ArrayType]) match {
            case Some(f) =>
              cur = cur.withColumn(f.name, explode_outer(col(s"`${f.name}`")))
              changed = true
            case None => ()
          }
      }
    }
    cur
  }

  /** `to_json` (reference: src/io/write.rs:72-83). The reference
    * serializes its columnar struct as one pretty JSON object; the
    * Spark-first equivalent is JSON Lines — one object per row — which
    * writes in parallel and round-trips through `read(multiLine=false)`. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}
