package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The persistence pair, mirroring the reference's `save_to_file` /
  * `read_from_file` (reference: src/dataframe/dataframe.rs:767-781 —
  * bincode serialization of the whole frame). The Spark-first story is
  * parquet: columnar, compressed, splittable, statistics for pushdown —
  * the format the rest of the engine already scans.
  */
object ParquetSource {
  def save(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Hive-style partitioned layout: one directory per value of the
    * partition columns. Readers that filter on those columns prune
    * whole directories before any IO (PartitionFilters in the scan) —
    * the first lever for 100 TB date-ranged data. */
  def savePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** ORC, Spark's other built-in columnar format, for interop with
    * ORC-based warehouses: same save/load contract as parquet. */
  def saveOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def loadOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Per-file parquet footer statistics for a LONG column: (file, rows,
    * min, max) straight from the metadata the format keeps for data
    * skipping — no data pages are read. This is layout introspection:
    * "which files would a filter on this column touch", the check that
    * PROVES a sort/z-order write produced skippable files (narrow
    * per-file ranges) instead of just claiming it. Driver-side by
    * design — cost is one footer read per file, the same metadata pass
    * every planner makes. */
  def parquetLongColStats(spark: SparkSession, path: String, column: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    val stats = files.map { f =>
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val colStats = blocks.flatMap(_.getColumns.asScala)
          .filter(_.getPath.toDotString == column)
          .map(_.getStatistics)
          .filter(s => s != null && s.hasNonNullValue)
        val mins = colStats.map(_.genericGetMin.asInstanceOf[Number].longValue)
        val maxs = colStats.map(_.genericGetMax.asInstanceOf[Number].longValue)
        (f.getPath.getName, blocks.map(_.getRowCount).sum,
          if (mins.isEmpty) None else Some(mins.min),
          if (maxs.isEmpty) None else Some(maxs.max))
      } finally reader.close()
    }
    import spark.implicits._
    stats.toDF("file", "rows", "min", "max")
  }

  /** Small-file compaction: rewrite a directory of parquet files into
    * ~targetBytes-sized files. The chronic 100 TB table disease is the
    * opposite of "too big": streaming sinks, partitioned writes and
    * incremental jobs leave thousands of KB-sized files whose per-file
    * open/footer cost dominates scans and whose count bloats every
    * planner listing. Compaction is a pure re-layout — `coalesce`, NOT
    * `repartition`: merging partitions needs no shuffle (each output
    * task reads several input files sequentially); data order inside
    * partitions is preserved, so a sorted/z-ordered layout stays
    * clustered. Returns (filesBefore, filesAfter).
    *
    * File count comes from the same FS listing the planner does; sizing
    * uses real on-disk bytes, not row estimates, so heavily-compressed
    * columns still land near the target. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long = 128L << 20): (Int, Int) = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new org.apache.hadoop.fs.Path(inDir)
    val fs = root.getFileSystem(conf)
    def parquetFiles(p: org.apache.hadoop.fs.Path): Array[org.apache.hadoop.fs.FileStatus] =
      fs.listStatus(p).filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val before = parquetFiles(root)
    val totalBytes = before.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    // coalesce only ever REDUCES partition count, so make the scan
    // produce at-least-target-grained partitions first: set
    // maxPartitionBytes to the target in an ISOLATED child session
    // (same SparkContext, own SQL conf) — concurrent queries on the
    // caller's session never observe the override — then coalesce to
    // the exact output count.
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
    s2.read.parquet(inDir).coalesce(nOut)
      .write.mode("overwrite").parquet(outDir)
    (before.length, parquetFiles(new org.apache.hadoop.fs.Path(outDir)).length)
  }

  /** Bucketed + sorted table layout (requires the session catalog):
    * both sides of a join bucketed by the join key into the same bucket
    * count join with NO exchange and no sort — the shuffle is paid once
    * at write time instead of per query. The layout for fact-fact joins
    * repeated at 100 TB. */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // A location left behind by a PREVIOUS session is invisible to this
    // session's in-memory catalog, so CREATE would fail with
    // LOCATION_ALREADY_EXISTS — clear it, which is exactly what DROP
    // TABLE would have done had the metastore survived. (With a real
    // Hive metastore the DROP above already handles it.)
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    if (wh.getScheme == null || wh.getScheme == "file") {
      val loc = new java.io.File(
        if (wh.getScheme == null) wh.getPath else new java.io.File(wh).getPath, table)
      if (loc.exists()) {
        import java.nio.file.{Files, Path}
        import scala.jdk.CollectionConverters._
        Files.walk(loc.toPath).sorted(java.util.Comparator.reverseOrder[Path]())
          .iterator().asScala.foreach(Files.delete)
      }
    }
    df.write.format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)
  }
}
