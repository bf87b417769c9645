package graft.queries

import java.nio.file.Files

import graft.{Graft, Tables}
import graft.operators.Display
import graft.sources.{AvroSource, CsvSource, ExcelSource, JsonSource, ParquetSource, SqlSource}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked coverage for the IO layer (SURVEY §2.8–§2.10) — the
  * readers/writers were previously verified by round-trip specs only;
  * these rows put them under the DuckDB gate.
  *
  * Two shapes:
  *  - fixture reads (`io_csv_read`, `io_json_read`): Spark parses a
  *    committed fixture file; DuckDB parses the SAME file with its own
  *    reader (`read_csv_auto` / `read_json_auto`) — two independent
  *    parser implementations must agree cell-for-cell.
  *  - write→read-back (`io_*_roundtrip`): Spark writes a driver table
  *    out through the format under test and reads it back; the oracle is
  *    the ORIGINAL table. Any fidelity loss in either direction of the
  *    format shows up as a hash mismatch. Results are cast back to the
  *    source schema so inference widening (e.g. int → long in CSV/JSON)
  *    is itself part of what round-trips.
  *
  * Fixture paths resolve relative to the repo root (Verify/Bench run
  * from there), falling back to the canonical absolute location the
  * oracle SQL uses.
  */
object IoQueries extends QueryModule {

  private def fixture(name: String): String = {
    val local = new java.io.File(s"fixtures/io/$name")
    if (local.exists()) local.getAbsolutePath else s"/root/repo/fixtures/io/$name"
  }

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft_io_$tag").toString

  /** Re-impose the source schema on a read-back frame: CSV/JSON/xlsx
    * inference widens integers to long; the round-trip contract is
    * "same values, same types as what was written". */
  private def castLike(df: DataFrame, like: DataFrame): DataFrame =
    df.select(like.schema.fields.toSeq.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)

  private def nation(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "nation")
  private def region(s: SparkSession, dir: String): DataFrame = Tables(s, dir, "region")

  private val abc: Seq[Seq[Any]] =
    Seq(Seq(1L, "Alice", 3.5), Seq(2L, "Bob", 4.0), Seq(3L, "Charlie", 2.5))

  val queries: Map[String, Q] = Map(
    // §2.9 read_csv: Spark's CSV parser vs DuckDB's on one fixture file.
    "io_csv_read" -> ((s, _) =>
      CsvSource.read(s, fixture("people.csv")).orderBy(col("Name"))),

    // §2.9 read_json + flatten: nested object → parent_child columns,
    // array-of-structs → exploded rows; DuckDB rebuilds the flatten with
    // struct field access + UNNEST.
    "io_json_read" -> ((s, _) =>
      JsonSource.read(s, fixture("profile.json")).orderBy(col("phoneNumbers_type"))),

    // §2.10 to_csv + §2.9 read_csv, write→read-back on a driver table.
    "io_csv_roundtrip" -> ((s, dir) => {
      val src = nation(s, dir)
      val out = tmpDir("csv")
      CsvSource.write(src, out)
      castLike(CsvSource.read(s, out), src).orderBy(col("n_nationkey"))
    }),

    // §2.10 to_json (JSON Lines) + §2.9 read_json.
    "io_json_roundtrip" -> ((s, dir) => {
      val src = nation(s, dir)
      val out = tmpDir("json")
      JsonSource.write(src, out)
      castLike(JsonSource.read(s, out, multiLine = false), src).orderBy(col("n_nationkey"))
    }),

    // §2.8 save_to_file / read_from_file (parquet persistence pair).
    "io_parquet_roundtrip" -> ((s, dir) => {
      val src = nation(s, dir)
      val out = tmpDir("parquet")
      ParquetSource.save(src, out)
      ParquetSource.load(s, out).orderBy(col("n_nationkey"))
    }),

    // §2.8 persistence, ORC variant of the same contract.
    "io_orc_roundtrip" -> ((s, dir) => {
      val src = region(s, dir)
      val out = tmpDir("orc")
      ParquetSource.saveOrc(src, out)
      ParquetSource.loadOrc(s, out).orderBy(col("r_regionkey"))
    }),

    // Avro container-file round trip over the dependency-free
    // graft-avro source/DSv2 connector (spark-avro is absent here):
    // orders exercises longs, strings, doubles AND the
    // timestamp-micros logical type; written one file per partition on
    // the executors, read back through the V2 scan.
    "io_avro_roundtrip" -> ((s, dir) => {
      val src = Tables(s, dir, "orders")
      val out = tmpDir("avro")
      AvroSource.write(src, out)
      AvroSource.read(s, out).orderBy(col("o_orderkey"))
    }),

    // §2.10 to_excel + §2.9 read_excel, read back through the
    // DataSource V2 connector (the executor-side parse path).
    "io_excel_roundtrip" -> ((s, dir) => {
      val src = region(s, dir)
      val out = tmpDir("xlsx") + "/region.xlsx"
      ExcelSource.write(src, out)
      castLike(s.read.format("graft-xlsx").load(out), src).orderBy(col("r_regionkey"))
    }),

    // §2.10 to_sql + §2.9 read_sql over embedded Derby (JDBC): write
    // with if_exists=replace, read back with an arbitrary SQL query —
    // the reference's read_sql contract (read.rs:246-290).
    "io_sql_roundtrip" -> ((s, dir) => {
      val src = nation(s, dir)
      val url = s"jdbc:derby:${tmpDir("derby")}/db;create=true"
      SqlSource.write(src, url, "nation_rt", ifExists = "replace")
      val back = SqlSource.read(s, url,
        """SELECT "n_nationkey", "n_name", "n_regionkey" FROM nation_rt""")
      castLike(back, src).orderBy(col("n_nationkey"))
    }),

    // Small-file compaction: orders written as 40 deliberately tiny
    // files, compacted to target-sized ones (shuffle-free coalesce),
    // read back — the maintenance pass that keeps a streaming-fed table
    // scannable. The oracle is the original table: compaction must be
    // a pure re-layout.
    "io_compact_roundtrip" -> ((s, dir) => {
      val src = Tables(s, dir, "orders")
      val shattered = tmpDir("shatter")
      src.repartition(40).write.mode("overwrite").parquet(shattered)
      val out = tmpDir("compact")
      ParquetSource.compact(s, shattered, out)
      ParquetSource.load(s, out).orderBy(col("o_orderkey"))
    }),

    // The multimodal INGESTION face: `binaryFile` is how a media corpus
    // (images/audio/video as raw files) enters Spark — one (path,
    // length, content) row per file, split across executors by the
    // normal file-partitioning knobs, with the decode operators
    // (MultimodalFunctions) running over `content` downstream. The
    // query writes 200 deterministic files (content a closed-form
    // function of the file index), reads them back through the source
    // and projects id/size/md5; the DuckDB oracle recomputes all three
    // from the same closed form, so the whole path — file write, source
    // scan, binary column — is hash-checked.
    "io_binary_files" -> ((s, _) => {
      val dir = tmpDir("binfiles")
      (0 until 200).foreach { i =>
        Files.write(java.nio.file.Paths.get(s"$dir/$i.bin"),
          s"graft-binary-$i:${i * 31}".getBytes("UTF-8"))
      }
      s.read.format("binaryFile").load(dir)
        .select(
          regexp_extract(col("path"), "(\\d+)\\.bin$", 1).cast("long").as("file_id"),
          col("length").as("n_bytes"),
          md5(col("content")).as("content_md5"))
        .orderBy(col("file_id"))
    }),

    // Raw text shards — the other corpus wire format next to JSON
    // Lines: one document per line, id and body tab-separated, written
    // with the `text` sink and read back with the `text` source (the
    // format a crawl dump or tokenizer-ready shard actually uses).
    // split-on-first-tab recovers the columns; the oracle is the
    // original table, so any fidelity loss in either direction is a
    // hash mismatch. (The fixture corpus is single-line/tab-free by
    // construction — the precondition any line-oriented shard format
    // imposes.)
    "io_text_roundtrip" -> ((s, dir) => {
      val out = tmpDir("text")
      Tables(s, dir, "documents")
        .select(concat_ws("\t", col("doc_id"), col("text")).as("value"))
        .write.mode("overwrite").text(out)
      s.read.text(out)
        .select(
          split(col("value"), "\t", 2).getItem(0).cast("long").as("doc_id"),
          split(col("value"), "\t", 2).getItem(1).as("text"))
        .orderBy(col("doc_id"))
    }),

    // Schema evolution at the SOURCE: two parquet generations of the
    // same table — an old one missing a column, a new full one — read
    // together with mergeSchema, the reconciled superset schema filling
    // the missing column with nulls. union_evolve covers the same
    // semantics as a frame op; this is the read-path face a long-lived
    // corpus directory actually exercises (new shards gain columns, old
    // shards stay as written). Ordered by (key, generation) so the
    // doubled rows are deterministic.
    "io_evolve_read" -> ((s, dir) => {
      val src = nation(s, dir)
      val (oldGen, newGen) = (tmpDir("evolve_old"), tmpDir("evolve_new"))
      src.select(col("n_nationkey"), col("n_name"))
        .write.mode("overwrite").parquet(oldGen)
      src.write.mode("overwrite").parquet(newGen)
      s.read.option("mergeSchema", "true").parquet(oldGen, newGen)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .orderBy(col("n_nationkey"), coalesce(col("n_regionkey"), lit(-1)))
    }),

    // §2.8 scatter_plot: the distributed binning grid behind the render
    // (the render itself is a driver-side paint of these rows).
    "plot_bins" -> ((s, dir) =>
      Display.scatterBins(Tables(s, dir, "lineitem"), "l_quantity", "l_extendedprice", 60, 20)
        .withColumnRenamed("count", "cnt")
        .orderBy(col("bx"), col("by"))),

    // §2.8 PartialEq: dfEqual is row-set + schema equality; the oracle
    // recomputes both verdicts with EXCEPT ALL in DuckDB.
    "df_equal" -> ((s, dir) => {
      val a = nation(s, dir)
      val b = a.withColumn("n_name", concat(col("n_name"), lit("_X")))
      val rows = Seq(
        Seq("identity", Display.dfEqual(a, a)),
        Seq("mutated", Display.dfEqual(a, b)))
      Graft.fromValues(s, Seq("pair", "equal"), rows).orderBy(col("pair"))
    }),

    // §2.8 Display: exact render of the reference's canonical 3×3
    // fixture (FIXTURES.md §1), one output row per rendered line.
    "display_render" -> ((s, _) => {
      val frame = Graft.fromValues(s, Seq("ID", "Name", "Score"), abc)
      val lines = Display.render(frame, 10, Seq(col("ID"))).split("\n").toSeq
      Graft.fromValues(s, Seq("line_no", "text"),
        lines.zipWithIndex.map { case (l, i) => Seq(i, l) }).orderBy(col("line_no"))
    })
  )

  private val fx = "/root/repo/fixtures/io"

  val oracle: Map[String, String] = Map(
    "io_csv_read" ->
      s"SELECT Name, Age, Gender FROM read_csv_auto('$fx/people.csv') ORDER BY Name",
    "io_json_read" ->
      s"""WITH base AS (
         |  SELECT firstName, lastName, age, address, unnest(phoneNumbers) AS ph
         |  FROM read_json_auto('$fx/profile.json'))
         |SELECT firstName, lastName, age,
         |       address.streetAddress AS address_streetAddress,
         |       address.city AS address_city,
         |       address.state AS address_state,
         |       ph.type AS phoneNumbers_type,
         |       ph.number AS phoneNumbers_number
         |FROM base ORDER BY phoneNumbers_type""".stripMargin,
    "io_csv_roundtrip" -> "SELECT * FROM nation ORDER BY n_nationkey",
    "io_json_roundtrip" -> "SELECT * FROM nation ORDER BY n_nationkey",
    "io_parquet_roundtrip" -> "SELECT * FROM nation ORDER BY n_nationkey",
    "io_orc_roundtrip" -> "SELECT * FROM region ORDER BY r_regionkey",
    "io_avro_roundtrip" -> "SELECT * FROM orders ORDER BY o_orderkey",
    "io_text_roundtrip" -> "SELECT doc_id, text FROM documents ORDER BY doc_id",
    "io_evolve_read" ->
      """SELECT * FROM (
           SELECT n_nationkey, n_name, CAST(NULL AS INTEGER) AS n_regionkey FROM nation
           UNION ALL
           SELECT n_nationkey, n_name, n_regionkey FROM nation)
         ORDER BY n_nationkey, coalesce(n_regionkey, -1)""",
    "io_binary_files" ->
      """SELECT CAST(i AS BIGINT) AS file_id,
           CAST(length('graft-binary-' || i || ':' || (i * 31)) AS BIGINT) AS n_bytes,
           md5('graft-binary-' || i || ':' || (i * 31)) AS content_md5
         FROM generate_series(0, 199) t(i) ORDER BY file_id""",
    "io_excel_roundtrip" -> "SELECT * FROM region ORDER BY r_regionkey",
    "io_sql_roundtrip" -> "SELECT * FROM nation ORDER BY n_nationkey",
    "io_compact_roundtrip" -> "SELECT * FROM orders ORDER BY o_orderkey",
    // Identical double arithmetic, term for term, to Display.scatterBins
    // (same op order → same IEEE result → same bin).
    "plot_bins" ->
      """WITH b AS (
        |  SELECT min(CAST(l_quantity AS DOUBLE)) AS xmin, max(CAST(l_quantity AS DOUBLE)) AS xmax,
        |         min(CAST(l_extendedprice AS DOUBLE)) AS ymin, max(CAST(l_extendedprice AS DOUBLE)) AS ymax
        |  FROM lineitem)
        |SELECT CAST(least(floor((CAST(l_quantity AS DOUBLE) - xmin) / (CASE WHEN xmax > xmin THEN xmax - xmin ELSE 1.0 END) * 60), 59) AS INT) AS bx,
        |       CAST(least(floor((CAST(l_extendedprice AS DOUBLE) - ymin) / (CASE WHEN ymax > ymin THEN ymax - ymin ELSE 1.0 END) * 20), 19) AS INT) AS by,
        |       count(*) AS cnt
        |FROM lineitem, b
        |WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "df_equal" ->
      """WITH a AS (SELECT * FROM nation),
        |     b AS (SELECT n_nationkey, n_name || '_X' AS n_name, n_regionkey FROM nation)
        |SELECT 'identity' AS pair,
        |       ((SELECT count(*) FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM a)) = 0
        |    AND (SELECT count(*) FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM a)) = 0) AS equal
        |UNION ALL
        |SELECT 'mutated' AS pair,
        |       ((SELECT count(*) FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)) = 0
        |    AND (SELECT count(*) FROM (SELECT * FROM b EXCEPT ALL SELECT * FROM a)) = 0) AS equal
        |ORDER BY pair""".stripMargin,
    "display_render" ->
      """SELECT * FROM (VALUES
        |  (0, '+----+---------+-------+'),
        |  (1, '| ID | Name    | Score |'),
        |  (2, '+----+---------+-------+'),
        |  (3, '| 1  | Alice   | 3.50  |'),
        |  (4, '| 2  | Bob     | 4.00  |'),
        |  (5, '| 3  | Charlie | 2.50  |'),
        |  (6, '+----+---------+-------+')
        |) AS t(line_no, text) ORDER BY line_no""".stripMargin
  )
}
