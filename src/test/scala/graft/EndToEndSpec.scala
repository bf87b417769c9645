package graft

import java.nio.file.Files

import graft.operators.Dedup
import graft.operators.GraftOps._
import graft.functions.TextFunctions._
import graft.sources.{CsvSource, ParquetSource}
import org.apache.spark.sql.functions._

/** One composed user journey through the library surface: ingest CSV,
  * clean, derive, dedup, profile, persist, reload — the "switch from
  * randas" workflow end to end. */
class EndToEndSpec extends SparkSpecBase {
  import spark.implicits._

  test("csv -> clean -> dedup -> profile -> parquet round trip composes") {
    val dir = Files.createTempDirectory("e2e").toString

    // 1. ingest: write then read a small corpus as CSV
    val raw = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs home", "en"),
      (2L, "THE  quick brown fox jumps over the lazy dog and runs home", "en"), // dup of 1
      (3L, "der hund und die katze ist ein tier im haus und garten", "de"),
      (4L, null.asInstanceOf[String], "xx"), // null text
      (5L, "spark shuffles partitions and broadcasts the small build side", "en")
    ).toDF("doc_id", "text", "lang")
    CsvSource.write(raw, s"$dir/in")
    // CSV inference picks the narrowest integral type; widen the key
    val docs = CsvSource.read(spark, s"$dir/in")
      .addColumn("doc_id", col("doc_id").cast("long"))

    // 2. clean: drop null-text rows (randas dropna semantics)
    val clean = docs.filterRows(col("text").isNotNull)
    assert(clean.count() == 4)

    // 3. dedup: exact groups identify the case/whitespace duplicate
    val dups = Dedup.exactDupGroups(clean, "doc_id", "text").collect()
    assert(dups.length == 1 && dups(0).getAs[Long]("keep_id") == 1L)
    val deduped = clean.filterRows(!col("doc_id").isin(
      dups.map(_.getAs[Long]("keep_id") + 1): _*)) // drop doc 2

    // 4. profile: language ID and token counts per surviving doc
    val profiled = deduped
      .addColumn("lang_id", langId(tokens(col("text"))))
      .addColumn("n_tokens", size(tokens(col("text"))))
    val langs = profiled.select("doc_id", "lang_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getString(1)).toMap
    assert(langs(1L) == "en" && langs(3L) == "de")

    // 5. persist + reload, nothing lost
    ParquetSource.save(profiled, s"$dir/out")
    val back = ParquetSource.load(spark, s"$dir/out")
    assert(back.count() == 3)
    assert(back.columns.toSet == Set("doc_id", "text", "lang", "lang_id", "n_tokens"))
  }
}
