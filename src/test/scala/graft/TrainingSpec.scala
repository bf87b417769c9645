package graft

import graft.queries.Training
import org.apache.spark.sql.functions._

/** Invariants of the round-4 training-prep queries (Training.scala)
  * that the DuckDB hash-compare can't see: reconstruction/overlap
  * properties of chunking, bin-boundary arithmetic of packing,
  * no-residual-PII after scrubbing, entropy bounds, quota exactness. */
class TrainingSpec extends SparkSpecBase {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("doc_chunks: stride/size arithmetic covers every token exactly") {
    val docs = Tables(spark, sfDir, "documents")
      .select(col("doc_id"), size(graft.functions.TextFunctions.tokens(col("text"))).as("n"))
      .filter(col("n") > 0)
    val chunks = Training.queries("doc_chunks")(spark, sfDir)
    val got = chunks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"), max(col("chunk_idx")).as("last_idx"),
        min(col("n_chunk_tokens")).as("min_len"), max(col("n_chunk_tokens")).as("max_len"))
      .join(docs, "doc_id")
    // ceil(n/stride) chunks, indices dense 0..k-1, every chunk <= 50
    // tokens, and the last window starts before the doc ends
    assert(got.filter(col("n_chunks") =!= ceil(col("n").cast("double") / 40)).count() == 0)
    assert(got.filter(col("last_idx") =!= col("n_chunks") - 1).count() == 0)
    assert(got.filter(col("max_len") > 50 || col("min_len") < 1).count() == 0)
    assert(got.filter(col("last_idx") * 40 >= col("n")).count() == 0)
  }

  test("doc_chunks: consecutive chunks overlap by size-stride tokens") {
    // re-derive chunk token arrays for one doc and check the 10-token
    // overlap: chunk i's tokens [40..50) == chunk i+1's tokens [0..10)
    val toks = graft.functions.TextFunctions
      .tokens(lit((1 to 95).map(i => s"t$i").mkString(" ")))
    val df = spark.range(1).select(toks.as("toks"))
      .select(explode(sequence(lit(0), lit(2))).as("i"), col("toks"))
      .select(col("i"), slice(col("toks"), col("i") * 40 + 1, lit(50)).as("c"))
    val rows = df.orderBy("i").collect().map(_.getSeq[String](1))
    assert(rows(0).length == 50 && rows(1).length == 50 && rows(2).length == 15)
    assert(rows(0).drop(40) == rows(1).take(10))
    assert(rows(1).drop(40) == rows(2).take(10))
  }

  test("seq_pack: offsets stay inside the budget and packs fill sequentially") {
    val packed = Training.queries("seq_pack")(spark, sfDir).cache()
    try {
      assert(packed.filter(col("pack_offset") < 0 || col("pack_offset") >= 2048).count() == 0)
      assert(packed.filter(col("pack_id") < 0).count() == 0)
      // every document lands exactly once
      assert(packed.select("doc_id").distinct().count() == packed.count())
      // within a shard, cum = pack_id*2048 + offset is the exclusive
      // running sum, so total tokens == max(cum) + last doc's n_tokens
      val perShard = packed
        .select(col("shard"), (col("pack_id") * 2048 + col("pack_offset")).as("cum"),
          col("n_tokens"))
      val tot = perShard.groupBy("shard").agg(sum("n_tokens").as("t"))
      val lastCum = perShard.groupBy("shard").agg(max(col("cum") + col("n_tokens")).as("m"))
      val bad = tot.join(lastCum, "shard").filter(col("t") =!= col("m")).count()
      assert(bad == 0)
    } finally packed.unpersist()
  }

  test("pii_scrub masks every planted pattern (no residual PII)") {
    // run the scrub projection directly on a corpus slice and re-scan
    val phone = "\\b\\d{3}-\\d{4}\\b"
    val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
    val ssn = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
    val aug = Seq(
      "reach me at 555-0199 tonight",
      "server 192.168.10.17 down, card 123-45-6789",
      "no pii here at all").toDF("t")
    val scrubbed = aug.select(
      regexp_replace(regexp_replace(regexp_replace(col("t"),
        ip, "[IP]"), ssn, "[ID]"), phone, "[PHONE]").as("s"))
    val residual = scrubbed.filter(
      size(regexp_extract_all(col("s"), lit(phone), lit(0))) > 0 ||
      size(regexp_extract_all(col("s"), lit(ip), lit(0))) > 0 ||
      size(regexp_extract_all(col("s"), lit(ssn), lit(0))) > 0).count()
    assert(residual == 0)
    val kept = scrubbed.orderBy("s").collect().map(_.getString(0))
    assert(kept.contains("reach me at [PHONE] tonight"))
    assert(kept.contains("server [IP] down, card [ID]"))
    assert(kept.contains("no pii here at all"))
  }

  test("char_entropy: bounds and degenerate cases") {
    val ent = Training.queries("char_entropy")(spark, sfDir).cache()
    try {
      // 0 <= H <= ln(n_distinct_chars), with equality iff uniform/single
      assert(ent.filter(col("char_entropy") < 0).count() == 0)
      assert(ent.filter(col("char_entropy") > log(col("n_distinct_chars").cast("double")) + 1e-6)
        .count() == 0)
    } finally ent.unpersist()
    // hand-computed: "aab" -> -(2/3 ln 2/3 + 1/3 ln 1/3) = 0.636514
    val h = Seq((2.0 / 3, 1.0 / 3)).toDF("pa", "pb")
      .select(round(-(col("pa") * log(col("pa")) + col("pb") * log(col("pb"))), 6))
      .head().getDouble(0)
    assert(h == 0.636514)
  }

  test("quota_sample: exactly min(quota, stratum size) per group, stable order") {
    val q = Training.queries("quota_sample")(spark, sfDir)
    val sizes = Tables(spark, sfDir, "customer")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("stratum"))
    val got = q.groupBy("c_mktsegment").agg(count(lit(1)).as("n"), max("rn").as("maxrn"))
      .join(sizes, "c_mktsegment")
    assert(got.filter(col("n") =!= least(lit(50), col("stratum"))).count() == 0)
    assert(got.filter(col("maxrn") =!= col("n")).count() == 0)
    // determinism: same draw twice
    val again = Training.queries("quota_sample")(spark, sfDir)
    assert(q.exceptAll(again).count() == 0 && again.exceptAll(q).count() == 0)
  }

  test("curation_pipeline_v2: stage counts reconcile against the standalone operators") {
    import graft.operators.{Dedup, Sampling}
    val out = SparkEntry.queries("curation_pipeline_v2")(spark, sfDir).collect()
    // the split column is exactly the three-way partition
    assert(out.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    // total docs in the report == mixed survivors minus near-dup drops
    // (every kept doc has >= 1 token on this fixture, so none vanish
    // from the scoring join)
    val docs = Tables(spark, sfDir, "documents")
    val mixed = Sampling.temperatureMix(docs, col("doc_id"), col("source"),
      alpha = 0.7, targetFraction = 0.3)
    val nMixed = mixed.count()
    val nDropped = Dedup.nearDupPairs(mixed, "doc_id", "text",
        maxDocFreq = Dedup.HotShingleCutoff)
      .select(col("j")).distinct().count()
    assert(out.map(_.getLong(2)).sum == nMixed - nDropped,
      s"report=${out.map(_.getLong(2)).sum} mixed=$nMixed dropped=$nDropped")
    // survivors are pairwise non-near-dup, so the plain salted-hash
    // split is leakage-free BY CONSTRUCTION: no qualifying pair can
    // have both endpoints alive
    val kept = mixed.join(
      Dedup.nearDupPairs(mixed, "doc_id", "text",
        maxDocFreq = Dedup.HotShingleCutoff).select(col("j").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
    val survivorPairs = Dedup.nearDupPairs(kept, "doc_id", "text",
      maxDocFreq = Dedup.HotShingleCutoff).count()
    assert(survivorPairs == 0L, s"$survivorPairs near-dup pairs survived dedup")
  }
}
