package graft

import graft.tools.ScaleFixture
import org.apache.spark.sql.functions._

/** The 10× fixture generator backs SCALING.md's evidence, so its
  * invariants are pinned: exact row multiplication, key disjointness
  * across replicas (joins stay valid), and the two anti-pathology
  * transforms — token-shuffled documents (no planted near-dup twins)
  * and regenerated embeddings (no planted cos≈1 pairs). */
class ScaleFixtureSpec extends SparkSpecBase {

  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-scalefix").toString
    ScaleFixture.generate(spark, "/root/testdata/sf0.001", dir, 3)
    dir
  }
  private def t(n: String) = spark.read.parquet(s"$out/$n.parquet")

  test("facts and scaled dims multiply by the replica count; fixed dims don't") {
    val src = (n: String) => Tables(spark, "/root/testdata/sf0.001", n).count()
    for (n <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(t(n).count() == 3 * src(n), n)
    for (n <- Seq("region", "nation"))
      assert(t(n).count() == src(n), n)
  }

  test("replicated keys are globally unique and joins stay valid") {
    assert(t("orders").select("o_orderkey").distinct().count() == t("orders").count())
    assert(t("events").select("event_id").distinct().count() == t("events").count())
    // every lineitem order key resolves: offsets moved fact and dim in lockstep
    val dangling = t("lineitem").join(t("orders"),
      col("l_orderkey") === col("o_orderkey"), "left_anti").count()
    assert(dangling == 0, s"$dangling lineitem rows lost their order")
  }

  test("documents are shuffled per replica: same token mass, no exact twins") {
    val d = t("documents")
    // token multiset is preserved -> corpus token count is 3x the source
    val srcToks = Tables(spark, "/root/testdata/sf0.001", "documents")
      .select(size(split(col("text"), " ")).as("n")).agg(sum("n")).first().getLong(0)
    assert(d.select(size(split(col("text"), " ")).as("n")).agg(sum("n"))
      .first().getLong(0) == 3 * srcToks)
    // replicas of multi-token docs must not be byte-identical to their source
    val twins = d.filter(col("doc_id") >= 100000000L)
      .select((col("doc_id") % 100000000L).as("doc_id"), col("text").as("rep"))
      .join(Tables(spark, "/root/testdata/sf0.001", "documents"), "doc_id")
      .filter(col("rep") === col("text") && size(split(col("text"), " ")) > 3)
      .count()
    assert(twins == 0, s"$twins replica docs identical to source")
  }

  test("embeddings keep shape but replicas are fresh directions") {
    val e = t("embeddings")
    assert(e.select(size(col("embedding"))).distinct().collect().map(_.getInt(0)).toSeq == Seq(64))
    // replicas must not duplicate the source vector (no planted cos=1 pairs)
    val dup = e.filter(col("vec_id") >= 100000000L)
      .select((col("vec_id") % 100000000L).as("vec_id"), col("embedding").as("rep"))
      .join(Tables(spark, "/root/testdata/sf0.001", "embeddings"), "vec_id")
      .filter(col("rep") === col("embedding")).count()
    assert(dup == 0, s"$dup replica vectors identical to source")
  }
}
