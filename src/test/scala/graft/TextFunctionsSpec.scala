package graft

import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Unit coverage for the LLM-pipeline text primitives (normalization,
  * shingles, MinHash, SimHash, language ID). These feed the registered
  * dedup/profile queries; the oracle gate covers end-to-end results,
  * these specs pin the primitive-level semantics. */
class TextFunctionsSpec extends SparkSpecBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c).collect()(0).get(0)

  test("normalize lowercases, collapses whitespace and trims") {
    assert(one(normalize(lit("  Hello   WORLD\t x "))) == "hello world x")
  }

  test("shingles: 3-grams of 5 tokens are 3 distinct ordered windows") {
    val df = Seq("a b c d e").toDF("t")
    val got = df.select(shingles(tokens(col("t")), 3)).collect()(0).getSeq[String](0)
    assert(got == Seq("a b c", "b c d", "c d e"))
  }

  test("shingles of a too-short document are empty, not backwards") {
    val df = Seq("a b").toDF("t")
    assert(df.select(shingles(tokens(col("t")), 3)).collect()(0).getSeq[String](0).isEmpty)
  }

  test("minhash signatures are deterministic and equal for equal docs") {
    val df = Seq("the quick brown fox jumps", "the quick brown fox jumps").toDF("t")
    val sigs = df.select(minhashSignature(shingleHashes(shingles(tokens(col("t")), 3)), 32))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) == sigs(1))
    assert(sigs(0).length == 32)
  }

  test("minhash similarity separates near-dups from unrelated docs") {
    val df = Seq(
      ("a", "one two three four five six seven eight nine ten"),
      ("b", "one two three four five six seven eight nine eleven"), // 1 token differs
      ("c", "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("id", "t")
    val sigs = df.select(col("id"),
        minhashSignature(shingleHashes(shingles(tokens(col("t")), 2)), 64).as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    def est(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
    assert(est(sigs("a"), sigs("b")) > 0.5)
    assert(est(sigs("a"), sigs("c")) < 0.2)
  }

  test("minhash band keys collide iff the band's signature slice matches") {
    val df = Seq("x y z w v u t s").toDF("t")
    val sig = minhashSignature(shingleHashes(shingles(tokens(col("t")), 2)), 16)
    val bands = df.select(minhashBands(sig, 16, 4)).collect()(0).getSeq[Long](0)
    assert(bands.length == 4) // 16/4 bands
    intercept[IllegalArgumentException] { minhashBands(lit(null), 16, 5) }
  }

  test("simhash: identical docs get identical fingerprints, hamming 0") {
    val df = Seq(("a b c d", "a b c d"), ("a b c d", "p q r s")).toDF("x", "y")
    val withFp = df
      .withColumn("hx", transform(tokens(col("x")), xxhash64(_)))
      .withColumn("hy", transform(tokens(col("y")), xxhash64(_)))
      .withColumn("fx", simhash64("hx"))
      .withColumn("fy", simhash64("hy"))
      .withColumn("d", hamming64(col("fx"), col("fy")))
    val d = withFp.select(col("d").cast("long")).collect().map(_.getLong(0))
    assert(d(0) == 0L)
    assert(d(1) > 0L)
  }

  test("simhash chunks: 4 x 16-bit pieces reassemble the fingerprint") {
    val df = Seq(0x1234_5678_9abc_def0L).toDF("fp")
    val ch = df.select(simhashChunks(col("fp"))).collect()(0).getSeq[Long](0)
    assert(ch == Seq(0xdef0L, 0x9abcL, 0x5678L, 0x1234L))
  }

  test("langId picks the language with the most marker hits") {
    val df = Seq(
      "the cat sat on the mat and the dog", // en
      "der hund und die katze ist ein tier", // de
      "el perro y la casa es un lugar",      // es
      "xyzzy plugh qwerty").toDF("t")        // und
    val got = df.select(langId(tokens(col("t")))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("en", "de", "es", "und"))
  }

  test("wordHits counts occurrences, not distinct hits") {
    val df = Seq("the the the a").toDF("t")
    assert(one(wordHits(tokens(lit("the the the a")), Seq("the", "a"))) == 4)
  }
}
