package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.graft.NativeExpressions
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._

/** Pins the native codegen'd sketch expressions to the higher-order-
  * function reference formulations: same inputs => identical outputs.
  * The HOF versions define the semantics; the native ones are the fast
  * path used by the Dedup operators. */
class NativeExprSpec extends SparkSpecBase {
  import spark.implicits._

  private val docs = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b", // too short for 3-grams -> empty hash array
    "one two three four five six seven eight nine ten eleven twelve",
    "spark scale shuffle partition broadcast join agg window",
    "the quick brown fox jumps over the lazy cat").toDF("t")

  private def hashed = docs
    .withColumn("toks", tokens(col("t")))
    .withColumn("sh", shingles(col("toks"), 3))
    .withColumn("hs", shingleHashes(col("sh")))

  test("native minhash signature equals the HOF formulation") {
    val k = 64
    val both = hashed
      .withColumn("a", TextFunctions.minhashSignature(col("hs"), k))
      .withColumn("b", NativeExpressions.minhashSignature(col("hs"), k))
      .select(col("a"), col("b")).collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
    }
  }

  test("native simhash equals the HOF formulation, incl. empty arrays") {
    val both = hashed
      .withColumn("hofFp", expr(
        """aggregate(sequence(0, 63), 0L, (fp, i) ->
             fp + CASE WHEN aggregate(hs, 0L,
                 (acc, h) -> acc + CASE WHEN (shiftright(h, i) & 1) = 1 THEN 1L ELSE -1L END) > 0
               THEN shiftleft(1L, i) ELSE 0L END)"""))
      .withColumn("natFp", NativeExpressions.simhash64(col("hs")))
      .select(col("hofFp"), col("natFp")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("native word shingles equal the HOF formulation incl. dedup and order") {
    val both = docs
      .withColumn("toks", tokens(col("t")))
      .withColumn("a", shingles(col("toks"), 3))
      .withColumn("b", NativeExpressions.wordShingles(col("toks"), 3))
      .select(col("a"), col("b")).collect()
    both.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
    // repeated-window dedup keeps first occurrence, like array_distinct
    val rep = Seq("a b a b a b").toDF("t")
      .select(NativeExpressions.wordShingles(tokens(col("t")), 2))
      .collect()(0).getSeq[String](0)
    assert(rep == Seq("a b", "b a"))
  }

  test("native expressions survive both codegen and interpreted paths") {
    // force interpreted fallback by evaluating through a filter too
    val n = hashed.withColumn("fp", NativeExpressions.simhash64(col("hs")))
      .filter(col("fp") =!= 0L).count()
    assert(n >= 3)
  }
}
