package graft

import org.apache.spark.sql.graft.NativeExpressions
import org.apache.spark.sql.functions._

/** SQL-surface registration of the native sketch expressions: after
  * `registerSql` (or session build with graft.GraftExtensions) the
  * functions are callable from plain SQL. */
class GraftSqlSpec extends SparkSpecBase {

  test("simhash64 and minhash_signature are callable from SQL") {
    NativeExpressions.registerSql(spark)
    val r = spark.sql(
      """SELECT simhash64(array(1L, 2L, 3L)) AS fp,
                minhash_signature(array(5L, 9L), 16) AS sig""").collect()(0)
    val viaApi = spark.range(1)
      .select(NativeExpressions.simhash64(array(lit(1L), lit(2L), lit(3L))).as("fp"),
        NativeExpressions.minhashSignature(array(lit(5L), lit(9L)), 16).as("sig"))
      .collect()(0)
    assert(r.getLong(0) == viaApi.getLong(0))
    assert(r.getSeq[Long](1) == viaApi.getSeq[Long](1))
    assert(r.getSeq[Long](1).length == 16)
  }

  test("minhash_signature rejects a non-literal k") {
    NativeExpressions.registerSql(spark)
    intercept[Exception] {
      spark.sql("SELECT minhash_signature(array(1L), cast(rand()*4 AS INT))").collect()
    }
  }

  test("vec_dot, vec_cosine and word_shingles are callable from SQL") {
    NativeExpressions.registerSql(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d,
                vec_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
                word_shingles(array('a', 'b', 'c'), 2) AS sh""").collect()(0)
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getSeq[String](2) == Seq("a b", "b c"))
  }

  test("word_shingles rejects a non-literal n") {
    NativeExpressions.registerSql(spark)
    intercept[Exception] {
      spark.sql("SELECT word_shingles(array('a'), cast(rand()*3 AS INT))").collect()
    }
  }
}
