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

  test("jaro_winkler and vec_sum_agg are callable from SQL") {
    NativeExpressions.registerSql(spark)
    val r = spark.sql(
      "SELECT jaro_winkler('martha', 'marhta') AS jw").collect()(0)
    assert(r.getDouble(0) == 0.9611111111111111) // DuckDB reference value
    spark.range(4).createOrReplaceTempView("vs_ids")
    val v = spark.sql(
      """SELECT vec_sum_agg(array(CAST(id AS DOUBLE), 1.0D), 2) AS s
         FROM vs_ids""").collect()(0).getSeq[Double](0)
    assert(v == Seq(4.0, 6.0, 4.0)) // [n, sum(id), sum(1)]
  }

  test("the mergeable sketch family is callable from SQL") {
    NativeExpressions.registerSql(spark)
    spark.range(3000).createOrReplaceTempView("sq_ids")
    val r = spark.sql(
      """SELECT theta_estimate(theta_sketch_agg(id)) AS ndv,
                freq_estimate(freq_sketch_agg(CAST(id % 5 AS STRING)), '3') AS f3,
                freq_max_error(freq_sketch_agg(CAST(id % 5 AS STRING))) AS me,
                kll_quantiles(kll_sketch_agg(CAST(id AS DOUBLE)), array(0.5)) AS q,
                gramian_agg(array(CAST(id AS DOUBLE)), 1) AS mom
         FROM sq_ids""").collect()(0)
    assert(r.getDouble(0) == 3000.0) // theta exact below nominal
    assert(r.getLong(1) == 600L && r.getLong(2) == 0L) // freq exact, no purge
    assert(math.abs(r.getSeq[Double](3).head - 1500.0) <= 60.0) // kll p50
    val mom = r.getSeq[Double](4)
    assert(mom(0) == 3000.0 && mom(1) == 3000.0 * 2999 / 2) // n, sum(id)
  }

  test("sketch size parameters must be integer literals") {
    NativeExpressions.registerSql(spark)
    intercept[Exception] {
      spark.sql("SELECT freq_sketch_agg('a', cast(rand()*3 AS INT))").collect()
    }
  }
}
