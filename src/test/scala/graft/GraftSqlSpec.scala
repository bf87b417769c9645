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
}
