package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.NativeExpressions

/** SparkSessionExtensions entry point: build a session with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` and the
  * native sketch expressions become SQL functions
  * (`SELECT simhash64(hashes) ...`, `minhash_signature(hashes, k)`).
  * For an already-built session use `NativeExpressions.registerSql`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    NativeExpressions.injectInto(ext)
}
