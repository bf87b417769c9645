package graft

/** Driver-contract invariants. These catch integration mistakes that
  * would otherwise surface only as a silently weaker correctness round:
  * a query name colliding across modules shadows one of them in the
  * flattened map; an oracle key without a query never gets compared. */
class ContractSpec extends SparkSpecBase {

  // the real module list — using SparkEntry's own, so this spec cannot
  // drift when a module is added
  private val modules = SparkEntry.modules

  test("no query name is shadowed across modules") {
    val all = modules.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"shadowed query names: $dups")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle key has a registered query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle SQL without a query: $dangling")
  }

  test("oracle coverage: every registered query is hash-gated") {
    // dedup_simhash left the rows-only set in round 6 (md5-derived
    // shingle hashes made the fingerprints engine-portable);
    // ann_cosine_lsh and bpe_merges in round 8 (plane constants spliced
    // into the oracle; fixed-round list_reduce CTE fold); profile_sketch
    // in round 9 — it now emits exact NDVs plus deterministic
    // sketch-within-bound booleans the oracle reproduces closed-form.
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, rowsOnly.toString)
  }

  test("query names are stable identifiers") {
    assert(SparkEntry.queries.keys.forall(_.matches("[a-z0-9_]+")))
  }

  test("flagship entry returns rows on the smoke scale factor") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  // ---- testdata drift smoke check -----------------------------------
  // The driver regenerates /root/testdata between rounds and has
  // changed physical column types before (events.ts flipped
  // TIMESTAMP(NANOS) -> plain micros in round 7, silently erroring all
  // 18 events consumers). Pin the post-loader logical schema of every
  // table so any future flip fails HERE, loudly, with the table name —
  // not as 18 opaque query failures. Timestamp flavors (TZ vs NTZ) are
  // normalized: under the UTC sessions graft runs, they are
  // value-identical and query-compatible, so only a genuine type change
  // (e.g. timestamp -> bigint) should trip this.
  private def normalize(dt: org.apache.spark.sql.types.DataType): String = dt match {
    case _: org.apache.spark.sql.types.TimestampType    => "timestamp"
    case _: org.apache.spark.sql.types.TimestampNTZType => "timestamp"
    case org.apache.spark.sql.types.ArrayType(e, _)     => s"array<${normalize(e)}>"
    case other                                          => other.simpleString
  }

  private val expectedSchemas: Map[String, Seq[(String, String)]] = Map(
    "region"   -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation"   -> Seq("n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string", "c_nationkey" -> "int",
                      "c_acctbal" -> "double", "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string", "s_nationkey" -> "int",
                      "s_acctbal" -> "double"),
    "part"     -> Seq("p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
                      "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
    "orders"   -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint", "o_orderstatus" -> "string",
                      "o_totalprice" -> "double", "o_orderdate" -> "timestamp",
                      "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint", "l_suppkey" -> "bigint",
                      "l_linenumber" -> "int", "l_quantity" -> "double",
                      "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
                      "l_returnflag" -> "string", "l_linestatus" -> "string",
                      "l_shipdate" -> "timestamp"),
    "events"   -> Seq("event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
                      "event_type" -> "string", "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
                       "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int"))

  test("testdata drift: every table loads with its expected logical schema") {
    val dir = "/root/testdata/sf0.001"
    val bad = Tables.names.flatMap { t =>
      val got = Tables(spark, dir, t).schema.fields.toSeq
        .map(f => f.name -> normalize(f.dataType))
      if (got == expectedSchemas(t)) None
      else Some(s"$t: expected ${expectedSchemas(t)} got $got")
    }
    assert(bad.isEmpty, "testdata drift detected (fix Tables loader or update " +
      s"expectations):\n${bad.mkString("\n")}")
  }
}
