package graft.queries

import graft.{Graft, Tables}
import graft.operators.GraftOps._
import org.apache.spark.sql.functions._

/** One oracle-checked query per reference operator (SURVEY.md §2.1-2.7),
  * exercised through the GraftOps library surface so the driver gate
  * covers the real API, not ad-hoc query code.
  *
  * Positional operators (cell/loc/iloc/head/tail/zip) take explicit
  * ordering columns — the distributed-correct reading of the reference's
  * implicit row order (SURVEY §1.3).
  */
object Parity extends QueryModule {

  private val abc: Seq[Seq[Any]] =
    Seq(Seq(1L, "Alice", 3.5), Seq(2L, "Bob", 4.0), Seq(3L, "Charlie", 2.5))

  val queries: Map[String, Q] = Map(
    // §2.1 constructors
    "parity_from_values" -> ((s, _) =>
      Graft.fromValues(s, Seq("id", "name", "score"), abc).orderBy(col("id"))),
    "parity_new_columnar" -> ((s, _) =>
      Graft.fromColumns(s,
        Map("id" -> Seq(1L, 2L, 3L), "name" -> Seq("Alice", "Bob", "Charlie"),
          "score" -> Seq(3.5, 4.0, 2.5)),
        Seq("id", "name", "score")).orderBy(col("id"))),

    // §2.2 projection / access
    // The sort exists only for hash determinism; c_custkey tiebreak keeps
    // range partitioning from degenerating to ~5 reducers on the 5-value
    // segment key (output is unchanged: equal-key rows are identical).
    "parity_column" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .orderBy(col("c_mktsegment"), col("c_custkey"))
        .columnValues("c_mktsegment")),
    "parity_cell_get" -> ((s, dir) =>
      Tables(s, dir, "customer").cellAt(41L, "c_name", Seq(col("c_custkey")))),
    "parity_loc" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .locRows(Seq(9L, 19L, 29L), Some(Seq("c_custkey", "c_name", "c_acctbal")), Seq(col("c_custkey")))
        .orderBy(col("c_custkey"))),
    "parity_iloc" -> ((s, dir) =>
      Tables(s, dir, "customer").ilocCell(7L, 1, Seq(col("c_custkey")))),
    "parity_head" -> ((s, dir) =>
      Tables(s, dir, "orders").headRows(5, Seq(col("o_orderkey")))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),
    "parity_tail" -> ((s, dir) =>
      Tables(s, dir, "orders").tailRows(5, Seq(col("o_orderkey")))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // §2.3 schema mutation
    "parity_add_column" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .addColumn("tier", when(col("c_acctbal") < 0, lit("neg"))
          .when(col("c_acctbal") < 5000, lit("mid")).otherwise(lit("high")))
        .select(col("c_custkey"), col("c_acctbal"), col("tier"))
        .orderBy(col("c_custkey"))),
    "parity_remove_column" -> ((s, dir) =>
      Tables(s, dir, "supplier").removeColumn("s_nationkey").orderBy(col("s_suppkey"))),

    // §2.4 aggregations
    "parity_sum" -> ((s, dir) =>
      Tables(s, dir, "lineitem").sumCol("l_quantity")
        .select(round(col("sum_l_quantity"), 2).as("sum_l_quantity"))),
    "parity_mean" -> ((s, dir) =>
      Tables(s, dir, "lineitem").meanCol("l_quantity")
        .select(round(col("mean_l_quantity"), 6).as("mean_l_quantity"))),
    "parity_variance" -> ((s, dir) =>
      Tables(s, dir, "customer").varianceCol("c_acctbal")
        .select(round(col("var_c_acctbal"), 4).as("var_c_acctbal"))),
    "parity_stddev" -> ((s, dir) =>
      Tables(s, dir, "customer").stdDevCol("c_acctbal")
        .select(round(col("std_c_acctbal"), 6).as("std_c_acctbal"))),
    "parity_min" -> ((s, dir) => Tables(s, dir, "part").minAll()),
    "parity_max" -> ((s, dir) => Tables(s, dir, "part").maxAll()),
    "parity_count" -> ((s, dir) => Tables(s, dir, "customer").countNonNull()),
    "parity_shape" -> ((s, dir) => {
      val df = Tables(s, dir, "customer")
      df.agg(count(lit(1)).as("n_rows")).select(col("n_rows"), lit(df.columns.length.toLong).as("n_cols"))
    }),
    "parity_describe" -> ((s, dir) =>
      Tables(s, dir, "customer").select(col("c_acctbal"), col("c_nationkey"))
        .describeStats(exact = true) // bit-exact quantiles for the DuckDB hash compare
        .select(col("column"), col("count"),
          round(col("mean"), 6).as("mean"), round(col("stddev"), 6).as("stddev"),
          col("min"), round(col("p25"), 6).as("p25"), round(col("p50"), 6).as("p50"),
          round(col("p75"), 6).as("p75"), col("max"))
        .orderBy(col("column"))),

    // §2.5 filters / query
    "parity_filter" -> ((s, dir) =>
      Tables(s, dir, "customer").filterRows(col("c_acctbal") > 5000)
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_custkey"))),
    "parity_query" -> ((s, dir) =>
      Tables(s, dir, "customer").query("c_mktsegment == 'BUILDING'")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))),

    // §2.6 missing data (testdata has no nulls; synthesize deterministically)
    "parity_dropna" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .addColumn("bal", when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
        .select(col("c_custkey"), col("bal"))
        .dropNa()
        .orderBy(col("c_custkey"))),
    "parity_fillna" -> ((s, dir) =>
      Tables(s, dir, "customer")
        .addColumn("bal", when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")))
        .select(col("c_custkey"), col("bal"))
        .fillNa("bal", 0.0)
        .orderBy(col("c_custkey"))),

    // §2.7 combining
    "parity_concat_rows" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
        .select(col("c_custkey").as("key"), col("c_acctbal").as("bal"), lit("cust").as("src"))
      val p = Tables(s, dir, "supplier")
        .select(col("s_suppkey").as("key"), col("s_acctbal").as("bal"), lit("supp").as("src"))
      c.concatRows(p).orderBy(col("src"), col("key"))
    }),
    "parity_concat_columns" -> ((s, dir) => {
      val left = Tables(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      val right = Tables(s, dir, "customer")
        .select(col("c_custkey").as("cust_id"), col("c_acctbal").as("bal"))
      left.concatColumns(right, Seq(col("c_custkey")), Seq(col("cust_id")))
        .orderBy(col("c_custkey"))
    }))

  val oracle: Map[String, String] = Map(
    "parity_from_values" ->
      """SELECT CAST(id AS BIGINT) AS id, name, CAST(score AS DOUBLE) AS score
         FROM (VALUES (1, 'Alice', 3.5), (2, 'Bob', 4.0), (3, 'Charlie', 2.5))
           AS t(id, name, score) ORDER BY id""",
    "parity_new_columnar" ->
      """SELECT CAST(id AS BIGINT) AS id, name, CAST(score AS DOUBLE) AS score
         FROM (VALUES (1, 'Alice', 3.5), (2, 'Bob', 4.0), (3, 'Charlie', 2.5))
           AS t(id, name, score) ORDER BY id""",
    "parity_column" ->
      "SELECT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "parity_cell_get" ->
      """SELECT c_name FROM (
           SELECT c_name, row_number() OVER (ORDER BY c_custkey) - 1 AS rn FROM customer)
         WHERE rn = 41""",
    "parity_loc" ->
      """SELECT c_custkey, c_name, c_acctbal FROM (
           SELECT c_custkey, c_name, c_acctbal,
                  row_number() OVER (ORDER BY c_custkey) - 1 AS rn FROM customer)
         WHERE rn IN (9, 19, 29) ORDER BY c_custkey""",
    "parity_iloc" ->
      """SELECT c_name FROM (
           SELECT c_name, row_number() OVER (ORDER BY c_custkey) - 1 AS rn FROM customer)
         WHERE rn = 7""",
    "parity_head" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_orderkey LIMIT 5""",
    "parity_tail" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM (
           SELECT * FROM orders ORDER BY o_orderkey DESC LIMIT 5)
         ORDER BY o_orderkey""",
    "parity_add_column" ->
      """SELECT c_custkey, c_acctbal,
         CASE WHEN c_acctbal < 0 THEN 'neg'
              WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS tier
         FROM customer ORDER BY c_custkey""",
    "parity_remove_column" ->
      "SELECT s_suppkey, s_name, s_acctbal FROM supplier ORDER BY s_suppkey",
    "parity_sum" ->
      "SELECT round(sum(l_quantity), 2) + 0.0 AS sum_l_quantity FROM lineitem",
    "parity_mean" ->
      "SELECT round(avg(l_quantity), 6) + 0.0 AS mean_l_quantity FROM lineitem",
    "parity_variance" ->
      "SELECT round(var_samp(c_acctbal), 4) + 0.0 AS var_c_acctbal FROM customer",
    "parity_stddev" ->
      "SELECT round(stddev_samp(c_acctbal), 6) + 0.0 AS std_c_acctbal FROM customer",
    "parity_min" ->
      """SELECT min(p_partkey) AS min_p_partkey, min(p_size) AS min_p_size,
         min(p_retailprice) AS min_p_retailprice FROM part""",
    "parity_max" ->
      """SELECT max(p_partkey) AS max_p_partkey, max(p_size) AS max_p_size,
         max(p_retailprice) AS max_p_retailprice FROM part""",
    "parity_count" ->
      """SELECT count(c_custkey) AS count_c_custkey, count(c_name) AS count_c_name,
         count(c_nationkey) AS count_c_nationkey, count(c_acctbal) AS count_c_acctbal,
         count(c_mktsegment) AS count_c_mktsegment FROM customer""",
    "parity_shape" ->
      "SELECT count(*) AS n_rows, CAST(5 AS BIGINT) AS n_cols FROM customer",
    "parity_describe" ->
      """SELECT "column", count, round(mean, 6) + 0.0 AS mean, round(stddev, 6) + 0.0 AS stddev,
                min, round(p25, 6) + 0.0 AS p25, round(p50, 6) + 0.0 AS p50, round(p75, 6) + 0.0 AS p75, max
         FROM (
           SELECT 'c_acctbal' AS "column", count(c_acctbal) AS count,
             avg(c_acctbal) AS mean, stddev_samp(c_acctbal) AS stddev,
             min(c_acctbal) AS min, quantile_cont(c_acctbal, 0.25) AS p25,
             quantile_cont(c_acctbal, 0.5) AS p50, quantile_cont(c_acctbal, 0.75) AS p75,
             max(c_acctbal) AS max FROM customer
           UNION ALL
           SELECT 'c_nationkey', count(c_nationkey),
             avg(c_nationkey), stddev_samp(CAST(c_nationkey AS DOUBLE)),
             CAST(min(c_nationkey) AS DOUBLE), quantile_cont(CAST(c_nationkey AS DOUBLE), 0.25),
             quantile_cont(CAST(c_nationkey AS DOUBLE), 0.5), quantile_cont(CAST(c_nationkey AS DOUBLE), 0.75),
             CAST(max(c_nationkey) AS DOUBLE) FROM customer)
         ORDER BY "column"""",
    "parity_filter" ->
      """SELECT c_custkey, c_acctbal FROM customer
         WHERE c_acctbal > 5000 ORDER BY c_custkey""",
    "parity_query" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""",
    "parity_dropna" ->
      """SELECT c_custkey, c_acctbal AS bal FROM customer
         WHERE c_acctbal >= 0 ORDER BY c_custkey""",
    "parity_fillna" ->
      """SELECT c_custkey,
         CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END AS bal
         FROM customer ORDER BY c_custkey""",
    "parity_concat_rows" ->
      """SELECT key, bal, src FROM (
           SELECT c_custkey AS key, c_acctbal AS bal, 'cust' AS src FROM customer
           UNION ALL
           SELECT s_suppkey, s_acctbal, 'supp' FROM supplier)
         ORDER BY src, key""",
    "parity_concat_columns" ->
      """SELECT c_custkey, c_name, c_custkey AS cust_id, c_acctbal AS bal
         FROM customer ORDER BY c_custkey""")
}
