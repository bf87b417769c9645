package graft.queries

import java.sql.Timestamp

import graft.Tables
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Typed Dataset[T] surface: case-class Encoders where compile-time
  * safety helps (ETL code touching many columns by name). The typed API
  * compiles field access instead of resolving strings at runtime; the
  * cost is Encoder serialization at Dataset boundaries, so the engine
  * uses it for business logic and drops to DataFrame for pure
  * relational plans (both appear here on purpose).
  */
object Typed extends QueryModule {

  /** lineitem rows an ETL author works with by field name. */
  case class LineItem(l_orderkey: Long, l_quantity: Double,
                      l_extendedprice: Double, l_discount: Double,
                      l_returnflag: String, l_linestatus: String)

  case class Order(o_orderkey: Long, o_custkey: Long, o_totalprice: Double,
                   o_orderstatus: String, o_orderdate: Timestamp)

  val queries: Map[String, Q] = Map(
    // Typed pipeline: Dataset[LineItem] -> typed filter + computed case
    // class -> relational aggregation. The filter and net-price math are
    // plain Scala (compiler-checked); the groupBy drops back to columns
    // so Catalyst keeps partial aggregation.
    "typed_revenue" -> ((s, dir) => {
      implicit val liEnc = Encoders.product[LineItem]
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_discount"), col("l_returnflag"), col("l_linestatus"))
        .as[LineItem]
      li.filter((r: LineItem) => r.l_quantity > 10.0 && r.l_discount < 0.05)
        .map((r: LineItem) => (r.l_returnflag, r.l_extendedprice * (1.0 - r.l_discount)))(
          Encoders.tuple(Encoders.STRING, Encoders.scalaDouble))
        .toDF("rf", "net")
        .groupBy(col("rf"))
        .agg(round(sum(col("net")), 2).as("revenue"), count(lit(1)).as("n"))
        .orderBy(col("rf"))
    }),

    // KeyValueGroupedDataset.mapGroups: arbitrary per-group Scala logic
    // (the batch sibling of mapGroupsWithState) — here a fold computing
    // count/spend/max per customer. Each group is one shuffle partition
    // stream; state is O(1) per group. Use for logic aggregates can't
    // express; for plain count/sum/max the relational path (one line
    // down in typed_revenue) keeps partial aggregation — this query
    // exists to pin the API's correctness, and the oracle shows the
    // semantics ARE the relational ones.
    "typed_group_stats" -> ((s, dir) => {
      implicit val ordEnc = Encoders.product[Order]
      val tup = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaDouble, Encoders.scalaDouble)
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderstatus"), col("o_orderdate").cast("timestamp").as("o_orderdate"))
        .as[Order]
        .groupByKey(_.o_custkey)(Encoders.scalaLong)
        .mapGroups { (cust: Long, rows: Iterator[Order]) =>
          var n = 0L; var spend = 0.0; var top = Double.MinValue
          rows.foreach { r =>
            n += 1; spend += r.o_totalprice; top = math.max(top, r.o_totalprice)
          }
          (cust, n, spend, top)
        }(tup)
        .toDF("o_custkey", "n_orders", "spend", "top_order")
        .select(col("o_custkey"), col("n_orders"),
          round(col("spend"), 2).as("spend"), round(col("top_order"), 2).as("top_order"))
        .orderBy(col("o_custkey"))
    }))

  val oracle: Map[String, String] = Map(
    "typed_revenue" ->
      """SELECT l_returnflag AS rf,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0 AS revenue,
         count(*) AS n
         FROM lineitem
         WHERE l_quantity > 10.0 AND l_discount < 0.05
         GROUP BY 1 ORDER BY 1""",
    "typed_group_stats" ->
      """SELECT o_custkey, count(*) AS n_orders,
         round(sum(o_totalprice), 2) + 0.0 AS spend,
         round(max(o_totalprice), 2) + 0.0 AS top_order
         FROM orders GROUP BY 1 ORDER BY 1""")
}
