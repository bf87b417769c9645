package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Core relational coverage: grouped aggregation, joins of every kind,
  * windows, sort/top-k, distinct, set ops, rollup/cube, scalar functions
  * (SURVEY.md §2.11 — capabilities the reference lacks but a complete
  * engine must have).
  *
  * Scale notes: dimension-side joins are explicitly broadcast; fact-fact
  * aggregation pre-aggregates before joining where possible; every query
  * is expressible as a single Catalyst plan (no driver loops).
  */
object Relational extends QueryModule {

  val queries: Map[String, Q] = Map(
    // Flagship: TPC-H Q1-shaped grouped aggregation over the fact table.
    // Partial (map-side) aggregation makes the shuffle carry only
    // |groups| x |partitions| rows — the plan that survives 100 TB.
    "q1_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Multi-way star join: fact x 4 dims. All dims are broadcast — zero
    // shuffle for the join itself; the only exchange is the final groupBy.
    "join_star" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val ord = Tables(s, dir, "orders")
      val cust = Tables(s, dir, "customer")
      val nat = Tables(s, dir, "nation")
      val reg = Tables(s, dir, "region")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"))
    }),

    // Left outer join with pre-aggregation BEFORE the join: the fact side
    // is reduced to one row per key first, so the join input is minimal.
    "join_left" -> ((s, dir) => {
      val part = Tables(s, dir, "part")
      val liAgg = Tables(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(round(sum(col("l_quantity")), 2).as("qty"))
      part.join(liAgg, col("p_partkey") === col("l_partkey"), "left")
        .select(col("p_partkey"), col("p_brand"),
          coalesce(col("qty"), lit(0.0)).as("qty"))
        .orderBy(col("p_partkey"))
    }),

    // Semi join (EXISTS): customers that have at least one urgent order.
    "join_semi" -> ((s, dir) => {
      val cust = Tables(s, dir, "customer")
      val urgent = Tables(s, dir, "orders")
        .filter(col("o_orderpriority") === lit("1-URGENT"))
      cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Anti join (NOT EXISTS): customers with no urgent order.
    "join_anti" -> ((s, dir) => {
      val cust = Tables(s, dir, "customer")
      val urgent = Tables(s, dir, "orders")
        .filter(col("o_orderpriority") === lit("1-URGENT"))
      cust.join(urgent, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // Full outer join: per-nation customer counts against per-nation
    // supplier counts — either side may miss a nation, both survive.
    // Two pre-aggregations (map-side partials) meet in one co-
    // partitioned join on the tiny key; coalesce fills the gaps.
    "join_full" -> ((s, dir) => {
      val c = Tables(s, dir, "customer").groupBy(col("c_nationkey").as("nk"))
        .agg(count(lit(1)).as("n_cust"))
      val sup = Tables(s, dir, "supplier").groupBy(col("s_nationkey").as("nk2"))
        .agg(count(lit(1)).as("n_supp"))
      c.join(sup, col("nk") === col("nk2"), "full_outer")
        .select(coalesce(col("nk"), col("nk2")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
        .orderBy(col("nationkey"))
    }),

    // Global sort + top-k: Spark runs TakeOrderedAndProject — a per-
    // partition heap + driver merge of k rows, not a full sort.
    "sort_topk" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("o_totalprice"))
        .limit(10)
    }),

    // Distinct over a low-cardinality pair — partial dedup map-side.
    "distinct_pairs" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Set ops the reference lacks entirely: intersect / except.
    "set_intersect" -> ((s, dir) => {
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))
    }),
    "set_except" -> ((s, dir) => {
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .except(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))
    }),

    // Multiset set ops: duplicate-preserving intersect/except (each
    // occurrence counts — the SQL ALL variants).
    "set_intersect_all" -> ((s, dir) => {
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .intersectAll(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))
    }),
    "set_except_all" -> ((s, dir) => {
      Tables(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .exceptAll(Tables(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey"))
    }),

    // Offset window functions: prior/next order per customer.
    "window_lag" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
      Tables(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_order"),
          lead(col("o_orderkey"), 1).over(w).as("next_order"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Rollup: hierarchical subtotals in one pass (Expand + single shuffle).
    "rollup_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("qty"))
        .orderBy(col("rf"), col("ls"))
    }),

    // Pivot: wide-format aggregation with explicit pivot values (an
    // implicit value list would need an extra collect job — always pass
    // the list at scale). One shuffle; each cell is a filtered sum.
    "pivot_agg" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum(col("o_totalprice")), 2))
        .orderBy(col("yr"))
    }),

    // Cube: all grouping-set combinations in one pass (Expand + single
    // shuffle), the full-lattice sibling of rollup_agg.
    "cube_agg" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"), col("n"))
        .orderBy(col("rf"), col("ls"))
    }),

    // Schema-evolution union: v1 rows (no event_type column yet) union
    // v2 rows — unionByName(allowMissingColumns) null-fills the missing
    // column by NAME, the append a pipeline does when a feed adds
    // fields (positional union would silently mis-align).
    "union_evolve" -> ((s, dir) => {
      val ev = Tables(s, dir, "events")
      val v1 = ev.filter(pmod(col("event_id"), lit(2)) === 0)
        .select(col("event_id"), col("user_id"), col("value"))
      val v2 = ev.filter(pmod(col("event_id"), lit(2)) === 1)
        .select(col("event_id"), col("user_id"), col("value"), col("event_type"))
      v1.unionByName(v2, allowMissingColumns = true)
        .orderBy(col("event_id"))
    }),

    // Conditional/filtered aggregation: per-condition counters and sums
    // in ONE pass over the scan (no unions of filtered subqueries).
    // Spark count_if / conditional sum == ANSI FILTER clauses.
    "filtered_agg" -> ((s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("yr"))
        .agg(
          expr("count_if(o_orderstatus = 'F')").as("n_f"),
          expr("count_if(o_orderstatus = 'O')").as("n_o"),
          round(sum(when(col("o_totalprice") > 200000.0, col("o_totalprice"))
            .otherwise(lit(0.0))), 2).as("big_rev"),
          count(lit(1)).as("n"))
        .orderBy(col("yr"))),

    // Array-function breadth over a computed array column (split,
    // size, sort, join, element access) — scalar outputs so the
    // cross-engine comparison is representation-free.
    "array_funcs" -> ((s, dir) =>
      Tables(s, dir, "part")
        .select(col("p_partkey"), split(col("p_type"), " ").as("w"))
        .select(col("p_partkey"),
          size(col("w")).as("n_words"),
          element_at(col("w"), 1).as("first_word"),
          element_at(col("w"), -1).as("last_word"),
          array_join(array_sort(col("w")), "-").as("sorted_joined"),
          array_contains(col("w"), "BRUSHED").cast("int").as("has_brushed"))
        .orderBy(col("p_partkey"))),

    // Explicit GROUPING SETS (the general lattice rollup/cube are
    // special cases of): two chosen sets in one Expand + one shuffle —
    // never two scans unioned.
    "grouping_sets" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("rev"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("rev"))
        .orderBy(col("rf"), col("ls"))
    }),

    // RANGE-frame window: trailing 30-day revenue per supplier — the
    // frame is bounded by the ORDER value (event time), not row count,
    // so ties are peers and the result is deterministic without a
    // unique tiebreak. Seconds-typed ordering keeps the frame bounds
    // integer-exact in both engines.
    "window_range" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // l_shipdate is TIMESTAMP_NTZ: hop via LTZ (session TZ is UTC) to
      // epoch seconds — the same values DuckDB's epoch() assigns.
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate").cast("timestamp").cast("long"))
        .rangeBetween(-2592000L, 0L) // 30 days in seconds, inclusive
      Tables(s, dir, "lineitem")
        .withColumn("trail_rev", round(sum(col("l_extendedprice")).over(w), 2))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("trail_rev"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"))
    }),

    // Exact group medians / quartiles (percentile with linear
    // interpolation — DuckDB quantile_cont agrees). Exact percentile
    // buffers per GROUP, so memory is bounded by the largest group —
    // fine for low-cardinality groupings; the global-percentile variant
    // is what describeStats switched to approx for.
    "median_groups" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 6).as("qty_median"),
          round(expr("percentile(l_quantity, 0.25)"), 6).as("qty_q1"),
          round(expr("percentile(l_quantity, 0.75)"), 6).as("qty_q3"),
          round(expr("percentile(l_extendedprice, 0.5)"), 6).as("price_median"))
        .orderBy(col("l_returnflag"))),

    // Unpivot/melt: wide -> long reshaping (the inverse of pivot_agg),
    // native in Spark 4 — a projection + Expand, no shuffle at all
    // until the output sort.
    "unpivot_long" -> ((s, dir) => {
      Tables(s, dir, "part")
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")), Array(col("p_size"), col("p_retailprice")),
          "measure", "value")
        .orderBy(col("p_partkey"), col("measure"))
    }),

    // Ordered list aggregation: collect_list is unordered by contract,
    // so sort_array makes the result deterministic and hash-comparable.
    "agg_lists" -> ((s, dir) => {
      Tables(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(sort_array(collect_set(col("l_linestatus"))).as("statuses"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"), concat_ws(",", col("statuses")).as("statuses"), col("n"))
        .orderBy(col("l_returnflag"))
    }),

    // Window functions: rank-per-group (top-3 orders per customer) and a
    // running sum — both shuffle once on the partition key.
    "window_rank" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"),
          round(col("o_totalprice"), 2).as("o_totalprice"))
        .orderBy(col("o_custkey"), col("rk"))
    }),
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
    // l_extendedprice disambiguates (verified unique at sf0.01/sf0.1).
    "window_running" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables(s, dir, "lineitem")
        .withColumn("running_qty", round(sum(col("l_quantity")).over(w), 2))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("running_qty"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    }),

    // Salted skew join: identical result to the plain join (the salt is
    // internal), but hot orderkeys spread across 8 reducers instead of
    // funneling into one — the restructuring AQE cannot do when a single
    // key exceeds a task. Oracle = the unsalted join, which is exactly
    // the correctness contract of salting. hotThreshold=5 sits just
    // above the synthetic data's ~4 lineitems/order so BOTH paths (salted
    // hot keys + replication-free cold plain join) carry real rows here.
    "join_salted" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val ord = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      graft.operators.SkewJoin.saltedJoin(li, ord, "l_orderkey", "o_orderkey", 8, hotThreshold = 5)
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority"))
    }),

    // SQL front end: the identical ANSI text runs through spark.sql and
    // through the DuckDB oracle — the engine is usable as plain SQL
    // (TPC-H Q3 shape: selective dim filter -> fact joins -> top-k).
    "sql_q3" -> ((s, dir) => {
      Seq("customer", "orders", "lineitem")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(Relational.SqlQ3)
    }),

    // TPC-H Q5 shape: 6-table join with region/date selectivity. The
    // identical SQL text runs on both engines; Catalyst broadcasts the
    // three dim tables (region<nation<supplier) and leaves the
    // customer⋈orders⋈lineitem chain as shuffle joins on their keys —
    // the plan that survives 100x (dims stay broadcastable, facts
    // co-partition on the join keys, AQE re-plans from runtime sizes).
    "sql_q5" -> ((s, dir) => {
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(Relational.SqlQ5)
    }),

    // TPC-H Q4 shape (adapted: no commit/receipt dates in the synthetic
    // lineitem — "late" = shipped >60 days after order): a correlated
    // EXISTS. Catalyst decorrelates it to a left-semi hash join on
    // l_orderkey with the ship-date predicate pushed below — no
    // per-row subquery execution survives optimization.
    "sql_q4" -> ((s, dir) => {
      Seq("orders", "lineitem")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(Relational.SqlQ4)
    }),

    // TPC-H Q17 shape (adapted to available columns): a correlated
    // SCALAR aggregate subquery (per-part average). Catalyst rewrites
    // it to a pre-aggregation on l_partkey joined back to the fact —
    // the decorrelation that turns O(rows × subquery) into two scans
    // and one keyed shuffle. The brand filter prunes the part side
    // before the join.
    "sql_q17" -> ((s, dir) => {
      Seq("lineitem", "part")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(Relational.SqlQ17)
    }),

    // TPC-H Q10 shape: returned-item revenue per customer, top 20 —
    // selective fact filter, two-fact join chain, broadcast nation,
    // then TakeOrderedAndProject on the aggregated revenue.
    "sql_q10" -> ((s, dir) => {
      Seq("customer", "orders", "lineitem", "nation")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(Relational.SqlQ10)
    }),

    // TPC-H Q18 shape: large-volume orders via an IN over a grouped
    // HAVING subquery — the third decorrelation pattern (after Q4's
    // EXISTS and Q17's scalar): Catalyst turns the IN-subquery into a
    // semi join against the pre-aggregated orderkey set.
    "sql_q18" -> ((s, dir) => {
      Seq("customer", "orders", "lineitem")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(Relational.SqlQ18)
    }),

    // TPC-H Q19 shape: a three-block DISJUNCTION tying fact and dim
    // predicates together (brand x size x quantity bands OR'd). Catalyst
    // extracts the common `p_partkey = l_partkey` conjunct so the join
    // stays an equi hash join, and pushes the brand/size disjunction to
    // the part scan — the difference between "scan part 3x" and one
    // pass. The quantity bounds evaluate post-join (they mix sides).
    "sql_q19" -> ((s, dir) => {
      Seq("lineitem", "part")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(Relational.SqlQ19)
    }),

    // TPC-H Q2 shape (adapted: unit price from lineitem stands in for
    // ps_supplycost — no partsupp in the synthetic schema): an ARGMIN
    // join-back. The correlated MIN subquery itself contains a join
    // chain; Catalyst decorrelates it into a grouped pre-aggregation
    // over the same filtered join, joined back on (partkey, unit
    // price). Both engines compute min over IEEE-double division, so
    // the equality selects the identical argmin rows.
    "sql_q2" -> ((s, dir) => {
      Seq("part", "supplier", "lineitem", "nation", "region")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(Relational.SqlQ2)
    }),

    // TPC-H Q21 shape (late = shipped >60 days after order): the
    // double-correlated pattern — EXISTS (another supplier on the same
    // order) AND NOT EXISTS (another LATE supplier on the same order).
    // Catalyst decorrelates both into a left-semi and a left-anti join
    // on l_orderkey, the anti join carrying the non-equi lateness
    // predicate as its extra condition; no per-row subquery survives.
    "sql_q21" -> ((s, dir) => {
      Seq("supplier", "lineitem", "orders", "nation")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(Relational.SqlQ21)
    }),

    // TPC-H Q22 shape (adapted: "no F-status order" replaces "no order"
    // — every synthetic customer has orders): an UNCORRELATED scalar
    // average (computed once, broadcast into the filter) plus an anti
    // join against the order set. The two decorrelations compose in one
    // plan: scalar subquery -> literal at runtime, NOT EXISTS ->
    // left-anti hash join.
    "sql_q22" -> ((s, dir) => {
      Seq("customer", "orders")
        .foreach(t => Tables(s, dir, t).createOrReplaceTempView(t))
      s.sql(Relational.SqlQ22)
    }),

    // Analytic window functions: distribution ranks and tiles.
    "window_stats" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"), col("c_custkey"))
      Tables(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cume"))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    }),

    // String function breadth beyond scalar_funcs.
    "string_funcs" -> ((s, dir) => {
      Tables(s, dir, "part")
        .select(col("p_partkey"),
          regexp_extract(col("p_type"), "^([A-Z]+)", 1).as("first_word"),
          lpad(col("p_brand"), 12, "_").as("brand_pad"),
          translate(col("p_name"), "aeiou", "_____").as("devoweled"),
          reverse(col("p_brand")).as("brand_rev"),
          substring(col("p_name"), 1, 5).as("name5"),
          length(col("p_type")).as("type_len"))
        .orderBy(col("p_partkey"))
    }),

    // Date/time function breadth over order dates.
    "date_funcs" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          quarter(col("o_orderdate")).as("qtr"),
          dayofmonth(col("o_orderdate")).as("dom"))
        .orderBy(col("o_orderkey"))
    }),

    // Scalar function library: string / date / math over orders.
    "scalar_funcs" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(
          col("o_orderkey"),
          upper(col("o_orderstatus")).as("status_u"),
          substring(col("o_orderpriority"), 1, 1).as("prio1"),
          length(col("o_orderpriority")).as("prio_len"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          round(abs(col("o_totalprice") - lit(1000.0)), 2).as("delta"),
          round(sqrt(col("o_totalprice")), 6).as("sqrt_price"))
        .orderBy(col("o_orderkey"))
    }))

  /** Shared between the Spark query and the DuckDB oracle verbatim. */
  val SqlQ3: String =
    """SELECT l_orderkey,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0 AS revenue,
       o_orderpriority
       FROM customer, orders, lineitem
       WHERE c_mktsegment = 'BUILDING'
         AND c_custkey = o_custkey AND l_orderkey = o_orderkey
       GROUP BY l_orderkey, o_orderpriority
       ORDER BY revenue DESC, l_orderkey LIMIT 20"""

  /** TPC-H Q5 (local-supplier revenue), adapted to the synthetic data's
    * date range. Identical text on both engines. */
  val SqlQ5: String =
    """SELECT n_name,
       round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0 AS revenue
       FROM customer, orders, lineitem, supplier, nation, region
       WHERE c_custkey = o_custkey
         AND l_orderkey = o_orderkey
         AND l_suppkey = s_suppkey
         AND c_nationkey = s_nationkey
         AND s_nationkey = n_nationkey
         AND n_regionkey = r_regionkey
         AND r_name = 'ASIA'
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
       GROUP BY n_name
       ORDER BY revenue DESC, n_name"""

  /** TPC-H Q4 adapted to the synthetic schema (late = shipped more than
    * 60 days after the order date). Identical text on both engines. */
  val SqlQ4: String =
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders
       WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         AND EXISTS (SELECT * FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
       GROUP BY o_orderpriority
       ORDER BY o_orderpriority"""

  /** TPC-H Q17 adapted (p_brand only; threshold 0.5*avg keeps the
    * result non-degenerate on this data). Identical text both engines. */
  val SqlQ17: String =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) + 0.0 AS avg_yearly
       FROM lineitem, part
       WHERE p_partkey = l_partkey
         AND p_brand = 'Brand#4'
         AND l_quantity < (SELECT 0.5 * avg(l_quantity)
                           FROM lineitem WHERE l_partkey = p_partkey)"""

  /** TPC-H Q10 adapted to the synthetic columns (no address/phone/
    * comment). Identical text on both engines. Revenue accumulates in
    * DECIMAL: the double sum's last ulp differed between engines and
    * one group's total sat exactly on a cent boundary, flipping
    * round(..., 2). double->DECIMAL(18,6) is deterministic (no double
    * is exactly halfway between two 6-dp decimals) and the decimal sum
    * is exact, so both engines round the identical value. */
  val SqlQ10: String =
    """SELECT c_custkey, c_name,
       CAST(round(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))), 2) + 0.0
            AS DOUBLE) AS revenue,
       round(c_acctbal, 2) + 0.0 AS c_acctbal, n_name
       FROM customer, orders, lineitem, nation
       WHERE c_custkey = o_custkey
         AND l_orderkey = o_orderkey
         AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
         AND l_returnflag = 'R'
         AND c_nationkey = n_nationkey
       GROUP BY c_custkey, c_name, c_acctbal, n_name
       ORDER BY revenue DESC, c_custkey LIMIT 20"""

  /** TPC-H Q18 adapted (threshold tuned to the synthetic order sizes).
    * Identical text on both engines. */
  val SqlQ18: String =
    """SELECT c_name, c_custkey, o_orderkey,
       round(o_totalprice, 2) + 0.0 AS o_totalprice,
       round(sum(l_quantity), 2) + 0.0 AS sum_qty
       FROM customer, orders, lineitem
       WHERE o_orderkey IN (
           SELECT l_orderkey FROM lineitem
           GROUP BY l_orderkey HAVING sum(l_quantity) > 180)
         AND c_custkey = o_custkey
         AND o_orderkey = l_orderkey
       GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"""

  /** TPC-H Q19 (discounted revenue over OR'd brand/size/quantity
    * bands), adapted to the synthetic brands/sizes. Identical text on
    * both engines. */
  val SqlQ19: String =
    """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0 AS revenue
       FROM lineitem, part
       WHERE p_partkey = l_partkey
         AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 30)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 25 AND l_quantity BETWEEN 10 AND 40)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 35 AND l_quantity BETWEEN 20 AND 50))"""

  /** TPC-H Q2 (min-cost supplier argmin), adapted: lineitem unit price
    * stands in for ps_supplycost. Identical text on both engines. */
  val SqlQ2: String =
    """SELECT DISTINCT round(s_acctbal, 2) + 0.0 AS s_acctbal, s_name, n_name, p_partkey, p_name
       FROM part, supplier, lineitem, nation, region
       WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
         AND p_type = 'STANDARD' AND p_size < 10
         AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
         AND r_name = 'EUROPE'
         AND l_extendedprice / l_quantity = (
             SELECT min(l2.l_extendedprice / l2.l_quantity)
             FROM lineitem l2, supplier s2, nation n2, region r2
             WHERE l2.l_partkey = p_partkey AND s2.s_suppkey = l2.l_suppkey
               AND s2.s_nationkey = n2.n_nationkey AND n2.n_regionkey = r2.r_regionkey
               AND r2.r_name = 'EUROPE')
       ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""

  /** TPC-H Q21 (suppliers who kept multi-supplier orders waiting),
    * late = shipped >60 days after the order date. Identical text on
    * both engines. */
  val SqlQ21: String =
    """SELECT s_name, count(*) AS numwait
       FROM supplier, lineitem l1, orders, nation
       WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
         AND o_orderstatus = 'F'
         AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
         AND EXISTS (SELECT * FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT * FROM lineitem l3
                         WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                           AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
         AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
       GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"""

  /** TPC-H Q22 (rich customers with no F-status order; the synthetic
    * data gives every customer at least one order, so plain "no
    * orders" would be empty). Identical text on both engines. */
  val SqlQ22: String =
    """SELECT c_nationkey, count(*) AS numcust, round(sum(c_acctbal), 2) + 0.0 AS totacctbal
       FROM customer
       WHERE c_nationkey IN (1, 3, 7, 11, 14, 19)
         AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                          WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 7, 11, 14, 19))
         AND NOT EXISTS (SELECT * FROM orders
                         WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
       GROUP BY c_nationkey ORDER BY c_nationkey"""

  val oracle: Map[String, String] = Map(
    "sql_q19" -> SqlQ19,
    "sql_q2" -> SqlQ2,
    "sql_q21" -> SqlQ21,
    "sql_q22" -> SqlQ22,
    "sql_q3" -> SqlQ3,
    "sql_q5" -> SqlQ5,
    "sql_q4" -> SqlQ4,
    "sql_q17" -> SqlQ17,
    "sql_q10" -> SqlQ10,
    "sql_q18" -> SqlQ18,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) + 0.0 AS sum_qty,
         round(sum(l_extendedprice), 2) + 0.0 AS sum_base_price,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0 AS sum_disc_price,
         round(avg(l_quantity), 6) + 0.0 AS avg_qty,
         round(avg(l_discount), 6) + 0.0 AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
    "join_star" ->
      """SELECT r_name,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0 AS revenue,
         count(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1 ORDER BY 1""",
    "join_left" ->
      """SELECT p_partkey, p_brand, coalesce(qty, 0.0) AS qty
         FROM part LEFT JOIN (
           SELECT l_partkey, round(sum(l_quantity), 2) + 0.0 AS qty
           FROM lineitem GROUP BY 1
         ) ON p_partkey = l_partkey
         ORDER BY p_partkey""",
    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "join_full" ->
      """SELECT coalesce(c.nk, s.nk2) AS nationkey,
           coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
         FROM (SELECT c_nationkey nk, count(*) n_cust FROM customer GROUP BY 1) c
         FULL OUTER JOIN (SELECT s_nationkey nk2, count(*) n_supp FROM supplier GROUP BY 1) s
           ON c.nk = s.nk2
         ORDER BY nationkey""",
    "join_anti" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "sort_topk" ->
      """SELECT o_orderkey, round(o_totalprice, 2) + 0.0 AS o_totalprice
         FROM orders ORDER BY orders.o_totalprice DESC, o_orderkey LIMIT 10""",
    "distinct_pairs" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2""",
    "set_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
         INTERSECT SELECT s_nationkey FROM supplier ORDER BY nationkey""",
    "set_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
         EXCEPT SELECT s_nationkey FROM supplier ORDER BY nationkey""",
    "set_intersect_all" ->
      """SELECT c_nationkey AS nationkey FROM customer
         INTERSECT ALL SELECT s_nationkey FROM supplier ORDER BY nationkey""",
    "set_except_all" ->
      """SELECT c_nationkey AS nationkey FROM customer
         EXCEPT ALL SELECT s_nationkey FROM supplier ORDER BY nationkey""",
    "window_stats" ->
      """SELECT c_mktsegment, c_custkey,
         ntile(4) OVER w AS quartile,
         round(percent_rank() OVER w, 6) + 0.0 AS pct_rank,
         round(cume_dist() OVER w, 6) + 0.0 AS cume
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
         ORDER BY c_mktsegment, c_custkey""",
    "string_funcs" ->
      """SELECT p_partkey,
         regexp_extract(p_type, '^([A-Z]+)', 1) AS first_word,
         lpad(p_brand, 12, '_') AS brand_pad,
         translate(p_name, 'aeiou', '_____') AS devoweled,
         reverse(p_brand) AS brand_rev,
         substring(p_name, 1, 5) AS name5,
         length(p_type) AS type_len
         FROM part ORDER BY p_partkey""",
    "date_funcs" ->
      """SELECT o_orderkey,
         strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
         strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
         CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
         CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom
         FROM orders ORDER BY o_orderkey""",
    "window_lag" ->
      """SELECT o_custkey, o_orderkey,
         lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_order,
         lead(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_order
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "rollup_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
         coalesce(l_linestatus, 'ALL') AS ls,
         count(*) AS n, round(sum(l_quantity), 2) + 0.0 AS qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY rf, ls""",
    "pivot_agg" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) + 0.0 AS F,
         round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) + 0.0 AS O,
         round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) + 0.0 AS P
         FROM orders GROUP BY 1 ORDER BY yr""",
    "cube_agg" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
         coalesce(l_linestatus, 'ALL') AS ls, count(*) AS n
         FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         ORDER BY rf, ls""",
    "union_evolve" ->
      """SELECT event_id, user_id, value, CAST(NULL AS VARCHAR) AS event_type
         FROM events WHERE event_id % 2 = 0
         UNION ALL
         SELECT event_id, user_id, value, event_type
         FROM events WHERE event_id % 2 = 1
         ORDER BY event_id""",
    "filtered_agg" ->
      """SELECT year(CAST(o_orderdate AS TIMESTAMP)) AS yr,
           count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
           count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
           round(sum(CASE WHEN o_totalprice > 200000.0 THEN o_totalprice
                          ELSE 0.0 END), 2) + 0.0 AS big_rev,
           count(*) AS n
         FROM orders GROUP BY 1 ORDER BY 1""",
    "array_funcs" ->
      """SELECT p_partkey,
           len(w) AS n_words,
           w[1] AS first_word,
           w[-1] AS last_word,
           array_to_string(list_sort(w), '-') AS sorted_joined,
           CAST(list_contains(w, 'BRUSHED') AS INT) AS has_brushed
         FROM (SELECT p_partkey, string_split(p_type, ' ') w FROM part)
         ORDER BY p_partkey""",
    "grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
           coalesce(l_linestatus, 'ALL') AS ls,
           count(*) AS n, round(sum(l_extendedprice), 2) + 0.0 AS rev
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
         ORDER BY rf, ls""",
    "window_range" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
           round(sum(l_extendedprice) OVER (
             PARTITION BY l_suppkey ORDER BY epoch(CAST(l_shipdate AS TIMESTAMP))
             RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) + 0.0 AS trail_rev
         FROM lineitem
         ORDER BY l_suppkey, l_orderkey, l_linenumber, l_extendedprice""",
    "median_groups" ->
      """SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6) + 0.0 AS qty_median,
           round(quantile_cont(l_quantity, 0.25), 6) + 0.0 AS qty_q1,
           round(quantile_cont(l_quantity, 0.75), 6) + 0.0 AS qty_q3,
           round(quantile_cont(l_extendedprice, 0.5), 6) + 0.0 AS price_median
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "unpivot_long" ->
      """SELECT p_partkey, measure, value FROM (
           SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
           UNION ALL
           SELECT p_partkey, 'p_retailprice', p_retailprice FROM part)
         ORDER BY p_partkey, measure""",
    "agg_lists" ->
      """SELECT l_returnflag,
         array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
         count(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY 1""",
    "window_rank" ->
      """SELECT o_custkey, rk, o_orderkey, round(o_totalprice, 2) + 0.0 AS o_totalprice
         FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rk
               FROM orders)
         WHERE rk <= 3 ORDER BY o_custkey, rk""",
    "window_running" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
         round(sum(l_quantity) OVER (PARTITION BY l_suppkey
           ORDER BY l_shipdate, l_orderkey, l_linenumber, l_extendedprice
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) + 0.0 AS running_qty
         FROM lineitem
         ORDER BY l_suppkey, l_orderkey, l_linenumber, l_extendedprice""",
    "join_salted" ->
      """SELECT o_orderpriority,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) + 0.0 AS revenue,
         count(*) AS n
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1 ORDER BY 1""",
    "scalar_funcs" ->
      """SELECT o_orderkey,
         upper(o_orderstatus) AS status_u,
         substring(o_orderpriority, 1, 1) AS prio1,
         length(o_orderpriority) AS prio_len,
         CAST(year(o_orderdate) AS INTEGER) AS yr,
         CAST(month(o_orderdate) AS INTEGER) AS mo,
         round(abs(o_totalprice - 1000.0), 2) + 0.0 AS delta,
         round(sqrt(o_totalprice), 6) + 0.0 AS sqrt_price
         FROM orders ORDER BY o_orderkey""")
}
