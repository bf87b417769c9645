package graft.queries

import java.nio.file.Files

import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.{BloomPrune, Quality, Sampling, Warehouse, ZOrder}
import graft.sources.ParquetSource
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-6 scale-mechanics queries: the operators whose whole point is
  * the 100 TB execution shape — bloom-prefiltered membership joins,
  * SCD2/CDC warehouse maintenance, weight-proportional sampling, and
  * the physical-layout levers (bucketed joins, partition pruning,
  * z-order clustering) exercised end-to-end through the oracle gate,
  * not just plan-asserted in specs.
  */
object Scale extends QueryModule {

  /** The versioned customer dimension the scd2_merge and pit_lookup
    * queries share: base dim as of 2024-01-01, merged with a snapshot
    * where keys ≡0 (mod 7) changed balance and ≡0 (mod 97) are new. */
  private def scd2Dim(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val c = Tables(s, dir, "customer")
    val dim = c.select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .withColumn("valid_from", lit("2024-01-01"))
      .withColumn("valid_to", lit(Warehouse.EndOfTime))
      .withColumn("is_current", lit(true))
    val snapshot = c.select(col("c_custkey"), col("c_mktsegment"),
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")).as("c_acctbal"))
      .union(c.filter(col("c_custkey") % 97 === 0)
        .select(col("c_custkey") + 1000000, lit("NEW"), lit(0.0)))
    Warehouse.scd2Merge(dim, snapshot, "c_custkey",
      Seq("c_mktsegment", "c_acctbal"), "2024-06-01")
  }

  /** DuckDB arithmetic for "first 4 hex digits of md5(key) as an int in
    * [0, 65536)" — the uniform draw both engines must agree on
    * digit-for-digit (Spark side: `conv(substring(md5(key), 1, 4), 16, 10)`). */
  private def md5DrawSql(keySql: String): String =
    (1 to 4).map { i =>
      s"(strpos('0123456789abcdef', substr(md5(CAST($keySql AS VARCHAR)), $i, 1)) - 1) * ${1 << (4 * (4 - i))}"
    }.mkString("(", " + ", ")")

  val queries: Map[String, Q] = Map(

    // Bloom-prefiltered exact semi join: orders scrubbed against a
    // customer blocklist. The bloom runs next to the orders scan and
    // drops ~99% of rows before the confirming join ever shuffles —
    // the result is still EXACT (bloom removes only certain
    // non-members), which is why a DuckDB oracle exists at all.
    "bloom_prune" -> ((s, dir) => {
      val blocklist = Tables(s, dir, "customer").filter(col("c_acctbal") < 0)
      BloomPrune.semiJoin(
        Tables(s, dir, "orders"), col("o_custkey"),
        blocklist, col("c_custkey"),
        expectedItems = 100000L, fpp = 0.01)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // SCD2 merge: fold an attribute snapshot into a versioned customer
    // dimension. Keys ≡ 0 (mod 7) arrive with a changed balance (old
    // row closes, successor opens), keys ≡ 0 (mod 97) also appear as
    // brand-new customers, everything else is a no-op pass-through.
    "scd2_merge" -> ((s, dir) =>
      scd2Dim(s, dir).orderBy(col("c_custkey"), col("valid_from"))),

    // Point-in-time lookup against that versioned dimension: each order
    // fetches the customer attributes that were TRUE at its as-of date
    // (half the facts date before the 2024-06-01 merge, half after, so
    // both versions of the changed keys are exercised). The
    // reproducibility primitive that keeps training features from
    // leaking the future.
    "pit_lookup" -> ((s, dir) => {
      val facts = Tables(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
        when(col("o_orderkey") % 2 === 0, "2024-03-01").otherwise("2024-09-01").as("as_of"))
      Warehouse.pitLookup(facts, col("o_custkey"), col("as_of"), scd2Dim(s, dir), "c_custkey")
        .select(col("o_orderkey"), col("o_custkey"), col("as_of"),
          col("c_acctbal").as("acctbal_asof"), col("valid_from"))
        .orderBy(col("o_orderkey"))
    }),

    // CDC change-log materialization: the events feed as an upsert log
    // (any event updates the user's latest state; an `error` event
    // tombstones the user). Latest-per-key via the WindowGroupLimit
    // top-1 shape; tombstoned users drop out.
    "cdc_apply" -> ((s, dir) =>
      Warehouse.applyChangeLog(Tables(s, dir, "events"),
          col("user_id"), Seq(col("ts"), col("event_id")),
          when(col("event_type") === "error", "D").otherwise("U"))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"), col("value").as("last_value"))
        .orderBy(col("user_id"))),

    // Weight-proportional deterministic sampling: documents kept with
    // probability 0.001 * n_chars (longer docs upsampled) — scan-level
    // filter, key-stable, zero shuffles; DuckDB recomputes the exact
    // md5 draw and threshold.
    "sample_weighted" -> ((s, dir) =>
      Sampling.weightedSample(Tables(s, dir, "documents"),
          col("doc_id"), col("n_chars"), rate = 0.001)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // Weighted sampling WITHOUT replacement, exactly k per group
    // (Efraimidis-Spirakis A-ES): rank by ln(u)/w with the key-stable
    // salted md5 draw — `sample_weighted` gives Bernoulli rate*w
    // inclusion with a RANDOM total; this gives a fixed-size quota
    // where long documents win proportionally to n_chars. One
    // projection + one per-source top-k window (WindowGroupLimit);
    // DuckDB reproduces draw, log-key and ranking digit-for-digit.
    "sample_topk_weighted" -> ((s, dir) =>
      Sampling.weightedTopK(Tables(s, dir, "documents"),
          col("doc_id"), col("n_chars"), k = 10, group = col("source"))
        .select(col("source"), col("rk"), col("doc_id"), col("n_chars"),
          (col("wkey") + lit(0.0)).as("wkey"))
        .orderBy(col("source"), col("rk"))),

    // Temperature-scaled source mixing (T5/mT5-style size^alpha
    // flattening at alpha=0.7, 30% target corpus): per-source rates
    // derived deterministically (6-dp-rounded pow, prefix-sum fold in
    // source order, integer thresholds), membership by the key-stable
    // md5 draw. Output is the per-source mixing report the pipeline
    // owner signs off on; DuckDB recomputes rates AND membership
    // digit-for-digit.
    "mix_temperature" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents")
      val kept = Sampling.temperatureMix(docs, col("doc_id"), col("source"),
        alpha = 0.7, targetFraction = 0.3)
      docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .join(kept.groupBy(col("source")).agg(count(lit(1)).as("n_sampled")),
          Seq("source"), "left")
        .select(col("source"), col("n_docs").cast("long").as("n_docs"),
          coalesce(col("n_sampled"), lit(0L)).cast("long").as("n_sampled"),
          round(coalesce(col("n_sampled"), lit(0L)) / col("n_docs"), 6)
            .as("achieved_rate"))
        .orderBy(col("source"))
    }),

    // Bucketed-table join: both sides written bucketed+sorted by the
    // join key, then merge-joined with no exchange (the write paid the
    // shuffle once; ScaleLayoutSpec pins the exchange-free plan). The
    // oracle only sees the RESULT — identical to a plain join.
    "layout_bucket_join" -> ((s, dir) => {
      ParquetSource.saveBucketed(Tables(s, dir, "orders"), "graft_bkt_orders", "o_custkey", 8)
      ParquetSource.saveBucketed(Tables(s, dir, "customer"), "graft_bkt_customer", "c_custkey", 8)
      s.table("graft_bkt_orders").hint("merge")
        .join(s.table("graft_bkt_customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("c_mktsegment"))
    }),

    // Hive-partitioned write + pruned read: events land partitioned by
    // event_type; the purchase-only read prunes every other directory
    // before IO (PartitionFilters, pinned by ScaleLayoutSpec).
    "layout_partition_prune" -> ((s, dir) => {
      val out = Files.createTempDirectory("graft_part").toString + "/events_by_type"
      ParquetSource.savePartitioned(Tables(s, dir, "events"), out, Seq("event_type"))
      ParquetSource.load(s, out)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_purchases"), round(sum(col("value")), 2).as("purchase_value"))
        .orderBy(col("user_id"))
    }),

    // Incremental view maintenance — the don't-rescan-the-base shape a
    // 100 TB rollup lives by: the historical partial aggregate is
    // MATERIALIZED once (count/sum per key are mergeable partials —
    // the same algebra as every sketch here), the new-data delta
    // aggregates alone, and the refreshed view is a union + one
    // re-aggregation of partials. The payload is the merged view; the
    // oracle recomputes the FULL aggregate from scratch, so any merge
    // error (lost partial, double count, non-mergeable statistic)
    // hash-mismatches. Base/delta split on a fixed calendar cutoff;
    // empty sides degrade gracefully to the full recompute.
    "ivm_merge" -> ((s, dir) => {
      val cut = lit("2024-01-21 00:00:00").cast("timestamp")
      val ev = Tables(s, dir, "events")
        .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
          col("value"), col("ts"))
      def partials(d: org.apache.spark.sql.DataFrame) =
        d.groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).cast("long").as("pn"), sum(col("value")).as("psum"))
      val store = Files.createTempDirectory("graft_ivm").toString + "/base_view"
      partials(ev.filter(col("ts") < cut)).write.mode("overwrite").parquet(store)
      ParquetSource.load(s, store)
        .unionByName(partials(ev.filter(col("ts") >= cut)))
        .groupBy(col("event_type"), col("day"))
        .agg(sum(col("pn")).cast("long").as("n_events"),
          (round(sum(col("psum")), 2) + lit(0.0)).as("sum_value"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Declarative data-quality audit across the star schema: row
    // predicates evaluate in ONE scan per table (N rules = N
    // conditional sums in the same partial agg), uniqueness is one
    // keyed shuffle, referential integrity one left join against
    // distinct parent keys. The c_acctbal rule fails on real rows —
    // the report shape carries violations, it doesn't crash.
    "dq_audit" -> ((s, dir) => {
      val orders = Tables(s, dir, "orders")
      val lineitem = Tables(s, dir, "lineitem")
      val customer = Tables(s, dir, "customer")
      Quality.audit(orders, "orders", Seq(
          "totalprice_positive" -> (col("o_totalprice") > 0),
          "status_domain" -> col("o_orderstatus").isin("O", "F", "P"),
          "orderdate_present" -> col("o_orderdate").isNotNull))
        .union(Quality.audit(lineitem, "lineitem", Seq(
          "quantity_range" -> col("l_quantity").between(1, 50),
          "discount_range" -> col("l_discount").between(0, 1))))
        .union(Quality.audit(customer, "customer", Seq(
          "acctbal_nonneg" -> (col("c_acctbal") >= 0))))
        .union(Quality.uniqueKeys(orders, "orders", Seq("o_orderkey")))
        .union(Quality.orphans(lineitem, "lineitem", "l_orderkey", orders, "o_orderkey"))
        .union(Quality.orphans(orders, "orders", "o_custkey", customer, "c_custkey"))
        .orderBy(col("check"))
    }),

    // Greedy budgeted corpus selection: best documents first (by
    // length, doc_id tiebreak) until a 12k-token budget is spent. The
    // global exclusive running sum runs DISTRIBUTED — range partition,
    // per-partition window, broadcast offsets — never as one
    // single-partition window; long arithmetic keeps the two-pass sum
    // bit-equal to the oracle's sequential scan.
    "budget_select" -> ((s, dir) =>
      Sampling.takeWhileBudget(
          Tables(s, dir, "documents")
            .select(col("doc_id"), col("n_chars"),
              size(graft.functions.TextFunctions.tokens(col("text"))).cast("long").as("n_tokens")),
          Seq(col("n_chars").desc, col("doc_id").asc), col("n_tokens"), budget = 12000L)
        .select(col("doc_id"), col("n_chars"), col("n_tokens"), col("cum_before"))
        .orderBy(col("doc_id"))),

    // Deterministic 5-fold cross-validation assignment, summarized per
    // fold — key-stable like split_assign (a doc's fold survives corpus
    // growth), one codegen'd projection before the fold aggregate.
    "fold_assign" -> ((s, dir) =>
      Sampling.foldByHash(Tables(s, dir, "documents"), col("doc_id"), 5)
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
        .orderBy(col("fold"))),

    // Snapshot reconciliation: what changed between two versions of the
    // customer table (keys %7 changed balance, %13 removed, %97 cloned
    // as new +1000000 keys). One full-outer join; changed rows name the
    // columns that moved. The report is the publish-gate a regenerated
    // 100 TB table passes before replacing its predecessor.
    "table_diff" -> ((s, dir) => {
      val c = Tables(s, dir, "customer")
      val before = c.select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val after = c.filter(col("c_custkey") % 13 =!= 0)
        .select(col("c_custkey"), col("c_mktsegment"),
          when(col("c_custkey") % 7 === 0, col("c_acctbal") + 100.0)
            .otherwise(col("c_acctbal")).as("c_acctbal"))
        .union(c.filter(col("c_custkey") % 97 === 0)
          .select(col("c_custkey") + 1000000, lit("NEW"), lit(0.0)))
      Warehouse.tableDiff(before, after, "c_custkey", Seq("c_mktsegment", "c_acctbal"))
        .filter(col("diff_status") =!= "unchanged")
        // string-join the column list so the hash compare sees a scalar
        .select(col("c_custkey"), col("diff_status"),
          array_join(col("changed_cols"), ",").as("changed_cols"))
        .orderBy(col("c_custkey"))
    }),

    // Hard-negative mining for contrastive training: each probe
    // embedding retrieves its top-3 most-similar vectors with a
    // DIFFERENT label — the pairs that sharpen a metric-learning
    // objective. Probes broadcast over one corpus scan; per-probe top-k
    // via the rank window Spark rewrites to WindowGroupLimit. Ranks on
    // the ROUNDED cosine so cross-engine ties break identically.
    "hard_negatives" -> ((s, dir) => {
      val emb = Tables(s, dir, "embeddings")
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("probe_id"), col("label").as("probe_label"),
          col("embedding").as("pvec"))
      val w = Window.partitionBy(col("probe_id")).orderBy(col("cos").desc, col("vec_id"))
      emb.crossJoin(broadcast(probes))
        .filter(col("label") =!= col("probe_label"))
        .select(col("probe_id"), col("vec_id"), col("label"),
          round(VectorFunctions.cosine(col("embedding"), col("pvec")), 6).as("cos"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .orderBy(col("probe_id"), col("rk"))
    }),

    // Z-order (Morton) clustering code over (l_partkey, l_suppkey):
    // the sort key behind multi-dimensional data skipping. Built from
    // shift/mask/or built-ins (whole-stage codegen), recomputed
    // verbatim by the oracle's integer arithmetic.
    "zorder_code" -> ((s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
          ZOrder.interleave2(col("l_partkey"), col("l_suppkey"), 16).as("zcode"))
        .orderBy(col("zcode"), col("l_orderkey"), col("l_linenumber"))),

    // Shard-count change cost: the fraction of documents that MOVE when
    // 8 shards become 10, under mod-N assignment (~everything moves —
    // the full-reshuffle trap) vs rendezvous/highest-random-weight
    // hashing (only ~1/5 moves: exactly the docs the two new shards
    // win). The argument for consistent placement when a 100 TB layout
    // gains workers. Deterministic and engine-portable: the weight is
    // md5(doc_id:shard), argmax via max_by with no possible tie.
    // Scale shape: explode to n_shards rows per doc, one partial-agg
    // argmax, one final single-row rollup.
    "shard_rebalance" -> ((s, dir) => {
      val docs = Tables(s, dir, "documents").select(col("doc_id"))
      def rdv(n: Int, out: String) = docs
        .select(col("doc_id"), explode(sequence(lit(0), lit(n - 1))).as("s"))
        .withColumn("wt",
          md5(concat(col("doc_id").cast("string"), lit(":"), col("s").cast("string"))))
        .groupBy(col("doc_id"))
        .agg(expr("max_by(s, wt)").as(out))
      docs
        .withColumn("m8", pmod(col("doc_id"), lit(8)))
        .withColumn("m10", pmod(col("doc_id"), lit(10)))
        .join(rdv(8, "r8"), "doc_id").join(rdv(10, "r10"), "doc_id")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("m8") =!= col("m10"), 1L).otherwise(0L)).as("moved_mod"),
          sum(when(col("r8") =!= col("r10"), 1L).otherwise(0L)).as("moved_rendezvous"))
        .select(col("n_docs"), col("moved_mod"), col("moved_rendezvous"),
          (round(col("moved_mod").cast("double") / col("n_docs").cast("double"), 6)
            + lit(0.0)).as("frac_mod"),
          (round(col("moved_rendezvous").cast("double") / col("n_docs").cast("double"), 6)
            + lit(0.0)).as("frac_rendezvous"))
    })
  )

  /** The scd2_merge dimension as reusable CTEs ending in `scd2` —
    * shared by the scd2_merge and pit_lookup oracles. */
  private val Scd2CteSql: String =
    """dim AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
       upd AS (
         SELECT c_custkey, c_mktsegment,
                CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
         FROM customer
         UNION ALL
         SELECT c_custkey + 1000000, 'NEW', 0.0 FROM customer WHERE c_custkey % 97 = 0),
       changed AS (
         SELECT d.c_custkey FROM dim d JOIN upd u USING (c_custkey)
         WHERE d.c_acctbal IS DISTINCT FROM u.c_acctbal
            OR d.c_mktsegment IS DISTINCT FROM u.c_mktsegment),
       scd2 AS (
         SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal,
                '2024-01-01' AS valid_from, '2024-06-01' AS valid_to, false AS is_current
         FROM dim d WHERE d.c_custkey IN (SELECT c_custkey FROM changed)
         UNION ALL
         SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal,
                '2024-01-01', '9999-12-31', true
         FROM dim d WHERE d.c_custkey NOT IN (SELECT c_custkey FROM changed)
         UNION ALL
         SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal,
                '2024-06-01', '9999-12-31', true
         FROM upd u
         WHERE u.c_custkey IN (SELECT c_custkey FROM changed)
            OR u.c_custkey NOT IN (SELECT c_custkey FROM dim))"""

  val oracle: Map[String, String] = Map(
    "shard_rebalance" ->
      """WITH d AS (SELECT doc_id FROM documents),
         e8 AS (SELECT doc_id, unnest(generate_series(0, 7)) AS s FROM d),
         r8 AS (SELECT doc_id,
                  arg_max(s, md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR))) AS r8
                FROM e8 GROUP BY 1),
         e10 AS (SELECT doc_id, unnest(generate_series(0, 9)) AS s FROM d),
         r10 AS (SELECT doc_id,
                   arg_max(s, md5(CAST(doc_id AS VARCHAR) || ':' || CAST(s AS VARCHAR))) AS r10
                 FROM e10 GROUP BY 1),
         j AS (SELECT d.doc_id, d.doc_id % 8 AS m8, d.doc_id % 10 AS m10, r8.r8, r10.r10
               FROM d JOIN r8 ON d.doc_id = r8.doc_id JOIN r10 ON d.doc_id = r10.doc_id)
         SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN m8 <> m10 THEN 1 ELSE 0 END) AS BIGINT) AS moved_mod,
           CAST(sum(CASE WHEN r8 <> r10 THEN 1 ELSE 0 END) AS BIGINT) AS moved_rendezvous,
           round(CAST(sum(CASE WHEN m8 <> m10 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) + 0.0 AS frac_mod,
           round(CAST(sum(CASE WHEN r8 <> r10 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) + 0.0 AS frac_rendezvous
         FROM j""",
    "bloom_prune" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
         ORDER BY o_orderkey""",
    "scd2_merge" ->
      s"""WITH $Scd2CteSql
         SELECT * FROM scd2 ORDER BY c_custkey, valid_from""",
    "pit_lookup" ->
      s"""WITH $Scd2CteSql,
         facts AS (
           SELECT o_orderkey, o_custkey,
                  CASE WHEN o_orderkey % 2 = 0 THEN '2024-03-01'
                       ELSE '2024-09-01' END AS as_of
           FROM orders)
         SELECT f.o_orderkey, f.o_custkey, f.as_of,
                d.c_acctbal AS acctbal_asof, d.valid_from
         FROM facts f LEFT JOIN scd2 d
           ON f.o_custkey = d.c_custkey
          AND f.as_of >= d.valid_from AND f.as_of < d.valid_to
         ORDER BY f.o_orderkey""",
    "cdc_apply" ->
      """WITH ranked AS (
           SELECT user_id, event_id, event_type, value,
                  row_number() OVER (PARTITION BY user_id
                    ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
           FROM events)
         SELECT user_id, event_id AS last_event_id,
                event_type AS last_type, value AS last_value
         FROM ranked WHERE rn = 1 AND event_type <> 'error'
         ORDER BY user_id""",
    "sample_weighted" ->
      s"""SELECT doc_id, lang, n_chars FROM documents
         WHERE ${md5DrawSql("doc_id")} < least(1.0, 0.001 * n_chars) * 65536.0
         ORDER BY doc_id""",
    // the oracle is the from-scratch recompute: the merged partials
    // must equal it exactly
    "ivm_merge" ->
      """SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) + 0.0 AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "sample_topk_weighted" ->
      s"""WITH d AS (
            SELECT source, doc_id, n_chars,
              round(ln((${md5DrawSql("'wsamp:' || CAST(doc_id AS VARCHAR)")} + 0.5)
                       / 65536.0) / n_chars, 9) + 0.0 AS wkey
            FROM documents),
          r AS (SELECT *, row_number() OVER (PARTITION BY source
                                             ORDER BY wkey DESC, doc_id) rk
                FROM d)
          SELECT source, rk, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
                 wkey + 0.0 AS wkey
          FROM r WHERE rk <= 10 ORDER BY source, rk""",
    // rates recomputed with the identical op order: 6-dp pow, ordered
    // prefix-sum fold for the weight total, 6-dp rate, integer threshold
    "mix_temperature" ->
      s"""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
                     FROM documents GROUP BY 1),
          w AS (SELECT source, n, round(pow(n, 0.7), 6) + 0.0 AS w FROM c),
          t AS (SELECT max(ps) AS sumw, max(nn) AS nn FROM
                 (SELECT sum(w) OVER (ORDER BY source) AS ps,
                         sum(n) OVER (ORDER BY source) AS nn FROM w)),
          r AS (SELECT source, n,
                  round(least(1.0, 0.3 * nn * w / sumw / n), 6) + 0.0 AS rate
                FROM w CROSS JOIN t),
          k AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_sampled
                FROM documents d JOIN r ON d.source = r.source
                WHERE ${md5DrawSql("d.doc_id")} < CAST(floor(rate * 65536.0) AS BIGINT)
                GROUP BY 1)
          SELECT r.source, r.n AS n_docs,
                 CAST(coalesce(k.n_sampled, 0) AS BIGINT) AS n_sampled,
                 round(coalesce(k.n_sampled, 0) * 1.0 / r.n, 6) + 0.0 AS achieved_rate
          FROM r LEFT JOIN k ON r.source = k.source
          ORDER BY r.source""",
    "layout_bucket_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
                round(sum(o_totalprice), 2) + 0.0 AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "layout_partition_prune" ->
      """SELECT user_id, count(*) AS n_purchases, round(sum(value), 2) + 0.0 AS purchase_value
         FROM events WHERE event_type = 'purchase'
         GROUP BY user_id ORDER BY user_id""",
    "dq_audit" ->
      """WITH o AS (SELECT count(*) n,
           sum(CASE WHEN NOT coalesce(o_totalprice > 0, false) THEN 1 ELSE 0 END) v_price,
           sum(CASE WHEN NOT coalesce(o_orderstatus IN ('O','F','P'), false) THEN 1 ELSE 0 END) v_status,
           sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) v_date,
           count(DISTINCT o_orderkey) d FROM orders),
         l AS (SELECT count(*) n,
           sum(CASE WHEN NOT coalesce(l_quantity BETWEEN 1 AND 50, false) THEN 1 ELSE 0 END) v_qty,
           sum(CASE WHEN NOT coalesce(l_discount BETWEEN 0 AND 1, false) THEN 1 ELSE 0 END) v_disc
           FROM lineitem),
         c AS (SELECT count(*) n,
           sum(CASE WHEN NOT coalesce(c_acctbal >= 0, false) THEN 1 ELSE 0 END) v_bal
           FROM customer),
         lo AS (SELECT count(*) n,
           sum(CASE WHEN l_orderkey IS NULL
                      OR l_orderkey NOT IN (SELECT o_orderkey FROM orders)
                    THEN 1 ELSE 0 END) v FROM lineitem),
         oc AS (SELECT count(*) n,
           sum(CASE WHEN o_custkey IS NULL
                      OR o_custkey NOT IN (SELECT c_custkey FROM customer)
                    THEN 1 ELSE 0 END) v FROM orders)
         SELECT "check", n_rows, CAST(n_violations AS BIGINT) AS n_violations,
                round(CAST(n_violations AS DOUBLE) / n_rows, 6) + 0.0 AS violation_rate
         FROM (
           SELECT 'orders.totalprice_positive' AS "check", n n_rows, v_price n_violations FROM o
           UNION ALL SELECT 'orders.status_domain', n, v_status FROM o
           UNION ALL SELECT 'orders.orderdate_present', n, v_date FROM o
           UNION ALL SELECT 'lineitem.quantity_range', n, v_qty FROM l
           UNION ALL SELECT 'lineitem.discount_range', n, v_disc FROM l
           UNION ALL SELECT 'customer.acctbal_nonneg', n, v_bal FROM c
           UNION ALL SELECT 'orders.unique_o_orderkey', n, n - d FROM o
           UNION ALL SELECT 'lineitem.l_orderkey_in_o_orderkey', n, v FROM lo
           UNION ALL SELECT 'orders.o_custkey_in_c_custkey', n, v FROM oc)
         ORDER BY "check"""",
    "budget_select" ->
      s"""WITH t AS (SELECT doc_id, n_chars,
              CAST(len(${Pipeline.toksSql}) AS BIGINT) n_tokens FROM documents),
          w AS (SELECT *, coalesce(CAST(sum(n_tokens) OVER (
                  ORDER BY n_chars DESC, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) cum_before
                FROM t)
          SELECT doc_id, n_chars, n_tokens, cum_before FROM w
          WHERE cum_before < 12000 ORDER BY doc_id""",
    "fold_assign" ->
      s"""SELECT CAST(${md5DrawSql("doc_id")} % 5 AS INTEGER) AS fold,
          count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
          FROM documents GROUP BY 1 ORDER BY 1""",
    "table_diff" ->
      """WITH b AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
         a AS (
           SELECT c_custkey, c_mktsegment,
                  CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal
           FROM customer WHERE c_custkey % 13 <> 0
           UNION ALL
           SELECT c_custkey + 1000000, 'NEW', 0.0 FROM customer WHERE c_custkey % 97 = 0)
         SELECT coalesce(b.c_custkey, a.c_custkey) AS c_custkey,
           CASE WHEN b.c_custkey IS NULL THEN 'added'
                WHEN a.c_custkey IS NULL THEN 'removed'
                ELSE 'changed' END AS diff_status,
           CASE WHEN b.c_custkey IS NULL OR a.c_custkey IS NULL THEN ''
                ELSE concat_ws(',',
                  CASE WHEN b.c_acctbal IS DISTINCT FROM a.c_acctbal THEN 'c_acctbal' END,
                  CASE WHEN b.c_mktsegment IS DISTINCT FROM a.c_mktsegment THEN 'c_mktsegment' END)
                END AS changed_cols
         FROM b FULL OUTER JOIN a ON b.c_custkey = a.c_custkey
         WHERE b.c_custkey IS NULL OR a.c_custkey IS NULL
            OR b.c_acctbal IS DISTINCT FROM a.c_acctbal
            OR b.c_mktsegment IS DISTINCT FROM a.c_mktsegment
         ORDER BY 1""",
    "hard_negatives" ->
      """WITH p AS (SELECT vec_id probe_id, label probe_label, embedding::DOUBLE[] pv
                    FROM embeddings WHERE vec_id < 5),
         c AS (
           SELECT probe_id, vec_id, label,
             round(list_dot_product(e, pv) /
                   (sqrt(list_dot_product(e, e)) * sqrt(list_dot_product(pv, pv))), 6) cos
           FROM (SELECT vec_id, label, embedding::DOUBLE[] e FROM embeddings)
           CROSS JOIN p WHERE label <> probe_label),
         r AS (SELECT *, row_number() OVER (PARTITION BY probe_id
                                            ORDER BY cos DESC, vec_id) rk FROM c)
         SELECT probe_id, vec_id, label, cos, rk FROM r WHERE rk <= 3
         ORDER BY probe_id, rk""",
    "zorder_code" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
          ${ZOrder.interleaveSql("l_partkey", "l_suppkey", 16)} AS zcode
          FROM lineitem ORDER BY zcode, l_orderkey, l_linenumber"""
  )
}
