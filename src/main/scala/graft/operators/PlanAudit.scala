package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.AttributeReference
import org.apache.spark.sql.execution.{CollectLimitExec, FileSourceScanExec, GlobalLimitExec, SparkPlan, TakeOrderedAndProjectExec, WholeStageCodegenExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Static plan-hygiene audit: the ".explain and iterate until it's the
  * plan you'd want" discipline as a queryable operator. Given any
  * DataFrame, walks its physical plan (through AQE wrappers and
  * subqueries) and reports the properties that decide whether the plan
  * survives a 100 TB scale-up:
  *
  *   - `cartesian_products`  — CartesianProduct / BroadcastNestedLoop
  *     joins: O(n x m) row products, the classic scale-killer. FAIL>0.
  *   - `shuffle_exchanges`   — every one is a full network/disk cycle;
  *     the number to minimize via broadcast, bucketing and partitioning
  *     reuse.
  *   - `broadcast_joins` / `shuffled_joins` — a small dim that shuffles
  *     instead of broadcasting turns a map-side join into a 2-sided
  *     exchange.
  *   - `unpruned_scans`      — file scans reading every column of a
  *     wider table: column pruning never reached the reader.
  *   - `unfiltered_wide_scans` — scans with neither pushed filters nor
  *     partition filters (full-table reads; fine for full aggregations,
  *     fatal when a predicate existed and stayed above the scan).
  *   - `single_partition_windows` — WindowExec with an EMPTY
  *     partitionSpec over input the plan cannot prove bounded: Spark
  *     moves every row into ONE partition and sorts it on one core
  *     (the "No Partition Defined for Window operation" warning) — the
  *     one plan shape in this repo that dies at 100x. A window is
  *     counted only when its child subtree contains neither a
  *     GlobalLimit / TakeOrderedAndProject / CollectLimit (the
  *     rank-the-top-k-survivors pattern, e.g. vocab_topk) nor an
  *     aggregate grouped solely on a `__pid` column (the
  *     partition-count-bounded offsets frame of the distributed
  *     prefix-sum/rank construction, Sampling.takeWhileBudget /
  *     Ranks.globalRowNumber). Windows over an aggregate of a
  *     SMALL-DOMAIN key (a 10-row decile cumsum, a per-source fold)
  *     are bounded in fact but not in the plan — they count, and the
  *     caller whitelists them by name with the domain argument spelled
  *     out (PlanAuditSpec does exactly this for the query surface).
  *   - `codegen_nodes` / `non_codegen_nodes` — operators inside vs
  *     outside WholeStageCodegen spans (interpreted rows pay virtual
  *     calls per row).
  *
  * The audit is STATIC: it inspects `queryExecution.executedPlan`
  * without running the query (under AQE that is the initial physical
  * plan; runtime re-optimization can only improve on what it reports —
  * e.g. a reported shuffled join may still become a broadcast join from
  * runtime stats). The result is a tiny driver-built DataFrame — a
  * diagnostic surface, not a data path. Severities: `fail` means the
  * plan should not ship to a large cluster; `warn` merits a look;
  * `info` is context.
  */
object PlanAudit {

  /** (check, severity, n, detail) per audit dimension. */
  def audit(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val root = df.queryExecution.executedPlan
    val nodes = collectAll(root)

    // Row-product severity ladder:
    //  - CartesianProductExec: both sides stream, O(n x m) — fail.
    //  - BroadcastNestedLoopJoin against a provably-single-row side (a
    //    global aggregate) is the "cross-join a scalar in" pattern:
    //    output cardinality equals the streamed side — ok, not counted.
    //  - Other BroadcastNestedLoopJoins: the build side fit (or was
    //    hinted) into a broadcast, so this is the deliberate
    //    corpus x small-bounded-set pattern (brute-force k-NN probes,
    //    k-means centroid assignment). Bounded ONLY if that side stays
    //    small by construction — warn, verify the bound.
    val cartesian = nodes.count(_.isInstanceOf[CartesianProductExec])
    val bnlj = nodes.count {
      case j: BroadcastNestedLoopJoinExec => !j.children.exists(isScalarSubplan)
      case _ => false
    }
    val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
    val broadcasts = nodes.count(_.isInstanceOf[BroadcastExchangeExec])
    val bcastJoins = nodes.count(_.isInstanceOf[BroadcastHashJoinExec])
    val shufJoins = nodes.count(n =>
      n.isInstanceOf[SortMergeJoinExec] || n.isInstanceOf[ShuffledHashJoinExec])

    // width > 3: a fully-read 2-3 column table usually IS the
    // projection (embeddings, edge lists); reading every column only
    // smells on genuinely wide tables
    val scans = nodes.collect { case s: FileSourceScanExec => s }
    val unpruned = scans.filter { s =>
      val total = s.relation.dataSchema.fields.length
      total > 3 && s.requiredSchema.fields.length >= total
    }
    val unfiltered = scans.filter { s =>
      s.dataFilters.isEmpty && s.partitionFilters.isEmpty &&
        s.relation.dataSchema.fields.length > 2
    }

    val spWindows = nodes.collect {
      case w: WindowExec if w.partitionSpec.isEmpty && !boundedBelow(w.child) => w
    }

    val codegenNodes = nodes.collect { case w: WholeStageCodegenExec => w }
      .map(w => spanNodes(w.child)).sum
    val planNodes = nodes.count(n =>
      !n.isInstanceOf[WholeStageCodegenExec] &&
        !n.isInstanceOf[AdaptiveSparkPlanExec])

    def row(check: String, sev: String, n: Long, detail: String) =
      Row(check, sev, n, detail)
    val rows = Seq(
      row("cartesian_products", if (cartesian > 0) "fail" else "ok", cartesian,
        "two-sided streamed row products (CartesianProduct)"),
      row("broadcast_nested_loops", if (bnlj > 0) "warn" else "ok", bnlj,
        "corpus x broadcast-set products: bounded only if the broadcast side is small by construction"),
      row("shuffle_exchanges", "info", shuffles,
        "full repartition cycles in the plan"),
      row("broadcast_joins", "info", bcastJoins,
        s"map-side joins ($broadcasts broadcast exchanges)"),
      row("shuffled_joins", if (shufJoins > 0) "warn" else "ok", shufJoins,
        "sort-merge/shuffled-hash joins: check the small side was not broadcast-able"),
      row("unpruned_scans", if (unpruned.nonEmpty) "warn" else "ok", unpruned.length,
        unpruned.map(s => s.relation.location.rootPaths.headOption
          .map(_.getName).getOrElse("?")).mkString(",")),
      row("unfiltered_wide_scans", "info", unfiltered.length,
        "scans with no pushed or partition filters (fine for full aggregation)"),
      row("single_partition_windows", if (spWindows.nonEmpty) "warn" else "ok",
        spWindows.length,
        spWindows.map(_.orderSpec.map(_.child.sql).mkString("(", ",", ")"))
          .mkString(";")),
      row("non_codegen_nodes", "info",
        math.max(0, planNodes - codegenNodes).toLong,
        s"$codegenNodes of $planNodes physical operators inside WholeStageCodegen"))

    val schema = StructType(Seq(
      StructField("check", StringType, nullable = false),
      StructField("severity", StringType, nullable = false),
      StructField("n", LongType, nullable = false),
      StructField("detail", StringType, nullable = false)))
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)
  }

  /** True when the plan is free of `fail`-severity findings. */
  def clean(df: DataFrame): Boolean =
    !audit(df).collect().exists(_.getString(1) == "fail")

  /** True when the subplan's output is provably bounded for window
    * purposes: a limit node (GlobalLimit / TakeOrderedAndProject /
    * CollectLimit) anywhere below, or an aggregate grouped ONLY on
    * `__pid` columns — spark_partition_id() grouping, output rows =
    * partition count (the distributed prefix-sum offsets frame). An
    * aggregate on an arbitrary key does NOT bound anything (a groupBy
    * over a vocabulary-sized key is still corpus-scale). */
  private def boundedBelow(p: SparkPlan): Boolean =
    collectAll(p).exists {
      case _: GlobalLimitExec | _: TakeOrderedAndProjectExec | _: CollectLimitExec => true
      case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
        pidGrouped(a.groupingExpressions)
      case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec =>
        pidGrouped(a.groupingExpressions)
      case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
        pidGrouped(a.groupingExpressions)
      case _ => false
    }

  private def pidGrouped(g: Seq[org.apache.spark.sql.catalyst.expressions.NamedExpression]): Boolean =
    g.nonEmpty && g.forall {
      case a: AttributeReference => a.name == "__pid"
      case _ => false
    }

  /** True when the subplan provably yields at most one row: a global
    * aggregate (no grouping expressions) somewhere at its root, under
    * any exchanges/projections AQE may interpose. */
  private def isScalarSubplan(p: SparkPlan): Boolean = p match {
    case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec =>
      a.groupingExpressions.isEmpty
    case a: org.apache.spark.sql.execution.aggregate.SortAggregateExec =>
      a.groupingExpressions.isEmpty
    case a: org.apache.spark.sql.execution.aggregate.ObjectHashAggregateExec =>
      a.groupingExpressions.isEmpty
    case a: AdaptiveSparkPlanExec => isScalarSubplan(a.executedPlan)
    // AQE leaf wrappers hiding their subplan: a materialized query
    // stage or a reused exchange over a scalar aggregate is still
    // scalar — without these cases, auditing an already-executed plan
    // flags legitimate scalar cross-joins as warn-level BNLJs
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      isScalarSubplan(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
      isScalarSubplan(r.child)
    case other if other.children.size == 1 => isScalarSubplan(other.children.head)
    case _ => false
  }

  /** Nodes strictly inside one WholeStageCodegen span: descend from the
    * span root but stop at InputAdapterExec — the codegen boundary —
    * so exchanges, scans and NESTED codegen regions below it are not
    * double-counted into this span's total. */
  private def spanNodes(p: SparkPlan): Int = p match {
    case _: org.apache.spark.sql.execution.InputAdapter => 0
    case n => 1 + n.children.map(spanNodes).sum
  }

  /** Every physical node, descending through AQE wrappers (which are
    * leaf nodes hiding their input plan) and subquery expressions. */
  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val direct = p.collectWithSubqueries { case n => n }
    direct.flatMap {
      case a: AdaptiveSparkPlanExec => a +: collectAll(a.executedPlan)
      // AQE materialized stages hide their subplans from collect —
      // descend so auditing an already-executed DataFrame still sees
      // every node. ReusedExchangeExec is NOT descended here: the
      // exchange it references appears (and is counted) at its
      // original site; isScalarSubplan recurses into it separately.
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        q +: collectAll(q.plan)
      case n => Seq(n)
    }
  }
}
