package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality audit — the pre-training gate that answers
  * "is this table fit to join/train on" as a violations report instead
  * of a pipeline crash. Three rule families:
  *
  *  - row predicates (`audit`): N rules over one table evaluate in ONE
  *    scan — every rule becomes a conditional-sum aggregate in the same
  *    partial-agg pass, so auditing 50 rules costs the same IO as
  *    auditing one. A NULL predicate result counts as a violation
  *    (`value > 0` must not pass on missing values).
  *  - key uniqueness (`uniqueKeys`): count(*) - count(distinct key),
  *    one shuffle on the key.
  *  - referential integrity (`orphans`): child keys without a parent —
  *    a left join against the DISTINCT parent keys (broadcast when the
  *    parent is dimension-sized), violations summed in the same pass.
  *
  * All three emit the same report schema (check, n_rows, n_violations,
  * violation_rate), so audits across tables union into one frame.
  */
object Quality {

  private def report(check: Column, nRows: Column, nViolations: Column): Seq[Column] =
    Seq(check.as("check"), nRows.as("n_rows"), nViolations.as("n_violations"),
      round(nViolations.cast("double") / nRows, 6).as("violation_rate"))

  /** One row per rule; `rules` are (name, predicate-that-must-hold).
    * Single scan regardless of rule count. */
  def audit(df: DataFrame, scope: String, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "audit: at least one rule")
    val aggs = count(lit(1)).as("__n") +: rules.map { case (name, pred) =>
      sum(when(!coalesce(pred, lit(false)), 1L).otherwise(0L)).as(s"__v_$name")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val entries = rules.map { case (name, _) =>
      struct(lit(s"$scope.$name").as("check"), col(s"__v_$name").as("v"))
    }
    wide.select(col("__n"), explode(array(entries: _*)).as("r"))
      .select(report(col("r.check"), col("__n"), col("r.v")): _*)
  }

  /** One report row: how many rows share a key with another row's key
    * (i.e. rows beyond the first per key value). */
  def uniqueKeys(df: DataFrame, scope: String, keyCols: Seq[String]): DataFrame = {
    val key = struct(keyCols.map(col): _*)
    df.agg(count(lit(1)).as("__n"), countDistinct(key).as("__d"))
      .select(report(lit(s"$scope.unique_${keyCols.mkString("_")}"),
        col("__n"), col("__n") - col("__d")): _*)
  }

  /** One report row: child rows whose `fk` has no match among the
    * parent's `pk` values (NULL fk is an orphan — it references
    * nothing). Distinct parent keys first, so a duplicated parent key
    * can't inflate the joined row count. */
  def orphans(child: DataFrame, scope: String, fk: String,
              parent: DataFrame, pk: String): DataFrame =
    child.select(col(fk))
      .join(parent.select(col(pk).as("__pk")).distinct(),
        col(fk) === col("__pk"), "left")
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("__v"))
      .select(report(lit(s"$scope.${fk}_in_$pk"), col("__n"), col("__v")): _*)

  /** Trailing-window volume anomaly flags over an hourly (key, hour,
    * count) frame: each hour scored against the mean/stddev of its
    * `trailing` predecessors, hours with fewer than `minPrior` prior
    * observations withheld (no stable baseline), `sigma`-band
    * spike/drought flags out. SHARED by the batch `ingest_anomaly`
    * query and [[graft.streaming.StreamOps.anomalySink]], so stream and
    * batch verdicts are identical by construction. The comparison uses
    * 6-dp ROUNDED stats so any two engines (or replays) branch on
    * identical doubles. The input frame is calendar-bounded (hours x
    * keys — the heavy per-event aggregation happens BEFORE this
    * function), so the low-cardinality window partition key never caps
    * corpus-scale parallelism. */
  def volumeAnomalies(counts: DataFrame, keyCol: String = "event_type",
                      hourCol: String = "h", nCol: String = "n",
                      trailing: Int = 24, sigma: Double = 3.0,
                      minPrior: Int = 12): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(hourCol))
      .rowsBetween(-trailing, -1)
    val mu = round(avg(col(nCol)).over(w), 6) + lit(0.0)
    val sd = round(stddev_samp(col(nCol)).over(w), 6) + lit(0.0)
    counts
      .withColumn("mu24", mu)
      .withColumn("sd24", sd)
      .withColumn("n_prior", count(col(nCol)).over(w))
      .filter(col("n_prior") >= minPrior)
      .select(col(keyCol),
        date_format(col(hourCol), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col(nCol).as("n"), col("mu24"), col("sd24"),
        (col(nCol) > col("mu24") + lit(sigma) * col("sd24") ||
          col(nCol) < col("mu24") - lit(sigma) * col("sd24")).as("anomaly"))
  }
}
