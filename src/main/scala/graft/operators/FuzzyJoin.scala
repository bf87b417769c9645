package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance join via deletion-neighborhood blocking (the SymSpell
  * scheme) — the entity-resolution primitive ("match these dirty names
  * against the canonical table") without the all-pairs cross join.
  *
  * Candidate generation: each side explodes its string into every
  * variant reachable by deleting ≤ maxDist characters; candidates meet
  * in an EQUI-join on the variant. This is exact, not heuristic: if
  * lev(a,b) ≤ d, an optimal alignment has s substitutions, i
  * insertions and e deletions with s+i+e ≤ d — deleting the
  * substituted+deleted positions from a (≤ d deletions) and the
  * substituted+inserted positions from b (≤ d deletions) yields the
  * SAME string, so every true pair shares a key. The join overshoots
  * (sharing a variant only bounds lev ≤ 2d); the final levenshtein
  * filter restores exactness.
  *
  * Scale shape: key fan-out is 1 + n + C(n,2) variants per row at d=2
  * (~200 for a 20-char name) — the published SymSpell trade: generation
  * is linear per row and the join is a plain shuffled equi-join, vs the
  * O(|L|·|R|) cross join a naive fuzzy match costs. Skewed variants
  * (short strings collapse to few keys) respond to the usual AQE skew
  * levers. For long texts, fuzzy-join a bounded key (title, name,
  * normalized prefix), not the document body.
  *
  * Spark's `levenshtein` is the classic Wagner-Fischer distance, the
  * same definition DuckDB implements, so verified distances are
  * engine-portable ints.
  */
object FuzzyJoin {

  /** All variants of `s` with exactly one character deleted, [] for "". */
  private def del1(s: Column): Column =
    when(length(s) >= 1, transform(sequence(lit(1), length(s)),
      i => concat(substring(s, lit(1), i - 1),
        substring(s, i + 1, length(s) - i))))
      .otherwise(array())

  /** Deletion neighborhood: every string reachable by 0..maxDist deletions. */
  private[graft] def neighborhood(s: Column, maxDist: Int): Column = {
    require(maxDist >= 0 && maxDist <= 2, "deletion neighborhood supported for d <= 2")
    val d0 = array(s)
    val d1 = del1(s)
    val d2 =
      when(length(s) >= 2, flatten(transform(sequence(lit(1), length(s) - 1),
        i => transform(sequence(i + 1, length(s)),
          j => concat(substring(s, lit(1), i - 1),
            substring(s, i + 1, j - i - 1),
            substring(s, j + 1, length(s) - j))))))
        .otherwise(array())
    val all = maxDist match {
      case 0 => d0
      case 1 => concat(d0, d1)
      case 2 => concat(d0, d1, d2)
    }
    array_distinct(all)
  }

  /** Inner join on levenshtein(lCol, rCol) <= maxDist via the deletion-
    * neighborhood equi-join. Output: all left + right columns +
    * `edit_dist`. Column names must not collide across sides.
    *
    * Multiplicity contract: each (left row, right row) pair appears
    * exactly once, INCLUDING when the input has duplicate rows — the
    * per-side row ids below dedupe only the several-shared-variants
    * fan-out of one pair, never two genuinely identical input rows (a
    * whole-row distinct here would silently collapse those).
    */
  def join(left: DataFrame, lCol: Column, right: DataFrame, rCol: Column,
           maxDist: Int): DataFrame = {
    val l = left.withColumn("_lrid", monotonically_increasing_id())
      .withColumn("_bk", explode(neighborhood(lCol, maxDist)))
    val r = right.withColumn("_rrid", monotonically_increasing_id())
      .withColumn("_bk", explode(neighborhood(rCol, maxDist)))
    l.join(r, "_bk")
      .drop("_bk")
      .dropDuplicates("_lrid", "_rrid") // a pair can share several variants; keep it once
      .filter(levenshtein(lCol, rCol) <= maxDist)
      .withColumn("edit_dist", levenshtein(lCol, rCol))
      .drop("_lrid", "_rrid")
  }
}
