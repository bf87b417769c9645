package graft

import org.scalatest.funsuite.AnyFunSuite

/** Lints every DuckDB oracle for the IEEE −0.0 trap.
  *
  * DuckDB's `round(x, n)` preserves the sign bit: `round(-2e-7, 6)`
  * returns **−0.0**, while Spark's BigDecimal-based `round` returns
  * **+0.0**. The driver's comparison hashes result bytes, so any
  * rounded float column that can go negative-tiny hash-mismatches even
  * though the values are numerically equal. The repo-wide discipline is
  * to append `+ 0.0` (which collapses −0.0 to +0.0) to every rounded
  * float in the oracle SQL — see Curation.scala:420. That discipline
  * was convention only, and it has now been forgotten twice (`kl_drift`
  * round 5, `embed_pca` round 9). This spec makes it a contract: any
  * `round(...)` in an oracle that is directly aliased into a SELECT
  * list without a trailing `+ 0.0` fails here, at `sbt test` time,
  * before the driver ever runs DuckDB.
  *
  * The check is deliberately regex-level (balanced-paren scan + alias
  * match), not a SQL parse: oracles are DuckDB dialect that Spark
  * cannot parse. Rounds that are provably sign-safe (integer-typed,
  * non-negative by construction) go on the explicit whitelist below
  * with a one-line justification each.
  */
class OracleLintSpec extends AnyFunSuite {

  /** (queryName, alias) pairs exempt from the guard, each justified. */
  private val whitelist: Set[(String, String)] = Set.empty

  /** Aliases of `round(...)` calls in `sql` that reach a SELECT list
    * (via `AS <alias>`) without the `+ 0.0` collapse. */
  def unguardedRounds(sql: String): Seq[String] = {
    val hits = scala.collection.mutable.Buffer[String]()
    val open = "(?i)\\bround\\s*\\(".r
    for (m <- open.findAllMatchIn(sql)) {
      var depth = 1
      var i = m.end
      while (i < sql.length && depth > 0) {
        sql.charAt(i) match {
          case '(' => depth += 1
          case ')' => depth -= 1
          case _   =>
        }
        i += 1
      }
      val rest = sql.substring(math.min(i, sql.length))
      val guarded = "^\\s*\\+\\s*0\\.0".r.findFirstIn(rest).isDefined
      if (!guarded) {
        // Direct alias: `round(...) AS name`. A round that instead
        // feeds an enclosing expression (comparison, arithmetic, outer
        // aggregate) is not a final column here; the OUTER expression
        // is what must carry the guard, and if that outer expression is
        // itself a round-AS it gets its own check.
        val alias = "(?i)^\\s*AS\\s+([A-Za-z_][A-Za-z0-9_]*)".r
          .findFirstMatchIn(rest).map(_.group(1))
        // `CAST(round(...) AS INT)`: the alias match would grab the
        // cast TYPE; an integer cast discards the sign bit, so only
        // flag casts back to floating types.
        val intCast = alias.exists(a =>
          Set("INT", "INTEGER", "BIGINT", "SMALLINT", "TINYINT", "HUGEINT",
              "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT", "BOOLEAN")
            .contains(a.toUpperCase) &&
          "^\\s*(?i)AS\\s+[A-Za-z_]+\\s*\\)".r.findFirstIn(rest).isDefined)
        alias.filterNot(_ => intCast).foreach(hits += _)
      }
    }
    hits.toSeq
  }

  test("every directly-aliased round() in every oracle carries + 0.0") {
    val bad = for {
      (name, sql) <- SparkEntry.oracleSql.toSeq.sortBy(_._1)
      alias       <- unguardedRounds(sql)
      if !whitelist((name, alias))
    } yield s"$name.$alias"
    assert(bad.isEmpty,
      s"oracle round() without '+ 0.0' −0.0 collapse (DuckDB round " +
      s"preserves the sign bit; Spark's does not — append '+ 0.0' or " +
      s"whitelist with a justification): ${bad.mkString(", ")}")
  }

  test("whitelist entries reference live (query, alias) pairs") {
    val stale = whitelist.filterNot { case (q, _) =>
      SparkEntry.oracleSql.contains(q)
    }
    assert(stale.isEmpty, s"whitelisted queries no longer exist: $stale")
  }

  test("the lint catches the round-9 embed_pca regression") {
    // The exact pre-fix oracle (commit d6bea32^ state): round without
    // the collapse. covar entry (6,10) = −3.5e-7 → DuckDB −0.0.
    val preFix =
      """WITH idx AS (SELECT CAST(i AS INT) i FROM generate_series(1, 64) g(i)),
          p AS (SELECT a.i i, b.i j FROM idx a JOIN idx b ON a.i <= b.i)
          SELECT p.i AS i, p.j AS j,
            round(covar_pop(embedding[p.i], embedding[p.j]), 6) AS cov,
            TRUE AS eig_ok
          FROM embeddings CROSS JOIN p
          GROUP BY 1, 2 ORDER BY 1, 2"""
    assert(unguardedRounds(preFix) == Seq("cov"))
    // ... and passes the fixed form.
    val fixed = preFix.replace("6) AS cov", "6) + 0.0 AS cov")
    assert(unguardedRounds(fixed).isEmpty)
  }
}
