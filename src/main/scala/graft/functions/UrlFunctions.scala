package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization as composable column expressions — the
  * crawl-frontier key normalization shared by the `url_canonical` and
  * `crawl_frontier` queries and the streaming
  * [[graft.streaming.StreamOps.frontierSink]]. Every rule is a
  * deterministic RE2-safe string op, so the DuckDB oracles apply the
  * identical regexes (DuckDB backrefs are \1 where Spark's are $1 —
  * same automaton, different escape).
  *
  * Rules, in order: drop the fragment; lowercase scheme://authority
  * (path case preserved); strip default ports (:443 https, :80 http);
  * drop utm_* tracking params; binary-sort surviving params;
  * re-attach '?' only if params remain.
  */
object UrlFunctions {

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val base = regexp_replace(noFrag, "\\?.*$", "")
    val q = regexp_extract(noFrag, "\\?(.*)$", 1)
    val lowered = concat(
      lower(regexp_extract(base, "^([^/]*//[^/]*)", 1)),
      regexp_replace(base, "^[^/]*//[^/]*", ""))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(https://[^/:]*):443(?=(/|$))", "$1"),
      "^(http://[^/:]*):80(?=(/|$))", "$1")
    val params = array_join(array_sort(
      filter(split(q, "&"), p => !p.startsWith("utm_") && p =!= "")), "&")
    concat(noPort,
      when(params =!= "", concat(lit("?"), params)).otherwise(lit("")))
  }

  /** Host (authority) of a canonicalized url. */
  def urlDomain(canonical: Column): Column =
    regexp_extract(canonical, "^https?://([^/]+)", 1)
}
