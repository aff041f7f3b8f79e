package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus ingestion — the normalization a
  * crawl pipeline runs before URL-level dedup (the cheapest dedup tier:
  * two page fetches of `HTTPS://WWW.Site.com/a/?utm_source=x#top` and
  * `https://site.com/a` are the same document long before any content
  * hash runs).
  *
  * Rules (each a pure string/regex transform, expressed identically as
  * Spark Columns and DuckDB SQL so the oracle verifies the whole chain):
  *   - drop the fragment (`#...`)
  *   - lowercase scheme and host
  *   - drop a default port (`:443` for https, `:80` for http)
  *   - drop a leading `www.`
  *   - path: strip trailing slashes, empty → `/` (case preserved — RFC
  *     3986 paths are case-sensitive)
  *   - query: split on `&`, drop empty and `utm_*` tracking params,
  *     SORT the rest (param order is presentation, not identity), rejoin
  *
  * All patterns are anchored single-match, so Spark's replace-all and
  * DuckDB's replace-first `regexp_replace` semantics agree. Per-row
  * narrow work — canonicalization itself never shuffles; the dedup
  * that follows shuffles once on the canonical key.
  */
object UrlFunctions {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  def stripFragment(u: Column): Column = regexp_replace(u, "#.*$", "")
  def stripFragmentSql(e: String): String = s"regexp_replace($e, '#.*$$', '')"

  def scheme(u: Column): Column = lower(regexp_extract(u, SchemeRe, 1))
  def schemeSql(e: String): String =
    s"lower(regexp_extract($e, '$SchemeRe', 1))"

  /** Lowercased host with default port and `www.` dropped. */
  def host(u: Column): Column = {
    val hp = lower(regexp_extract(u, s"$SchemeRe([^/?#]+)", 2))
    val noPort = when(scheme(u) === "https", regexp_replace(hp, ":443$", ""))
      .when(scheme(u) === "http", regexp_replace(hp, ":80$", ""))
      .otherwise(hp)
    regexp_replace(noPort, "^www\\.", "")
  }
  def hostSql(e: String): String = {
    val hp = s"lower(regexp_extract($e, '$SchemeRe([^/?#]+)', 2))"
    val noPort = s"""CASE WHEN ${schemeSql(e)} = 'https' THEN regexp_replace($hp, ':443$$', '')
                    |     WHEN ${schemeSql(e)} = 'http'  THEN regexp_replace($hp, ':80$$', '')
                    |     ELSE $hp END""".stripMargin
    s"regexp_replace($noPort, '^www\\.', '')"
  }

  /** Path with trailing slashes stripped; empty → "/". */
  def path(u: Column): Column = {
    val p = regexp_replace(
      regexp_extract(u, s"$SchemeRe[^/?#]*([^?#]*)", 2), "/+$", "")
    when(p === "", lit("/")).otherwise(p)
  }
  def pathSql(e: String): String = {
    val p = s"regexp_replace(regexp_extract($e, '$SchemeRe[^/?#]*([^?#]*)', 2), '/+$$', '')"
    s"CASE WHEN $p = '' THEN '/' ELSE $p END"
  }

  /** Query string with empty + `utm_*` params dropped and the rest
    * sorted; "" when nothing survives. */
  def queryNorm(u: Column): Column = {
    val raw = regexp_extract(u, "\\?([^#]*)", 1)
    val kept = array_sort(filter(split(raw, "&"),
      x => x =!= "" && substring(x, 1, 4) =!= "utm_"))
    array_join(kept, "&")
  }
  def queryNormSql(e: String): String = {
    val raw = s"regexp_extract($e, '\\?([^#]*)', 1)"
    s"array_to_string(list_sort(list_filter(string_split($raw, '&'), " +
      s"x -> x <> '' AND substr(x, 1, 4) <> 'utm_')), '&')"
  }

  /** The canonical form: scheme://host/path[?sorted-query]. */
  def canonicalUrl(u: Column): Column = {
    val q = queryNorm(u)
    concat(scheme(u), lit("://"), host(u), path(u),
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }
  def canonicalUrlSql(e: String): String = {
    val q = queryNormSql(e)
    s"${schemeSql(e)} || '://' || ${hostSql(e)} || ${pathSql(e)} || " +
      s"CASE WHEN $q = '' THEN '' ELSE '?' || $q END"
  }
}
