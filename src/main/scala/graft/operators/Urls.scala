package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL curation for crawl-derived corpora — the step C4/CommonCrawl-
  * style pipelines run BEFORE text ever enters the engine: the same
  * page is crawled under `HTTP://Host.com:80/a#frag` and
  * `http://host.com/a?utm_source=x`, so URL-keyed dedup, per-domain
  * quotas, and domain blocklists all need one canonical form first.
  *
  * Canonicalization (all staged `withColumn`s — each piece computed
  * once, the whole pass one codegen'd map-only projection, no UDF):
  *  - scheme and host lowercase; default ports stripped (`:80` http,
  *    `:443` https); fragment dropped;
  *  - tracking query parameters removed ([[TrackingParamRe]]:
  *    `utm_*`, `fbclid`, `gclid`, `msclkid`) preserving the order of
  *    the rest — parameter ORDER is not reordered (a&b vs b&a can be
  *    semantically different; canonicalization must never merge
  *    distinct resources, only distinct spellings of one);
  *  - empty path becomes `/`; scheme-less or host-less input yields
  *    NULL canonical (malformed by contract — quarantine upstream).
  *
  * Registrable domain: last two host labels, or last three when the
  * second-level label is a common public-suffix second level
  * (`co/com/net/org/gov/edu/ac` — the standard heuristic; the full
  * public-suffix list is a data file, not an algorithm change).
  *
  * Every rule is mirrored operation-for-operation in the DuckDB
  * oracle (l36) — regex constants shared, engine-specific function
  * spellings parallel (the Html.scala discipline), so the per-doc
  * hash-match certifies both the rules and their portability.
  */
object Urls {

  /** Tracking params stripped from query strings (RE2 ∩ java.regex). */
  val TrackingParamRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid)="

  val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  val HostPortRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  /** path + query, fragment excluded. */
  val RestRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"

  private val SecondLevels = Seq("co", "com", "net", "org", "gov",
    "edu", "ac")

  /** Adds `url_canonical` and `url_domain` for `urlCol`. */
  def canonicalize(df: DataFrame, urlCol: String): DataFrame = {
    val u = s"`$urlCol`"
    val slds = SecondLevels.map(s => s"'$s'").mkString(", ")
    df
      .withColumn("__scheme",
        expr(s"lower(regexp_extract($u, '$SchemeRe', 1))"))
      .withColumn("__hostport",
        expr(s"lower(regexp_extract($u, '$HostPortRe', 1))"))
      .withColumn("__host", expr(
        s"""CASE WHEN __scheme = 'http'
                 THEN regexp_replace(__hostport, ':80$$', '')
                 WHEN __scheme = 'https'
                 THEN regexp_replace(__hostport, ':443$$', '')
                 ELSE __hostport END"""))
      .withColumn("__pathq", expr(s"regexp_extract($u, '$RestRe', 1)"))
      .withColumn("__path",
        expr("regexp_extract(__pathq, '^([^?]*)', 1)"))
      .withColumn("__q", expr(
        s"""array_join(filter(split(
              regexp_extract(__pathq, '^[^?]*[?](.*)$$', 1), '&'),
              p -> p != '' AND NOT (p rlike '$TrackingParamRe')), '&')"""))
      .withColumn("url_canonical", expr(
        """IF(__scheme = '' OR __host = '', NULL,
             concat(__scheme, '://', __host,
               IF(__path = '', '/', __path),
               IF(__q = '', '', concat('?', __q))))"""))
      .withColumn("__h",
        expr("regexp_replace(__host, ':[0-9]+$', '')"))
      .withColumn("__labels", expr("split(__h, '[.]')"))
      .withColumn("url_domain", expr(
        s"""CASE
              WHEN __host = '' THEN NULL
              WHEN size(__labels) >= 3 AND
                   element_at(__labels, size(__labels) - 1)
                     IN ($slds)
              THEN concat_ws('.',
                element_at(__labels, size(__labels) - 2),
                element_at(__labels, size(__labels) - 1),
                element_at(__labels, size(__labels)))
              WHEN size(__labels) >= 2
              THEN concat_ws('.',
                element_at(__labels, size(__labels) - 1),
                element_at(__labels, size(__labels)))
              ELSE __h END"""))
      .drop("__scheme", "__hostport", "__host", "__pathq", "__path",
        "__q", "__h", "__labels")
  }

  /** Keep rows whose registrable domain is NOT in `blocklist` —
    * broadcast LEFT ANTI join, so the blocklist scales to the
    * million-domain lists real curation uses without a literal-list
    * expression; rows with NULL domain (malformed URLs) are DROPPED
    * (an un-attributable URL must not bypass the blocklist).
    */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
                           blocklist: DataFrame): DataFrame = {
    // Barrier.filterAbove, not a bare filter: a deterministic filter on
    // url_domain is pushed below the canonicalization Projects, where
    // it re-evaluates the whole inlined regex tree per row on top of
    // the projection's own evaluation — measured 7x wall on a 30M-row
    // probe (160 s vs 12 s after the fix, SCALE_r12.md §7).
    val withDomain = Barrier.filterAbove(canonicalize(df, urlCol),
      col("url_domain").isNotNull)
    withDomain.join(
      broadcast(blocklist.select(col(blocklist.columns.head)
        .as("__blocked_domain"))),
      withDomain("url_domain") === col("__blocked_domain"), "left_anti")
  }

  /** The DuckDB mirror of [[canonicalize]] as a CTE chain rooted at
    * `srcCte(doc_id, u)`; exposes `c(doc_id, u, url_canonical,
    * url_domain)`. Kept adjacent to the Spark rules on purpose: every
    * edit here must have a twin above.
    */
  def canonicalDuckSql(srcCte: String): String = {
    val slds = SecondLevels.map(s => s"'$s'").mkString(", ")
    s"""u0 AS ($srcCte),
       u1 AS (SELECT doc_id, u,
         lower(regexp_extract(u, '$SchemeRe', 1)) AS scheme,
         lower(regexp_extract(u, '$HostPortRe', 1)) AS hostport,
         regexp_extract(u, '$RestRe', 1) AS pathq
         FROM u0),
       u2 AS (SELECT *,
         CASE WHEN scheme = 'http'
              THEN regexp_replace(hostport, ':80$$', '')
              WHEN scheme = 'https'
              THEN regexp_replace(hostport, ':443$$', '')
              ELSE hostport END AS host,
         regexp_extract(pathq, '^([^?]*)', 1) AS path,
         coalesce(array_to_string(list_filter(
           string_split(regexp_extract(pathq, '^[^?]*[?](.*)$$', 1),
             '&'),
           p -> p <> '' AND NOT regexp_matches(p, '$TrackingParamRe')),
           '&'), '') AS q
         FROM u1),
       u3 AS (SELECT *,
         string_split(regexp_replace(host, ':[0-9]+$$', ''), '.')
           AS labels
         FROM u2),
       c AS (SELECT doc_id, u,
         CASE WHEN scheme = '' OR host = '' THEN NULL
              ELSE scheme || '://' || host ||
                   (CASE WHEN path = '' THEN '/' ELSE path END) ||
                   (CASE WHEN q = '' THEN '' ELSE '?' || q END) END
           AS url_canonical,
         CASE
           WHEN host = '' THEN NULL
           WHEN len(labels) >= 3 AND
                labels[len(labels) - 1] IN ($slds)
           THEN labels[len(labels) - 2] || '.' ||
                labels[len(labels) - 1] || '.' || labels[len(labels)]
           WHEN len(labels) >= 2
           THEN labels[len(labels) - 1] || '.' || labels[len(labels)]
           ELSE regexp_replace(host, ':[0-9]+$$', '') END AS url_domain
         FROM u3)"""
  }
}
