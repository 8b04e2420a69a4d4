package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → training text extraction — the boilerplate-stripping step
  * every web-crawl pipeline runs before any quality/dedup operator
  * (trafilatura/jusText territory), as deterministic regex dataflow so
  * the whole pass is engine-portable and oracle-checkable:
  *
  *  1. `<script>`/`<style>` elements go first, CONTENT INCLUDED — code
  *     and CSS are not prose, and a script body may contain literal
  *     `<` / tag-looking strings that would corrupt a naive one-pass
  *     tag strip (the spec pins exactly that case);
  *  2. link text is measured BEFORE tags are stripped (`<a>` content
  *     against total extracted text = link density, the classic
  *     nav/boilerplate discriminant jusText keys on);
  *  3. remaining tags collapse to spaces (never to '' — `a</p><p>b`
  *     must not fuse words), the five predefined entities plus nbsp
  *     decode, whitespace collapses.
  *
  * Patterns stay inside the RE2 ∩ java.util.regex common subset (lazy
  * quantifiers, inline `(?is)` flags, character classes — NO
  * lookaround), which is what lets the identical pattern strings run
  * in Spark's codegen'd regexp_replace and DuckDB's RE2 oracle.
  * Regex-parsing HTML is bounded-scope by design: element stripping +
  * text statistics, not DOM semantics — the documented contract every
  * large-scale extractor actually honors at this stage.
  */
object Html {

  // Shared pattern constants are deliberately BACKSLASH-FREE: RE2 has
  // no backreferences (so no <(script|style)>...</\1>), and the two
  // engines disagree on backslash handling inside SQL string literals
  // (Spark parses '\b' as a BACKSPACE escape; DuckDB keeps it) — any
  // class needing a backslash must live in the per-engine fragments,
  // spelled for that engine's literal rules.
  private val Script = "(?is)<script[^>]*>.*?</script>"
  private val Style = "(?is)<style[^>]*>.*?</style>"
  // `<a>` or `<a ...>` but not `<abbr>`: the text is GROUP 2
  private val ATag = "(?is)<a(>| [^>]*>)(.*?)</a>"
  private val AnyTag = "(?s)<[^>]*>"

  /** SQL fragment (shared Spark/DuckDB syntax, the x14 discipline)
    * producing the cleaned text of `htmlExpr`.
    */
  def cleanTextSql(htmlExpr: String): String = {
    val noCode = s"regexp_replace(regexp_replace($htmlExpr, " +
      s"'$Script', ' '), '$Style', ' ')"
    val noTags = s"regexp_replace($noCode, '$AnyTag', ' ')"
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (e, (ent, ch)) =>
        s"replace($e, '$ent', '$ch')"
      }
    s"trim(regexp_replace($decoded, '\\\\s+', ' '))"
  }

  /** SQL fragment: total characters of LINK TEXT (tag-stripped `<a>`
    * content, scripts/styles removed first so a script's fake anchors
    * don't count).
    */
  def linkCharsSql(htmlExpr: String): String = {
    val noCode = s"regexp_replace(regexp_replace($htmlExpr, " +
      s"'$Script', ' '), '$Style', ' ')"
    s"""coalesce(aggregate(
          regexp_extract_all($noCode, '$ATag', 2),
          0L, (acc, x) ->
            acc + length(trim(regexp_replace(
              regexp_replace(x, '$AnyTag', ' '), '\\\\s+', ' ')))),
        0L)"""
  }

  /** DuckDB mirror of [[linkCharsSql]] (same patterns; list_reduce is
    * DuckDB's fold and needs a seeded prepend like the l10 oracle).
    */
  def linkCharsDuckSql(htmlExpr: String): String = {
    val noCode = s"regexp_replace(regexp_replace($htmlExpr, " +
      s"'$Script', ' ', 'g'), '$Style', ' ', 'g')"
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(
            regexp_extract_all($noCode, '$ATag', 2),
            x -> CAST(length(trim(regexp_replace(
              regexp_replace(x, '$AnyTag', ' ', 'g'),
              '\\s+', ' ', 'g'))) AS BIGINT))),
        (a, b) -> a + b)"""
  }

  /** DuckDB mirror of [[cleanTextSql]] ('g' flags — DuckDB replaces
    * first-match-only by default where Spark replaces all).
    */
  def cleanTextDuckSql(htmlExpr: String): String = {
    val noCode = s"regexp_replace(regexp_replace($htmlExpr, " +
      s"'$Script', ' ', 'g'), '$Style', ' ', 'g')"
    val noTags = s"regexp_replace($noCode, '$AnyTag', ' ', 'g')"
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (e, (ent, ch)) =>
        s"replace($e, '$ent', '$ch')"
      }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  def cleanText(htmlCol: String): Column = expr(cleanTextSql(htmlCol))

  /** `href` attribute values RE (RE2 ∩ java.regex — double-quoted
    * attributes, the form the l34 synthesis and real generated markup
    * emit; single-quoted/unquoted attributes are a parser's job, not a
    * regex's — documented limitation).
    */
  val HrefRe: String = "href=\"([^\"]*)\""

  /** All href values of the document, in order — the outlink extractor
    * feeding URL canonicalization (Urls.canonicalize) and the link
    * graph (l62). Map-only.
    */
  def extractHrefs(htmlCol: String): Column =
    org.apache.spark.sql.functions.regexp_extract_all(
      org.apache.spark.sql.functions.col(htmlCol),
      org.apache.spark.sql.functions.lit(HrefRe),
      org.apache.spark.sql.functions.lit(1))

  /** DuckDB mirror of [[extractHrefs]] (same regex constant). */
  def extractHrefsDuckSql(htmlExpr: String): String =
    s"regexp_extract_all($htmlExpr, 'href=\"([^\"]*)\"', 1)"

  /** Link density in [0, 1]: link chars / clean chars (0 for empty). */
  def linkDensity(htmlCol: String): Column = {
    val clean = cleanTextSql(htmlCol)
    expr(s"""IF(length($clean) = 0, CAST(0.0 AS DOUBLE),
        CAST(${linkCharsSql(htmlCol)} AS DOUBLE)
          / CAST(length($clean) AS BIGINT))""")
  }
}
