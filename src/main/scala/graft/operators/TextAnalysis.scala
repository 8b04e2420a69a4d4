package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, heuristic language ID, and document fingerprinting — all pure
  * Catalyst expressions (codegen'd, streaming-safe, oracle-mirrorable).
  */
object TextAnalysis {

  private def toksSql(textCol: String): String =
    s"filter(split($textCol, ' '), t -> length(t) > 0)"

  /** Whitespace token count. */
  def tokenCount(textCol: String): Column =
    expr(s"size(${toksSql(textCol)})").cast("long")

  /** BPE-ish subword count: runs of letters, runs of digits, and single
    * other non-space characters each count as one token — a deterministic
    * stand-in for a real BPE vocabulary's pre-tokenizer.
    */
  def bpeishCount(textCol: String): Column =
    expr(s"size(regexp_extract_all($textCol, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0))")
      .cast("long")

  /** Quality-score feature columns (length/punct/stopword ratios — the
    * standard cheap filters applied before LLM training).
    */
  def qualityFeatures(textCol: String, stopwords: Seq[String])
      : Seq[(String, Column)] = {
    val toks = toksSql(textCol)
    val nToks = s"size($toks)"
    val stopArr = stopwords.map(w => s"'$w'").mkString("array(", ", ", ")")
    Seq(
      "n_chars_m" -> expr(s"length($textCol)").cast("long"),
      "n_tokens" -> expr(nToks).cast("long"),
      "avg_token_len" ->
        expr(s"""CAST(aggregate($toks, CAST(0 AS BIGINT),
             (a, t) -> a + length(t)) AS DOUBLE) / CAST($nToks AS BIGINT)"""),
      "stopword_ratio" ->
        expr(s"""CAST(size(filter($toks,
             t -> array_contains($stopArr, t))) AS DOUBLE)
             / CAST($nToks AS BIGINT)"""),
      "alpha_ratio" ->
        expr(s"""CAST(length(regexp_replace($textCol, '[^a-zA-Z]', ''))
             AS DOUBLE) / CAST(length($textCol) AS BIGINT)"""))
  }

  /** Marker-word hit count for one language: occurrences of `marker` as a
    * whole token.
    */
  def markerHits(textCol: String, marker: String): Column =
    expr(s"size(filter(${toksSql(textCol)}, t -> t = '$marker'))")
      .cast("long")

  /** Heuristic language ID: argmax of marker-hit counts with a fixed
    * priority order for ties (first entry wins). `markers` maps language
    * code -> marker token.
    */
  def langId(textCol: String, markers: Seq[(String, String)]): Column = {
    val hits = markers.map { case (lang, m) => lang -> markerHits(textCol, m) }
    // strictly-greater fold, so earlier entries win ties
    hits.tail.foldLeft((hits.head._2, lit(hits.head._1): Column)) {
      case ((bestHits, bestLang), (lang, h)) =>
        (when(h > bestHits, h).otherwise(bestHits),
          when(h > bestHits, lit(lang)).otherwise(bestLang))
    }._2
  }

  /** Token-window chunks for training-data preparation: windows of
    * `size` tokens starting every `stride` tokens (stride < size =
    * overlapping context windows). Returns array<struct<start, chunk>>;
    * explode it to one row per chunk. The token array is bound once
    * (lambda-variable trick — see Dedup.shingles).
    */
  def chunks(textCol: String, size: Int, stride: Int): Column = expr(
    s"""element_at(transform(array(${toksSql(textCol)}), ts ->
        transform(sequence(1, size(ts), $stride),
          i -> struct(CAST(i AS BIGINT) AS start,
                      array_join(slice(ts, i, $size), ' ') AS chunk))), 1)""")

  /** PII-style pattern redaction: digit runs masked (the cheap scrub pass
    * a training pipeline runs before tokenization).
    */
  def redactDigits(textCol: String, mask: String = "#"): Column =
    expr(s"regexp_replace($textCol, '[0-9]+', '$mask')")

  /** Order-sensitive rolling-hash document fingerprint over tokens:
    * fold (acc * 31 + (17 * len(tok) + ascii(first char))) mod prime.
    * Portable: the DuckDB oracle reproduces it with list_reduce.
    */
  def fingerprint(textCol: String): Column = expr(
    s"""aggregate(${toksSql(textCol)}, CAST(0 AS BIGINT), (a, t) ->
        (a * 31 + length(t) * 17 + ascii(substring(t, 1, 1))) % 1000000007)""")
}
