package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WARC crawl-container ingest (ISO 28500) — the step before
  * [[Html.cleanText]] in a CommonCrawl-shaped pipeline. The reference
  * pipeline ingests already-extracted tabular data
  * (`scripts/extract.py`); a 100 TB training-data pipeline starts one
  * step earlier, at the crawler's container files, so this operator is
  * part of the beyond-reference LLM-curation surface (SURVEY §2.14).
  *
  * The record walk itself is the native `warc_parse` expression
  * ([[graft.plans.WarcParse]]): per-file byte walk, one struct per
  * record, corruption quarantined as an `error`-tagged struct instead
  * of a task failure. This wrapper is the dataflow: explode the record
  * array, split good records from quarantine, and expose response
  * bodies ready for the HTML extractor.
  *
  * Scale shape: parsing is map-only and codegen'd (no shuffle, no
  * regex); one input file fans out to its records via a single
  * generator. Downstream stages see ordinary columns, so filter
  * pushdown and column pruning continue to apply. Quarantine is a
  * filter on the same parsed array — NOT a second parse.
  */
object Warc {

  /** All records of all files: one row per record (or per quarantine
    * stub), `(idCol, rec_idx, warc_type, target_uri, content_type,
    * content_length, http_status, http_mime, body, error)`.
    */
  def records(df: DataFrame, idCol: String, warcCol: String): DataFrame =
    df.select(col(idCol),
        explode(call_function("warc_parse", col(warcCol))).as("__r"))
      .select(col(idCol), col("__r.rec_idx").as("rec_idx"),
        col("__r.warc_type").as("warc_type"),
        col("__r.target_uri").as("target_uri"),
        col("__r.content_type").as("content_type"),
        col("__r.content_length").as("content_length"),
        col("__r.http_status").as("http_status"),
        col("__r.http_mime").as("http_mime"),
        col("__r.body").as("body"),
        col("__r.error").as("error"))

  /** Good HTTP-response records only, with the extracted page text:
    * the rows [[Html.cleanText]] feeds on. `okOnly` additionally
    * drops non-2xx statuses (fetch errors carried in-band by the
    * crawler).
    */
  def responseTexts(df: DataFrame, idCol: String, warcCol: String,
                    okOnly: Boolean = true): DataFrame =
    responseTextsFromRecords(records(df, idCol, warcCol), idCol, okOnly)

  /** [[responseTexts]] over an already-parsed [[records]] frame — the
    * single definition of the response gate and output schema, shared
    * with the streaming sink (which parses once and consumes the
    * records frame twice).
    */
  def responseTextsFromRecords(recs: DataFrame, idCol: String,
                               okOnly: Boolean = true): DataFrame = {
    val base = recs
      .filter(col("error").isNull &&
        lower(col("warc_type")) === "response" && col("body").isNotNull)
    val gated =
      if (okOnly)
        base.filter(col("http_status") >= 200L &&
          col("http_status") < 300L)
      else base
    gated.select(col(idCol), col("rec_idx"), col("target_uri"),
      col("http_status"), col("http_mime"),
      Html.cleanText("body").as("text"))
  }

  /** Quarantine: one row per corrupt file tail, `(idCol, rec_idx,
    * error)` — `rec_idx` is how many records parsed cleanly before the
    * framing broke.
    */
  def quarantine(df: DataFrame, idCol: String,
                 warcCol: String): DataFrame =
    records(df, idCol, warcCol)
      .filter(col("error").isNotNull)
      .select(col(idCol), col("rec_idx"), col("error"))
}
