package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed "full modern curation pipeline" (l71): every wave-5..10
  * cleaning stage chained into ONE dataflow, certified by ONE DuckDB
  * mirror — the l28 treatment for the post-ingest curation surface.
  * The individually-verified stages (l34/l35/l36/l37/l59/l60/l63/l64/
  * l1/l2bh/l39/l65/l26h/l25) do not certify their COMPOSITION: column
  * collisions, stage ordering, survivor-set scoping and key flow
  * (component ids feeding the split; quota feeding the packer) only
  * break end to end, and l28 found real bugs exactly there.
  *
  * Stage chain (crawl-shaped):
  *   1  ingest           raw (html, url) corpus
  *   2  url_blocklist    canonicalize -> registrable domain -> drop
  *                       blocked + unattributable (NULL-domain) rows
  *   3  html_extract     script/style/tag strip, entity decode
  *   4  unicode_clean    zero-width/control strip + NFC recompose
  *   5  mojibake_repair  cp1252-damage digraph fold
  *   6  line_boilerplate CCNet line-frequency filter (df > cap drops)
  *   7  gopher_quality   the 7-rule battery, keep = all pass
  *   8  exact_dedup      sha-256 of normalized text, keep min id
  *   9  split_*          leakage-safe split: LCG keyed by the near-dup
  *                       CONNECTED COMPONENT (never the doc id)
  *   10 near_dedup       one keeper per component (the min-id label)
  *   11 source_quota     per-source token budget, quality-first
  *                       (histogram form — no per-source window task)
  *   12 pack             concat-and-chunk sequence packing
  *
  * Output = the funnel: one row per stage (three for the split),
  * (stage_no, stage, n_docs, n_tokens, n_chars) — n_chars makes the
  * content-only stages (4, 5) visible where doc/token counts cannot
  * move. KN-surprisal gating (l55) and sentence dedup (l70) are NOT in
  * this chain: each carries its own composed-cost oracle, and their
  * mirrors (per-bigram smoothing CTEs / cross-doc sentence keep-first)
  * would dominate this one without adding new cross-stage contracts.
  *
  * Scale shape: every stage is the already-audited operator — the
  * blocklist is a broadcast LEFT ANTI, content stages are map-only
  * codegen'd projections, dedup keys are 8-byte hashes, the pair graph
  * is df-capped, the quota avoids per-source window collapse, and the
  * funnel itself is 12 small global aggregates over cached stages.
  */
object CurationPipeline {

  private val GopherRuleFields = Seq("r_wordcount", "r_meanlen",
    "r_symbol", "r_bullet", "r_ellipsis", "r_alpha", "r_stopwords")

  /** One funnel row: doc count, whitespace-token count, char count. */
  private def stageStat(no: Int, name: String, df: DataFrame,
                        textCol: String): DataFrame =
    df.agg(
      count(lit(1)).cast("long").as("n_docs"),
      coalesce(sum(TextAnalysis.tokenCount(textCol)), lit(0L))
        .cast("long").as("n_tokens"),
      coalesce(sum(length(col(textCol)).cast("long")), lit(0L))
        .cast("long").as("n_chars"))
      .select(lit(no.toLong).as("stage_no"), lit(name).as("stage"),
        col("n_docs"), col("n_tokens"), col("n_chars"))

  /** Run the full chain over `raw` (idCol, sourceCol, htmlCol, urlCol)
    * and return the funnel.
    *
    * Stage boundaries are `localCheckpoint(eager = false)`, NOT
    * persist(): several stages reference their predecessor TWICE (s6
    * joins the line filter back to s5, s8 joins the dup-group table
    * back to s7, s11 joins the quota survivors back to s10), so the
    * un-truncated logical tree DOUBLES at each such stage and the
    * funnel's 13 union branches each carry the full prefix —
    * Catalyst's analysis + cache matching on that shape took 10
    * minutes and then exhausted an 8 GB driver at 500 input rows.
    * Checkpointing makes every stage a leaf: plan work is linear in
    * stage count, the same cure GraphRank.connectedComponents applies
    * per pointer-jumping round (treeString OOM, round 11). LAZY
    * (eager = false) because truncation happens at plan construction
    * either way — the RDD materializes inside the first consuming
    * action instead of as 11 separate synchronization jobs, a
    * measured ~30% of the composed wall at sf0.1. Cluster caveat as
    * with GraphRank: localCheckpoint trades executor-loss recovery
    * for lineage truncation — a production run at scale would swap
    * these boundaries for reliable checkpoints or stage-output tables.
    */
  /** `reline` rebuilds line structure for the boilerplate-frequency
    * stage after HTML extraction collapsed all whitespace — it is the
    * CALLER'S text shape, not the operator's: the default keeps the
    * extracted text as one line (the stage then only removes whole-doc
    * duplicates of that line), real crawls keep extractor-emitted
    * newlines, and the l71 fixture plants nav/footer lines and cuts at
    * portable word boundaries. (An earlier draft baked the fixture's
    * rebuild into the operator — every caller got synthetic boilerplate
    * injected and ' the '/' a ' tokens deleted.)
    */
  def run(raw: DataFrame, idCol: String, sourceCol: String,
          htmlCol: String, urlCol: String,
          blockedDomains: Seq[String],
          lineMaxDf: Long, gopherMinWords: Int,
          jaccN: Int, jaccThreshold: Double, jaccMaxDocFreq: Int,
          budgetPerSource: Long, packBudget: Long,
          trainPct: Int, valPct: Int,
          reline: Column => Column = identity): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    val id = col(idCol)

    val s1 = raw.localCheckpoint(false)
    val s2 = Urls.filterBlockedDomains(s1, urlCol,
        blockedDomains.toDF("domain"))
      .select(id, col(sourceCol), col(htmlCol)).localCheckpoint(false)
    val s3 = s2.select(id, col(sourceCol),
      Html.cleanText(htmlCol).as("text")).localCheckpoint(false)
    val s4 = s3.withColumn("text", call_function("nfc_normalize",
      regexp_replace(regexp_replace(col("text"),
        TextAnalysis.ZeroWidthPattern, ""),
        TextAnalysis.ControlPattern, ""))).localCheckpoint(false)
    val s5 = s4.withColumn("text",
      TextAnalysis.mojibakeRepair(col("text"))).localCheckpoint(false)
    val lined = s5.withColumn("text", reline(col("text")))
    val s6 = Dedup.lineFrequencyFilter(lined, idCol, "text", lineMaxDf)
      .select(id, col("clean_text").as("text"))
      .join(s5.select(id, col(sourceCol)), Seq(idCol)).localCheckpoint(false)
    val s7 = s6
      .withColumn("__g",
        TextAnalysis.gopherRules("text", gopherMinWords))
      .filter(GopherRuleFields
        .map(f => col("__g").getField(f)).reduce(_ * _) === 1L)
      .drop("__g").localCheckpoint(false)
    // keepers are exactly the min-id of each content-hash group, so a
    // semi-join on the 8-byte keep_id suffices — no second hash pass,
    // no 64-char-string join key
    val s8 = s7
      .join(Dedup.exactDupGroups(s7, idCol, "text")
        .select(col("keep_id")), id === col("keep_id"), "left_semi")
      .localCheckpoint(false)
    val pairs = Dedup.ngramJaccardPairs(s8, idCol, "text", jaccN,
      jaccThreshold, jaccMaxDocFreq, hashedShingles = true)
    val s9 = s8
      .join(GraphRank.connectedComponents(pairs, "doc_a", "doc_b"),
        id === col("node"), "left")
      .withColumn("component", coalesce(col("component"), id))
      .drop("node")
      .withColumn("split",
        TextAnalysis.splitAssign("component", trainPct, valPct))
      .localCheckpoint(false)
    val s10 = s9.filter(id === col("component")).localCheckpoint(false)
    val s11 = s10
      .join(CorpusAssembly.qualityQuotaSelectHistogram(s10, sourceCol,
          idCol, "text", budgetPerSource)
        .filter(col("kept")).select(id), Seq(idCol))
      .localCheckpoint(false)
    val s12 = CorpusAssembly.sequencePack(s11, idCol, "text", packBudget)

    Seq(
      stageStat(1, "ingest", s1, htmlCol),
      stageStat(2, "url_blocklist", s2, htmlCol),
      stageStat(3, "html_extract", s3, "text"),
      stageStat(4, "unicode_clean", s4, "text"),
      stageStat(5, "mojibake_repair", s5, "text"),
      stageStat(6, "line_boilerplate", s6, "text"),
      stageStat(7, "gopher_quality", s7, "text"),
      stageStat(8, "exact_dedup", s8, "text"),
      s9.groupBy("split").agg(
          count(lit(1)).cast("long").as("n_docs"),
          coalesce(sum(TextAnalysis.tokenCount("text")), lit(0L))
            .cast("long").as("n_tokens"),
          coalesce(sum(length(col("text")).cast("long")), lit(0L))
            .cast("long").as("n_chars"))
        .select(lit(9L).as("stage_no"),
          concat(lit("split_"), col("split")).as("stage"),
          col("n_docs"), col("n_tokens"), col("n_chars")),
      stageStat(10, "near_dedup", s10, "text"),
      stageStat(11, "source_quota", s11, "text"),
      // pack: n_docs = number of bins the kept tokens fill; token and
      // char totals equal stage 11's by construction (chunking moves
      // content, never drops it) — the funnel pins exactly that
      s12.agg(
          countDistinct(col("bin")).cast("long").as("n_docs"),
          coalesce(sum(col("n_tokens")), lit(0L)).cast("long")
            .as("n_tokens"))
        .crossJoin(s11.agg(coalesce(sum(length(col("text"))
          .cast("long")), lit(0L)).cast("long").as("n_chars")))
        .select(lit(12L).as("stage_no"), lit("pack").as("stage"),
          col("n_docs"), col("n_tokens"), col("n_chars"))
    ).reduce(_ unionByName _)
  }
}
