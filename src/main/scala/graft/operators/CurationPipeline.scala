package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * move. KN-surprisal gating (l55) and sentence dedup (l70) are OPT-IN
  * stages (`sentenceSplitter` inserts cross-corpus sentence dedup
  * between 6 and 7, `knKeepBelowBits` a perplexity gate between 7 and
  * 8; downstream stage numbers shift by execution order): the DEFAULT
  * chain — and therefore the l71 oracle — stays exactly the 12 stages
  * above, because their DuckDB mirrors (per-bigram smoothing CTEs /
  * cross-doc sentence keep-first) would dominate the l71 mirror
  * without adding new cross-stage contracts; the opt-in arms are
  * funnel-spec-pinned instead.
  *
  * Scale shape: every stage is the already-audited operator — the
  * blocklist is a broadcast LEFT ANTI, content stages are map-only
  * codegen'd projections, dedup keys are 8-byte hashes, the pair graph
  * is df-capped, the quota avoids per-source window collapse, and the
  * funnel itself is 12 small global aggregates over cached stages.
  *
  * Two execution forms over ONE stage-definition list (so they cannot
  * drift): [[run]] bounds stages with `localCheckpoint` (the local /
  * interactive form), [[runCheckpointed]] materializes every stage as
  * a parquet table under a caller-named directory (the 100 TB form —
  * RISKS.md row 11: 12 cached stages of a 100 TB corpus don't fit the
  * cache, and a production run needs restartability; each stage table
  * is the natural restart point).
  */
object CurationPipeline {

  private val GopherRuleFields = Seq("r_wordcount", "r_meanlen",
    "r_symbol", "r_bullet", "r_ellipsis", "r_alpha", "r_stopwords")

  /** One funnel row: doc count, whitespace-token count, char count. */
  private def stageStat(no: Long, name: String, df: DataFrame,
                        textCol: String): DataFrame =
    df.agg(
      count(lit(1)).cast("long").as("n_docs"),
      coalesce(sum(TextAnalysis.tokenCount(textCol)), lit(0L))
        .cast("long").as("n_tokens"),
      coalesce(sum(length(col(textCol)).cast("long")), lit(0L))
        .cast("long").as("n_chars"))
      .select(lit(no.toLong).as("stage_no"), lit(name).as("stage"),
        col("n_docs"), col("n_tokens"), col("n_chars"))

  /** One stage of the chain: `build` derives the stage's frame from its
    * (boundary-materialized) predecessor; `stat` derives its funnel
    * row(s) — given the stage's EXECUTION-ORDER number (opt-in stages
    * shift downstream numbering) — from the stage's own materialized
    * frame plus the predecessor (only pack reads the predecessor: it
    * conserves chars by construction, so its char total is the quota
    * stage's). */
  private case class StageDef(name: String,
      build: DataFrame => DataFrame,
      stat: (Long, DataFrame, DataFrame) => DataFrame)

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
  private def stages(idCol: String, sourceCol: String, htmlCol: String,
      urlCol: String, blockedDomains: Seq[String], lineMaxDf: Long,
      gopherMinWords: Int, jaccN: Int, jaccThreshold: Double,
      jaccMaxDocFreq: Int, budgetPerSource: Long, packBudget: Long,
      trainPct: Int, valPct: Int,
      reline: Column => Column,
      sentenceSplitter: Option[Column => Column],
      knKeepBelowBits: Option[Double]): Seq[StageDef] = {
    val id = col(idCol)
    def plain(name: String, textCol: String)(
        build: DataFrame => DataFrame): StageDef =
      StageDef(name, build,
        (no, self, _) => stageStat(no, name, self, textCol))
    // OPT-IN stage (Lee et al. 2021 / C4): cross-corpus sentence-level
    // exact dedup, keep-FIRST occurrence, between boilerplate removal
    // and the quality gate. Keys are 8-byte sentence hashes (the l23h
    // scale shape); the doc is REASSEMBLED from its surviving
    // sentences in original order (single-space rejoin — the splitter
    // already owns the document's line shape). A doc whose every
    // sentence already appeared earlier disappears (it contributes
    // nothing); empty-splitting docs likewise.
    val sentenceStage = sentenceSplitter.map { split =>
      plain("sentence_dedup", "text") { prev =>
        val keyed = prev.select(id, col(sourceCol),
            posexplode(split(col("text"))).as(Seq("pos", "s")))
          .withColumn("sk", xxhash64(col("s")))
        val first = keyed.groupBy("sk")
          .agg(min(struct(id.as("fdoc"), col("pos").as("fpos"))).as("f"))
          .select(col("sk"), col("f.fdoc").as("fdoc"),
            col("f.fpos").as("fpos"))
        keyed.join(first, Seq("sk"))
          .filter(id === col("fdoc") && col("pos") === col("fpos"))
          .groupBy(id, col(sourceCol))
          .agg(array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("s")))),
            x => x("s")), " ").as("text"))
      }
    }
    // OPT-IN stage (l55's operator as a gate): drop docs whose
    // Kneser-Ney bigram surprisal is at or above the threshold —
    // the perplexity filter a real curation run places after the
    // heuristic battery (heuristics are cheap and cut volume before
    // the model-scoring pass pays its training aggregates).
    val knStage = knKeepBelowBits.map { thr =>
      plain("kn_surprisal", "text")(prev =>
        prev.join(TextAnalysis.knBigramSurprisal(prev, idCol, "text", thr)
          .filter(col("keep") === 1L).select(col(idCol)), Seq(idCol)))
    }
    Seq(
      plain("ingest", htmlCol)(identity),
      plain("url_blocklist", htmlCol) { prev =>
        val spark = prev.sparkSession
        import spark.implicits._
        Urls.filterBlockedDomains(prev, urlCol,
            blockedDomains.toDF("domain"))
          .select(id, col(sourceCol), col(htmlCol))
      },
      plain("html_extract", "text")(prev =>
        prev.select(id, col(sourceCol),
          Html.cleanText(htmlCol).as("text"))),
      plain("unicode_clean", "text")(prev =>
        prev.withColumn("text", call_function("nfc_normalize",
          regexp_replace(regexp_replace(col("text"),
            TextAnalysis.ZeroWidthPattern, ""),
            TextAnalysis.ControlPattern, "")))),
      plain("mojibake_repair", "text")(prev =>
        prev.withColumn("text",
          TextAnalysis.mojibakeRepair(col("text")))),
      plain("line_boilerplate", "text") { prev =>
        val lined = prev.withColumn("text", reline(col("text")))
        Dedup.lineFrequencyFilter(lined, idCol, "text", lineMaxDf)
          .select(id, col("clean_text").as("text"))
          .join(prev.select(id, col(sourceCol)), Seq(idCol))
      }) ++ sentenceStage ++ Seq(
      plain("gopher_quality", "text")(prev =>
        prev.withColumn("__g",
            TextAnalysis.gopherRules("text", gopherMinWords))
          .filter(GopherRuleFields
            .map(f => col("__g").getField(f)).reduce(_ * _) === 1L)
          .drop("__g"))) ++ knStage ++ Seq(
      // keepers are exactly the min-id of each content-hash group, so a
      // semi-join on the 8-byte keep_id suffices — no second hash pass,
      // no 64-char-string join key
      plain("exact_dedup", "text")(prev =>
        prev.join(Dedup.exactDupGroups(prev, idCol, "text")
          .select(col("keep_id")), id === col("keep_id"), "left_semi")),
      StageDef("split", prev => {
        val pairs = Dedup.ngramJaccardPairs(prev, idCol, "text", jaccN,
          jaccThreshold, jaccMaxDocFreq, hashedShingles = true)
        prev.join(GraphRank.connectedComponents(pairs, "doc_a", "doc_b"),
            id === col("node"), "left")
          .withColumn("component", coalesce(col("component"), id))
          .drop("node")
          .withColumn("split",
            TextAnalysis.splitAssign("component", trainPct, valPct))
      }, (no, self, _) => self.groupBy("split").agg(
          count(lit(1)).cast("long").as("n_docs"),
          coalesce(sum(TextAnalysis.tokenCount("text")), lit(0L))
            .cast("long").as("n_tokens"),
          coalesce(sum(length(col("text")).cast("long")), lit(0L))
            .cast("long").as("n_chars"))
        .select(lit(no).as("stage_no"),
          concat(lit("split_"), col("split")).as("stage"),
          col("n_docs"), col("n_tokens"), col("n_chars"))),
      plain("near_dedup", "text")(prev =>
        prev.filter(id === col("component"))),
      plain("source_quota", "text")(prev =>
        prev.join(CorpusAssembly.qualityQuotaSelectHistogram(prev,
            sourceCol, idCol, "text", budgetPerSource)
          .filter(col("kept")).select(id), Seq(idCol))),
      // pack: n_docs = number of bins the kept tokens fill; token and
      // char totals equal the quota stage's by construction (chunking
      // moves content, never drops it) — the funnel pins exactly that
      StageDef("pack", prev =>
        CorpusAssembly.sequencePack(prev, idCol, "text", packBudget),
        (no, self, prev) => self.agg(
            countDistinct(col("bin")).cast("long").as("n_docs"),
            coalesce(sum(col("n_tokens")), lit(0L)).cast("long")
              .as("n_tokens"))
          .crossJoin(prev.agg(coalesce(sum(length(col("text"))
            .cast("long")), lit(0L)).cast("long").as("n_chars")))
          .select(lit(no).as("stage_no"), lit("pack").as("stage"),
            col("n_docs"), col("n_tokens"), col("n_chars"))))
  }

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
    * for lineage truncation — [[runCheckpointed]] is the cluster form.
    */
  def run(raw: DataFrame, idCol: String, sourceCol: String,
          htmlCol: String, urlCol: String,
          blockedDomains: Seq[String],
          lineMaxDf: Long, gopherMinWords: Int,
          jaccN: Int, jaccThreshold: Double, jaccMaxDocFreq: Int,
          budgetPerSource: Long, packBudget: Long,
          trainPct: Int, valPct: Int,
          reline: Column => Column = identity,
          sentenceSplitter: Option[Column => Column] = None,
          knKeepBelowBits: Option[Double] = None): DataFrame = {
    val defs = stages(idCol, sourceCol, htmlCol, urlCol, blockedDomains,
      lineMaxDf, gopherMinWords, jaccN, jaccThreshold, jaccMaxDocFreq,
      budgetPerSource, packBudget, trainPct, valPct, reline,
      sentenceSplitter, knKeepBelowBits)
    var prev = raw
    val stats = scala.collection.mutable.ArrayBuffer[DataFrame]()
    defs.zipWithIndex.foreach { case (d, i) =>
      val built = d.build(prev)
      // the terminal pack table is consumed once (its stat) — no
      // boundary needed
      val bounded =
        if (i == defs.size - 1) built else built.localCheckpoint(false)
      stats += d.stat(i + 1L, bounded, prev)
      prev = bounded
    }
    stats.reduce(_ unionByName _)
  }

  /** The cluster / restartable form (RISKS.md row 11 made real): every
    * stage is MATERIALIZED as a parquet table `stageDir/s<no>` with its
    * funnel row(s) alongside (`stageDir/funnel_s<no>`), written in
    * stage order — the ReferenceParity runDate discipline applied to
    * the curation chain.
    *
    * Restart-from-stage-k for free: a re-run over the same `stageDir`
    * SKIPS every stage whose data AND funnel tables are complete
    * (`_SUCCESS` present — Spark's commit protocol writes it last, so
    * a killed write is detected and redone) and recomputes from the
    * first incomplete stage onward, reading its predecessor's table
    * instead of re-deriving the prefix. Funnel rows for completed
    * stages are READ from their materialized tables, never re-scanned
    * — at 100 TB the restart cost is the remaining stages only.
    *
    * The returned funnel is bit-identical to [[run]]'s (same stage
    * definitions, same aggregates; spec-pinned).
    *
    * A `_GRAFT_CHAIN` fingerprint (ordered stage names + every scalar
    * parameter) guards reuse: a `stageDir` holding stages from a
    * different chain is REFUSED rather than silently served back.
    * NOT fingerprintable — and therefore on the caller — are the
    * function-valued knobs (`reline`, `sentenceSplitter`) and the
    * INPUT DATASET itself: a reused stageDir always answers for the
    * corpus it was built from, so a new crawl snapshot needs a new
    * stageDir (the runDate-directory discipline).
    */
  def runCheckpointed(raw: DataFrame, idCol: String, sourceCol: String,
          htmlCol: String, urlCol: String,
          blockedDomains: Seq[String],
          lineMaxDf: Long, gopherMinWords: Int,
          jaccN: Int, jaccThreshold: Double, jaccMaxDocFreq: Int,
          budgetPerSource: Long, packBudget: Long,
          trainPct: Int, valPct: Int, stageDir: String,
          reline: Column => Column = identity,
          sentenceSplitter: Option[Column => Column] = None,
          knKeepBelowBits: Option[Double] = None): DataFrame = {
    val spark = raw.sparkSession
    val defs = stages(idCol, sourceCol, htmlCol, urlCol, blockedDomains,
      lineMaxDf, gopherMinWords, jaccN, jaccThreshold, jaccMaxDocFreq,
      budgetPerSource, packBudget, trainPct, valPct, reline,
      sentenceSplitter, knKeepBelowBits)
    val hconf = spark.sessionState.newHadoopConf()
    def complete(p: String): Boolean = {
      val hp = new org.apache.hadoop.fs.Path(p, "_SUCCESS")
      hp.getFileSystem(hconf).exists(hp)
    }
    // Chain fingerprint: a restart may only reuse stage tables built
    // by the SAME chain — a prior run with different thresholds or
    // opt-in stages would otherwise be served back silently ("every
    // s<k> is complete, nothing rebuilds, stale funnel returned").
    // The fingerprint covers the ordered stage names + every scalar
    // parameter; the function-valued knobs (reline, sentenceSplitter)
    // CANNOT be fingerprinted — changing only those against a reused
    // stageDir is on the caller, and the scaladoc says so.
    locally {
      // NUL-separated: adjacent-field boundary shifts (lineMaxDf=42,
      // minWords=0 vs 4, 20 would otherwise collide into one string)
      val fp = (defs.map(_.name) ++ Seq(idCol, sourceCol, htmlCol,
        urlCol, blockedDomains.mkString("|"), lineMaxDf,
        gopherMinWords, jaccN, jaccThreshold, jaccMaxDocFreq,
        budgetPerSource, packBudget, trainPct, valPct,
        knKeepBelowBits)).mkString("\u0000")
      val fpPath = new org.apache.hadoop.fs.Path(stageDir, "_GRAFT_CHAIN")
      val fs = fpPath.getFileSystem(hconf)
      if (fs.exists(fpPath)) {
        val in = fs.open(fpPath)
        val prior = try {
          val bos = new java.io.ByteArrayOutputStream()
          val tmp = new Array[Byte](4096)
          var n = in.read(tmp)
          while (n > 0) { bos.write(tmp, 0, n); n = in.read(tmp) }
          new String(bos.toByteArray, "UTF-8")
        } finally in.close()
        require(prior == fp,
          s"runCheckpointed: $stageDir holds stages from a DIFFERENT " +
            "chain (stage list or parameters changed) — reusing them " +
            "would return a stale funnel; use a fresh stageDir")
      } else {
        val out = fs.create(fpPath, true)
        try out.write(fp.getBytes("UTF-8")) finally out.close()
      }
    }
    var prev = raw
    val stats = scala.collection.mutable.ArrayBuffer[DataFrame]()
    defs.zipWithIndex.foreach { case (d, i) =>
      val no = i + 1L
      val dataP = s"$stageDir/s$no"
      val statP = s"$stageDir/funnel_s$no"
      // a crash BETWEEN the data write and the funnel write must not
      // rebuild the (possibly multi-TB) completed stage table — only
      // the cheap funnel aggregate is recomputed from it
      val dataWasComplete = complete(dataP)
      if (!dataWasComplete)
        d.build(prev).write.mode("overwrite").parquet(dataP)
      val self = spark.read.parquet(dataP)
      if (!dataWasComplete || !complete(statP))
        d.stat(no, self, prev).write.mode("overwrite").parquet(statP)
      prev = self
      stats += spark.read.parquet(statP)
    }
    stats.reduce(_ unionByName _)
  }
}
