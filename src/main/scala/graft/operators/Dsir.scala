package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection via importance resampling (Xie et al.
  * 2023, "Data Selection for Language Models via Importance
  * Resampling", arXiv:2302.03169): score every raw document by how
  * much more likely its tokens are under a TARGET domain's hashed
  * n-gram distribution than under the raw corpus's, then keep the
  * top-k — the standard cheap way to steer a 100 TB crawl toward a
  * small high-quality target (Wikipedia/books in the paper; the
  * `targetPred` rows here) without training a classifier.
  *
  * Cross-engine-exact by construction (the l24/l31 discipline):
  *  - features are hashed unigram buckets `poly_hash(token) % buckets`
  *    (the portable polynomial hash every DuckDB oracle replays);
  *  - the log-likelihood ratio is integer log2 via
  *    bitlen = length(bin(x)): per bucket
  *    `wb = (bitlen(rawTot) - bitlen(rawCnt))
  *        - (bitlen(tgtTot + buckets) - bitlen(tgtCnt + 1))`
  *    — -log2 raw prob minus -log2 add-one-smoothed target prob, all
  *    BIGINT, so scores are bit-identical on any engine/partitioning;
  *  - ranking is by PER-TOKEN average bits (`avg_bits`, the l24/CCNet
  *    convention), not the raw sum: the bitlen approximation gives
  *    every token a constant additive shift (bitlen(rawTot) -
  *    bitlen(tgtTot + buckets)), so a summed score would rank by doc
  *    LENGTH under that shift — averaging cancels it exactly.
  *    (Division of two small integers is bit-deterministic IEEE
  *    double, the established l24 avg_bits contract.)
  *  - the kept set is the top `topK` by (avg_bits desc, id asc) — a
  *    total order, so "resampling" is deterministic (the paper's
  *    Gumbel noise is for statistical de-biasing across runs; a
  *    reproducible pipeline wants the argmax form).
  *
  * Resolution caveat (honest): integer bitlen quantizes each bucket's
  * log-ratio to whole bits, so a target whose distribution differs
  * only subtly from the raw corpus (e.g. the gate corpus's language
  * labels over a SHARED synthetic vocabulary) scores near-zero
  * everywhere and the ranking degenerates to noise — the operator
  * discriminates when the distributions genuinely differ (DsirSpec's
  * bimodal corpus; the sf5 probe's original-vs-regenerated split),
  * which is the regime DSIR exists for.
  *
  * Scale shape: one token pass computes raw AND target bucket counts
  * in a single map-side-combinable aggregate over at most `buckets`
  * keys; the <= `buckets`-row weight table broadcasts back onto the
  * token stream for per-doc scoring (8-byte key, map-side partial
  * sums); the global top-k plans as TakeOrderedAndProject (per-
  * partition top-k + driver merge — no global sort shuffle) and
  * rejoins as a broadcast. Nothing driver-side ever exceeds
  * max(buckets, topK) rows.
  */
object Dsir {

  /** Per-doc importance scores + the top-`topK` keep flag.
    * Output: (idCol, n_tokens, score_bits, avg_bits, keep) for EVERY
    * input doc; docs with no tokens score 0 and are never resample
    * candidates.
    */
  def importanceResample(docs: DataFrame, idCol: String, textCol: String,
                         targetPred: Column, buckets: Int = 4096,
                         topK: Int = 100): DataFrame = {
    require(buckets > 0 && topK > 0,
      s"dsir needs positive buckets/topK, got $buckets/$topK")
    val toks = docs
      .select(col(idCol).as("doc"), targetPred.as("is_tgt"),
        explode(TextAnalysis.tokens(textCol)).as("t"))
      .select(col("doc"), col("is_tgt"),
        pmod(expr("poly_hash(t)"), lit(buckets.toLong)).as("bk"))
    // raw + target counts in ONE pass over the token stream
    val cnt = toks.groupBy("bk").agg(
      count(lit(1)).as("rc"),
      sum(when(col("is_tgt"), 1L).otherwise(0L)).as("tc0"))
    val tot = cnt.agg(sum("rc").cast("long").as("rt"),
      sum("tc0").cast("long").as("tt0"))
    val w = cnt.crossJoin(broadcast(tot))
      .select(col("bk"),
        ((length(bin(col("rt"))) - length(bin(col("rc"))))
          - (length(bin(col("tt0") + lit(buckets.toLong)))
            - length(bin(col("tc0") + lit(1L)))))
          .cast("long").as("wb"))
    val scored = toks.join(broadcast(w), Seq("bk"))
      .groupBy("doc").agg(count(lit(1)).as("n_tokens"),
        sum("wb").as("score_bits"))
      .withColumn("avg_bits",
        col("score_bits").cast("double") / col("n_tokens"))
    val kept = scored
      .orderBy(col("avg_bits").desc, col("doc").asc)
      .limit(topK)
      .select(col("doc").as("kdoc"))
    docs.select(col(idCol).as("doc"))
      .join(scored, Seq("doc"), "left")
      .join(broadcast(kept), col("doc") === col("kdoc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score_bits"), lit(0L)).as("score_bits"),
        coalesce(col("avg_bits"), lit(0.0d)).as("avg_bits"),
        col("kdoc").isNotNull.cast("long").as("keep"))
  }

  /** The hashed-unigram bucket stream of a corpus: (doc, is_tgt, bk).
    * Shared by [[importanceResample]]'s one-shot path and the
    * streaming sink's per-batch count/score stages.
    */
  def bucketedTokens(docs: DataFrame, idCol: String, textCol: String,
                     targetPred: Column, buckets: Int): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc"), targetPred.as("is_tgt"),
        explode(TextAnalysis.tokens(textCol)).as("t"))
      .select(col("doc"), col("is_tgt"),
        pmod(expr("poly_hash(t)"), lit(buckets.toLong)).as("bk"))

  /** Score `docs` against an EXTERNAL counts table `(bk, rc, tc)` —
    * the at-arrival path of the STREAMING sink
    * ([[graft.streaming.StreamOps.dsirForeachBatch]]): the prior
    * corpus's distribution decides, the batch's own tokens don't move
    * it. Smoothing is symmetric add-one on BOTH sides
    * (`wb = (bitlen(rt+B) - bitlen(rc+1)) - (bitlen(tt+B) -
    * bitlen(tc+1))`), because unlike [[importanceResample]] — where
    * every scored bucket was observed in the raw corpus by
    * construction — a batch token can hit a bucket the prior corpus
    * never saw; such NO-EVIDENCE tokens contribute exactly 0 (the
    * left-join-miss path — neutrality, deliberately NOT the add-one
    * prior `bitlen(rt+B) - bitlen(tt+B)`, which would reward unseen
    * garbage just because the target corpus is the smaller one).
    * Against EMPTY counts every token is unseen, every score is 0,
    * and the ranking degenerates to id order — score only after the
    * state holds a corpus.
    *
    * Output: (idCol, n_tokens, score_bits, avg_bits, keep) with the
    * top `topK` of THESE docs kept by (avg_bits desc, id asc).
    */
  def scoreAgainstCounts(docs: DataFrame, idCol: String, textCol: String,
                         counts: DataFrame, buckets: Int,
                         topK: Int): DataFrame = {
    val toks = bucketedTokens(docs, idCol, textCol, lit(false), buckets)
      .select("doc", "bk")
    val tot = counts.agg(
      coalesce(sum("rc"), lit(0L)).cast("long").as("rt"),
      coalesce(sum("tc"), lit(0L)).cast("long").as("tt"))
    val w = counts.crossJoin(broadcast(tot))
      .select(col("bk"),
        ((length(bin(col("rt") + lit(buckets.toLong)))
          - length(bin(col("rc") + lit(1L))))
          - (length(bin(col("tt") + lit(buckets.toLong)))
            - length(bin(col("tc") + lit(1L)))))
          .cast("long").as("wb"))
    val scored = toks.join(broadcast(w), Seq("bk"), "left")
      .groupBy("doc").agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("wb"), lit(0L))).as("score_bits"))
      .withColumn("avg_bits",
        col("score_bits").cast("double") / col("n_tokens"))
    val kept = scored
      .orderBy(col("avg_bits").desc, col("doc").asc)
      .limit(topK)
      .select(col("doc").as("kdoc"))
    docs.select(col(idCol).cast("long").as("doc"))
      .join(scored, Seq("doc"), "left")
      .join(broadcast(kept), col("doc") === col("kdoc"), "left")
      .select(col("doc").as(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("score_bits"), lit(0L)).as("score_bits"),
        coalesce(col("avg_bits"), lit(0.0d)).as("avg_bits"),
        col("kdoc").isNotNull.cast("long").as("keep"))
  }
}
