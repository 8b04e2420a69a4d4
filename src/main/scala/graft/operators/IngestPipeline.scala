package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed daily-ingest flow of a training-data pipeline: a NEW
  * batch of crawled documents lands next to a STANDING corpus and must
  * be exact-deduped against it, stripped of spans it duplicates, quota-
  * selected per source, and split-assigned — as ONE dataflow, because
  * composition bugs (column collisions, stage-order sensitivity, a
  * survivor set computed against the wrong corpus) never show up when
  * each stage is verified in isolation.
  *
  * Stage semantics (each individually registry-verified):
  *  1. incremental exact dedup ([[Dedup.incrementalDupFlags]], = l22):
  *     batch docs whose normalized content hash already exists in the
  *     standing corpus are dropped — the standing side reduces to its
  *     DISTINCT hash index before the join;
  *  2. cross-snapshot duplicated-span removal
  *     ([[Dedup.dupSpanRemoval]] with hashed gram keys, = l23h) over
  *     standing UNION survivors: `spanN`-token windows the surviving
  *     batch shares with the standing corpus (near-identical re-crawls,
  *     boilerplate) — or with other new docs — are cut from the batch
  *     text; only batch rows are emitted;
  *  3. per-source quality quota on the CLEANED text
  *     ([[CorpusAssembly.qualityQuotaSelectHistogram]], = l26h): greedy
  *     quality-first selection under `budgetPerSource` tokens, decided
  *     through the (source, quality) histogram — no per-source global
  *     window;
  *  4. deterministic split assignment ([[TextAnalysis.splitAssign]],
  *     = l19) over the kept docs.
  *
  * Every stage is the 100 TB form of its family: the only corpus-sized
  * shuffles are the digest join (8/32-byte keys), the two hashed-gram
  * exchanges (8-byte keys), and the histogram aggregation; nothing
  * materializes between stages, so Catalyst plans the whole flow as one
  * DAG. Caller contract: `standing` and `batch` id spaces must be
  * disjoint (stage 2 unions them under one id column).
  *
  * Returns per (source, split): `n_docs`, `tokens_kept` (clean-text
  * tokens of kept docs), `dup_positions_removed` (token positions cut
  * at stage 2 from kept docs).
  */
object IngestPipeline {

  def run(standing: DataFrame, batch: DataFrame, idCol: String,
          textCol: String, sourceCol: String, spanN: Int,
          budgetPerSource: Long, trainPct: Int, valPct: Int): DataFrame = {
    val flags = Dedup.incrementalDupFlags(standing, batch, idCol, textCol)
    // cached: feeds BOTH the span-removal union and the source re-attach
    // join below — without it Spark re-executes the dedup join per
    // consumer. Bounded: survivors is at most the BATCH (the daily
    // increment), never the standing corpus.
    val survivors = batch.join(
      flags.filter(col("dup_of_existing") === 0L).select(idCol), Seq(idCol))
      .cache()
    val union = standing.select(col(idCol), col(textCol))
      .unionByName(survivors.select(col(idCol), col(textCol)))
    // span stats computed over the union, emitted for batch rows only;
    // the join also re-attaches the batch's source column. Cached for
    // the same reason (quota scoring + the n_dup_positions join both
    // consume it; recomputing would run the corpus-sized gram shuffles
    // twice) and bounded the same way — batch rows only.
    val cleaned = Dedup
      .dupSpanRemoval(union, idCol, textCol, n = spanN,
        hashedGramKeys = true)
      .join(survivors.select(col(idCol), col(sourceCol)), Seq(idCol))
      .cache()
    val quota = CorpusAssembly.qualityQuotaSelectHistogram(
      cleaned.select(col(sourceCol), col(idCol), col("clean_text")),
      sourceCol, idCol, "clean_text", budgetPerSource)
    // quota's n_tokens is the CLEAN token count; only n_dup_positions is
    // pulled back from the span stage (avoids the n_tokens collision)
    val kept = quota.filter(col("kept"))
      .join(cleaned.select(col(idCol), col("n_dup_positions")), Seq(idCol))
      .withColumn("split",
        TextAnalysis.splitAssign(idCol, trainPct, valPct))
    val summary = kept.groupBy(col(sourceCol), col("split")).agg(
      count(lit(1)).as("n_docs"),
      sum("n_tokens").cast("long").as("tokens_kept"),
      sum("n_dup_positions").cast("long").as("dup_positions_removed"))
    // Materialize the (sources x splits)-row summary eagerly via
    // localCheckpoint, then RELEASE both batch-bounded caches: a
    // long-lived driver running daily ingests would otherwise accumulate
    // two cache entries per run for the session lifetime. The checkpoint
    // keeps the returned frame valid after the unpersists (its lineage no
    // longer references survivors/cleaned) and costs only the tiny
    // summary's storage.
    val out = summary.localCheckpoint(eager = true)
    survivors.unpersist(blocking = false)
    cleaned.unpersist(blocking = false)
    out
  }
}
