package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Full-registry static-plan budget gate (round-15 verdict item 3).
  *
  * [[PlanGoldenSpec]] pins the slowest queries' EXACT fingerprints;
  * this spec sweeps EVERY registered query (221 at time of writing)
  * for the four plan classes that are catastrophic at 100 TB no
  * matter which query they appear in, and bounds each against a
  * committed allowlist:
  *
  *  - `CartesianProduct` — always a bug at scale. Budget 0, no
  *    exceptions (even x21, the range join whose NAIVE predicate
  *    form would be a cross, sweeps clean — the registered query is
  *    the bucketed equi-join form, which is the point).
  *  - `GlobalSort` — a full-data total order. Budget 0: every
  *    registered query that needs a deterministic output order gets
  *    it from the Verify dump's own canonical sort, not the plan.
  *  - `GlobalWindow` — a single-task collapse UNLESS the windowed
  *    frame is bounded by construction. Allowlisted per query below;
  *    every entry is one of the documented bounded families:
  *      (a) `orderedIdBounded` reference-parity ids over a DIM
  *          (Gold.scala:95 — nation-sized; w1, and g-family parents);
  *      (b) per-partition/per-shard SUMMARY cumulation — one row per
  *          partition or shard, not per record (CorpusAssembly.scala:64
  *          and :162 — the l25 packing family, l32 epoch shuffle,
  *          l56 weighted sample, l71's packing stage);
  *      (c) bounded-cardinality orders: vocab ranks (Bpe.scala:329 —
  *          l30v), time ticks (DistinctSketch.scala:53-118 — x24),
  *          histogram bins (Extras.scala:338 — x12p), final top-k of
  *          an already-k-bounded result (l27).
  *  - `BroadcastNestedLoopJoin` — fine ONLY when the broadcast side
  *    is O(1) or bounded-small by construction. Allowlisted per query;
  *    every entry is one of: a single-row scalar attach (corpus df /
  *    avgdl / total-count literals joined onto every row: l18, l24*,
  *    l29*, l38, l41*, l51, l55, l56, l75, x5*, x9, x12p, x24, x25,
  *    x28, x16w, x22w, l71, l74, l76), or a bounded QUERY/CODEBOOK set
  *    crossed against candidates where that cross IS the operator's
  *    documented work shape (brute/ANN scoring: l5, l11*, l27*, l46*,
  *    l52a, l53*, l57).
  *
  * Budgets are upper bounds on the STATIC plan
  * ([[PlanFingerprint.budgetForQuery]]): AQE only ever removes
  * exchanges or demotes join strategies at runtime, never introduces
  * one of these classes. A query appearing here with a HIGHER count
  * than committed — or a query NOT listed growing any of the four —
  * fails with the full diff. Regenerate the measurement with `runMain
  * graft.tools.PlanBudgetGen` and justify any new entry in the commit.
  */
class PlanBudgetSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  private val GW = "GlobalWindow"
  private val BNLJ = "BroadcastNestedLoopJoin"

  /** query -> (budget class -> max count). Absent = 0. */
  private val allow: Map[String, Map[String, Int]] = Map(
    // (a) orderedIdBounded dim ids
    "w1_row_number" -> Map(GW -> 1),
    // (b) per-partition / per-shard summary cumulation
    "l25_sequence_packing" -> Map(GW -> 1),
    "l25b_ffd_packing" -> Map(GW -> 1),
    "l25s_sequence_packing_sharded" -> Map(GW -> 1),
    "l32_epoch_shuffle" -> Map(GW -> 2),
    "l56_weighted_sample" -> Map(GW -> 1, BNLJ -> 1),
    "l71_curation_pipeline" -> Map(GW -> 1, BNLJ -> 1),
    // (c) bounded-cardinality orders
    "l30v_bpe_token_ids" -> Map(GW -> 1),
    "l27_bm25_topk" -> Map(GW -> 1, BNLJ -> 1),
    "x24_hll_cumulative_distinct" -> Map(GW -> 2),
    "x12p_histogram_quantiles" -> Map(GW -> 1, BNLJ -> 1),
    // scalar attach (single-row broadcast side)
    "l18_tfidf_terms" -> Map(BNLJ -> 1),
    "l24_unigram_surprisal" -> Map(BNLJ -> 1),
    "l24b_bigram_surprisal" -> Map(BNLJ -> 1),
    "l27b_bm25_batch" -> Map(BNLJ -> 1),
    "l29_temperature_mix" -> Map(BNLJ -> 1),
    "l29h_temperature_mix_hist" -> Map(BNLJ -> 2),
    "l38_cluster_balance" -> Map(BNLJ -> 1),
    "l41_dsir_resample" -> Map(BNLJ -> 2),
    "l41b_dsir_score_holdout" -> Map(BNLJ -> 2),
    "l51_cms_freq" -> Map(BNLJ -> 1),
    "l55_kn_surprisal" -> Map(BNLJ -> 2),
    "l74_tokenizer_eval" -> Map(BNLJ -> 1),
    "l75_corpus_datasheet" -> Map(BNLJ -> 2),
    "l76_warc_curation_ingest" -> Map(BNLJ -> 3),
    "x16w_bucketed_write" -> Map(BNLJ -> 1),
    "x22w_bucketed_graph_write" -> Map(BNLJ -> 1),
    "x25_kmv_corpus_overlap" -> Map(BNLJ -> 3),
    "x28_parquet_quarantine_scan" -> Map(BNLJ -> 1),
    "x5_approx_distinct" -> Map(BNLJ -> 1),
    "x5p_kmv_distinct" -> Map(BNLJ -> 1),
    "x9_constraints" -> Map(BNLJ -> 3),
    // bounded query/codebook set crossed with candidates (the
    // operator's documented work shape)
    "l5_knn_brute" -> Map(BNLJ -> 1),
    "l11_ann_ivf" -> Map(BNLJ -> 2),
    "l11p_ann_ivf_portable" -> Map(BNLJ -> 2),
    "l46_two_stage_ann" -> Map(BNLJ -> 1),
    "l46p_two_stage_ann_portable" -> Map(BNLJ -> 1),
    "l52a_pq_adc_topk" -> Map(BNLJ -> 1),
    "l53_ivf_pq_topk" -> Map(BNLJ -> 1),
    "l53r_ivf_pq_residual" -> Map(BNLJ -> 1),
    "l57_hard_negatives" -> Map(BNLJ -> 1),
  )

  private val watched =
    Seq("CartesianProduct", "GlobalSort", GW, BNLJ)

  test("every registered query stays inside its static-plan budget") {
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    val over = names.flatMap { n =>
      val fp = PlanFingerprint.budgetForQuery(s, n, PlanGolden.sfDir)
      val budget = allow.getOrElse(n, Map.empty)
      watched.flatMap { k =>
        val got = fp.getOrElse(k, 0)
        val max = budget.getOrElse(k, 0)
        if (got > max) Some(s"$n: $k=$got exceeds budget $max") else None
      }
    }
    assert(over.isEmpty,
      s"static-plan budget exceeded (PlanBudgetGen to re-measure, " +
        s"then justify in the allowlist):\n${over.mkString("\n")}")
    // The allowlist must not outlive its queries: a stale entry would
    // silently re-authorize the class if the name were ever reused.
    val stale = allow.keySet -- names.toSet
    assert(stale.isEmpty, s"allowlist entries for unregistered: $stale")
  }
}
