package graft.plans

/** The COMMITTED plan-shape fingerprints (see [[PlanFingerprint]]) of
  * the slowest bench queries (BENCH_DETAIL all_queries, round 14 —
  * the slowest 15 plus the next 5 with non-trivial static plans) at
  * the correctness-gate SF (sf0.01). PlanGoldenSpec fails on any
  * drift; regenerate an intentional change with
  * `runMain graft.tools.PlanGoldenGen` and justify the diff in the
  * commit message.
  *
  * An EMPTY map is itself a guarantee, not a gap: the iterative
  * operators (PageRank, trained classifier, tokenizer training)
  * return a cached bounded-size leaf per their cache contract, so
  * their registered frame fingerprints as a bare InMemoryTableScan —
  * if that contract breaks (someone drops the cache and hands back
  * the full iterative lineage), the fingerprint stops being empty and
  * the gate fires.
  */
object PlanGolden {
  val sfDir = "/root/testdata/sf0.01"
  val goldens: Map[String, Map[String, Int]] = Map(
    "l71_curation_pipeline" -> Map("BroadcastExchange" -> 2,
      "BroadcastHashJoin" -> 1, "BroadcastNestedLoopJoin" -> 1,
      "GlobalWindow" -> 1, "HashAggregate" -> 30,
      "ShuffleExchange" -> 19, "WholeStageCodegen" -> 24,
      "Window" -> 1),
    "l31_trained_quality" -> Map(),
    "x22_pagerank" -> Map(),
    "l65_leakage_safe_split" -> Map("BroadcastExchange" -> 1,
      "BroadcastHashJoin" -> 1, "WholeStageCodegen" -> 1),
    "l28_ingest_pipeline" -> Map("WholeStageCodegen" -> 1),
    "l40_canonical_dedup" -> Map("BroadcastExchange" -> 2,
      "BroadcastHashJoin" -> 3, "ShuffleExchange" -> 1,
      "SortAggregate" -> 2, "WholeStageCodegen" -> 4),
    "l61_containment_join" -> Map("Generate" -> 3,
      "HashAggregate" -> 4, "ShuffleExchange" -> 9,
      "SortMergeJoin" -> 4, "WholeStageCodegen" -> 19, "Window" -> 1),
    "l39_dup_components" -> Map("BroadcastExchange" -> 1,
      "BroadcastHashJoin" -> 1, "WholeStageCodegen" -> 1),
    "l49_edit_distance_join" -> Map("BroadcastExchange" -> 3,
      "BroadcastHashJoin" -> 4, "Generate" -> 5, "HashAggregate" -> 2,
      "ShuffleExchange" -> 1, "WholeStageCodegen" -> 8),
    "x22p_pagerank_prepart" -> Map(),
    "l2b_ngram_jaccard_capped" -> Map("BroadcastExchange" -> 2,
      "BroadcastHashJoin" -> 2, "Generate" -> 2, "HashAggregate" -> 2,
      "ObjectHashAggregate" -> 2, "ShuffleExchange" -> 2,
      "WholeStageCodegen" -> 6),
    "l42_semantic_dedup" -> Map("BroadcastExchange" -> 1,
      "BroadcastHashJoin" -> 1, "WholeStageCodegen" -> 4),
    "l73_wordpiece_train" -> Map(),
    "l54_prefix_filter_jaccard" -> Map("BroadcastExchange" -> 3,
      "BroadcastHashJoin" -> 4, "Generate" -> 2, "HashAggregate" -> 4,
      "ShuffleExchange" -> 2, "WholeStageCodegen" -> 8, "Window" -> 2),
    "l2bh_ngram_jaccard_capped_hashed" -> Map("BroadcastExchange" -> 2,
      "BroadcastHashJoin" -> 2, "Generate" -> 2, "HashAggregate" -> 2,
      "ObjectHashAggregate" -> 2, "ShuffleExchange" -> 2,
      "WholeStageCodegen" -> 7),
    "l61h_containment_join_hashed" -> Map("Generate" -> 3,
      "HashAggregate" -> 4, "ShuffleExchange" -> 9,
      "SortMergeJoin" -> 4, "WholeStageCodegen" -> 19, "Window" -> 1),
    "l54h_prefix_filter_jaccard_hashed" -> Map(
      "BroadcastExchange" -> 3, "BroadcastHashJoin" -> 4,
      "Generate" -> 2, "HashAggregate" -> 4, "ShuffleExchange" -> 2,
      "WholeStageCodegen" -> 8, "Window" -> 2),
    "l23_dup_span_removal" -> Map("BroadcastExchange" -> 2,
      "BroadcastHashJoin" -> 2, "Generate" -> 2, "HashAggregate" -> 4,
      "ObjectHashAggregate" -> 2, "ShuffleExchange" -> 3,
      "WholeStageCodegen" -> 8),
    "l62_link_graph_rank" -> Map("BroadcastExchange" -> 1,
      "BroadcastHashJoin" -> 1, "WholeStageCodegen" -> 2),
    "l2_ngram_jaccard" -> Map("BroadcastExchange" -> 3,
      "BroadcastHashJoin" -> 3, "Generate" -> 2, "HashAggregate" -> 2,
      "ShuffleExchange" -> 1, "WholeStageCodegen" -> 5),
  )
}
