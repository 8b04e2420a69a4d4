package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Locks in the physical-plan shapes the 100 TB design depends on — a
  * regression here (a lost broadcast hint, an accidental cartesian) would
  * still produce correct small-scale results, so only a plan assertion
  * catches it.
  */
class QueryPlanSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    Registry.queries(name)(s, sf).queryExecution.executedPlan.toString

  // The former full-registry "no cartesian product" sweep (70 s — it
  // built and physical-planned all 221 queries a second time) is
  // subsumed by PlanBudgetSpec's CartesianProduct budget: 0 for every
  // registered query, asserted on the STATIC plan, which is the
  // stronger object (AQE can only remove joins at runtime, never
  // introduce a cartesian). The targeted per-query assertions below
  // keep their own cartesian checks.

  test("star joins broadcast their dims (a8, j3 statically; g5's " +
    "RDD-backed dims convert at runtime via AQE)") {
    Seq("a8_dashboard_revenue", "j3_broadcast_inner").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast")
      assert(!p.contains("CartesianProduct"), q)
    }
    // g5's dims go through Gold.orderedId (no compile-time size
    // estimate); the AQE runtime conversion is asserted after execution
    // in GoldWarehouseSpec. Statically it must still be cartesian-free.
    assert(!plan("g5_fact_build").contains("CartesianProduct"))
  }

  test("as-of join shuffles each side once on the key, no join node at all") {
    val p = plan("j5_asof_join")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "as-of is a union + window, not a join")
    assert(p.contains("Window"), p.take(400))
  }

  test("scans prune columns: a8's lineitem scan reads only the 3 columns " +
    "it needs") {
    val p = plan("a8_dashboard_revenue")
    val scanSchema = p.linesIterator
      .find(l => l.contains("ReadSchema") && l.contains("l_orderkey"))
      .getOrElse(fail("no lineitem scan found"))
    assert(scanSchema.contains("l_orderkey") &&
      scanSchema.contains("l_extendedprice") &&
      scanSchema.contains("l_discount"))
    assert(!scanSchema.contains("l_comment") &&
      !scanSchema.contains("l_shipdate") &&
      !scanSchema.contains("l_quantity"),
      s"column pruning regressed: $scanSchema")
  }

  test("filters reach the parquet scan (pushdown on f5's date window)") {
    val p = plan("f5_date_window")
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate), " +
      "GreaterThanOrEqual(o_orderdate") ||
      p.contains("GreaterThanOrEqual(o_orderdate"), p.take(1200))
  }

  test("round-7 sketch/text ops prune their scans: x5p reads only " +
    "l_orderkey, l24's documents scan skips the unused columns") {
    val x5pScan = plan("x5p_kmv_distinct").linesIterator
      .find(l => l.contains("ReadSchema") && l.contains("l_orderkey"))
      .getOrElse(fail("no lineitem scan in x5p"))
    assert(!x5pScan.contains("l_comment") &&
      !x5pScan.contains("l_extendedprice"), x5pScan)
    val l24Scans = plan("l24_unigram_surprisal").linesIterator
      .filter(_.contains("ReadSchema")).toSeq
    assert(l24Scans.nonEmpty)
    l24Scans.foreach { sc =>
      assert(!sc.contains("n_chars") && !sc.contains("source"),
        s"l24 scan reads unused columns: $sc")
    }
  }

  test("round-8 retrieval ops keep their scale shapes: l27 prunes to " +
    "(doc_id, text) and top-ks via TakeOrdered, l27b broadcasts the " +
    "query side, x18's scans read only text") {
    val p27 = plan("l27_bm25_topk")
    assert(p27.contains("TakeOrderedAndProject"),
      "l27's top-k must be TakeOrdered (per-partition heaps), not a " +
        "global sort")
    val scan27 = p27.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(fail("no scan in l27"))
    assert(scan27.contains("doc_id") && scan27.contains("text") &&
      !scan27.contains("lang") && !scan27.contains("source"), scan27)
    val p27b = plan("l27b_bm25_batch")
    assert(p27b.contains("BroadcastHashJoin"),
      "l27b lost its broadcast term/df/query joins")
    assert(!p27b.contains("CartesianProduct"))
    // The round-9 fix's whole point: per-query ranking must run through
    // the bounded mergeable top-k aggregation (ObjectHashAggregate over
    // BoundedTopK), never a window ranking the scored stream — a window
    // funnels each query's ENTIRE matched-doc set into one task at scale.
    assert(!p27b.contains("Window"),
      "l27b regressed to a window over the scored stream")
    assert(p27b.contains("ObjectHashAggregate"),
      "l27b's BoundedTopK aggregation path is gone")
    // Round-11: lshTopK's final ranking moved to the same BoundedTopK
    // shape (multi-probe multiplies per-query candidates 37x at the l6m
    // design point; a q_id window would funnel them into one task).
    // (and the same shape for the whole ANN family — l5's per-query
    // candidate set is the entire corpus, l11's is corpus/nCells*nProbe)
    for (name <- Seq("l6m_ann_lsh_multiprobe", "l5_knn_brute")) {
      val p = plan(name)
      assert(!p.contains("Window"),
        s"$name regressed to a window over the candidate stream")
      assert(p.contains("ObjectHashAggregate"),
        s"$name's BoundedTopK aggregation path is gone")
    }
    // l11p keeps its nearestCells windows — those rank <= nCells(=16)
    // centroid rows PER VECTOR (bounded per key, not corpus-scaled);
    // only the final candidate ranking must be the bounded aggregation
    val p11 = plan("l11p_ann_ivf_portable")
    assert(p11.contains("ObjectHashAggregate"),
      "l11p's BoundedTopK final ranking is gone")
    val p18 = plan("x18_heavy_hitters")
    val scans18 = p18.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans18.nonEmpty)
    scans18.foreach { sc =>
      assert(sc.contains("text") && !sc.contains("doc_id") &&
        !sc.contains("lang"), s"x18 scan reads unused columns: $sc")
    }
  }

  test("round-12 PCA/retrieval ops keep their scale shapes") {
    // l43: the fused moment buffer must PARTIALLY aggregate before the
    // exchange (one ~17 KB buffer per partition — the whole point), and
    // the scan must prune to the embedding column alone
    val p43 = plan("l43_pca_moments")
    assert(p43.contains("ObjectHashAggregate"),
      "l43 lost the typed-Aggregator path")
    assert(p43.contains("partial_momentagg"),
      "l43's map-side partial aggregation is gone — the shuffle would " +
        "carry rows, not buffers")
    val scan43 = p43.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scan43.nonEmpty && scan43.forall(sc =>
      sc.contains("embedding") && !sc.contains("label")),
      s"l43 scan reads unused columns: $scan43")
    // l44: projection is map-only — no exchange anywhere in the plan
    // up to the output (the fit's jobs run at build time, separately)
    val p44 = plan("l44_pca_project")
    assert(!p44.contains("Exchange"),
      "l44's projection must stay map-only (k vec_dot calls, no shuffle)")
    // l45: exactly the one (doc, bucket) aggregation exchange; the
    // per-token work must be the native poly_hash, not an interpreted
    // lambda per (token × bucket)
    val p45 = plan("l45_feature_hash_embed")
    assert(p45.contains("poly_hash"), "l45 lost the native hash")
    assert("Exchange".r.findAllIn(p45).size == 1,
      "l45 must shuffle exactly once (the (doc,bucket) partial agg)")
    // l46/l48: the query/candidate side broadcasts; never a cartesian
    for (name <- Seq("l46_two_stage_ann", "l48_near_dup_reduced")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin") ||
        p.contains("BroadcastNestedLoopJoin"),
        s"$name lost its broadcast join")
      assert(!p.contains("CartesianProduct"), name)
    }
  }
}
