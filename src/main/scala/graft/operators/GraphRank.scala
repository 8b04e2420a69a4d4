package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank in FIXED-POINT integer arithmetic — the graph-authority
  * score corpus curation pipelines rank domains/URLs with (harmonic or
  * PageRank centrality over the link graph decides what is worth
  * crawling and keeping), expressed so that model TRAINING itself is
  * cross-engine-exact: every rank is a scaled BIGINT, the damping
  * step is integer multiply-divide, and contributions fold through
  * integer division — the l31 exact-BIGINT discipline applied to an
  * iterative graph algorithm. Same inputs => the same bit-exact ranks
  * on any engine, partitioning, or rerun, and the DuckDB oracle
  * replays every iteration as an unrolled CTE.
  *
  * Iteration: `r0 = scale` for every node;
  * `r_{k+1}(v) = base + (dampNum * Σ_{u→v} (r_k(u) DIV outdeg(u)))
  *               DIV dampDen`, with `base = (scale * (dampDen -
  * dampNum)) DIV dampDen`. Nodes with no in-edges keep `base` (the
  * LEFT join); dangling nodes (out-degree 0) simply don't propagate —
  * the standard simplification, documented rather than patched,
  * because redistribution would turn every iteration into an extra
  * global aggregate for a correction term that doesn't change
  * rankings on connected graphs.
  *
  * Scale shape: each iteration is ONE equi-join of the edge list with
  * the ≤|V|-row rank table plus a map-side-combinable groupBy on the
  * destination key — 8-byte-key shuffles carrying (node, rank) pairs,
  * never adjacency materialization; `iters` bounded driver iterations
  * chain lazily (the keeper-resolution loop discipline) with a cache
  * per rank table so iteration k+1 doesn't recompute 1..k.
  *
  * Since round 16 the out-degree is folded into the cached edge list
  * ONCE (the `edeg` pre-join below), so EVERY form pays the |E|-row
  * layout cost exactly once per run and no iteration re-joins deg or
  * re-exchanges edges — the only per-iteration shuffle is the
  * (dst, contrib) aggregate (≤|V| combined rows; GraphRankSpec pins
  * that shuffle bytes no longer scale with the iteration count).
  * `prePartitionEdges` (RISKS.md row 2's named lever) now only moves
  * WHERE that single |E| exchange happens: an explicit repartition on
  * `src` before the cache instead of the exchange inside the edeg
  * build — byte-equivalent, kept for the declared x22p form and for
  * callers that want the layout pinned independent of join planning.
  * Results are bit-identical by construction (partitioning is
  * result-inert — x22p pins it against x22's own DuckDB oracle).
  * [[pageRankFromBucketed]] still strictly dominates both: the
  * bucketed-at-write layout makes even the one upfront exchange zero.
  */
object GraphRank {

  def pageRankFixedPoint(edges: DataFrame, srcCol: String,
                         dstCol: String, iters: Int,
                         scale: Long = 1L << 20,
                         dampNum: Long = 85L,
                         dampDen: Long = 100L,
                         prePartitionEdges: Boolean = false): DataFrame = {
    require(iters >= 1 && dampNum > 0 && dampNum < dampDen,
      s"bad pagerank config: iters=$iters damp=$dampNum/$dampDen")
    // Iterative algorithms MUST materialize their reused inputs: the
    // edge list feeds the degree table AND every iteration's join, so
    // without the cache each of the 2·iters consumers re-runs the
    // upstream plan (the sf5 probe caught exactly that — a 30M-row
    // distinct recomputed ~8× per run). The per-iteration count() is
    // the Lloyd-refinement discipline: materialize `next` BEFORE
    // releasing `prev` (unpersisting a parent invalidates dependent
    // cache entries), which also makes this operator eager by nature —
    // like keeper resolution, not like the lazy one-pass queries.
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    // repartition BEFORE the cache: the cached blocks then carry
    // HashPartitioning(src) and every iteration's InMemoryTableScan
    // reports it, so EnsureRequirements inserts no edge-side Exchange.
    val e = (if (prePartitionEdges) e0.repartition(col("src")) else e0)
      .cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    // Out-degree is per-edge join metadata: fold it into the cached edge
    // list ONCE (edeg) instead of re-joining deg every iteration — the
    // old shape paid an |E|-side join (and, without prePartitionEdges,
    // an |E|-row Exchange) per iteration for a value that never changes.
    // With edeg cached partitioned on src, the only per-iteration
    // shuffle left is the map-side-combined (dst, contrib) aggregate.
    // LAZY on purpose: iteration 1 materializes it inside its own job
    // (an eager count() here measured as a pure extra |E| pass at gate
    // SF, where deg broadcasts and the join is already exchange-free).
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val edeg = e.join(deg, "src").cache()
    val base = scale * (dampDen - dampNum) / dampDen
    var r = nodes.withColumn("r", lit(scale))
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      val contrib = edeg.join(r, edeg("src") === r("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("r DIV outdeg")).as("__in"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(
            s"($dampNum * coalesce(__in, 0L)) DIV $dampDen")).as("r"))
        .cache()
      next.count()
      if (prev != null) prev.unpersist(blocking = false)
      prev = r
      r = next
    }
    // final ranks are materialized above; safe to release the inputs.
    // CACHE CONTRACT: the returned frame IS cached (one bounded |V|-row
    // table) and the caller owns the release — `result.unpersist()`
    // after the consuming action. Unpersisting here instead would
    // cascade-recompute every iteration on the caller's first action
    // (all parent caches are released below), and a localCheckpoint
    // would just move the same bytes into RDD blocks with the same
    // ownership question. Repeated invocations in one session (bench
    // reps) otherwise accumulate distinct entries until LRU eviction —
    // the bench harness clears between queries via clearCache().
    e.unpersist(blocking = false)
    edeg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    r
  }

  /** Connected components by min-label propagation with POINTER
    * JUMPING — the transitive-closure step every production dedup
    * pipeline needs between "near-dup PAIRS" (l2/l3/l12) and "keep one
    * doc per dup CLUSTER" (l40): near-duplicate similarity is not
    * transitive, so A~B and B~C must collapse into one group even when
    * A~C was never emitted. Output: `(node, component)` where
    * `component` is the MINIMUM node id reachable from `node` —
    * canonical, deterministic under any partitioning, and exactly what
    * a DuckDB recursive CTE computes for the oracle.
    *
    * Algorithm per round (edges symmetrized once up front):
    *  1. neighbor-min: `L'(v) = min(L(v), min over (u,v) edges of L(u))`
    *     — one 8-byte-key equi-join of the edge list with the |V|-row
    *     label table plus a map-side-combinable min;
    *  2. pointer jump: `L''(v) = min(L'(v), L'(L'(v)))` — a |V|x|V|
    *     self-join on the label table (labels ARE node ids, so the
    *     label table doubles as a parent-pointer forest; jumping halves
    *     path lengths, Shiloach-Vishkin style).
    * Rounds repeat until a changed-label count hits zero: O(diameter)
    * without step 2, O(log |V|) with it (GraphRankSpec pins a 64-node
    * chain converging in <= 8 rounds). Monotonicity (labels only
    * decrease, and the component minimum is a fixpoint) makes the
    * converged labels exactly the reachable-min, independent of
    * iteration interleaving.
    *
    * Scale shape: every round is three 8-byte-key equi-joins + one
    * map-side-combinable aggregate over (long, long) rows — no
    * adjacency lists, no driver-side state beyond the converged count;
    * label-table lineage is localCheckpoint-truncated per round (see
    * the in-body comment — a cache-only discipline OOMs plan
    * construction). At 100 TB the edge list for dedup graphs is SPARSE
    * (bounded by the candidate generator's cap — cap^2/2 pairs per
    * shingle under l2b's hot-shingle cap), so |E| ~ |dup docs|, not
    * |docs|^2.
    *
    * CACHE CONTRACT: the returned |V|-row frame is cached; the caller
    * owns the release (same as [[pageRankFixedPoint]]).
    */
  def connectedComponents(edges: DataFrame, srcCol: String,
                          dstCol: String, maxIters: Int = 64,
                          prePartitionEdges: Boolean = false,
                          reliableCheckpoints: Boolean = false): DataFrame =
    connectedComponentsWithStats(edges, srcCol, dstCol, maxIters,
      prePartitionEdges, reliableCheckpoints)._1

  /** [[connectedComponents]] plus the round count (spec hook for the
    * pointer-jump convergence bound).
    *
    * `prePartitionEdges` (see [[pageRankFixedPoint]]): symmetrize +
    * distinct leaves the cached edge list hash-partitioned on
    * (src, dst), which does NOT satisfy the per-round neighbor-join's
    * src clustering — so every round re-exchanges |E| rows. The flag
    * re-partitions on `src` alone before caching; the per-round
    * neighbor join then reads the cached layout and the round's
    * shuffles shrink to the ≤|V|-row aggregate + pointer-jump tables.
    */
  /** Write an edge list in the ON-DISK layout the iterative ops read
    * with ZERO edge-side exchange: bucketed (hash-partitioned at write
    * time) on `src`, normalized to (src: long, dst: long). This is
    * SCALE_r14 §7's closing lever made real — `prePartitionEdges`
    * moves the per-iteration |E| exchange to one upfront exchange per
    * RUN; bucketed-at-write storage pays it once per CORPUS, and every
    * cold start after that just reads the layout ([[Bucketed]] is the
    * general mechanism; this wrapper fixes the column contract the
    * graph loops consume).
    *
    * `symmetrizeForCC = true` additionally bakes in what
    * [[connectedComponents]] would compute per run before its loop —
    * symmetrize + self-loop removal + distinct (CC is multiplicity-
    * blind, so distinct is purely a cost optimization); read such a
    * table back through [[componentsFromBucketed]]. Keep it `false`
    * for [[pageRankFromBucketed]] — PageRank is multiplicity-SENSITIVE
    * (each edge contributes), so its table must hold the edges as
    * given.
    */
  def writeEdgesBucketed(edges: DataFrame, srcCol: String,
                         dstCol: String, table: String, buckets: Int,
                         path: String,
                         symmetrizeForCC: Boolean): Unit = {
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val out =
      if (symmetrizeForCC)
        symmetrize(e0).filter(col("src") =!= col("dst")).distinct()
      else e0
    graft.sources.Bucketed.writeBucketed(out, table, "src", buckets, path)
  }

  /** [[pageRankFixedPoint]] cold-started from a
    * [[writeEdgesBucketed]] table (`symmetrizeForCC = false`): the
    * bucketed scan reports HashPartitioning(src), the edge cache
    * preserves it (autoBucketedScan is disabled in Sessions.build
    * precisely so the standalone cache-materialization plan keeps the
    * layout), and EnsureRequirements inserts no edge-side Exchange —
    * not even the one upfront exchange `prePartitionEdges` pays.
    * GraphRankSpec pins result equality, the scan's partitioning, and
    * the shuffle-byte cut vs the pre-partitioned form.
    */
  def pageRankFromBucketed(spark: org.apache.spark.sql.SparkSession,
                           table: String, iters: Int,
                           scale: Long = 1L << 20,
                           dampNum: Long = 85L,
                           dampDen: Long = 100L): DataFrame =
    pageRankFixedPoint(spark.table(table), "src", "dst", iters, scale,
      dampNum, dampDen, prePartitionEdges = false)

  /** [[connectedComponents]] cold-started from a
    * [[writeEdgesBucketed]] table written with
    * `symmetrizeForCC = true`: the per-run symmetrize + distinct +
    * repartition all collapse into the write-time layout, so a cold
    * start reads the edge list exchange-free and goes straight into
    * the label loop.
    */
  def componentsFromBucketed(spark: org.apache.spark.sql.SparkSession,
                             table: String, maxIters: Int = 64,
                             reliableCheckpoints: Boolean = false)
      : DataFrame =
    ccCore(spark.table(table), maxIters, reliableCheckpoints)._1

  /** (src, dst) plus the reversed copy of every row, in ONE pass over
    * the input: `explode(array(fwd, rev))` instead of
    * `e0.union(e0.swap)`. Same multiset by construction, but the union
    * shape EXECUTES the edge-list subtree twice when the result is
    * materialized (once per branch) — and the CC callers hand in pair
    * generators (shingle candidate gen + verify joins) whose double
    * execution was most of the symmetrize cost at every scale.
    */
  private def symmetrize(e0: DataFrame): DataFrame =
    e0.select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))

  private[graft] def connectedComponentsWithStats(
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 64,
      prePartitionEdges: Boolean = false,
      reliableCheckpoints: Boolean = false): (DataFrame, Int) = {
    // Per-round lineage truncation is mandatory either way (see the
    // in-body comment); HOW it truncates is the local-vs-cluster
    // trade. localCheckpoint (default) writes RDD blocks to executor
    // storage — free locally, but lineage-FREE means losing an
    // executor mid-convergence fails the whole job. reliableCheckpoints
    // uses real checkpoint(): each round's |V|-row label table lands in
    // the session's checkpoint DIRECTORY (sc.setCheckpointDir — object
    // storage on a cluster), so executor loss recovers from files and a
    // 40-hour convergence doesn't restart from round 0. The rounds are
    // O(log |V|) and each table is 16 bytes/node, so the storage cost
    // is bounded and tiny next to the edge list. Results are identical
    // by construction (GraphRankSpec pins it and proves real files).
    val e0 = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
    val eSym = symmetrize(e0)
      .filter(col("src") =!= col("dst"))
      .distinct()
    ccCore(if (prePartitionEdges) eSym.repartition(col("src")) else eSym,
      maxIters, reliableCheckpoints)
  }

  /** The label-propagation loop over an edge list the caller
    * guarantees SYMMETRIZED and self-loop-free, in whatever layout it
    * arrived in (per-run prepared above, or bucketed-at-write via
    * [[componentsFromBucketed]] — the loop itself never re-exchanges
    * the edges). Caches and releases the edge frame. */
  private def ccCore(edgesReady: DataFrame, maxIters: Int,
                     reliableCheckpoints: Boolean): (DataFrame, Int) = {
    def snap(df: DataFrame): DataFrame =
      if (reliableCheckpoints) df.checkpoint(true)
      else df.localCheckpoint(true)
    val e = edgesReady.cache()
    // Lineage MUST be truncated per round: the label table feeds THREE
    // of next round's operators (neighbor join, left join, pointer-jump
    // self-join), so a cache-only discipline still nests the logical
    // plan ~4x per round — plan construction itself blows up after ~10
    // rounds (observed: treeString OOM). localCheckpoint materializes
    // the |V|-row (long, long) table as RDD blocks and replaces the
    // plan with a leaf; the per-round tables are tiny (16 bytes/node),
    // so rounds x |V| retained blocks are negligible next to the edge
    // list and get released by the context cleaner as handles go out of
    // scope. (Cluster caveat, documented: localCheckpoint is lineage-
    // free, so losing an executor mid-convergence fails the job and the
    // caller reruns — the standard trade for iterative graph loops.)
    var lab = snap(e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")))
    var rounds = 0
    var changed = 1L
    while (changed > 0) {
      rounds += 1
      require(rounds <= maxIters,
        s"connectedComponents: no fixpoint after $maxIters rounds")
      val nbrMin = e.join(lab, e("src") === lab("node"))
        .groupBy(col("dst").as("node")).agg(min("lbl").as("nm"))
      val stepped = snap( // consumed twice by the self-join below
        lab.join(nbrMin, Seq("node"), "left")
          .select(col("node"), col("lbl").as("old"),
            least(col("lbl"), coalesce(col("nm"), col("lbl"))).as("mid")))
      val parent = stepped
        .select(col("node").as("p"), col("mid").as("plbl"))
      val next = snap(
        stepped.join(parent, stepped("mid") === parent("p"), "left")
          .select(col("node"), col("old"),
            least(col("mid"), coalesce(col("plbl"), col("mid"))).as("lbl")))
      changed = next.filter(col("lbl") < col("old")).count()
      lab = next.select("node", "lbl")
    }
    val result = lab.select(col("node"), col("lbl").as("component")).cache()
    result.count()
    e.unpersist(blocking = false)
    (result, rounds)
  }

  /** The matching DuckDB oracle for [[connectedComponents]]:
    * `edgesSql` must yield (doc_a, doc_b) pair rows. Returns
    * (node, component) for every node WITH at least one edge — the
    * registered queries LEFT-join it back to the full corpus so
    * singletons label themselves. Propagation prunes to labels smaller
    * than the receiving node (`r.m < eg.d`): the component minimum
    * still reaches every member (it is smaller than every node it
    * passes through), and the recursion's working set stays bounded by
    * per-node smaller-reachable labels instead of full closure.
    */
  def componentsOracleSql(edgesSql: String,
      tail: String = "SELECT node, component FROM cc"): String =
    s"""WITH RECURSIVE cc_p AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM ($edgesSql) ccq),
       |cc_e AS (SELECT doc_a AS s, doc_b AS d FROM cc_p
       |  UNION ALL SELECT doc_b AS s, doc_a AS d FROM cc_p),
       |cc_r(node, m) AS (
       |  SELECT s, s FROM cc_e
       |  UNION
       |  SELECT cc_e.d, cc_r.m FROM cc_r
       |  JOIN cc_e ON cc_e.s = cc_r.node WHERE cc_r.m < cc_e.d),
       |cc AS (SELECT node, min(m) AS component FROM cc_r GROUP BY node)
       |$tail""".stripMargin

  /** The matching DuckDB oracle: `edgesSql` must yield (src, dst). */
  def oracleSql(edgesSql: String, iters: Int, scale: Long = 1L << 20,
                dampNum: Long = 85L, dampDen: Long = 100L): String = {
    val base = scale * (dampDen - dampNum) / dampDen
    val iterCtes = (1 to iters).map { k =>
      s"""r$k AS MATERIALIZED (SELECT n.node,
         |  CAST($base + ($dampNum * coalesce(c.i, 0)) // $dampDen
         |    AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.r // d.outdeg) AS i
         |    FROM e JOIN deg d ON e.src = d.src
         |    JOIN r${k - 1} p ON e.src = p.node
         |    GROUP BY e.dst) c ON n.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($edgesSql),
       |nodes AS (SELECT src AS node FROM e
       |  UNION SELECT dst FROM e),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
       |  FROM e GROUP BY src),
       |r0 AS (SELECT node, CAST($scale AS BIGINT) AS r FROM nodes),
       |$iterCtes
       |SELECT node, r FROM r$iters""".stripMargin
  }
}
