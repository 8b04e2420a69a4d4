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
  */
object GraphRank {

  def pageRankFixedPoint(edges: DataFrame, srcCol: String,
                         dstCol: String, iters: Int,
                         scale: Long = 1L << 20,
                         dampNum: Long = 85L,
                         dampDen: Long = 100L): DataFrame = {
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
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).cache()
    val base = scale * (dampDen - dampNum) / dampDen
    var r = nodes.withColumn("r", lit(scale))
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      val contrib = e.join(deg, "src").join(r,
          e("src") === r("node"))
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
    deg.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    r
  }

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
