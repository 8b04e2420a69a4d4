package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join WITHOUT a nested-loop: Spark compiles
  * a bare `p BETWEEN s AND e` join predicate to
  * BroadcastNestedLoopJoin — O(|points| × |intervals|) compares, and a
  * driver OOM the moment the interval side outgrows the broadcast
  * threshold (at 100 TB both sides scale: every event against every
  * promo/session/validity window). The standard fix, bucketized here:
  *
  *  1. pick a bucket width `W` on the point domain;
  *  2. a point maps to ONE bucket `floor(p / W)`;
  *  3. an interval explodes into its covered buckets
  *     `floor(s / W) .. floor(e / W)`;
  *  4. equi-join on bucket (ONE hash shuffle Catalyst plans like any
  *     other), then the exact BETWEEN filter inside matches.
  *
  * Exactly the semantics of the naive predicate (RangeJoinSpec pins
  * equality and bucket-width invariance) at cost
  * |points| + Σ(width_i/W + 1) shuffled rows instead of the product.
  * `W` trades fan-out against selectivity: W ≈ the median interval
  * width keeps the explode factor ~2 while a bucket pairs each point
  * with only its candidate intervals. Degenerate intervals (`e < s`)
  * are DROPPED before the explode — Spark's `sequence(a, b)` runs
  * DESCENDING when `b < a` (the l13 guard), which would fabricate
  * buckets for an empty interval.
  *
  * Floor division (not `DIV`) keeps negative domains correct: -1/86400
  * must bucket to -1, not 0.
  */
object RangeJoin {

  /** `salt` > 1 splits every bucket `salt` ways — points take a
    * deterministic salt from their own value, intervals replicate
    * across all salts (they cannot know which points will probe them;
    * the operators/Skew.scala replicate-the-small-side trade). This is
    * the cure for BUCKET skew, which AQE cannot see: the sf5 probe
    * measured a 598M-match join running on ~27 single-task partitions
    * because the time domain had ~27 live buckets — each reducer's
    * INPUT is kilobytes (so AQE's byte-based skew split never fires)
    * while its join OUTPUT is tens of millions of rows.
    *
    * `broadcastIntervals` hints the exploded interval side around the
    * sort-merge path entirely (right whenever it fits an executor —
    * the stats on a Generate output are too poor for Catalyst to pick
    * this itself): the join inherits the point scan's parallelism and
    * no `__b` exchange exists to skew.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      bucketWidth: Long, salt: Int = 1,
                      broadcastIntervals: Boolean = false): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be > 0, got $bucketWidth")
    require(salt >= 1, s"salt must be >= 1, got $salt")
    val w = lit(bucketWidth)
    val p = points
      .withColumn("__b", floor(col(pointCol) / w).cast("long"))
      .withColumn("__s",
        if (salt > 1) pmod(xxhash64(col(pointCol)), lit(salt.toLong))
        else lit(0L))
    val i0 = intervals
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bs", floor(col(startCol) / w).cast("long"))
      .withColumn("__be", floor(col(endCol) / w).cast("long"))
      .withColumn("__b", explode(expr("sequence(__bs, __be)")))
      .drop("__bs", "__be")
    val i1 =
      if (salt > 1)
        i0.withColumn("__s",
          explode(expr(s"sequence(0L, ${salt - 1}L)")))
      else i0.withColumn("__s", lit(0L))
    val i = if (broadcastIntervals) broadcast(i1) else i1
    p.join(i, Seq("__b", "__s"))
      .filter(col(pointCol) >= col(startCol) &&
        col(pointCol) <= col(endCol))
      .drop("__b", "__s")
  }
}
