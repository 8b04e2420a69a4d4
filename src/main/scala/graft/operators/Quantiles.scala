package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact order-statistic selection WITHOUT a global sort — the "keep
  * exactly the k best documents" primitive ("top 10% by quality") at
  * corpus scale.
  *
  * A global `ORDER BY score DESC LIMIT k` ranks every row through one
  * exchange; approximate quantiles (x12p's histogram) give a threshold
  * but not an EXACT k. This finds the exact k-th order pair
  * (value DESC, id ASC) by iterative histogram narrowing: each pass is
  * ONE map-side-combinable bucket-count aggregation over the candidate
  * range, narrowing the value interval by the bucket factor — ⌈64 /
  * log2(buckets)⌉ passes worst-case for a 64-bit domain (4 at B = 64k),
  * each reading only rows still inside the interval (the filter reaches
  * the scan). Ties on the value are broken exactly the same way on the
  * id, so the selection predicate `(v, id) < (t, idT)` keeps EXACTLY k
  * rows with no window, no shuffle, no driver-side row collection —
  * driver state is one (lo, hi) interval and a B-entry count array per
  * pass (the Bpe.train / mmrSelect driver-paced class).
  *
  * Values and ids must be BIGINT (quality scores in this engine are
  * integer bits / scaled longs by the determinism discipline).
  */
object Quantiles {

  /** The exact k-th largest (value, id) pair under (value DESC, id ASC)
    * — the selection threshold. Requires 1 <= k <= count; ids must be
    * unique. O(passes) aggregations, no sort anywhere.
    */
  def kthLargest(df: DataFrame, valueCol: String, idCol: String,
                 k: Long, buckets: Int = 4096): (Long, Long) = {
    require(k >= 1, s"k must be >= 1, got $k")
    val v = col(valueCol).cast("long")
    // Pass structure: count rows with value > hi-candidate ranges via
    // bucketed histograms over [lo, hi].
    val bounds = df.agg(min(v).as("lo"), max(v).as("hi"),
      count(lit(1)).as("n")).head()
    require(!bounds.isNullAt(0), "empty input")
    require(k <= bounds.getLong(2),
      s"k=$k exceeds row count ${bounds.getLong(2)}")
    var lo = bounds.getLong(0)
    var hi = bounds.getLong(1)
    // nonneg domain: hi - lo must not wrap (a full-Long domain's span
    // overflows); quality scores and ids in this engine are nonneg by
    // the determinism discipline — shift your domain otherwise
    require(lo >= 0L, s"non-negative value domain required, min=$lo")
    // rows with value strictly ABOVE the current interval, accumulated
    // as the interval narrows
    var above = 0L
    while (lo < hi) {
      // bucket width >= 1; bucket index of x is (x - lo) / w, clamped
      val w = math.max(1L, (hi - lo) / buckets + 1L)
      // integer DIV, never `/`: Spark plans long/long as DOUBLE
      // division, which mis-buckets above 2^53 (the RangeJoin lesson —
      // and this spec's 63-bit arm caught the same class here live)
      val hist = df.filter(v >= lo && v <= hi)
        .groupBy(expr(s"(CAST($valueCol AS BIGINT) - $lo) DIV $w")
          .as("b"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // walk buckets from the TOP: find the bucket holding the k-th
      val maxB = (hi - lo) / w
      var acc = above
      var bTop = maxB
      var found = false
      while (!found && bTop >= 0) {
        val c = hist.getOrElse(bTop, 0L)
        if (acc + c >= k) found = true
        else { acc += c; bTop -= 1 }
      }
      require(found, "histogram lost the k-th (counting bug)")
      above = acc
      // bTop*w <= hi-lo, so newLo never overflows; the bucket's upper
      // edge newLo + (w-1) CAN overflow near Long.MaxValue (seen live
      // at buckets=4 over a 63-bit domain) — compare spans, not sums
      val newLo = lo + bTop * w
      val newHi = if (w - 1L >= hi - newLo) hi else newLo + (w - 1L)
      lo = newLo
      hi = newHi
      if (w == 1L) {
        // buckets are exact values — lo IS the k-th value
        hi = lo
      }
    }
    val t = lo
    // ties on t: the k-th id is the (k - above)-th SMALLEST id among
    // value == t — same narrowing on the id domain
    val need = k - above
    val ties = df.filter(v === t)
    val idT = kthSmallestId(ties, idCol, need, buckets)
    (t, idT)
  }

  /** The exact `need`-th smallest id within `df` — the tie-break leg,
    * same histogram narrowing.
    */
  private def kthSmallestId(df: DataFrame, idCol: String, need: Long,
                            buckets: Int): Long = {
    val id = col(idCol).cast("long")
    val bounds = df.agg(min(id).as("lo"), max(id).as("hi")).head()
    var lo = bounds.getLong(0)
    var hi = bounds.getLong(1)
    require(lo >= 0L, s"non-negative id domain required, min=$lo")
    var below = 0L
    while (lo < hi) {
      val w = math.max(1L, (hi - lo) / buckets + 1L)
      val hist = df.filter(id >= lo && id <= hi)
        .groupBy(expr(s"(CAST($idCol AS BIGINT) - $lo) DIV $w").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val maxB = (hi - lo) / w
      var acc = below
      var b = 0L
      var found = false
      while (!found && b <= maxB) {
        val c = hist.getOrElse(b, 0L)
        if (acc + c >= need) found = true
        else { acc += c; b += 1 }
      }
      require(found, "id histogram lost the k-th (counting bug)")
      below = acc
      val newLo = lo + b * w
      val newHi = if (w - 1L >= hi - newLo) hi else newLo + (w - 1L)
      lo = newLo
      hi = newHi
      if (w == 1L) hi = lo
    }
    lo
  }

  /** Selection predicate for exactly the top `k` under
    * (value DESC, id ASC), given [[kthLargest]]'s threshold pair.
    */
  def keepTopK(valueCol: String, idCol: String,
               threshold: (Long, Long)): Column = {
    val (t, idT) = threshold
    (col(valueCol).cast("long") > t) ||
      (col(valueCol).cast("long") === t && col(idCol).cast("long") <= idT)
  }
}
