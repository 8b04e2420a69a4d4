package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One upper-triangle cell of the exact second-moment sums (the
  * [[MomentAgg]] output row — field order is the public column order).
  */
final case class MomentCell(i: Long, j: Long, sxy: Long, sx: Long,
                            sy: Long, n: Long)

/** Typed Aggregator computing ALL d(d+1)/2 exact scaled-integer moment
  * cells in ONE buffer: per row, integerize the vector (round half away
  * from zero at 10^digits — bit-identical to `round(x·10^digits, 0)` in
  * Spark AND DuckDB), then a JIT-compiled nested loop accumulates the
  * triangle. Merge is elementwise long addition, so the result is exact
  * and partition-order independent (deterministic under any layout/AQE).
  *
  * This replaces the higher-order-function formulation (explode the
  * per-row pair structs into a hash-agg) for [[graft.operators.Pca]]:
  * that shape evaluates an interpreted lambda per (row × pair) — 2 080
  * interpreted struct builds per row, the exact cliff the LSH family hit
  * (measured 8.7–10.9 s at 100k×64-d; this buffer does the same sums in
  * compiled primitive ops). Shuffle: ONE ~17 KB buffer per partition,
  * O(partitions·d²) regardless of corpus size.
  *
  * Overflow envelope: |x|≈1 at digits=6 gives per-row products ≤ 10¹²,
  * so the long sums hold ~9·10⁶ rows; at digits=4 the envelope is
  * ~9·10¹⁰ rows. Pick digits to fit N·10^(2·digits) ≲ 9.2·10¹⁸; beyond
  * it use [[graft.operators.Pca.momentSumsHof]] with `wide = true`
  * (decimal(38,0) accumulator).
  */
final class MomentAgg(dim: Int, digits: Int)
    extends Aggregator[Seq[Double], Array[Long], Seq[MomentCell]] {

  private val scale = math.pow(10, digits)
  private val size = 1 + dim + dim * (dim + 1) / 2

  override def zero: Array[Long] = new Array[Long](size)

  /** round half away from zero — matches Spark's round(x, 0) (BigDecimal
    * HALF_UP) and DuckDB's round on every non-tie, and on ties for all
    * |x·scale| < 2^52 (the entire embedding domain).
    *
    * NOT the naive floor(s + 0.5): that misrounds the
    * 0.49999999999999994 class (the largest double below 0.5 — s + 0.5
    * rounds to exactly 1.0 in IEEE, the same defect pre-Java-7
    * Math.round had). The correction term detects the only possible
    * misround — t landed MORE than 0.5 above s, i.e. the addition
    * carried across the boundary — and steps back.
    */
  @inline private def rnd(x: Double): Long = {
    val s = x * scale
    val a = math.abs(s)
    var t = math.floor(a + 0.5)
    if (t - a > 0.5) t -= 1.0
    if (s < 0) -t.toLong else t.toLong
  }

  override def reduce(buf: Array[Long], xs: Seq[Double]): Array[Long] = {
    if (xs == null) return buf
    require(xs.length == dim,
      s"MomentAgg(dim=$dim): got a length-${xs.length} vector")
    val v = new Array[Long](dim)
    var i = 0
    xs.foreach { x => v(i) = rnd(x); i += 1 }
    i = 0
    var o = 1 + dim
    while (i < dim) {
      val vi = v(i)
      buf(1 + i) += vi
      var j = i
      while (j < dim) { buf(o) += vi * v(j); j += 1; o += 1 }
      i += 1
    }
    buf(0) += 1
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < size) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Seq[MomentCell] = {
    val out = Vector.newBuilder[MomentCell]
    val n = buf(0)
    var i = 0
    var o = 1 + dim
    while (i < dim) {
      var j = i
      while (j < dim) {
        out += MomentCell(i, j, buf(o), buf(1 + i), buf(1 + j), n)
        j += 1; o += 1
      }
      i += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.kryo[Array[Long]]

  override def outputEncoder: Encoder[Seq[MomentCell]] =
    ExpressionEncoder[Seq[MomentCell]]()
}
