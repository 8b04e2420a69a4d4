package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator computing the SKETCH moments a randomized
  * eigensolve needs ([[graft.operators.Pca.fitRandomized]]): for a
  * fixed matrix M (d×l, carried inside the aggregator and shipped once
  * with the task binary), one pass accumulates
  * {{{ n,   Σ x  (d cells),   Σ x·(Mᵀx)ᵀ  (d·l cells) }}}
  * so the driver can form A·M for A = E[xxᵀ] (or the covariance) from
  * one aggregate whose buffer is O(d·l) — NOT O(d²), which is the whole
  * point: [[MomentAgg]]'s exact triangle is 1 GB per partition at
  * d = 16k, while this buffer at l = 24 is ~3 MB. Per row the update is
  * 2·d·l multiply-adds of compiled primitive ops (z = Mᵀx, then the
  * rank-1 accumulate x·zᵀ).
  *
  * Determinism caveat (vs [[MomentAgg]]'s exact integers): sums are
  * IEEE doubles, so results can vary in the last ulps with partition
  * layout. That is the honest price of the randomized path — it is an
  * approximation method whose output carries an error bound anyway;
  * the spec pins subspace agreement against the exact eigensolve, not
  * bitwise identity.
  */
final class SketchAgg(dim: Int, m: Array[Array[Double]])
    extends Aggregator[Seq[Double], Array[Double], Seq[SketchCell]] {

  require(m.length == dim, s"SketchAgg: matrix has ${m.length} rows, " +
    s"expected dim=$dim")
  private val l = if (m.isEmpty) 0 else m(0).length
  // layout: [0]=n, [1..d]=Σx, [1+d ..]=Σ x·zᵀ (row-major), [last]=Σ‖x‖²
  // (the trace cell — total variance needs it, and it costs d flops)
  private val size = 1 + dim + dim * l + 1

  override def zero: Array[Double] = new Array[Double](size)

  override def reduce(buf: Array[Double],
                      xs: Seq[Double]): Array[Double] = {
    if (xs == null) return buf
    require(xs.length == dim,
      s"SketchAgg(dim=$dim): got a length-${xs.length} vector")
    val x = new Array[Double](dim)
    var i = 0
    xs.foreach { v => x(i) = v; i += 1 }
    // z = Mᵀ x
    val z = new Array[Double](l)
    i = 0
    while (i < dim) {
      val xi = x(i)
      if (xi != 0.0) {
        val mi = m(i)
        var j = 0
        while (j < l) { z(j) += xi * mi(j); j += 1 }
      }
      i += 1
    }
    // accumulate n, Σx, Σ x zᵀ, Σ‖x‖²
    buf(0) += 1.0
    i = 0
    var o = 1 + dim
    var ssq = 0.0
    while (i < dim) {
      val xi = x(i)
      buf(1 + i) += xi
      ssq += xi * xi
      var j = 0
      while (j < l) { buf(o) += xi * z(j); j += 1; o += 1 }
      i += 1
    }
    buf(size - 1) += ssq
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < size) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Double]): Seq[SketchCell] = {
    val out = Vector.newBuilder[SketchCell]
    val n = buf(0).toLong
    val ssq = buf(size - 1)
    var i = 0
    var o = 1 + dim
    while (i < dim) {
      var j = 0
      while (j < l) {
        out += SketchCell(i, j, buf(o), buf(1 + i), n, ssq)
        j += 1; o += 1
      }
      i += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[Array[Double]] =
    Encoders.kryo[Array[Double]]

  override def outputEncoder: Encoder[Seq[SketchCell]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[SketchCell]]()
}

/** One cell of the sketch sums: `sxz` = Σ x_i·z_j, `sx` = Σ x_i;
  * `ssq` = Σ‖x‖² (the trace cell, repeated per row like `n`). */
final case class SketchCell(i: Long, j: Long, sxz: Double, sx: Double,
                            n: Long, ssq: Double)
