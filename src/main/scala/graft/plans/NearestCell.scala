package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** `nearest_cell(vec, flatCentroids, centroidNorms, cellIds)` — the
  * argmax-cosine centroid CELL ID of a vector against a fixed centroid
  * table, fused into one primitive loop (the [[LshBuckets]] discipline
  * applied to IVF assignment).
  *
  * Why: the declarative assignment (`Similarity.assignCells`) is a
  * broadcast join that multiplies every corpus vector by nCells rows
  * and ranks them through a per-vector `row_number` window — at 256
  * cells that is a 256× row blowup plus a window sort per micro-batch,
  * which the sf5 probe measured dominating the streaming index build.
  * Here the centroid matrix is ONE flat `double[]` reference
  * (cell-major: `c*dim + d`) and the whole assignment is a map-side
  * codegen'd loop: no join, no window, no extra rows.
  *
  * Bit-compatibility contract with `assignCells(take = 1)`: the
  * vector's self-norm accumulates over its FULL length (`vec_dot(v,v)`
  * order), each cross dot over `min(dim, |v|)` (the `vec_dot`
  * truncation rule), cosine = dot / (vnorm * cnorm) in exactly that
  * double order, and a STRICT `>` comparison walks cells in ascending
  * `cellIds` order — so equal cosines keep the smallest cell id, the
  * same total order as the window's (sim desc, cell asc).
  * NearestCellSpec pins per-row equality on real embeddings.
  *
  * The three table arguments must be FOLDABLE (driver-built literals,
  * the BloomMightContain contract): they deserialize once per task via
  * `addReferenceObj`, never per row. Callers order all three by cell
  * id ascending ([[graft.operators.Similarity.collectCentroids]]).
  */
case class NearestCell(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
            ArrayType(DoubleType, _), ArrayType(LongType, _)) =>
        if (!(second.foldable && third.foldable && fourth.foldable))
          TypeCheckResult.TypeCheckFailure(
            "nearest_cell centroid tables must be FOLDABLE (literal) — " +
              "collect the centroid table driver-side first")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        "nearest_cell requires (array<double>, array<double>, " +
          s"array<double>, array<bigint>), got ${a.simpleString(10)}, " +
          s"${b.simpleString(10)}, ${c.simpleString(10)}, " +
          s"${d.simpleString(10)}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "nearest_cell"

  private def doubles(e: Expression): Array[Double] =
    e.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  @transient private lazy val mat: Array[Double] = doubles(second)
  @transient private lazy val nrms: Array[Double] = doubles(third)
  @transient private lazy val ids: Array[Long] =
    fourth.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val dim: Int = {
    require(ids.length > 0 && nrms.length == ids.length &&
      mat.length % ids.length == 0,
      s"nearest_cell: ${ids.length} ids, ${nrms.length} norms, " +
        s"matrix of ${mat.length} doubles do not form a cell table")
    mat.length / ids.length
  }

  override def nullSafeEval(v: Any, m: Any, nr: Any, id: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val len = a.numElements()
    var self = 0.0
    var d = 0
    while (d < len) { self += a.getDouble(d) * a.getDouble(d); d += 1 }
    val vnrm = java.lang.Math.sqrt(self)
    val n = java.lang.Math.min(dim, len)
    var best = java.lang.Double.NEGATIVE_INFINITY
    var bestId = ids(0)
    var c = 0
    while (c < ids.length) {
      var acc = 0.0
      var i = 0
      val base = c * dim
      while (i < n) { acc += a.getDouble(i) * mat(base + i); i += 1 }
      val sim = acc / (vnrm * nrms(c))
      if (sim > best) { best = sim; bestId = ids(c) }
      c += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _, _) => {
      val matRef = ctx.addReferenceObj("nearestCellMat", mat, "double[]")
      val nrmRef = ctx.addReferenceObj("nearestCellNrm", nrms, "double[]")
      val idRef = ctx.addReferenceObj("nearestCellIds", ids, "long[]")
      val len = ctx.freshName("len")
      val self = ctx.freshName("self")
      val vnrm = ctx.freshName("vnrm")
      val n = ctx.freshName("n")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val sim = ctx.freshName("sim")
      val base = ctx.freshName("base")
      s"""
         |int $len = $v.numElements();
         |double $self = 0.0;
         |for (int $d = 0; $d < $len; $d++) {
         |  $self += $v.getDouble($d) * $v.getDouble($d);
         |}
         |double $vnrm = java.lang.Math.sqrt($self);
         |int $n = java.lang.Math.min($dim, $len);
         |double $best = java.lang.Double.NEGATIVE_INFINITY;
         |long $bestId = $idRef[0];
         |for (int $c = 0; $c < $idRef.length; $c++) {
         |  double $acc = 0.0;
         |  int $base = $c * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $v.getDouble($i) * $matRef[$base + $i];
         |  }
         |  double $sim = $acc / ($vnrm * $nrmRef[$c]);
         |  if ($sim > $best) { $best = $sim; $bestId = $idRef[$c]; }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): NearestCell = copy(f, s, t, q)
}
