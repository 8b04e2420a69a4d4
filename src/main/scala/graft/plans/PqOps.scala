package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Product-quantization kernels (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search"), fused into codegen'd
  * primitive loops on the [[NearestCell]]/[[LshBuckets]] discipline:
  * the codebook is ONE flat foldable `double[]` (layout
  * `flat[(s*ksub + c)*dsub + i]` for subspace s, codeword c, element i)
  * deserialized once per task via `addReferenceObj`, and every per-row
  * op is a compiled loop — no joins, no windows, no per-element lambda
  * interpretation, no per-subspace column fan-out (which at real m
  * would also re-hit the JIT-overflow cliff LshBuckets documents).
  *
  * Float-order contracts (what the l52 oracles replay):
  *  - [[PqEncodeAll]]: per (s, c) the L2 distance accumulates
  *    `(v_i - cw_i)^2` left-to-right over i; a STRICT `<` walking c
  *    ascending keeps the smallest code on ties.
  *  - [[PqLut]]: `lut[s*ksub + c] = dot(q_sub, cw)` left-to-right
  *    over i.
  *  - [[PqLutScore]]: the ADC score folds `lut[s*ksub + codes[s]]`
  *    in ascending-s order (per-subspace partial dots summed in s
  *    order — NOT the same rounding as one concatenated dot, and the
  *    oracle mirrors this exact order with an ORDER BY s list fold).
  */
object PqOps {
  private[plans] def checkTables(flat: Expression, dsub: Expression,
                                 ksub: Expression): Option[String] = {
    if (!flat.foldable)
      Some("the flat codebook must be FOLDABLE (a driver-built literal)")
    else if (!dsub.foldable || !ksub.foldable)
      Some("dsub and ksub must be literals")
    else None
  }

  private[plans] def longOf(e: Expression): Int =
    e.eval(null) match {
      case l: Long => l.toInt
      case i: Int  => i
      case other => throw new IllegalArgumentException(
        s"expected an integer literal, got $other")
    }
}

/** `pq_encode_all(vec, flatCodebook, dsub, ksub)` — ALL m subspace
  * codes of a vector in one pass: code_s = argmin_c of the L2 distance
  * between the s-th dsub-slice of `vec` and codeword c of subspace s.
  * Output array<long> of length m = flat.length / (ksub * dsub).
  * Vectors shorter than m*dsub treat missing elements as absent
  * (distance over the available prefix) — callers validate dimensions.
  */
case class PqEncodeAll(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _),
            LongType | org.apache.spark.sql.types.IntegerType,
            LongType | org.apache.spark.sql.types.IntegerType) =>
        PqOps.checkTables(second, third, fourth)
          .map(TypeCheckResult.TypeCheckFailure)
          .getOrElse(TypeCheckResult.TypeCheckSuccess)
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        "pq_encode_all requires (array<double>, array<double>, int, " +
          s"int), got ${a.simpleString(10)}, ${b.simpleString(10)}, " +
          s"${c.simpleString(10)}, ${d.simpleString(10)}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode_all"

  @transient private lazy val mat: Array[Double] =
    second.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val dsub: Int = PqOps.longOf(third)
  @transient private lazy val ksub: Int = PqOps.longOf(fourth)
  @transient private lazy val m: Int = {
    require(dsub > 0 && ksub > 0 && mat.length % (dsub * ksub) == 0,
      s"pq_encode_all: codebook of ${mat.length} doubles does not " +
        s"factor into subspaces of $ksub x $dsub")
    mat.length / (dsub * ksub)
  }

  /** Shared by eval and the spec's JVM mirror checks. */
  def encode(v: ArrayData): Array[Long] = {
    val len = v.numElements()
    val codes = new Array[Long](m)
    var s = 0
    while (s < m) {
      var best = java.lang.Double.POSITIVE_INFINITY
      var bestC = 0L
      var c = 0
      while (c < ksub) {
        var acc = 0.0
        var i = 0
        val vBase = s * dsub
        val mBase = (s * ksub + c) * dsub
        while (i < dsub && vBase + i < len) {
          val d = v.getDouble(vBase + i) - mat(mBase + i)
          acc += d * d
          i += 1
        }
        if (acc < best) { best = acc; bestC = c.toLong }
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    codes
  }

  override def nullSafeEval(v: Any, m2: Any, d2: Any, k2: Any): Any =
    new GenericArrayData(encode(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, _, _, _) => {
      val matRef = ctx.addReferenceObj("pqEncMat", mat, "double[]")
      val len = ctx.freshName("len")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val vBase = ctx.freshName("vBase")
      val mBase = ctx.freshName("mBase")
      val diff = ctx.freshName("diff")
      s"""
         |int $len = $v.numElements();
         |long[] $codes = new long[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  double $best = java.lang.Double.POSITIVE_INFINITY;
         |  long $bestC = 0L;
         |  int $vBase = $s * $dsub;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $acc = 0.0;
         |    int $mBase = ($s * $ksub + $c) * $dsub;
         |    for (int $i = 0; $i < $dsub && $vBase + $i < $len; $i++) {
         |      double $diff = $v.getDouble($vBase + $i) - $matRef[$mBase + $i];
         |      $acc += $diff * $diff;
         |    }
         |    if ($acc < $best) { $best = $acc; $bestC = (long) $c; }
         |  }
         |  $codes[$s] = $bestC;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): PqEncodeAll = copy(f, s, t, q)
}

/** `pq_lut(qvec, flatCodebook, dsub, ksub)` — the per-QUERY ADC lookup
  * table: `lut[s*ksub + c] = dot(q_sub_s, codeword(s, c))`, computed
  * once per query row (ksub*dim multiplies) so the per-pair score
  * ([[PqLutScore]]) is m lookups + adds instead of dim multiplies —
  * the asymmetric-distance trick that makes a PQ scan compute-bounded
  * by CODE length, not vector length.
  */
case class PqLut(first: Expression, second: Expression,
                 third: Expression, fourth: Expression)
    extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        PqOps.checkTables(second, third, fourth)
          .map(TypeCheckResult.TypeCheckFailure)
          .getOrElse(TypeCheckResult.TypeCheckSuccess)
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        "pq_lut requires (array<double>, array<double>, int, int), " +
          s"got ${a.simpleString(10)} and ${b.simpleString(10)}")
    }

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  @transient private lazy val mat: Array[Double] =
    second.eval(null).asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val dsub: Int = PqOps.longOf(third)
  @transient private lazy val ksub: Int = PqOps.longOf(fourth)
  @transient private lazy val m: Int = {
    require(dsub > 0 && ksub > 0 && mat.length % (dsub * ksub) == 0,
      s"pq_lut: codebook of ${mat.length} doubles does not factor " +
        s"into subspaces of $ksub x $dsub")
    mat.length / (dsub * ksub)
  }

  override def nullSafeEval(q: Any, m2: Any, d2: Any, k2: Any): Any = {
    val v = q.asInstanceOf[ArrayData]
    val len = v.numElements()
    val lut = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        var acc = 0.0
        var i = 0
        val vBase = s * dsub
        val mBase = (s * ksub + c) * dsub
        while (i < dsub && vBase + i < len) {
          acc += v.getDouble(vBase + i) * mat(mBase + i)
          i += 1
        }
        lut(s * ksub + c) = acc
        c += 1
      }
      s += 1
    }
    new GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, _, _, _) => {
      val matRef = ctx.addReferenceObj("pqLutMat", mat, "double[]")
      val len = ctx.freshName("len")
      val lut = ctx.freshName("lut")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val vBase = ctx.freshName("vBase")
      val mBase = ctx.freshName("mBase")
      s"""
         |int $len = $q.numElements();
         |double[] $lut = new double[${m * ksub}];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $vBase = $s * $dsub;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $acc = 0.0;
         |    int $mBase = ($s * $ksub + $c) * $dsub;
         |    for (int $i = 0; $i < $dsub && $vBase + $i < $len; $i++) {
         |      $acc += $q.getDouble($vBase + $i) * $matRef[$mBase + $i];
         |    }
         |    $lut[$s * $ksub + $c] = $acc;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression,
      q: Expression): PqLut = copy(f, s, t, q)
}

/** `pq_lut_score(lut, codes, ksub)` — the per-pair ADC score:
  * sum over subspaces (ascending s) of `lut[s*ksub + codes[s]]`.
  * m additions and lookups per pair; codes outside [0, ksub) score as
  * 0 for that subspace (never produced by [[PqEncodeAll]]).
  */
case class PqLutScore(first: Expression, second: Expression,
                      third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(LongType, _)) =>
        if (!third.foldable)
          TypeCheckResult.TypeCheckFailure("ksub must be a literal")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        "pq_lut_score requires (array<double>, array<bigint>, int), " +
          s"got ${a.simpleString(10)} and ${b.simpleString(10)}")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_lut_score"

  @transient private lazy val ksub: Int = PqOps.longOf(third)

  override def nullSafeEval(l: Any, cs: Any, k2: Any): Any = {
    val lut = l.asInstanceOf[ArrayData]
    val codes = cs.asInstanceOf[ArrayData]
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      val c = codes.getLong(s)
      if (c >= 0L && c < ksub) {
        val idx = s * ksub + c.toInt
        if (idx < lut.numElements()) acc += lut.getDouble(idx)
      }
      s += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, cs, _) => {
      val m = ctx.freshName("m")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val idx = ctx.freshName("idx")
      s"""
         |int $m = $cs.numElements();
         |double $acc = 0.0;
         |for (int $s = 0; $s < $m; $s++) {
         |  long $c = $cs.getLong($s);
         |  if ($c >= 0L && $c < ${ksub}L) {
         |    int $idx = $s * $ksub + (int) $c;
         |    if ($idx < $l.numElements()) $acc += $l.getDouble($idx);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqLutScore =
    copy(f, s, t)
}
