package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** The deterministic hyperplane family every LSH operator hashes with
  * (SplitMix64-style mix of (plane, component) → a double in
  * [-0.5, 0.5)). Single source of truth: `Similarity.planeSqlLiteral`
  * renders the SAME doubles as SQL list literals for the cross-engine
  * oracles (l6p), and [[LshBuckets]] bakes them into its fused loop —
  * all three views are bit-identical by construction.
  */
object Planes {
  def plane(plane: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      var z = plane.toLong * 0x9E3779B97F4A7C15L +
        d.toLong * 0xC2B2AE3D27D4EB4FL + 0x165667B19E3779F9L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^= z >>> 31
      (java.lang.Math.floorMod(z, 1000000L).toDouble / 1000000.0) - 0.5
    }
}

/** All `nTables` sign-pattern LSH bucket ids of an array<double> vector,
  * fused into ONE primitive loop over a flat plane matrix.
  *
  * Why an expression and not composition: the composed form — an
  * `array(...)` of per-table bucket ids, each a sum of nPlanes
  * `when(vec_dot(v, plane_literal) > 0, 1<<p)` terms — inlines
  * nTables x nPlanes separate dot-product loops plus their null checks
  * into one generated method. At the l12 design point that is 96-128
  * loops: the method blows past the JIT's compilation limits, the whole
  * scan stage drops to interpreted evaluation, and bucketing becomes
  * the dominant cost of every LSH query (measured: the three cell-
  * stream stages of l12c at 50x scale each spent ~70 s in single tasks
  * of what should be a ~4 GFLOP pass — SCALE_r06.md §3). Here the plane
  * matrix is one flat `double[]` reference (table-major:
  * ((t*nPlanes + p)*dim + d)) and the generated code is three nested
  * loops the JIT compiles and vectorizes.
  *
  * Bit-compatibility contract: ascending-index dot accumulation (the
  * same fold `vec_dot` uses), sign rule `dot > 0.0`, bit p set as
  * `1L << p` — bucket ids are identical to the composed form, which
  * SimilaritySpec pins; the l6p/l3p oracle SQL remains valid verbatim.
  *
  * Truncated inputs follow vec_dot: the dot runs over
  * min(dim, vector length). A null input vector yields null via the
  * UnaryExpression null contract.
  */
case class LshBuckets(child: Expression, nPlanes: Int, nTables: Int,
                      dim: Int, planeOffset: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets requires array<double>, got ${t.simpleString(10)}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "lsh_buckets"

  /** Flat [table][plane][component] matrix, built once per expression
    * instance (driver) and shipped as ONE reference object.
    */
  @transient private lazy val planesFlat: Array[Double] = {
    val out = new Array[Double](nTables * nPlanes * dim)
    var t = 0
    while (t < nTables) {
      var p = 0
      while (p < nPlanes) {
        val pl = Planes.plane(planeOffset + t * nPlanes + p, dim)
        System.arraycopy(pl, 0, out, (t * nPlanes + p) * dim, dim)
        p += 1
      }
      t += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(dim, a.numElements())
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var b = 0L
      var p = 0
      while (p < nPlanes) {
        val base = (t * nPlanes + p) * dim
        var acc = 0.0
        var d = 0
        while (d < n) {
          acc += a.getDouble(d) * planesFlat(base + d)
          d += 1
        }
        if (acc > 0.0) b |= 1L << p
        p += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planes = ctx.addReferenceObj("lshPlanes", planesFlat, "double[]")
      val pl = ctx.freshName("planes")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      s"""
         |double[] $pl = $planes;
         |int $n = java.lang.Math.min($dim, $v.numElements());
         |long[] $out = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $b = 0L;
         |  for (int $p = 0; $p < $nPlanes; $p++) {
         |    int $base = ($t * $nPlanes + $p) * $dim;
         |    double $acc = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $acc += $v.getDouble($d) * $pl[$base + $d];
         |    }
         |    if ($acc > 0.0) $b |= 1L << $p;
         |  }
         |  $out[$t] = $b;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): LshBuckets = copy(child = newChild)
}

object LshBuckets {
  /** Function-registry builder: the four shape arguments must be
    * foldable int literals (they parameterize generated code). The
    * expression is SQL-visible (registered via SparkSessionExtensions),
    * so a wrong-arity user call must fail analysis with the expected
    * signature, not an IndexOutOfBoundsException from children(4).
    */
  def build(children: Seq[Expression]): LshBuckets = {
    if (children.length != 5)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`lsh_buckets`",
          "expectedNum" -> "5",
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    def intOf(e: Expression): Int = {
      require(e.foldable, s"lsh_buckets shape args must be literals, got $e")
      e.eval(InternalRow.empty).asInstanceOf[Number].intValue
    }
    LshBuckets(children(0), intOf(children(1)), intOf(children(2)),
      intOf(children(3)), intOf(children(4)))
  }
}
