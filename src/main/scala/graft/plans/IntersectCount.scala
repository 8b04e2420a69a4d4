package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Count of DISTINCT common elements of two array<string> (or
  * array<long> — the hashed-shingle form) columns —
  * `size(array_intersect(a, b))` without materializing the intersection
  * array (array_intersect builds the result array, its growable buffer
  * and a dedup set per ROW just for size() to throw it away). The exact
  * verification stage of every blocked dedup operator (n-gram Jaccard,
  * MinHash-LSH, decontamination) runs this per candidate pair, so the
  * allocation cut is on the hot path.
  *
  * Semantics match array_intersect-then-size for any inputs (duplicates
  * counted once: probes REMOVE from the set). Null ELEMENTS are ignored
  * (shingle arrays never carry them); a null input array yields null via
  * the BinaryExpression contract.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_count requires two array<string> or two array<long> " +
          s"arguments, got ${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "intersect_count"

  private def isLong: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isLong)
      IntersectCount.countLongs(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData])
    else
      IntersectCount.count(a.asInstanceOf[ArrayData],
        b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val helper = if (isLong) "countLongs" else "count"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.IntersectCount.$helper($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  /** Static helper shared by interpreted eval and generated code: hash
    * the smaller side, probe-and-remove with the larger.
    */
  def count(x: ArrayData, y: ArrayData): Long = {
    val (small, large) =
      if (x.numElements() <= y.numElements()) (x, y) else (y, x)
    val n = small.numElements()
    val set = new java.util.HashSet[Object](Math.max(4, n * 2))
    var i = 0
    while (i < n) {
      if (!small.isNullAt(i)) set.add(small.getUTF8String(i))
      i += 1
    }
    var c = 0L
    val m = large.numElements()
    var j = 0
    while (j < m && !set.isEmpty) {
      if (!large.isNullAt(j) && set.remove(large.getUTF8String(j))) c += 1L
      j += 1
    }
    c
  }

  /** array<long> variant (hashed shingles): same probe-and-remove
    * shape over a primitive-long set — no per-element boxing beyond
    * the HashSet entries themselves.
    */
  def countLongs(x: ArrayData, y: ArrayData): Long = {
    val (small, large) =
      if (x.numElements() <= y.numElements()) (x, y) else (y, x)
    val n = small.numElements()
    val set = new java.util.HashSet[java.lang.Long](Math.max(4, n * 2))
    var i = 0
    while (i < n) {
      if (!small.isNullAt(i))
        set.add(java.lang.Long.valueOf(small.getLong(i)))
      i += 1
    }
    var c = 0L
    val m = large.numElements()
    var j = 0
    while (j < m && !set.isEmpty) {
      if (!large.isNullAt(j) &&
          set.remove(java.lang.Long.valueOf(large.getLong(j)))) c += 1L
      j += 1
    }
    c
  }
}
