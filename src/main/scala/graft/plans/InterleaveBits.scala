package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** `interleave_bits(a, b)` — the 2-D Morton (Z-order) value of two
  * 16-bit bucket coordinates: bit `i` of `a` lands at position `2i`,
  * bit `i` of `b` at `2i+1`, giving a 32-bit key whose sort order is
  * the Z space-filling curve. Sorting/range-partitioning a table by
  * this key co-locates rows that are close in BOTH dimensions, so
  * per-file min/max stats become tight in both columns and scans
  * filtered on EITHER dimension prune files — the multi-dimensional
  * data-layout trick (Databricks OPTIMIZE ZORDER, Iceberg sort orders)
  * that single-column sorting cannot give (sorted by `a`, a filter on
  * `b` touches every file). ZOrderSpec measures exactly that: a
  * one-dimension filter overlaps a strict subset of z-ordered files vs
  * ALL linearly-sorted files.
  *
  * Inputs must already be bucketized to `[0, 65535]` (callers scale or
  * modulo their dimensions — bucket resolution is a layout choice, not
  * something to guess here); out-of-range values THROW rather than
  * silently alias buckets. 16 bits per dimension keeps the key
  * positive in a BIGINT with headroom, and 65536×65536 cells is finer
  * than any practical file count resolves anyway.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"interleave_bits requires two BIGINT bucket coordinates, got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "interleave_bits"

  override def nullSafeEval(a: Any, b: Any): Any =
    InterleaveBits.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  // Emit a static call rather than an inline loop: Janino cannot parse a
  // parenthesized arithmetic expression as a shift RHS (`<< (2 * i)` fails
  // with `Expression "2 * i" is not a type`), which silently demoted every
  // z-order projection to interpreted mode. The JVM JIT inlines the static
  // method, so this is as fast as the unrolled loop would have been, and
  // range checking (with the same exception) lives in one place.
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.InterleaveBits.interleave($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  def interleave(a: Long, b: Long): Long = {
    require(a >= 0L && a <= 65535L && b >= 0L && b <= 65535L,
      s"interleave_bits coordinates must be in [0, 65535], got ($a, $b)")
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}
