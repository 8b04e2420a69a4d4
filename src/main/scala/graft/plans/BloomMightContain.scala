package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(filterBytes, hash)` — membership test of a LONG
  * key against a serialized `org.apache.spark.util.sketch.BloomFilter`
  * (the format `DataFrameStatFunctions.bloomFilter` writes), as a
  * codegen'd predicate. This is the manual, builder-controlled sibling
  * of Spark's runtime `BloomFilterMightContain` injection (Spark's own
  * rule only fires on equi-join keys it can see through; the
  * decontamination prefilter needs it on an EXPLODED shingle stream
  * long before any join is visible to the optimizer).
  *
  * The filter bytes must be FOLDABLE (a literal the driver built): the
  * filter deserializes ONCE per task via `addReferenceObj`, never per
  * row — the same contract Spark's internal expression enforces. One
  * sided-error only: `false` is definite, `true` may be a false
  * positive, so callers must re-verify survivors exactly (the l15b
  * decontamination join does).
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain requires a FOLDABLE (literal) filter — " +
          "build it driver-side and pass the serialized bytes")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (binary, bigint) arguments, got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }

  override def prettyName: String = "bloom_might_contain"

  /** Deserialized once per driver/executor instance; only touched when
    * the bytes are non-null (the null contract short-circuits first).
    */
  @transient private lazy val filter: BloomFilter = {
    val bytes = left.eval(null).asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(bytes: Any, value: Any): Any =
    filter.mightContainLong(value.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (_, v) => {
      // the left child's generated code is just the literal reference
      // load; membership goes through the once-deserialized filter
      val bf = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      s"${ev.value} = $bf.mightContainLong($v);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
