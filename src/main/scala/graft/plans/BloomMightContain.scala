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
    * @transient so the serialized expression carries ONLY the literal
    * bytes — executors rebuild the filter from them on first use.
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
    nullSafeCodeGen(ctx, ev, (bytes, v) => {
      // Deserialize LAZILY from the literal's bytes into per-instance
      // mutable state — NOT addReferenceObj(filter): shipping the
      // driver-deserialized filter in the codegen references while the
      // same bytes ride along as the plan literal doubles every task's
      // closure (~40 MB at the documented 20 MB decontamination filter).
      // readFrom of the bit array is a cheap wrap, paid once per task.
      val bf = ctx.addMutableState(classOf[BloomFilter].getName,
        "graftBloomFilter")
      // through the static helper, not readFrom directly: readFrom
      // throws checked IOException, which generated code can't declare
      // — the canary spec caught exactly that as a CompileException
      s"""
         |if ($bf == null) {
         |  $bf = graft.plans.BloomMightContain.deserialize($bytes);
         |}
         |${ev.value} = $bf.mightContainLong($v);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

object BloomMightContain {
  /** Executor-side lazy deserialization target for the generated code:
    * wraps readFrom's CHECKED IOException (generated methods can't
    * declare throws) — it cannot actually occur on a byte-array stream.
    */
  def deserialize(bytes: Array[Byte]): BloomFilter =
    try BloomFilter.readFrom(new ByteArrayInputStream(bytes))
    catch { case e: java.io.IOException => throw new RuntimeException(e) }
}
