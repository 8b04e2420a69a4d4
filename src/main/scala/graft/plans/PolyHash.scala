package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native portable polynomial string hash:
  * fold over code points of `h = (h * 31 + codePoint) % 1073741789`,
  * seed 7 — exactly the fold the DuckDB oracles compute with
  * `list_reduce(list_transform(range(...), i -> ascii(s[i])), ...)`, and
  * exactly what the SQL higher-order formulation
  * `aggregate(sequence(1, length(t)), 7, (a, i) ->
  *   (a * 31 + ascii(substring(t, i, 1))) % 1073741789)`
  * computes per CHARACTER — but as one compiled loop per string instead
  * of an interpreted lambda per character (the HOF was the dominant cost
  * of every portable-hash operator: SimHash (l4) and portable MinHash
  * (l3p) hash each token/shingle character-by-character through
  * interpreter dispatch).
  *
  * Code points stay under 2^21 and the modulus under 2^30, so the
  * accumulator never exceeds 2^36 — no overflow at any input length.
  * Empty string hashes to the seed (7), matching the oracle's empty
  * fold. (The HOF form is kept pinned equal in PolyHashSpec.)
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"poly_hash requires a string argument, got ${t.simpleString(10)}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "poly_hash"

  override def nullSafeEval(s: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    var h = 7L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % 1073741789L
      i += Character.charCount(cp)
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val str = ctx.freshName("str")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      s"""
         |java.lang.String $str = $s.toString();
         |long $h = 7L;
         |int $i = 0;
         |while ($i < $str.length()) {
         |  int $cp = $str.codePointAt($i);
         |  $h = ($h * 31L + $cp) % 1073741789L;
         |  $i += java.lang.Character.charCount($cp);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PolyHash = copy(child = newChild)
}
