package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(s)` — Unicode NFC (canonical composition) of a
  * string, as a codegen'd native expression. Crawled corpora mix
  * composed and decomposed forms of the same visible text (`é` vs
  * `e`+U+0301, macOS filenames are NFD, some CMSes emit NFKD
  * fragments), so WITHOUT normalization exact dedup treats equal
  * documents as distinct, shingle/fingerprint keys diverge on equal
  * text, and tokenizers learn duplicate vocabulary entries — every
  * hash-keyed operator upstream of this file quietly depends on a
  * canonical byte form. Spark ships no normalizer function; this wraps
  * `java.text.Normalizer` (the JDK's Unicode-conformant NFC), which
  * DuckDB's `nfc_normalize` (utf8proc) matches byte-for-byte — the l35
  * oracle crosses engines on md5 of the normalized text.
  *
  * Fast path: a pure-ASCII string (numBytes == numChars — no
  * multi-byte sequences) is NFC by definition and returns the input
  * UTF8String untouched, no java.lang.String allocation; real corpora
  * are overwhelmingly ASCII so the scan is the common-case cost.
  * Codegen emits one static JIT-inlined call (the canary-covered
  * pattern — no inline loops for Janino to mis-parse).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize requires a string argument, got ${t.simpleString(10)}")
    }

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.NfcNormalize.nfc($s);")

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  def nfc(s: UTF8String): UTF8String = {
    // ASCII iff every code point is one byte; ASCII is closed under NFC
    if (s.numBytes == s.numChars) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str,
          java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(java.text.Normalizer.normalize(str,
        java.text.Normalizer.Form.NFC))
    }
  }
}
