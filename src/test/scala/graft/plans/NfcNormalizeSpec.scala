package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** All non-ASCII fixture text is written as unicode ESCAPES: the whole
  * point is the distinction between composed and decomposed forms, and
  * literal characters in source survive neither editors nor review.
  */
class NfcNormalizeSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("nfc_normalize recomposes decomposed sequences, reorders " +
    "combining marks canonically, is identity on ASCII and " +
    "already-NFC text, and preserves nulls") {
    import s.implicits._
    val rows = Seq(
      "plain ascii stays",       // ASCII fast path
      "cafe\u0301",              // e + combining acute -> \u00E9
      "nai\u0308ve",             // i + combining diaeresis -> \u00EF
      "caf\u00E9",               // already composed: identity
      "A\u030A",                 // A + combining ring -> \u00C5
      "d\u0307\u0323",           // dot-above before dot-below: NFC must
                                 // reorder (class 220 < 230) then compose
      "")
    val got = rows.toDF("t")
      .select(expr("nfc_normalize(t)").as("n")).collect()
      .map(_.getString(0))
    val want = rows.map(java.text.Normalizer
      .normalize(_, java.text.Normalizer.Form.NFC))
    assert(got.toSeq == want)
    // the reorder case really changed something (guards a vacuous pin)
    assert(want(5) != rows(5))
    val n = Seq[Option[String]](None).toDF("t")
      .select(expr("nfc_normalize(t)")).head()
    assert(n.isNullAt(0))
  }

  test("nfc_normalize participates in whole-stage codegen") {
    val plan = s.range(0L, 4L)
      .select(expr("nfc_normalize(CAST(id AS STRING))").as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [nfc_normalize"), plan)
  }

  test("unicodeClean strips zero-width and control characters, counts " +
    "them, and flags recomposition") {
    import s.implicits._
    val df = Seq(
      (1L, "a\u200Bb\u0001c"), // two invisibles, no recompose
      (2L, "cafe\u0301"),       // recompose only
      (3L, "clean"))            // untouched
      .toDF("id", "t")
    val out = graft.operators.TextAnalysis.unicodeClean(df, "id", "t")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == (("abc", 2L, false)))
    assert(out(2L) == (("caf\u00E9", 0L, true)))
    assert(out(3L) == (("clean", 0L, false)))
  }
}
