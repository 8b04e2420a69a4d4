package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The plan-shape golden gate (round-15 verdict item 3): every query
  * in [[PlanGolden.goldens]] must fingerprint EXACTLY as committed.
  * A failure here is a deterministic plan regression (new exchange,
  * join-strategy flip, window collapse, codegen-span split) that the
  * wall-clock bench would only catch noisily — or an intentional
  * change that must be regenerated via `runMain
  * graft.tools.PlanGoldenGen` and justified in the commit.
  */
class PlanGoldenSpec extends AnyFunSuite {
  private val s = TestSpark.spark

  test("slowest-queries plan fingerprints match the committed goldens") {
    val drift = PlanGolden.goldens.toSeq.sortBy(_._1).flatMap {
      case (name, want) =>
        val got = PlanFingerprint.forQuery(s, name, PlanGolden.sfDir)
        if (got == want) None
        else Some(s"$name:\n  want ${PlanFingerprint.render(want)}" +
          s"\n  got  ${PlanFingerprint.render(got)}")
    }
    assert(drift.isEmpty,
      "plan fingerprints drifted (regenerate via PlanGoldenGen if " +
        "intentional):\n" + drift.mkString("\n"))
  }
}
