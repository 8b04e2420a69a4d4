package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hand-computed pin of the composed ingest flow on a 5-doc fixture —
  * the l28 registry entry certifies the composition against DuckDB at
  * the gate SF; this spec pins the SEMANTICS small enough to verify by
  * hand (who is dropped, which positions are cut, who fits the budget,
  * which split the LCG lands on).
  *
  * Fixture walkthrough: standing = {1: w1..w10, 2: x1..x8}; batch =
  * {101: copy of 1 (exact dup -> dropped at stage 1), 102: x1..x8 y1 y2
  * (survives; its 8-gram window [x1..x8] also lives in standing doc 2,
  * so positions 1-8 are cut -> clean "y1 y2"), 134: z1..z9 (unique ->
  * intact)}. Quality (distinct clean tokens): 134 = 9, 102 = 2. Splits:
  * two-round LCG bucket of 134 is 83 -> 'val'; of 102 is 25 ->
  * 'train'.
  */
class IngestPipelineSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("composed ingest: exact-dup batch doc dropped, spans shared with " +
    "the standing corpus cut, quota ranks the CLEANED text, splits " +
    "land on the deterministic LCG buckets") {
    import s.implicits._
    val standing = Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (2L, "x1 x2 x3 x4 x5 x6 x7 x8")).toDF("doc_id", "text")
    val batch = Seq(
      (101L, "s", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (102L, "s", "x1 x2 x3 x4 x5 x6 x7 x8 y1 y2"),
      (134L, "s", "z1 z2 z3 z4 z5 z6 z7 z8 z9"))
      .toDF("doc_id", "source", "text")
    def run(budget: Long): Set[(String, String, Long, Long, Long)] =
      IngestPipeline.run(standing, batch, "doc_id", "text", "source",
          spanN = 8, budgetPerSource = budget, trainPct = 80, valPct = 10)
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet

    // budget 9: only 134 (quality 9, cum 9) fits; 102 (cum 11) dropped
    assert(run(9L) == Set(("s", "val", 1L, 9L, 0L)))
    // budget 11: both fit — 102 arrives span-cut (2 clean tokens, 8
    // positions removed) in 'train', 134 intact in 'val'
    assert(run(11L) == Set(
      ("s", "val", 1L, 9L, 0L),
      ("s", "train", 1L, 2L, 8L)))
  }
}
