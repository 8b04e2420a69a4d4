package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DsirSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  // target docs speak vocab A, raw-only docs vocab B, plus one mixed
  // doc and one empty doc
  private def corpus = {
    import s.implicits._
    val tgt = (1L to 8L).map(i => (i, "alpha beta gamma alpha", true))
    val raw = (11L to 18L).map(i => (i, "zeta eta theta zeta", false))
    val mixed = Seq((30L, "alpha zeta", false), (31L, "", false))
    (tgt ++ raw ++ mixed).toDF("doc_id", "text", "is_tgt")
  }

  private def run(parts: Int, topK: Int = 9) =
    Dsir.importanceResample(corpus.repartition(parts), "doc_id", "text",
        targetPred = col("is_tgt"), buckets = 512, topK = topK)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))))
      .toMap

  test("target-vocab docs outscore raw-only docs per token; the mixed " +
    "doc lands between; empty docs score 0 and are never kept") {
    val got = run(4)
    val tgtAvg = (1L to 8L).map(got(_)._3)
    val rawAvg = (11L to 18L).map(got(_)._3)
    assert(tgtAvg.min > got(30L)._3,
      "pure target vocab beats the mixed doc")
    assert(got(30L)._3 > rawAvg.max,
      "the mixed doc beats pure raw vocab")
    assert(got(31L) == ((0L, 0L, 0.0d, 0L)),
      "empty doc: 0 tokens, 0 score, drop")
    // topK=9: all 8 target docs + the mixed doc survive, raw docs don't
    assert((1L to 8L).forall(got(_)._4 == 1L) && got(30L)._4 == 1L)
    assert((11L to 18L).forall(got(_)._4 == 0L))
  }

  test("bit-deterministic under any partitioning") {
    val want = run(1)
    assert(run(7) == want && run(13) == want)
  }

  test("tie-break at the k boundary is by doc id ascending") {
    // 8 identically-scored target docs, topK = 3 -> the 3 smallest ids
    val got = run(4, topK = 3)
    assert((1L to 3L).forall(got(_)._4 == 1L))
    assert((4L to 8L).forall(got(_)._4 == 0L))
  }
}
