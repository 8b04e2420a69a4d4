package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The streaming fixed-n span index
  * ([[StreamOps.dupSpanIndexForeachBatch]]) — RISKS row 15's
  * between-releases policy as an operator. The l78 oracle certifies
  * the at-arrival flag semantics end-to-end at the gate SF; this spec
  * pins the mechanics on a hand-built corpus: per-batch flags equal
  * the one-shot [[graft.operators.Dedup.dupSpanRemoval]] over
  * (standing ∪ batch) RESTRICTED to the batch (the at-arrival
  * definition), retries are byte-identical after compaction subsumed
  * the batch's delta, and the tiered compaction cadence keeps the
  * listed dirs bounded without changing any flag.
  */
class DupSpanIndexSpec extends AnyFunSuite {
  private val s = TestSpark.spark
  import s.implicits._

  private val span = "w1 w2 w3 w4" // the shared 4-token window
  private val batches: Seq[Seq[(Long, String)]] = Seq(
    Seq((1L, s"$span a b c"), // introduces the span
      (2L, "x1 x2 x3 x4 x5")),
    Seq((10L, s"p q $span r"), // dup of batch-0 standing span
      (11L, "y1 y2 y3 y4 y5"),
      (12L, "z1 z2 z3 z4"), (13L, s"k $span"), // within-batch pair?
      (14L, "u1 u2 u3")), // too short for n=4? 3 < 4 — zero grams
    Seq((20L, s"$span $span"), // self-overlap + standing dup
      (21L, "y1 y2 y3 y4 y5"))) // dup of batch-1 doc 11's window

  test("at-arrival flags equal the one-shot operator over " +
    "standing∪batch restricted to the batch; retry after compaction " +
    "is byte-identical; dirs stay bounded") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_spanidx").toString
    val sink = StreamOps.dupSpanIndexForeachBatchTiered(
      s"$root/index", s"$root/flags", "doc_id", "text", n = 4,
      maxDeltas = 2, hashedGramKeys = true, fanout = 2)

    def flags(path: String): Map[Long, (Long, Long, String)] =
      s.read.parquet(path).collect().map(r =>
        r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_dup_positions"),
          r.getAs[String]("clean_text")))).toMap

    var standing = Seq.empty[(Long, String)]
    batches.zipWithIndex.foreach { case (rows, i) =>
      sink(rows.toDF("doc_id", "text"), i.toLong)
      // one-shot reference: full dupSpanRemoval over everything seen
      // so far, restricted to this batch's docs — the at-arrival rule
      val cum = (standing ++ rows).toDF("doc_id", "text")
      val batchIds = rows.map(_._1).toSet
      val ref = graft.operators.Dedup
        .dupSpanRemoval(cum, "doc_id", "text", n = 4,
          hashedGramKeys = true)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dup_positions"),
            r.getAs[String]("clean_text")))).toMap
        .filter(kv => batchIds(kv._1))
      assert(flags(s"$root/flags/batch=$i") == ref,
        s"batch $i flags diverged from the at-arrival reference")
      standing ++= rows
    }
    // the semantics were actually exercised (non-vacuity)
    val f1 = flags(s"$root/flags/batch=1")
    assert(f1(10L)._2 == 4L, "standing dup must flag at arrival")
    assert(f1(11L)._2 == 0L, "unique doc must stay clean")
    assert(f1(14L)._2 == 0L, "sub-n doc has no windows")
    val f2 = flags(s"$root/flags/batch=2")
    assert(f2(21L)._2 > 0L, "dup of a BATCH-1 window must flag")
    assert(f2(20L)._1 == 8L && f2(20L)._3 == "",
      "all-duplicated doc must clean to ''")
    // batch-0's introduction stays clean (at-arrival, not global)
    assert(flags(s"$root/flags/batch=0")(1L)._2 == 0L)

    // compaction fired (maxDeltas=2 over 3 batches) and bounded dirs
    val dirs = new java.io.File(s"$root/index").listFiles()
      .map(_.getName).filter(_.startsWith("d=")).toSeq.sorted
    assert(dirs.exists(_.startsWith("d=c")),
      s"tiered compaction never fired: $dirs")
    assert(StreamOps.plainDeltaDirCount(s, s"$root/index") <= 2)

    // retry batch 1 — its delta long since consumed by a segment: the
    // recomputed flags must be byte-identical (standing read is
    // first_batch < 1 through the compacted segments)
    val before = flags(s"$root/flags/batch=1")
    sink(batches(1).toDF("doc_id", "text"), 1L)
    assert(flags(s"$root/flags/batch=1") == before,
      "post-compaction retry changed the at-arrival flags")
  }
}
