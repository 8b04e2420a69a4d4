package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** HLL-sketch incremental distinct counting: tolerance vs exact,
  * invariance to partitioning/order (the mergeability contract), and
  * the append-only standing-state form.
  */
class DistinctSketchSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  /** (tick, key) rows: keys overlap heavily across ticks so the
    * cumulative union differs from the per-tick sum. */
  private def fixture(nTicks: Int, perTick: Int, keySpace: Int) = {
    import s.implicits._
    val rnd = new scala.util.Random(7)
    (1 to nTicks).flatMap { t =>
      Seq.fill(perTick)((t.toLong, rnd.nextInt(keySpace).toLong))
    }.toDF("tick", "k")
  }

  test("certifiedCumulative: every tick within 5% of exact, exact_cum " +
    "IS exact, and the verdict frame is invariant to partitioning") {
    val df = fixture(nTicks = 8, perTick = 4000, keySpace = 10000)
    val got = DistinctSketch.certifiedCumulative(df, "tick", "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(got.length == 8)
    assert(got.forall(_._3), s"some tick missed tolerance: ${got.toSeq}")
    // independent exact recompute
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    val wantCum = (1 to 8).map { t =>
      rows.filter(_._1 <= t).map(_._2).distinct.length.toLong
    }
    assert(got.map(_._2).toSeq == wantCum, "exact_cum must be exact")
    // monotone non-decreasing by construction
    assert(got.sliding(2).forall(p => p(0)._2 <= p(1)._2))
    // partitioning invariance: registers fold by max — any layout,
    // same sketch, same estimate, same verdicts
    for (parts <- Seq(1, 13)) {
      val again = DistinctSketch
        .certifiedCumulative(df.repartition(parts), "tick", "k")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
        .sortBy(_._1)
      assert(again.toSeq == got.toSeq, s"parts=$parts drifted")
    }
  }

  test("mergeability: union of per-partition sketches == one whole-" +
    "corpus sketch, estimate-identical") {
    import s.implicits._
    val df = fixture(nTicks = 1, perTick = 20000, keySpace = 50000)
    val whole = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("k"), lit(12))))
      .collect()(0).getLong(0)
    // shard by an arbitrary function of the key, sketch each shard,
    // union the shard sketches — the distributed plan in miniature
    val sharded = df.withColumn("shard", pmod(col("k"), lit(7)))
      .groupBy("shard").agg(hll_sketch_agg(col("k"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
      .collect()(0).getLong(0)
    assert(whole == sharded,
      "register-max merge must equal the single-pass sketch")
  }

  test("appendTick: the standing table built by per-day appends equals " +
    "the rebuilt-from-scratch cumulative at every prefix, without " +
    "rescanning history") {
    val df = fixture(nTicks = 6, perTick = 3000, keySpace = 8000)
    val sketches = DistinctSketch.tickSketches(df, "tick", "k").cache()
    sketches.count()
    // backfill ticks 1..3, then append 4, 5, 6 one at a time
    var standing = DistinctSketch.standingFromSketches(
      sketches.filter(col("tick") <= 3)).localCheckpoint(true)
    for (t <- 4 to 6) {
      standing = DistinctSketch.appendTick(standing,
        sketches.filter(col("tick") === t)).localCheckpoint(true)
    }
    val appended = standing
      .select(col("tick"), hll_sketch_estimate(col("cum_sk")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rebuilt = DistinctSketch.cumulativeEstimates(sketches)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(appended == rebuilt,
      s"append-built standing state drifted: $appended vs $rebuilt")
    sketches.unpersist(blocking = false)
  }
}
