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

  test("KMV overlap: estimator path lands within 3-sigma tolerances on " +
    "a planted overlap; n<k path is exact; signatures are " +
    "partitioning-invariant") {
    import s.implicits._
    val k = 1024
    // planted: A = 0..39999, B = 30000..69999 -> |A|=|B|=40000,
    // union 70000, intersection 10000, jaccard 1/7
    val a = (0L until 40000L).toDF("v")
    val b = (30000L until 70000L).toDF("v")
    def sig(df: org.apache.spark.sql.DataFrame, parts: Int) =
      DistinctSketch.kminHashes(df.repartition(parts), col("v"), k)
    val est = DistinctSketch.overlapEstimate(sig(a, 4), sig(b, 9), k)
      .collect()(0)
    assert(!est.getBoolean(3), "must exercise the ESTIMATOR path")
    val (ej, eu, ei) =
      (est.getDouble(0), est.getDouble(1), est.getDouble(2))
    assert(math.abs(eu - 70000.0) <= 0.10 * 70000.0, s"union est $eu")
    assert(math.abs(ei - 10000.0) <= 0.12 * 70000.0, s"inter est $ei")
    assert(math.abs(ej - 1.0 / 7.0) <= 0.05, s"jaccard est $ej")
    // partitioning invariance: the k smallest distinct hashes are a
    // set property of the data
    val again = DistinctSketch.overlapEstimate(sig(a, 1), sig(b, 32), k)
      .collect()(0)
    assert((again.getDouble(0), again.getDouble(1), again.getDouble(2))
      == ((ej, eu, ei)), "signature must not depend on layout")
    // exact branch: under k total distinct values => exact numbers
    val sa = (0L until 300L).toDF("v")
    val sb = (200L until 500L).toDF("v")
    val ex = DistinctSketch.overlapEstimate(
      DistinctSketch.kminHashes(sa, col("v"), k),
      DistinctSketch.kminHashes(sb, col("v"), k), k).collect()(0)
    assert(ex.getBoolean(3), "under-k must take the exact branch")
    assert(ex.getDouble(1) == 500.0 && ex.getDouble(2) == 100.0 &&
      ex.getDouble(0) == 100.0 / 500.0)
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
