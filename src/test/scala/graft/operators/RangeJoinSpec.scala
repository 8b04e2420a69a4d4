package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class RangeJoinSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def fixture() = {
    import s.implicits._
    val rnd = new scala.util.Random(3)
    // negative and positive points, so floor-division bucketing is
    // exercised on both sides of zero
    val pts = Seq.fill(400)(rnd.nextInt(2000).toLong - 1000L)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("pid", "p")
    val ivs = Seq.tabulate(60) { i =>
      val st = rnd.nextInt(1900).toLong - 1000L
      (i.toLong, st, st + rnd.nextInt(120).toLong)
    } ++ Seq(
      (900L, 5L, 5L),    // degenerate point interval
      (901L, 10L, 3L))   // empty (end < start): must be dropped
    (pts, ivs.toDF("iid", "st", "en"))
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("pid", "iid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("bucketized range join equals the naive BETWEEN join at any " +
    "bucket width, including point and empty intervals and negative " +
    "domains") {
    val (pts, ivs) = fixture()
    val naive = pairs(pts.join(ivs,
      col("p") >= col("st") && col("p") <= col("en")))
    assert(naive.nonEmpty, "fixture must produce matches")
    for (w <- Seq(1L, 7L, 100L, 10000L)) {
      val got = pairs(RangeJoin.pointInInterval(pts, ivs, "p", "st",
        "en", bucketWidth = w))
      assert(got == naive, s"bucketWidth=$w")
    }
  }

  test("the bucketized plan is an equi-join — no nested-loop, no " +
    "cartesian — where the naive predicate plans a " +
    "BroadcastNestedLoopJoin") {
    val (pts, ivs) = fixture()
    val naivePlan = pts.join(ivs,
        col("p") >= col("st") && col("p") <= col("en"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"),
      s"the naive form should be the bad plan:\n${naivePlan.take(400)}")
    val bucketed = RangeJoin.pointInInterval(pts, ivs, "p", "st", "en",
      bucketWidth = 50L)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"bucketized form must be an equi-join:\n${plan.take(800)}")
  }

  test("salting and interval-broadcast change the plan, never the " +
    "result; the broadcast form really is a broadcast join") {
    val (pts, ivs) = fixture()
    val base = pairs(RangeJoin.pointInInterval(pts, ivs, "p", "st",
      "en", bucketWidth = 50L))
    for (salt <- Seq(2, 8)) {
      assert(pairs(RangeJoin.pointInInterval(pts, ivs, "p", "st", "en",
        bucketWidth = 50L, salt = salt)) == base, s"salt=$salt")
    }
    val bc = RangeJoin.pointInInterval(pts, ivs, "p", "st", "en",
      bucketWidth = 50L, broadcastIntervals = true)
    assert(pairs(bc) == base)
    assert(bc.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    assert(pairs(RangeJoin.pointInInterval(pts, ivs, "p", "st", "en",
      bucketWidth = 50L, salt = 4, broadcastIntervals = true)) == base)
  }

  test("exact bucketing above 2^53: an epoch-nanos domain (~2^60) " +
    "joins identically to the naive BETWEEN join on bucket edges " +
    "where double division mis-buckets") {
    import s.implicits._
    val W = 3600L * 1000000000L // one hour of nanoseconds
    val base = (1L << 60) / W * W // bucket-aligned start near 2^60
    // at this magnitude doubles step by 256 ns, so a point 1 ns below a
    // bucket boundary rounds ONTO the boundary — the self-check pins
    // that the fixture really exercises the failure mode
    assert((0L until 40L).exists { k =>
      val p = base + k * W - 1
      math.floor(p.toDouble / W.toDouble).toLong != Math.floorDiv(p, W)
    }, "fixture must include a point double division mis-buckets")
    val pts = (0L until 40L).flatMap { k =>
      val b0 = base + k * W
      Seq(b0 - 1, b0, b0 + 1, b0 + W / 2)
    }.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
    val ivs = (0L until 40L by 3L).map { k =>
      (k, base + k * W, base + (k + 2) * W - 1)
    }.toDF("iid", "st", "en")
    val naive = pairs(pts.join(ivs,
      col("p") >= col("st") && col("p") <= col("en")))
    assert(naive.nonEmpty, "fixture must produce matches")
    val got = pairs(RangeJoin.pointInInterval(pts, ivs, "p", "st", "en",
      bucketWidth = W))
    assert(got == naive)
  }

  test("AutoSalt equals the manual result; the chosen factor splits a " +
    "single-hot-bucket fixture and stays 1 for an already-spread one") {
    val (pts, ivs) = fixture()
    val base = pairs(RangeJoin.pointInInterval(pts, ivs, "p", "st",
      "en", bucketWidth = 50L))
    assert(pairs(RangeJoin.pointInInterval(pts, ivs, "p", "st", "en",
      bucketWidth = 50L, salt = RangeJoin.AutoSalt)) == base)
    import s.implicits._
    // 5000 events in one day-bucket (many sharing a timestamp — the
    // value-hash trap): live=1 bucket, so auto must split
    val rnd = new scala.util.Random(11)
    val hot = Seq.tabulate(5000)(i => (i.toLong, rnd.nextInt(50).toLong))
      .toDF("pid", "p")
    assert(RangeJoin.chooseSalt(hot, "p", 86400L) > 1)
    // 400 points over ~40 live buckets at width 50 on [-1000, 1000]:
    // parallelism target is already covered, salt must stay small
    val spread = RangeJoin.chooseSalt(pts, "p", 50L)
    assert(spread >= 1 && spread <= 64)
  }

  test("salting tolerates unhashable payload columns (a map-typed " +
    "column must not break the row-hash) and AutoSalt stands down " +
    "under broadcastIntervals") {
    import s.implicits._
    val (pts0, ivs) = fixture()
    val pts = pts0.withColumn("payload",
      map(lit("k"), col("p"))) // xxhash64 rejects MapType
    val base = pairs(RangeJoin.pointInInterval(pts0, ivs, "p", "st",
      "en", bucketWidth = 50L))
    assert(pairs(RangeJoin.pointInInterval(pts, ivs, "p", "st", "en",
      bucketWidth = 50L, salt = 4)) == base)
    // AutoSalt + broadcast: result equal, and the plan carries no
    // interval replication (no sequence over salts on the build side)
    val bc = RangeJoin.pointInInterval(pts0, ivs, "p", "st", "en",
      bucketWidth = 50L, salt = RangeJoin.AutoSalt,
      broadcastIntervals = true)
    assert(pairs(bc) == base)
    assert(bc.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
  }

  test("an interval spanning many buckets still matches exactly once " +
    "per point") {
    import s.implicits._
    val pts = (0L until 100L).map(p => (p, p)).toDF("pid", "p")
    val ivs = Seq((1L, 0L, 99L)).toDF("iid", "st", "en")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "st", "en", 3L)
    assert(got.count() == 100L, "no duplicate matches from the explode")
  }
}
