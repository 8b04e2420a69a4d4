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

  test("an interval spanning many buckets still matches exactly once " +
    "per point") {
    import s.implicits._
    val pts = (0L until 100L).map(p => (p, p)).toDF("pid", "p")
    val ivs = Seq((1L, 0L, 99L)).toDF("iid", "st", "en")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "st", "en", 3L)
    assert(got.count() == 100L, "no duplicate matches from the explode")
  }
}
