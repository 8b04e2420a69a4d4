package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class QuantilesSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def check(rows: Seq[(Long, Long)], k: Long,
                    buckets: Int = 16): Unit = {
    import s.implicits._
    val df = rows.toDF("id", "v").repartition(5)
    val got = Quantiles.kthLargest(df, "v", "id", k, buckets)
    val expect = rows.map { case (id, v) => (v, id) }
      .sortBy { case (v, id) => (-v, id) }.apply((k - 1).toInt)
    assert(got == expect, s"k=$k: got $got expect $expect")
    val kept = df.filter(Quantiles.keepTopK("v", "id", got))
      .collect().map(r => (r.getLong(1), r.getLong(0))).toSet
    val keptRef = rows.map { case (id, v) => (v, id) }
      .sortBy { case (v, id) => (-v, id) }.take(k.toInt).toSet
    assert(kept == keptRef, s"k=$k keep-set diverged")
    assert(kept.size == k, "exactly k rows kept")
  }

  test("kthLargest: exact order statistic with id tie-break on random " +
    "data, dense ties, all-equal, k=1 and k=n edges") {
    val rnd = new scala.util.Random(123L)
    // dense ties: values drawn from a tiny domain
    val dense = (0L until 200L).map(i => i -> (rnd.nextInt(7) + 10L))
    for (k <- Seq(1L, 2L, 19L, 100L, 199L, 200L)) check(dense, k)
    // adversarial: every value equal -> selection is purely id order
    val equal = (0L until 50L).map(i => i -> 42L)
    for (k <- Seq(1L, 25L, 50L)) check(equal, k)
    // spread values, no ties
    val spread = rnd.shuffle((0L until 300L).toVector)
      .zipWithIndex.map { case (v, i) => i.toLong -> v * 17L }
    for (k <- Seq(1L, 150L, 300L)) check(spread, k)
  }

  test("kthLargest: 63-bit domain needs multiple narrowing passes and " +
    "stays exact; tiny bucket counts stress the recursion") {
    val rnd = new scala.util.Random(77L)
    val wide = (0L until 500L).map(i =>
      i -> (rnd.nextLong() & Long.MaxValue))
    for (k <- Seq(1L, 7L, 250L, 500L); b <- Seq(4, 64))
      check(wide, k, buckets = b)
  }

  test("kthLargest rejects k out of range") {
    import s.implicits._
    val df = Seq((1L, 5L), (2L, 6L)).toDF("id", "v")
    intercept[IllegalArgumentException] {
      Quantiles.kthLargest(df, "v", "id", 3L)
    }
    intercept[IllegalArgumentException] {
      Quantiles.kthLargest(df, "v", "id", 0L)
    }
  }
}
