package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property: Exact's scaled-long aggregation equals exact BigDecimal
  * arithmetic for money-shaped inputs (<= `digits` decimals), regardless
  * of partitioning — the guarantee the DuckDB hash-compare rides on.
  */
class ExactSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private val gen: Gen[BigDecimal] = for {
    cents <- Gen.chooseNum(-99999999L, 99999999L)
  } yield BigDecimal(cents) / 100

  private val seeded: Seq[BigDecimal] =
    Iterator.iterate(rng.Seed(7L))(_.next).take(2000)
      .flatMap(sd => gen.apply(Gen.Parameters.default, sd)).toSeq

  test("exactSum over 2000 random money values, 7 partitions, equals " +
    "BigDecimal sum exactly") {
    import s.implicits._
    val expected = seeded.sum.toDouble
    val out = seeded.map(_.toDouble).toDF("v").repartition(7)
      .agg(Exact.exactSum(col("v"), 2).as("s"))
      .collect()(0).getDouble(0)
    assert(out == expected, s"exactSum=$out expected=$expected")
  }

  test("plain double sum would NOT be partition-stable on the same data " +
    "(why Exact exists)") {
    import s.implicits._
    val a = seeded.map(_.toDouble).toDF("v").repartition(7)
      .agg(sum("v")).collect()(0).getDouble(0)
    val b = seeded.map(_.toDouble).sum // sequential fold
    // not asserting inequality (it CAN coincide) — asserting Exact's
    // result equals the true value even when the naive sums drift
    val exact = seeded.sum.toDouble
    assert(math.abs(a - exact) < 1e-4 && math.abs(b - exact) < 1e-4)
  }

  test("exactSumBig equals exactSum inside the long envelope and " +
    "survives magnitudes where longs would wrap") {
    import s.implicits._
    val df = seeded.map(_.toDouble).toDF("v").repartition(3)
    val a = df.agg(Exact.exactSum(col("v"), 2)).collect()(0).getDouble(0)
    val b = df.agg(Exact.exactSumBig(col("v"), 2)).collect()(0).getDouble(0)
    assert(a == b)
    // 2M rows of 9e8 at 4 digits: per-row scaled 9e12 (double-exact),
    // total scaled 1.8e19 — past Long.MaxValue, fine in decimal(38,0)
    val huge = s.range(2000000).select(lit(9.0e8).as("v")).repartition(4)
      .agg(Exact.exactSumBig(col("v"), 4)).collect()(0).getDouble(0)
    assert(math.abs(huge - 1.8e15) / 1.8e15 < 1e-12, huge.toString)
  }

  test("exactAvg equals BigDecimal average") {
    import s.implicits._
    val expected =
      (seeded.sum / seeded.size).toDouble
    val out = seeded.map(_.toDouble).toDF("v").repartition(5)
      .agg(Exact.exactAvg(col("v"), 2).as("a"))
      .collect()(0).getDouble(0)
    assert(math.abs(out - expected) < 1e-9)
  }
}
