package graft.functions

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KmvSketchSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("KMV sketch: deterministic across partitionings, exact below k, " +
    "within 15% above k") {
    import s.implicits._
    val sketch = new KmvSketch(256).toColumn.name("est")

    // exact regime: fewer distinct values than k
    val small = s.range(100).map(_ % 40).repartition(7)
    assert(small.select(sketch).collect()(0) == 40.0)

    // estimate regime: 5000 distinct values, k=256
    val big = s.range(5000).map(_.toLong)
    val est3 = big.repartition(3).select(sketch).collect()(0)
    val est11 = big.repartition(11).select(sketch).collect()(0)
    assert(est3 == est11, "merge must be partition-order independent")
    val relErr = math.abs(est3 - 5000.0) / 5000.0
    assert(relErr < 0.15, s"estimate $est3 relErr $relErr")
  }

  test("KMV merge ignores duplicates (set semantics)") {
    import s.implicits._
    val dupped = s.range(1000).flatMap(x => Seq(x % 30, x % 30))
      .repartition(5)
    assert(dupped.select(new KmvSketch(64).toColumn.name("e"))
      .collect()(0) == 30.0)
  }
}
