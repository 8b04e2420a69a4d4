package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ExtrasSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct lands within 5% of exact") {
    val row = Registry.queries("x5_approx_distinct")(s, sf).collect()(0)
    val (approx, exact) = (row.getLong(0), row.getLong(1))
    assert(exact > 0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.05, s"approx=$approx exact=$exact relErr=$relErr")
  }

  test("sessionization: session counts are positive and bounded by events") {
    val rows = Registry.queries("x1_sessionize")(s, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nSess, nEv) = (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))
      assert(nSess >= 1 && nSess <= nEv)
    }
  }
}
