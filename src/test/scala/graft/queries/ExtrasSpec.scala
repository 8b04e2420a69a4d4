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

  test("approx_percentile (the 100 TB one-pass path) lands within 2% of " +
    "the exact percentiles x12 computes") {
    import org.apache.spark.sql.functions._
    val exact = Registry.queries("x12_percentiles")(s, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val approx = graft.core.Tables.orders(s, sf)
      .groupBy("o_orderpriority").agg(
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("p50"),
        expr("approx_percentile(o_totalprice, 0.9, 10000)").as("p90"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(exact.keySet == approx.keySet && exact.nonEmpty)
    exact.foreach { case (k, (e50, e90)) =>
      val (a50, a90) = approx(k)
      assert(math.abs(a50 - e50) / e50 < 0.02, s"$k p50 $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 < 0.02, s"$k p90 $a90 vs $e90")
    }
  }

  test("x12p histogram-quantile sketch: each estimate's bucket brackets " +
    "the exact global percentile within one bucket width") {
    import org.apache.spark.sql.functions._
    val est = Registry.queries("x12p_histogram_quantiles")(s, sf).collect()
      .map(r => r.getAs[Double]("q") -> r.getAs[Double]("est_lo")).toMap
    assert(est.keySet == Set(0.5, 0.9, 0.99))
    val exact = graft.core.Tables.orders(s, sf)
      .agg(expr("percentile(o_totalprice, array(0.5, 0.9, 0.99))"))
      .collect()(0).getSeq[Double](0)
    Seq(0.5, 0.9, 0.99).zip(exact).foreach { case (q, ex) =>
      val lo = est(q)
      assert(lo <= ex && ex < lo + 2 * 6000.0,
        s"q=$q est_lo=$lo exact=$ex outside bucket envelope")
    }
  }

  test("x12p bucket pick matches a brute-force cumulative scan " +
    "(including the exact cum == q*N boundary rule)") {
    val vals = graft.core.Tables.orders(s, sf)
      .select("o_totalprice").collect().map(_.getDouble(0))
    val hist = vals.groupBy(v => math.floor(v / 6000.0).toLong)
      .map { case (b, xs) => b -> xs.length.toLong }.toSeq.sortBy(_._1)
    val n = vals.length.toLong
    def pick(q: Double): Long = {
      var cum = 0L
      hist.foreach { case (b, c) =>
        cum += c
        if (cum.toDouble >= q * n) return b
      }
      hist.last._1
    }
    val got = Registry.queries("x12p_histogram_quantiles")(s, sf)
      .collect().map(r => r.getAs[Double]("q") ->
        (r.getAs[Long]("bucket"), r.getAs[Long]("n_total"))).toMap
    Seq(0.5, 0.9, 0.99).foreach { q =>
      assert(got(q) == ((pick(q), n)), s"q=$q")
    }
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
