package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class DomainMixSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  // Independent reimplementation of the integer update (no shared code
  // with the operator beyond the constants).
  private def refWeights(ex: Seq[(String, Long, Long)], iters: Int,
                         etaMilli: Long, uniformPct: Long)
      : Map[String, Long] = {
    val S = DomainMix.Scale
    val k = ex.length.toLong
    val c = S * uniformPct / 100L
    val sorted = ex.sortBy(_._1)
    val exm = sorted.map { case (_, nTok, sumEx) =>
      1000L * sumEx / nTok }
    var w = sorted.map(_ => S / k)
    for (_ <- 1 to iters) {
      val tmp = w.zip(exm).map { case (wd, e) =>
        wd * (1000L + etaMilli * e / 1000L) }
      val sum = tmp.sum
      w = tmp.map(t => (S - c) * t / sum + c / k)
    }
    sorted.map(_._1).zip(w).toMap
  }

  test("domainExcess: hand-computed bitlen excess on a two-domain " +
    "corpus; specialist-favoring tokens clip at zero") {
    import s.implicits._
    // domain A: 'x' * 6; domain B: 'x' * 1 + 'y' * 1.
    // Global: c(x)=7, c(y)=1, T=8 -> bits_g(x)=4-3=1, bits_g(y)=4-1=3.
    // A: c_A(x)=6, T_A=6 -> bits_A(x) = 3-3 = 0 -> excess(x in A) = 1.
    // B: c_B(x)=1, c_B(y)=1, T_B=2 -> bits_B = 2-1 = 1 for both
    //   -> excess(x in B) = max(0, 1-1) = 0; excess(y in B) = 3-1 = 2.
    val docs = Seq(
      ("A", "x x x x x x"),
      ("B", "x y")).toDF("source", "text")
    val got = DomainMix.domainExcess(docs, "text", "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("A") == ((6L, 6L, 1000L)), got("A").toString)
    assert(got("B") == ((2L, 2L, 1000L)), got("B").toString)
  }

  test("domainWeights: matches the independent integer reference, " +
    "high-excess domains gain, smoothing floors every weight, " +
    "weights sum to ~Scale") {
    import s.implicits._
    // three domains with very different generalist-vs-specialist gaps:
    // C's vocabulary is domain-unique (huge excess), A dominates the
    // global model (near-zero excess)
    val docs = Seq.tabulate(40)(i => ("A", "alpha beta gamma delta")) ++
      Seq.tabulate(8)(i => ("B", s"alpha mix$i beta")) ++
      Seq.tabulate(4)(i => ("C", s"uniq${i}a uniq${i}b uniq${i}c"))
    val df = docs.toDF("source", "text")
    val iters = 12
    val got = DomainMix.domainWeights(df, "text", "source", iters)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    val ref = refWeights(
      got.toSeq.map { case (d, (n, se, _)) => (d, n, se) },
      iters, 100L, 2L)
    for ((d, (_, _, w)) <- got)
      assert(w == ref(d), s"domain $d: $w != ref ${ref(d)}")
    assert(got("C")._3 > got("A")._3,
      "the high-excess domain must out-weigh the generalist-covered one")
    val k = got.size.toLong
    val floor = DomainMix.Scale * 2L / 100L / k
    assert(got.values.forall(_._3 >= floor), "uniform smoothing floor")
    val total = got.values.map(_._3).sum
    assert(total <= DomainMix.Scale &&
      total >= DomainMix.Scale - 3 * k, s"sum $total")
    // partition invariance of the distributed pass
    val got2 = DomainMix.domainWeights(df.repartition(13), "text",
      "source", iters).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(got2 == got.map { case (d, (_, _, w)) => d -> w })
  }

  test("domainWeights: an empty corpus fails loudly at the call site, " +
    "not with a bare /-by-zero in the weight loop") {
    import s.implicits._
    val empty = Seq.empty[(String, String)].toDF("source", "text")
    val e = intercept[IllegalArgumentException] {
      DomainMix.domainWeights(empty, "text", "source", iters = 3)
    }
    assert(e.getMessage.contains("no domains"), e.getMessage)
    // all-blank docs tokenize to zero tokens -> same guard fires
    val blank = Seq(("A", " "), ("B", "")).toDF("source", "text")
    val e2 = intercept[IllegalArgumentException] {
      DomainMix.domainWeights(blank, "text", "source", iters = 3)
    }
    assert(e2.getMessage.contains("no domains"), e2.getMessage)
  }
}
