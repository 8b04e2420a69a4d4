package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MisraGriesSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  /** zipf-ish corpus: term_i appears ~ 2000/i times, i in 1..40 —
    * distinct (40) far above the sketch capacities used below, so the
    * reduce-eviction and merge-trim paths both fire.
    */
  private def zipfTokens: Seq[String] =
    (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"term_$i"))

  test("summary keeps every term above n/(capacity+1) and respects the " +
    "counter error bound, under any partitioning") {
    import s.implicits._
    val tokens = new scala.util.Random(7).shuffle(zipfTokens)
    val truth = tokens.groupBy(identity).map { case (t, xs) =>
      t -> xs.size.toLong }
    val n = tokens.size.toLong
    val cap = 12
    val bound = n / (cap + 1).toLong
    Seq(1, 7, 32).foreach { parts =>
      val buf = tokens.toDF("t").repartition(parts).as[String]
        .select(new MisraGries(cap).toColumn.name("s")).head()
      assert(buf.n == n, s"parts=$parts: total count must be exact")
      assert(buf.counts.size <= cap)
      truth.filter(_._2 > bound).foreach { case (t, c) =>
        assert(buf.counts.contains(t),
          s"parts=$parts: heavy term $t (freq $c > $bound) was dropped")
      }
      buf.counts.foreach { case (t, est) =>
        val c = truth(t)
        assert(est <= c && c <= est + bound,
          s"parts=$parts: counter $t=$est outside [${c - bound}, $c]")
      }
    }
  }

  test("exact regime: distinct terms <= capacity yields exact counters") {
    import s.implicits._
    val tokens = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(5)("c")
    val buf = new scala.util.Random(3).shuffle(tokens).toDF("t")
      .repartition(5).as[String]
      .select(new MisraGries(8).toColumn.name("s")).head()
    assert(buf.counts == Map("a" -> 50L, "b" -> 30L, "c" -> 5L))
    assert(buf.n == 85L)
  }

  test("heavyHitters output is the exact brute-force answer, invariant " +
    "to partitioning, with the sketch under trim pressure") {
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val docs = rnd.shuffle(zipfTokens).grouped(25).zipWithIndex
      .map { case (tk, i) => (i.toLong, tk.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    val phi = 0.05
    val tokens = zipfTokens
    val n = tokens.size.toLong
    val expected = tokens.groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
      .filter { case (_, c) => c.toDouble > phi * n.toDouble }
    assert(expected.nonEmpty && expected.size < 10,
      s"fixture should have a few true heavy hitters, got $expected")
    Seq(1, 32).foreach { parts =>
      val got = graft.operators.TextAnalysis.heavyHitters(
          docs.repartition(parts), "text", phi = phi, capacity = 19)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("heavyHitters rejects a phi below the sketch's guarantee line") {
    import s.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.heavyHitters(docs, "text",
        phi = 0.001, capacity = 99)
    }
  }
}
