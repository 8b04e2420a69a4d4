package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.scalatest.funsuite.AnyFunSuite

/** Direct unit pins for the round-10 ordering hardening: UTF-8
  * (code-point) tie-breaks for String doc ids and NaN-total-order score
  * comparison. The end-to-end ranking behavior is pinned by
  * TextAnalysisSpec (batch == single-query, bit-exact); these tests pin
  * the two edge cases the advice called out, which the gate corpus
  * never exercises.
  */
class BoundedTopKSpec extends AnyFunSuite {

  test("codePointOrdering sorts supplementary-plane strings in UTF-8 " +
    "byte order where Ordering[String] (UTF-16 code units) disagrees") {
    val emoji = "😀" // U+1F600, surrogate pair
    val fffd = "�"        // U+FFFD, single BMP code unit
    // UTF-16 code-unit order: the high surrogate 0xD83D sorts BELOW
    // 0xFFFD; code-point (== UTF-8 byte) order is the reverse
    assert(Ordering.String.lt(emoji, fffd))
    assert(BoundedTopK.codePointOrdering.gt(emoji, fffd),
      "code-point order must rank U+1F600 above U+FFFD")
    // agreement on plain BMP strings, prefixes, and equality
    assert(BoundedTopK.codePointOrdering.lt("abc", "abd"))
    assert(BoundedTopK.codePointOrdering.lt("ab", "abc"))
    assert(BoundedTopK.codePointOrdering.equiv("täst", "täst"))
    // a prefix of a supplementary string still sorts first
    assert(BoundedTopK.codePointOrdering.lt("a", "a" + emoji))
  }

  test("NaN scores cannot break the sort contract and rank as greatest " +
    "(Double.compare total order)") {
    val agg = new BoundedTopK[Long](3)
    var buf = agg.zero
    // two NaN entries among 200 distinct finite-scored docs: the slack
    // (64) forces repeated compaction sorts WITH NaN in the buffer —
    // the case where a non-total comparator throws or misorders
    buf = agg.reduce(buf, TopDoc(Double.NaN, 900L, 0L, 0L))
    (0 until 200).foreach { i =>
      buf = agg.reduce(buf, TopDoc(i.toDouble, i.toLong, 0L, 0L))
    }
    val other = {
      var b = agg.zero
      b = agg.reduce(b, TopDoc(Double.NaN, 901L, 0L, 0L))
      (200 until 260).foreach { i =>
        b = agg.reduce(b, TopDoc(-1.0, i.toLong, 0L, 0L))
      }
      b
    }
    val out = agg.finish(agg.merge(buf, other))
    assert(out.length == 3)
    // NaN sorts greatest under Double.compare (doc asc on the tie),
    // then the highest finite score
    assert(out.map(_.doc) == Seq(900L, 901L, 199L), out.toString)
  }

  test("exactness: finish returns the true top-k under heavy compaction " +
    "pressure with deterministic doc tie-breaks") {
    val agg = new BoundedTopK[String](5)
    var buf = agg.zero
    // 500 entries, scores collide in groups of 10 -> ties broken by doc
    (0 until 500).foreach { i =>
      buf = agg.reduce(buf, TopDoc((i / 10).toDouble, f"d$i%03d", 0L, 0L))
    }
    val out = agg.finish(buf)
    assert(out.map(_.doc) ==
      Seq("d490", "d491", "d492", "d493", "d494"))
  }
}
