package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultiContainsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  /** Brute-force overlapping occurrence count: for each pattern, probe
    * every start position — the semantics the oracle SQL mirrors.
    */
  private def brute(text: String, pats: Seq[String]): Long =
    pats.map { p =>
      (0 to text.length - p.length)
        .count(i => text.regionMatches(i, p, 0, p.length)).toLong
    }.sum

  test("documented semantics: overlaps, nested patterns, duplicates, " +
    "absent patterns, empty text") {
    def ac(pats: String*): AhoCorasick = new AhoCorasick(pats.toArray)
    assert(ac("aa").countMatches("aaaa") == 3L)
    assert(ac("table", "able").countMatches("table") == 2L)
    assert(ac("ab", "ab").countMatches("xabx") == 2L)
    assert(ac("zz").countMatches("aaa") == 0L)
    assert(ac("a").countMatches("") == 0L)
    // dictionary-suffix chain: "she" ends both "she" and "he"
    assert(ac("she", "he", "hers").countMatches("ushers") == 3L)
  }

  test("matches a brute-force reference on random texts over an " +
    "adversarial pattern set (shared prefixes, nesting, overlaps)") {
    val pats = Seq("ab", "abc", "bc", "c", "abab", "ba", "aabb")
    val rnd = new scala.util.Random(41)
    val ac = new AhoCorasick(pats.toArray)
    (1 to 200).foreach { _ =>
      val t = Vector.fill(rnd.nextInt(60))("abc" (rnd.nextInt(3))).mkString
      assert(ac.countMatches(t) == brute(t, pats), s"text=$t")
    }
  }

  test("automaton node ids above the Integer box cache (> 127 nodes) " +
    "still resolve failure links by VALUE") {
    // 80 distinct 3-char patterns -> ~240 trie nodes; a reference
    // comparison on boxed ids would corrupt fail links silently
    val rnd = new scala.util.Random(7)
    val pats = (0 until 80).map(i => f"p$i%02dx").distinct
    val ac = new AhoCorasick(pats.toArray)
    val hay = pats.mkString("", "", "p00x")
    assert(ac.countMatches(hay) == pats.length + 1L)
    (1 to 50).foreach { _ =>
      val t = Vector.fill(40)(pats(rnd.nextInt(pats.size))
        .charAt(rnd.nextInt(4))).mkString
      assert(ac.countMatches(t) == brute(t, pats))
    }
  }

  test("multi_contains_count SQL function equals the brute force on the " +
    "documents corpus and rejects non-literal patterns") {
    val docs = graft.core.Tables
      .documents(s, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val pats = Seq("fast table", "table", "agg", "merge batch", "zzz")
    val arr = pats.map(p => s"'$p'").mkString("array(", ", ", ")")
    val got = docs
      .select(col("doc_id"), col("text"),
        expr(s"multi_contains_count(text, $arr)").as("n"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) == brute(r.getString(1), pats),
        s"doc ${r.getLong(0)}")
    }
    assert(got.exists(_.getLong(2) > 0), "fixture must produce hits")
    val err = intercept[Exception] {
      docs.select(expr("multi_contains_count(text, array(text))")).collect()
    }
    assert(err.getMessage.contains("literal string array"))
  }

  test("multi_contains_count participates in whole-stage codegen") {
    val docs = graft.core.Tables
      .documents(s, "/root/testdata/sf0.001")
    val plan = docs
      .select(expr("multi_contains_count(text, array('agg'))").as("n"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [multi_contains_count"))
  }

  test("build rejects empty arrays, null elements, and empty-string " +
    "patterns analysis-style — not at first-row eval on an executor") {
    import s.implicits._
    val df = Seq("abc").toDF("t")
    def analyze(sqlArr: String): Unit =
      df.select(expr(s"multi_contains_count(t, $sqlArr)")).collect()
    val eEmpty = intercept[Exception] { analyze("array()") }
    assert(eEmpty.getMessage.contains("non-empty"), eEmpty.getMessage)
    val eNull = intercept[Exception] {
      analyze("array('a', CAST(NULL AS STRING))") }
    assert(eNull.getMessage.contains("NULL"), eNull.getMessage)
    val eBlank = intercept[Exception] { analyze("array('a', '')") }
    assert(eBlank.getMessage.contains("empty string"), eBlank.getMessage)
  }
}
