package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TextAnalysisSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("splitAssign: deterministic across partitionings, fractions near " +
    "the requested 80/10/10") {
    import s.implicits._
    val ids = s.range(10000).select(col("id").as("doc_id"))
    val assigned = ids
      .withColumn("split", TextAnalysis.splitAssign("doc_id", 80, 10))
    val counts = assigned.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(counts("train") - 8000L) < 400, counts.toString)
    assert(math.abs(counts("val") - 1000L) < 200, counts.toString)
    assert(math.abs(counts("test") - 1000L) < 200, counts.toString)
    // repartitioning must not move any document to another split
    val a = assigned.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = ids.repartition(7)
      .withColumn("split", TextAnalysis.splitAssign("doc_id", 80, 10))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
  }

  test("topTfidfTerms: corpus-wide terms score low, doc-unique terms " +
    "rank first, ties break lexicographically") {
    import s.implicits._
    // 'everywhere' is in all 4 docs; each doc has a unique marker term
    val docs = Seq(
      (1L, "everywhere alpha1 alpha1 common2"),
      (2L, "everywhere beta22 common2 filler"),
      (3L, "everywhere gamma3 gamma3 gamma3"),
      (4L, "everywhere delta4")).toDF("doc_id", "text")
    val top = TextAnalysis.topTfidfTerms(docs, "doc_id", "text",
        k = 1, minLen = 5)
      .collect().map(r => r.getAs[Long]("doc") -> r.getAs[String]("term"))
      .toMap
    assert(top == Map(1L -> "alpha1", 2L -> "beta22", 3L -> "gamma3",
      4L -> "delta4"))
  }
}
