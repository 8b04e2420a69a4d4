package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class IntersectCountSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("intersect_count equals size(array_intersect) on overlaps, " +
    "duplicates, disjoint and empty arrays; null input propagates") {
    import s.implicits._
    val cases = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a", "a", "b"), Seq("a", "a", "a")), // dups count once
      (Seq("a", "b"), Seq("x", "y")),
      (Seq.empty[String], Seq("a")),
      (Seq("a"), Seq.empty[String]),
      ((1 to 300).map("t" + _), (150 to 450).map("t" + _)))
    val df = cases.toDF("a", "b")
      .withColumn("native", expr("intersect_count(a, b)"))
      .withColumn("builtin",
        size(array_intersect(col("a"), col("b"))).cast("long"))
    df.collect().foreach(r =>
      assert(r.getLong(2) == r.getLong(3), r.toString))
    val withNull = Seq((Some(Seq("a")), Option.empty[Seq[String]]))
      .toDF("a", "b").select(expr("intersect_count(a, b)")).head()
    assert(withNull.isNullAt(0))
  }
}
