package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private def run(left: Seq[(String, Long, String)],
                  right: Seq[(String, Long, Double, Long)]) = {
    val l = left.toDF("k", "t", "ltag")
    val r = right.toDF("k", "t", "rate", "rid")
    AsOfJoin.asOf(l, r, Seq("k"), "t", "t",
      Map("rate" -> "rate", "rid" -> "src_rid"),
      rightTieBreak = Some("rid"))
  }

  test("attaches latest right row at-or-before left time, per key") {
    val out = run(
      left = Seq(("a", 5L, "x"), ("a", 20L, "y"), ("b", 7L, "z")),
      right = Seq(("a", 3L, 1.1, 1L), ("a", 10L, 2.2, 2L), ("b", 9L, 9.9, 3L)))
      .collect().map(r => (r.getAs[String]("k"), r.getAs[Long]("t"),
        Option(r.getAs[java.lang.Double]("rate")))).toSet
    assert(out == Set(
      ("a", 5L, Some(1.1)),   // rate@3 is latest <= 5
      ("a", 20L, Some(2.2)),  // rate@10
      ("b", 7L, None)))       // b's only rate is at 9 > 7
  }

  test("equal timestamps are inclusive (right row at t matches left at t)") {
    val out = run(
      left = Seq(("a", 10L, "x")),
      right = Seq(("a", 10L, 4.4, 1L)))
      .collect()
    assert(out.head.getAs[Double]("rate") == 4.4)
  }

  test("ties among right rows at same (key, time): greatest tiebreak wins") {
    val out = run(
      left = Seq(("a", 10L, "x")),
      right = Seq(("a", 10L, 1.0, 1L), ("a", 10L, 2.0, 7L), ("a", 10L, 1.5, 3L)))
      .collect()
    assert(out.head.getAs[Double]("rate") == 2.0)
    assert(out.head.getAs[Long]("src_rid") == 7L)
  }

  test("payload fill is atomic: a right row with a null field never mixes " +
    "with an older right row's values") {
    val l = Seq(("a", 20L)).toDF("k", "t")
    val r = Seq(("a", 1L, Some(1.1), Some(100L)),
        ("a", 10L, None: Option[Double], Some(200L)))
      .toDF("k", "t", "rate", "rid")
    val out = AsOfJoin.asOf(l, r, Seq("k"), "t", "t",
      Map("rate" -> "rate", "rid" -> "src_rid"),
      rightTieBreak = Some("rid")).collect().head
    // latest right row (t=10) wins as a UNIT: its null rate stays null,
    // it must NOT borrow 1.1 from the t=1 row
    assert(out.getAs[Any]("rate") == null)
    assert(out.getAs[Long]("src_rid") == 200L)
  }

  test("left columns (incl. time) pass through once — no duplicate names") {
    val out = run(
      left = Seq(("a", 5L, "x")),
      right = Seq(("a", 3L, 1.1, 1L)))
    assert(out.columns.toSeq.sorted ==
      Seq("k", "ltag", "rate", "src_rid", "t"))
    // by-name access works (a duplicate 't' would throw AMBIGUOUS_REFERENCE)
    assert(out.select("t").collect().map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("plan shuffles each side once on the key — no join explosion") {
    val plan = run(
      left = Seq(("a", 5L, "x")),
      right = Seq(("a", 3L, 1.1, 1L)))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoop"))
  }
}
