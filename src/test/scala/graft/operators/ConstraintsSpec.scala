package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Constraints._

class ConstraintsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("each constraint kind counts its violations on seeded dirty data") {
    import s.implicits._
    val dirty = Seq(
      (1L, Some("a"), 5.0),
      (1L, Some("b"), -2.0),   // dup key + negative
      (2L, None, 3.0),         // null name
      (3L, Some("c"), 0.0))    // non-positive
      .toDF("k", "name", "v")
    val ref = Seq(1L, 2L).toDF("rk") // 3 is an orphan

    val out = check(dirty, Seq(
      Unique("dup_k", Seq("k")),
      NotNull("null_name", "name"),
      Check("nonpos_v", col("v") > 0),
      ForeignKey("orphans", Seq("k"), ref, Seq("rk"))))
      .collect()(0)
    assert(out.getLong(0) == 1)   // one extra row under key 1
    assert(out.getLong(1) == 1)   // one null name
    assert(out.getLong(2) == 2)   // -2.0 and 0.0
    assert(out.getLong(3) == 1)   // key 3 unmatched

    // violation samplers return the offending rows
    assert(violations(dirty, Unique("d", Seq("k"))).count() == 2)
    assert(violations(dirty, ForeignKey("o", Seq("k"), ref, Seq("rk")))
      .select("k").collect().map(_.getLong(0)).toSeq == Seq(3L))
  }

  test("null predicate results count as violations (null-safe Check)") {
    import s.implicits._
    val df = Seq(Some(1.0), None, Some(-1.0)).toDF("v")
    val out = check(df, Seq(Check("bad", col("v") > 0))).collect()(0)
    assert(out.getLong(0) == 2) // null and -1.0 both violate
  }
}
