package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class UpsertSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("merge: updates win on matched keys, unmatched updates insert, " +
    "unmatched current rows survive") {
    import s.implicits._
    val current = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val updates = Seq((2L, "B2"), (4L, "d")).toDF("k", "v")
    val merged = Upsert.merge(current, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(merged == Set((1L, "a"), (2L, "B2"), (3L, "c"), (4L, "d")))
  }

  test("merge is idempotent: applying the same updates twice changes " +
    "nothing further") {
    import s.implicits._
    val current = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val updates = Seq((2L, "B2")).toDF("k", "v")
    val once = Upsert.merge(current, updates, Seq("k"))
    val twice = Upsert.merge(once, updates, Seq("k"))
    assert(twice.except(once).count() == 0 && once.except(twice).count() == 0)
  }

  test("duplicate keys inside the update set do not drop current rows " +
    "beyond the matched keys") {
    import s.implicits._
    val current = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // two update rows for the same key: both land (caller dedups if a
    // single winner is required), key 1 untouched
    val updates = Seq((2L, "B2"), (2L, "B3")).toDF("k", "v")
    val merged = Upsert.merge(current, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(merged == Set((1L, "a"), (2L, "B2"), (2L, "B3")))
  }
}
