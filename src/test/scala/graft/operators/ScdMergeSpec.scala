package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class ScdMergeSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private def dim(rows: Seq[(String, String, Boolean, String, Option[String])]) =
    rows.toDF("k", "city", "IsCurrent", "EffectiveStartDate",
        "EffectiveEndDate")
      .withColumn("EffectiveStartDate", col("EffectiveStartDate").cast("date"))
      .withColumn("EffectiveEndDate", col("EffectiveEndDate").cast("date"))

  test("SCD2 merge: unchanged passes, changed closes+opens, new opens, " +
    "missing closes, history untouched") {
    val current = dim(Seq(
      ("a", "Paris", true, "2024-01-01", None),
      ("a", "Lyon", false, "2023-01-01", Some("2024-01-01")), // history
      ("b", "Berlin", true, "2024-01-01", None),
      ("c", "Rome", true, "2024-01-01", None)))
    val incoming = Seq(
      ("a", "Paris"),   // unchanged
      ("b", "Hamburg"), // changed
      ("d", "Madrid"))  // new; c missing -> closed
      .toDF("k", "city")

    val out = ScdMerge.merge(current, incoming, "k", Seq("city"),
        asOf = "2024-06-01")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
        Option(r.getDate(4)).map(_.toString)))
      .toSet

    assert(out == Set(
      ("a", "Lyon", false, Some("2024-01-01")),     // history kept
      ("a", "Paris", true, None),                   // unchanged
      ("b", "Berlin", false, Some("2024-06-01")),   // closed old version
      ("b", "Hamburg", true, None),                 // opened new version
      ("c", "Rome", false, Some("2024-06-01")),     // closed missing
      ("d", "Madrid", true, None)))                 // opened brand-new
  }

  test("incremental mode (closeMissing=false) keeps absent keys live") {
    val current = dim(Seq(("c", "Rome", true, "2024-01-01", None)))
    val incoming = Seq(("d", "Madrid")).toDF("k", "city")
    val out = ScdMerge.merge(current, incoming, "k", Seq("city"),
        asOf = "2024-06-01", closeMissing = false)
      .collect().map(r => (r.getString(0), r.getBoolean(2))).toSet
    assert(out == Set(("c", true), ("d", true)))
  }

  test("null-safe compare: null -> value counts as a change once") {
    val current = dim(Seq(("a", null, true, "2024-01-01", None)))
    val incoming = Seq(("a", "Oslo")).toDF("k", "city")
    val out = ScdMerge.merge(current, incoming, "k", Seq("city"),
        asOf = "2024-06-01")
      .collect().map(r => (Option(r.getString(1)), r.getBoolean(2))).toSet
    assert(out == Set((None, false), (Some("Oslo"), true)))
  }
}
