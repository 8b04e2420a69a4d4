package graft.core

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LakePathSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("run-date partitioned writes: per-run reads prune, dynamic " +
    "overwrite replaces only its own run") {
    import s.implicits._
    val root = Files.createTempDirectory("graft_lake").toString
    val lake = LakePath.bronze(root, "sales")

    lake.write(Seq((1, "a"), (2, "b")).toDF("id", "v"), "2024-01-01")
    lake.write(Seq((3, "c")).toDF("id", "v"), "2024-01-02")
    assert(lake.read(s, "2024-01-01").count() == 2)
    assert(lake.read(s, "2024-01-02").count() == 1)
    assert(lake.readAll(s).count() == 3)

    // re-running one date must not clobber the other (dynamic overwrite)
    lake.write(Seq((9, "z")).toDF("id", "v"), "2024-01-01")
    assert(lake.read(s, "2024-01-01").collect().map(_.getInt(0)).toSeq ==
      Seq(9))
    assert(lake.read(s, "2024-01-02").count() == 1)

    // and the per-run read prunes at the scan
    val plan = lake.read(s, "2024-01-01")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(600))
  }

  test("schema evolution: a column added by a later run reads as null " +
    "for earlier runs through readAllMerged") {
    import s.implicits._
    val root = Files.createTempDirectory("graft_lake_evo").toString
    val lake = LakePath.silver(root, "docs")
    lake.write(Seq((1L, "a")).toDF("id", "v"), "2024-01-01")
    lake.write(Seq((2L, "b", 0.9)).toDF("id", "v", "quality"),
      "2024-01-02")
    val all = lake.readAllMerged(s)
    assert(all.columns.toSet ==
      Set("id", "v", "quality", "run_date"))
    val rows = all.select("id", "quality").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows == Map(1L -> None, 2L -> Some(0.9)))
  }
}
