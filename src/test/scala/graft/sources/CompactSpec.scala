package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CompactSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("compaction collapses a many-small-files table without changing " +
    "its contents") {
    import s.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    // 40 tiny files
    s.range(4000).select($"id", ($"id" * 2).as("v"))
      .repartition(40).write.parquet(dir)
    assert(Compact.fileCount(dir) == 40)
    val checksumBefore = s.read.parquet(dir)
      .agg(org.apache.spark.sql.functions.sum($"id" + $"v"))
      .collect()(0).getLong(0)

    val (before, after) = Compact.compactDir(s, dir, targetBytes = 512 * 1024)
    assert(before == 40)
    assert(after < 10, s"expected few files, got $after")
    val checksumAfter = s.read.parquet(dir)
      .agg(org.apache.spark.sql.functions.sum($"id" + $"v"))
      .collect()(0).getLong(0)
    assert(checksumAfter == checksumBefore)
    assert(s.read.parquet(dir).count() == 4000)
  }

  test("target file count never rounds to zero") {
    assert(Compact.targetFileCount(1L, 128 * 1024 * 1024L) == 1)
    assert(Compact.targetFileCount(300L * 1024 * 1024, 128L * 1024 * 1024) == 3)
  }
}
