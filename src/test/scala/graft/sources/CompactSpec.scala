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

  test("z-ordered compaction merges small unsorted files AND makes " +
    "their stats prunable on both dimensions, contents unchanged") {
    import org.apache.spark.sql.functions._
    import s.implicits._
    val dir = Files.createTempDirectory("graft_zcompact").toString + "/t"
    // 64x64 grid scattered randomly over 40 tiny files: every file
    // spans the whole key space, so nothing prunes before compaction
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    grid.repartition(40).write.parquet(dir)
    def touched(c: String, lo: Long, hi: Long): (Int, Int) = {
      val parts = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
        .map(_.getAbsolutePath)
      val t = parts.count { p =>
        val r = s.read.parquet(p)
          .agg(min(col(c)).cast("long"), max(col(c)).cast("long")).head()
        r.getLong(0) <= hi && r.getLong(1) >= lo
      }
      (t, parts.length)
    }
    assert(touched("y", 0L, 3L) == ((40, 40)),
      "random layout: every small file overlaps the filter")
    val (before, after) = Compact.compactDirZOrdered(s, dir,
      targetBytes = 8 * 1024,
      zOf = df => graft.operators.ZOrder.zvalue(df("x"), df("y")))
    assert(before == 40 && after < 40 && after >= 4,
      s"expected a merged multi-file layout, got $before -> $after")
    val (ty, ally) = touched("y", 0L, 3L)
    assert(ty <= math.max(1, ally / 2),
      s"y filter should prune the z-compacted files: $ty/$ally")
    val back = s.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(back == grid.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(!s.read.parquet(dir).columns.contains("__z"),
      "the helper key must not reach disk")
  }
}
