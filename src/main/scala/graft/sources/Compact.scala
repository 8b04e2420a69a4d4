package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** Small-file compaction — the lake maintenance op every run-partitioned
  * layout eventually needs (thousands of kilobyte files per partition
  * destroy scan throughput: each costs a task + a footer read).
  *
  * Pure sizing core + an explicit rewrite step; the rewrite lands in a
  * new directory and swaps atomically-enough for a single-writer lake
  * (a transactional table format takes over this job at multi-writer
  * scale).
  */
object Compact {

  /** Target file count for `totalBytes` of data at `targetBytes` per
    * file — never zero.
    */
  def targetFileCount(totalBytes: Long, targetBytes: Long): Int =
    math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)

  private def parquetFiles(dir: Path): Seq[Path] =
    Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq

  def dataSize(dir: String): Long =
    parquetFiles(Paths.get(dir)).map(Files.size).sum

  def fileCount(dir: String): Int = parquetFiles(Paths.get(dir)).size

  /** Rewrite `dir` into files of ~`targetBytes` (estimated from current
    * on-disk size). Returns (filesBefore, filesAfter).
    */
  def compactDir(s: SparkSession, dir: String,
                 targetBytes: Long): (Int, Int) = {
    val before = fileCount(dir)
    val n = targetFileCount(dataSize(dir), targetBytes)
    val df = s.read.parquet(dir)
    val tmp = dir + "__compacting"
    df.repartition(n).write.mode("overwrite").parquet(tmp)
    // swap: remove originals, move compacted files in
    parquetFiles(Paths.get(dir)).foreach(Files.delete)
    parquetFiles(Paths.get(tmp)).foreach { p =>
      Files.move(p, Paths.get(dir).resolve(p.getFileName))
    }
    Files.walk(Paths.get(tmp)).iterator().asScala.toSeq.reverse
      .foreach(Files.deleteIfExists(_))
    (before, fileCount(dir))
  }
}
