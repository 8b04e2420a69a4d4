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

  /** [[compactDir]] with a Z-ORDER clustered rewrite — the full
    * `OPTIMIZE ... ZORDER BY` maintenance pass: streaming sinks and
    * micro-batch appends produce many small UNSORTED files (each file
    * spans the whole key space, so min/max stats prune nothing); this
    * rewrite both merges them to `targetBytes`-sized files AND
    * clusters rows along the Z curve of `zOf` (typically
    * [[graft.operators.ZOrder.zvalue]] over two bucketized filter
    * dimensions), so the compacted files prune on BOTH dimensions.
    * `zOf` builds the key from the frame being rewritten; the helper
    * column never reaches disk. Same single-writer swap contract as
    * [[compactDir]]; CompactSpec measures the before/after
    * files-touched delta under a one-dimension filter.
    */
  def compactDirZOrdered(s: SparkSession, dir: String, targetBytes: Long,
                         zOf: DataFrame => org.apache.spark.sql.Column)
      : (Int, Int) = {
    import org.apache.spark.sql.functions.col
    val before = fileCount(dir)
    val n = targetFileCount(dataSize(dir), targetBytes)
    val df = s.read.parquet(dir)
    val tmp = dir + "__compacting"
    df.withColumn("__z", zOf(df))
      .repartitionByRange(n, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(tmp)
    parquetFiles(Paths.get(dir)).foreach(Files.delete)
    parquetFiles(Paths.get(tmp)).foreach { p =>
      Files.move(p, Paths.get(dir).resolve(p.getFileName))
    }
    Files.walk(Paths.get(tmp)).iterator().asScala.toSeq.reverse
      .foreach(Files.deleteIfExists(_))
    (before, fileCount(dir))
  }
}
