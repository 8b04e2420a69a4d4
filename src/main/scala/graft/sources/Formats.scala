package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Columnar/text source formats beyond the reference's CSV + parquet:
  * ORC (the other splittable columnar lake format Spark ships a native
  * vectorized reader for — same predicate-pushdown and column-pruning
  * behavior as parquet, asserted in FormatsSpec) and JSON-lines (the
  * interchange format crawler/annotation pipelines hand a training-data
  * ingest; one object per line keeps it splittable).
  *
  * JSON reads take an explicit schema for the same reason the CSV
  * production path does: inference scans everything twice, and a
  * drifting inferred schema is a silent breaking change at 100 TB.
  */
object Formats {

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  /** Parquet write with NATIVE column BLOOM FILTERS (parquet-mr ≥1.12;
    * the format-level split-block bloom, not our query-side
    * `bloom_might_contain`) — the third leg of the data-skipping story:
    * z-order layouts prune RANGE filters, cell/hive partitioning prunes
    * CATEGORY filters, and blooms prune NEEDLE lookups on
    * high-cardinality columns where min/max stats are useless (every
    * row group spans the whole hash space, so a `hash = x` point query
    * decodes everything without one). Readers get the skipping for
    * free: Spark's parquet reader consults row-group blooms for
    * pushed-down equality predicates by default. `expectedNdv` sizes
    * each filter (per row group) — overshooting wastes footer bytes,
    * undershooting inflates the false-positive rate.
    */
  def writeParquetBloom(df: DataFrame, path: String,
                        bloomCols: Seq[String],
                        expectedNdv: Long): Unit = {
    val w = bloomCols.foldLeft(df.write.mode("overwrite")) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c",
          expectedNdv.toString)
    }
    w.parquet(path)
  }

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJsonl(s: SparkSession, path: String,
                schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  /** JSON-lines ingest with QUARANTINE, the same contract as
    * [[Csv.readQuarantining]]: PERMISSIVE mode keeps every line, and a
    * line that fails the schema lands with its raw text in
    * `_corrupt_record` so the caller splits (clean, quarantined) —
    * crawled corpora ALWAYS contain malformed lines, and at 100 TB one
    * of them must neither kill the job nor vanish silently.
    */
  def readJsonlQuarantining(s: SparkSession, path: String,
                            schema: StructType): DataFrame =
    s.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .json(path)

  /** Parquet directory scan with CORRUPT-FILE quarantine — the file-
    * granular sibling of the row-granular [[readJsonlQuarantining]] /
    * [[graft.sources.Csv]] contract. At 100 TB some files are torn
    * (killed writers, partial uploads, bit rot): the default read
    * fails the whole job on the first bad footer, and
    * `spark.sql.files.ignoreCorruptFiles` drops them SILENTLY —
    * neither is acceptable for a corpus whose completeness is audited.
    * This scan validates every file's parquet FOOTER up front (magic
    * bytes at both ends + a readable footer length — a distributed
    * map over the file list, each task reading O(16 bytes) per file,
    * never the data), then reads only the valid files and returns the
    * quarantine list alongside: (data, quarantined(file, size_bytes,
    * reason)). The footer check is the same gate the real reader
    * applies first, so a file passing it cannot fail the scan for
    * container reasons (page-level corruption inside a valid footer
    * surfaces per-file at read time — rerun with the file added to
    * the quarantine, the WarcFiles per-member degrade discipline).
    */
  def scanParquetQuarantining(s: SparkSession,
                              dir: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(root)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      .map(st => (st.getPath.toString, st.getLen))
    val confBc = s.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        s.sparkContext.hadoopConfiguration))
    val verdicts = s.sparkContext
      .parallelize(files.toIndexedSeq, math.max(1, files.length / 64))
      .map { case (p, len) =>
        val path = new org.apache.hadoop.fs.Path(p)
        val reason =
          if (len < 12L) Some("too-short-for-parquet")
          else {
            val f = path.getFileSystem(confBc.value.value).open(path)
            try {
              val head = new Array[Byte](4)
              f.readFully(0L, head)
              val tail = new Array[Byte](8)
              f.readFully(len - 8, tail)
              val magic = "PAR1".getBytes("US-ASCII")
              if (!java.util.Arrays.equals(head, magic))
                Some("bad-header-magic")
              else if (!(tail(4) == magic(0) && tail(5) == magic(1) &&
                  tail(6) == magic(2) && tail(7) == magic(3)))
                Some("bad-footer-magic")
              else {
                val footerLen = (tail(0) & 0xff) | ((tail(1) & 0xff) << 8) |
                  ((tail(2) & 0xff) << 16) | ((tail(3) & 0xff) << 24)
                if (footerLen < 0 || footerLen.toLong > len - 12L)
                  Some("footer-length-out-of-range")
                else None
              }
            } catch {
              case scala.util.control.NonFatal(e) =>
                Some(s"unreadable: ${e.getClass.getSimpleName}")
            } finally f.close()
          }
        (p, len, reason.getOrElse(""))
      }.collect() // bounded by the FILE COUNT (one small row per file)
    val (bad, good) = verdicts.partition(_._3.nonEmpty)
    val quarantined = bad.toIndexedSeq
      .toDF("file", "size_bytes", "reason")
    require(good.nonEmpty || bad.isEmpty,
      s"scanParquetQuarantining: every file in $dir is corrupt")
    val data =
      if (good.isEmpty) s.emptyDataFrame
      else s.read.parquet(good.map(_._1).toIndexedSeq: _*)
    (data, quarantined)
  }
}
