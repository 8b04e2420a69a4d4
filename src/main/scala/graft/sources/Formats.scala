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
}
