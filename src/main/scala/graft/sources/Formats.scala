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
