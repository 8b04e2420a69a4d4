package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV ingest (SURVEY §2.1 S1; reference: BBT-ETL-DW
  * scripts/etl_extract.py:48).
  *
  * Two modes:
  *  - production: explicit schema (no inference — inferSchema scans every
  *    file twice, a non-starter at lake scale);
  *  - ad-hoc: header + inference, matching the reference's ingest exactly
  *    (including its duplicate-header behavior: a header appearing twice
  *    comes out as name+position, e.g. OrderID -> OrderID0/OrderID14,
  *    which the audit/cleaning stages then detect and repair).
  */
object Csv {

  def read(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.option("header", "true").schema(schema).csv(path)

  def readInferred(s: SparkSession, path: String): DataFrame =
    s.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** Production ingest with QUARANTINE instead of crash-or-silently-null:
    * PERMISSIVE mode keeps every row, and rows that fail the schema land
    * with their raw text in `_corrupt_record` so the caller can split the
    * frame into (clean, quarantined) — at 100 TB a single malformed line
    * must neither kill the job (FAILFAST) nor vanish (DROPMALFORMED).
    */
  def readQuarantining(s: SparkSession, path: String,
                       schema: StructType): DataFrame =
    s.read.option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema.add("_corrupt_record", "string"))
      .csv(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}
