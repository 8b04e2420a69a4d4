package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Medallion-lake path convention (SURVEY §1.1): layer/source tables
  * partitioned by run date. Unlike the reference's date-suffixed
  * directories (`output/bronze/<source>/<yyyy-MM-dd>/`, a path convention
  * Spark can't prune), runs land as a Hive-style `run_date=` partition so
  * reading a date range prunes at the scan (ScaleShapeSpec demonstrates
  * the pruning; LakePathSpec the round trip).
  */
final case class LakePath(root: String, layer: String, source: String) {
  def dir: String = s"$root/$layer/$source"

  def write(df: DataFrame, runDate: String): Unit =
    df.withColumn("run_date", org.apache.spark.sql.functions.lit(runDate))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("run_date")
      .parquet(dir)

  /** One run's data (partition-pruned scan). */
  def read(s: SparkSession, runDate: String): DataFrame =
    s.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("run_date") === runDate)
      .drop("run_date")

  /** Every run, with the run_date column exposed. */
  def readAll(s: SparkSession): DataFrame = s.read.parquet(dir)

  /** Every run, with SCHEMA EVOLUTION: columns added by later runs union
    * in (earlier runs read them as null). mergeSchema reads every
    * partition's footer instead of sampling one — the cost of supporting
    * a table whose shape changed mid-history, paid only on this explicit
    * call, never by default.
    */
  def readAllMerged(s: SparkSession): DataFrame =
    s.read.option("mergeSchema", "true").parquet(dir)
}

object LakePath {
  def bronze(root: String, source: String): LakePath =
    LakePath(root, "bronze", source)
  def silver(root: String, source: String): LakePath =
    LakePath(root, "silver", source)
  def gold(root: String, table: String): LakePath =
    LakePath(root, "gold", table)
}
