package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue-by-region over the full star chain (the reference's headline
    * Power BI tile, SURVEY §2.6 A8).
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.queries("a8_dashboard_revenue")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted only for operators whose hashing is
    * engine-specific (MinHash/LSH) — those get rows-only checks plus
    * recall tests in the ScalaTest suite.
    */
  def oracleSql: Map[String, String] = Registry.oracleSql
}
