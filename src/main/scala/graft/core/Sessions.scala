package graft.core

import org.apache.spark.sql.SparkSession

/** Single place where every entry point (Verify, Bench, tests, ad-hoc mains)
  * builds its SparkSession, so the semantic-critical confs cannot drift.
  *
  * Confs that change query *results* (and therefore must match the DuckDB
  * oracle the driver compares against):
  *  - session time zone UTC: timestamp<->date casts are zone-sensitive, and
  *    [[Tables.eventTsUs]]'s NTZ->TIMESTAMP cast only matches DuckDB's
  *    epoch_us under UTC.
  *  - nanosAsLong: inert for the current TIMESTAMP(MICROS) testdata, kept so
  *    a TIMESTAMP(NANOS) events regeneration (seen in earlier testdata drops,
  *    which Spark has no type for) reads as epoch-nano BIGINT instead of
  *    failing the scan.
  */
object Sessions {

  def build(appName: String, cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .withExtensions(new graft.plans.GraftExtensions)
      // One shuffle partition per core: at local[32] the driver contract asks
      // for 32, not the 200 default sized for real clusters. AQE coalesces
      // further when partitions come out small.
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // Performance-only, result-inert: keep bucketed scans BUCKETED
      // even in plans the heuristic thinks don't benefit. The heuristic
      // breaks the iterative-graph cold start: a cache()d edge frame's
      // InMemoryRelation plan is compiled STANDALONE at registration
      // time, sees no join, silently drops the bucket layout — and
      // every iteration then re-exchanges the edge list the table was
      // bucketed to avoid (GraphRank.pageRankFromBucketed/
      // componentsFromBucketed, GraphRankSpec pins the partitioning).
      .config("spark.sql.sources.bucketing.autoBucketedScan.enabled",
        "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def cpusFromEnv(default: Int): Int =
    sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(default)
}
