package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size-aware broadcast hinting for the dimension side of a join.
  *
  * A bare `broadcast()` hint OVERRIDES Spark's size check: if the "dim"
  * actually scales with the data volume (TPC-H customer/part/supplier all
  * grow linearly with SF), the hint that was fine at test scale OOMs the
  * driver at 100 TB instead of degrading to a shuffle join. This helper
  * hints only when the optimizer's size estimate is below a configured
  * bound, so the same query code broadcasts at small scale and falls back
  * to a sort-merge/shuffled-hash join when the table outgrows the bound —
  * the plan degrades, the job still completes.
  *
  * Genuinely bounded dims (nation: 25 rows, region: 5 — fixed by schema,
  * not by SF) don't need this and keep their unconditional hints.
  *
  * The estimate is `optimizedPlan.stats.sizeInBytes` — file-size based for
  * parquet scans, no job is triggered. [[DimBroadcastRule]] applies the
  * same bound inside the optimizer for un-hinted dim scans.
  */
object DimBroadcast {

  /** Session conf key bounding what this helper (and [[DimBroadcastRule]])
    * will broadcast, in bytes of estimated plan size.
    */
  val maxBytesConf = "spark.graft.dimBroadcast.maxBytes"

  /** 512 MiB: generous next to Spark's 10 MB auto-broadcast default —
    * the point of hinting dims is that stats under- or over-shoot for
    * wide-but-short tables — but far below executor/driver heap, so a
    * mis-hint degrades performance, not stability.
    */
  val defaultMaxBytes: Long = 512L * 1024 * 1024

  def configuredMaxBytes(df: DataFrame): Long =
    df.sparkSession.conf.getOption(maxBytesConf)
      .map(_.toLong).getOrElse(defaultMaxBytes)

  /** Hint `df` for broadcast iff its estimated size is within the session
    * bound ([[maxBytesConf]]); otherwise return it unchanged and let the
    * planner pick a shuffle join. The conf is read at plan-construction
    * time (documented: not a lazily-read semantic conf).
    */
  def hint(df: DataFrame): DataFrame = hint(df, configuredMaxBytes(df))

  def hint(df: DataFrame, maxBytes: Long): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(maxBytes))
      broadcast(df)
    else df
}
