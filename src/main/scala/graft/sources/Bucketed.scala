package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed tables: co-located storage for joins a warehouse runs
  * REPEATEDLY on the same key.
  *
  * At 100 TB a fact x fact join is dominated by shuffling both sides on
  * the join key — every single run. Bucketing pays that shuffle ONCE at
  * write time: `bucketBy(n, key)` hash-partitions the files, `sortBy`
  * orders them within each bucket, and the catalog records the layout,
  * so every later equi-join between tables bucketed the same way plans
  * as a sort-merge join with NO exchange on either side (and no sort
  * when each bucket holds one file). This is the standing answer to
  * "the same lineitem x orders join runs in every nightly query" — see
  * BucketedSpec for the exchange-free plan and x16_bucketed_join for
  * the oracle-checked result.
  *
  * Buckets must be sized for the target scale (bucket count is fixed at
  * write time; ~128-512 MB per bucket at rest is the usual target) and
  * both sides must agree on the count or one side re-shuffles.
  */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted parquet table backed by
    * an explicit path. Overwrites table and data.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
}
