package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §4 "shuffle points"; the 100 TB
  * reality: one dominant customer/currency/date serializes a whole
  * partition).
  *
  * == AQE vs salting — when to use which ==
  *
  * First line of defense is AQE's runtime skew-JOIN splitting (on by
  * default with adaptive execution; ScaleShapeSpec demonstrates the
  * split appearing as `skew=true` in the final adaptive plan). Prefer it
  * because it needs no code change, acts only when a partition actually
  * exceeds `spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes`
  * (x `skewedPartitionFactor` over the median), and costs nothing when
  * data is well distributed.
  *
  * Reach for explicit salting when AQE cannot help:
  *  - skewed AGGREGATIONS: AQE splits join partitions, not hash
  *    aggregates — a hot group whose per-key state is large (collect_list
  *    payloads, many distincts) still lands in one task; [[saltedSum]]
  *    forces extra partials.
  *  - sort-merge-join SORT pressure: AQE splits the probe side of the
  *    join, but a single hot key must still be sorted/spilled per split;
  *    [[saltedLeftJoin]] changes the shuffle KEY itself to (key, salt).
  *  - deterministic plans: AQE decisions depend on runtime sizes and can
  *    differ run to run; salting is fixed at plan time.
  * The price of salting is an n-fold replication of the other side
  * ([[saltedLeftJoin]]) or a second aggregate ([[saltedSum]]) that you
  * pay whether or not the skew materializes — which is exactly why AQE
  * is the default and salting the targeted override.
  */
object Skew {

  /** Deterministic salt in [0, n) derived from the row's other columns —
    * no RNG state, so retries/speculative tasks agree.
    */
  def salt(n: Int, from: Column*): Column =
    pmod(xxhash64(from: _*), lit(n.toLong))

  /** Two-phase salted aggregation: groupBy (key, salt) computes partial
    * sums/counts in parallel across `salts` tasks per key, then a final
    * groupBy(key) combines the tiny partials. Result is identical to the
    * direct aggregation (longs/doubles: partial sums are what a hash
    * aggregate computes anyway — this just forces MORE partials for the
    * hot key).
    */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salts: Int, saltFrom: Seq[String]): DataFrame =
    df.withColumn("__salt", salt(salts, saltFrom.map(col): _*))
      .groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"), count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum("__partial").as(s"${valueCol}_sum"),
        sum("__n").cast("long").as("n"))

  /** Salted equi-join for a skewed LEFT side against a right side too big
    * to broadcast: left rows get a deterministic salt in [0, n); the
    * right side is replicated n times with every salt value. The shuffle
    * key becomes (key, salt), spreading each hot key over n tasks at the
    * cost of an n-fold right-side replication — use with n small and a
    * right side much smaller than the left (else prefer AQE).
    */
  def saltedLeftJoin(left: DataFrame, right: DataFrame, key: String,
                     salts: Int, saltFrom: Seq[String]): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      salt(salts, saltFrom.map(col): _*))
    val replicatedRight = right
      .withColumn("__salt", explode(expr(
        s"transform(sequence(0, ${salts - 1}), x -> CAST(x AS BIGINT))")))
    saltedLeft.join(replicatedRight, Seq(key, "__salt"), "left")
      .drop("__salt")
  }
}
