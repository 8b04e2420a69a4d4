package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (SURVEY §4 "shuffle points"; the 100 TB
  * reality: one dominant customer/currency/date serializes a whole
  * partition).
  *
  * First line of defense is AQE's runtime skew-join splitting (enabled in
  * Sessions). These operators cover what AQE can't: skewed AGGREGATIONS
  * whose single hot key exceeds one task even after partial aggregation
  * of high-cardinality payloads, and skewed joins against a
  * non-broadcastable build side.
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
