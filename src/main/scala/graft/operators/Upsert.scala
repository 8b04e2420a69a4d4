package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyed upsert — MERGE INTO semantics in batch form, the general-purpose
  * counterpart to [[ScdMerge]]'s versioned merge: on matched keys the
  * update row wins, unmatched update rows insert, unmatched current rows
  * survive unchanged.
  *
  * Scale shape: one shuffle of each side on the key (a left-anti join +
  * union) — no windows, no collects. Replacing a transactional table
  * format's MERGE at 100 TB, this is exactly the rewrite those formats
  * perform under the hood, minus the file-level pruning they add.
  */
object Upsert {

  def merge(current: DataFrame, updates: DataFrame,
            keys: Seq[String]): DataFrame =
    current
      .join(updates.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(updates)
}
