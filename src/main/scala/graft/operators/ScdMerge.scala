package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Real SCD Type-2 merge (SURVEY §7.4 — the reference only emits the
  * scaffolding columns, map_cols.py:89-91; every run pretends the world
  * never changed). This is the actual close-old/open-new semantics a
  * warehouse needs.
  *
  * Contract: `current` carries (naturalKey, compareCols..., IsCurrent,
  * EffectiveStartDate, EffectiveEndDate). `incoming` carries
  * (naturalKey, compareCols...) for the new snapshot.
  *
  *  - unchanged rows (same compareCols) pass through untouched;
  *  - changed rows: the current version closes (IsCurrent=false,
  *    EffectiveEndDate=asOf) and a new version opens;
  *  - brand-new keys open a first version;
  *  - keys absent from the snapshot close (a full-snapshot merge —
  *    pass `closeMissing = false` for incremental feeds);
  *  - history rows (IsCurrent=false) always pass through.
  *
  * Scale shape: one shuffle of each side on the natural key (the join),
  * no windows, no collects; Catalyst plans a sort-merge join for
  * dim-x-snapshot sizes that exceed broadcast.
  */
object ScdMerge {

  def merge(current: DataFrame, incoming: DataFrame, naturalKey: String,
            compareCols: Seq[String], asOf: String,
            closeMissing: Boolean = true): DataFrame = {
    val history = current.filter(!col("IsCurrent"))
    val live = current.filter(col("IsCurrent"))

    val changed = compareCols
      .map(c => !(col(c) <=> col(s"__new_$c"))) // null-safe compare
      .reduce(_ || _)

    val renamedIncoming = incoming.select(
      col(naturalKey).as("__new_key") +:
        compareCols.map(c => col(c).as(s"__new_$c")): _*)

    val joined = live.join(renamedIncoming,
      col(naturalKey) === col("__new_key"), "full_outer")

    val asOfDate = lit(asOf).cast("date")
    val newCols = Seq(naturalKey) ++ compareCols

    // live rows whose key is still present and unchanged -> pass through
    val unchanged = joined
      .filter(col(naturalKey).isNotNull && col("__new_key").isNotNull &&
        !changed)
      .select(live.columns.toIndexedSeq.map(col): _*)

    // live rows that changed, or vanished from the snapshot -> closed
    val closed = joined
      .filter(col(naturalKey).isNotNull &&
        ((col("__new_key").isNotNull && changed) ||
          (col("__new_key").isNull && lit(closeMissing))))
      .select(live.columns.toIndexedSeq.map(col): _*)
      .withColumn("IsCurrent", lit(false))
      .withColumn("EffectiveEndDate", asOfDate)

    // changed keys and brand-new keys -> opened versions
    val opened = joined
      .filter(col("__new_key").isNotNull &&
        (col(naturalKey).isNull || changed))
      .select(
        col("__new_key").as(naturalKey) +:
          compareCols.map(c => col(s"__new_$c").as(c)): _*)
      .withColumn("IsCurrent", lit(true))
      .withColumn("EffectiveStartDate", asOfDate)
      .withColumn("EffectiveEndDate", lit(null).cast("date"))
      .select(live.columns.toIndexedSeq.map(col): _*)

    // vanished keys with closeMissing=false pass through untouched
    val untouchedMissing =
      if (closeMissing) live.limit(0)
      else joined.filter(col(naturalKey).isNotNull && col("__new_key").isNull)
        .select(live.columns.toIndexedSeq.map(col): _*)

    history.unionByName(unchanged).unionByName(closed)
      .unionByName(opened).unionByName(untouchedMissing)
  }
}
