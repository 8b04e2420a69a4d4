package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable as-of join (point-in-time lookup).
  *
  * Semantics: for each left row, attach the latest right row with the same
  * key whose time is <= the left row's time (inclusive). This is the
  * canonical "last known exchange rate / last prior signup" operator — the
  * reference approximates it with an exact-date equi join plus a
  * window-forward-filled fallback column (BBT-ETL-DW
  * scripts/etl_transform/sales_currency.py:77-100); this is the general form.
  *
  * Implementation: union both sides tagged, then one window pass per key
  * ordered by (time, tag) carrying the last non-null right payload forward.
  * Compared to a naive join-then-filter (which explodes to |L|x|R| per key)
  * this shuffles each input exactly once on the key and scales to arbitrarily
  * large sides — the partitioning is by key, so 1000 executors each see only
  * their keys' timelines. Skewed keys can be salted upstream if one key
  * dominates.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      build side (values carried forward)
    * @param keyCols    equi key column names present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param payload    columns of `right` to attach (renamed as given)
    * @return `left` columns + payload columns (null when no prior right row)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String,
           payload: Map[String, String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag 0 = right (sorts first on time ties => inclusive <= semantics)
    val taggedRight = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__tag")) ++
        payload.map { case (src, dst) => col(src).as(s"__p_$dst") } ++
        leftCols.filterNot(keyCols.contains).map(c => lit(null).as(s"__l_$c")): _*)
    val taggedLeft = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__tag")) ++
        payload.map { case (_, dst) => lit(null).as(s"__p_$dst") } ++
        leftCols.filterNot(keyCols.contains).map(c => col(c).as(s"__l_$c")): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .select((keyCols.map(col) :+ col("__t") :+ col("__tag")) ++
        payload.map { case (_, dst) =>
          last(col(s"__p_$dst"), ignoreNulls = true).over(w).as(dst) } ++
        leftCols.filterNot(keyCols.contains).map(c => col(s"__l_$c").as(c)): _*)
      .filter(col("__tag") === 1)
      .withColumnRenamed("__t", leftTime)
      .drop("__tag")
  }
}
