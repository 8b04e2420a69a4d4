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
  * ordered by (time, tag, tiebreak) carrying the last non-null right payload
  * forward. Compared to a naive join-then-filter (which explodes to |L|x|R|
  * per key) this shuffles each input exactly once on the key and scales to
  * arbitrarily large sides — the partitioning is by key, so 1000 executors
  * each see only their keys' timelines. Skewed keys can be salted upstream
  * if one key dominates.
  *
  * Design points (each pinned by AsOfJoinSpec):
  *  - the whole right payload travels as ONE struct, so the forward fill is
  *    per-row atomic: a right row with a null in one payload column can never
  *    mix with values from a different right row.
  *  - ties among right rows sharing (key, time) resolve deterministically:
  *    the row with the greatest `rightTieBreak` wins (it sorts last in the
  *    window frame and `last` picks it).
  *  - left columns (including the time column) pass through under temp names
  *    and are restored once — no duplicate output columns.
  */
object AsOfJoin {

  /** @param left          probe side
    * @param right         build side (values carried forward)
    * @param keyCols       equi key column names present on both sides
    * @param leftTime      event-time column on `left`
    * @param rightTime     event-time column on `right`
    * @param payload       right columns to attach, as src -> output name
    * @param rightTieBreak right column ordering ties at equal (key, time);
    *                      greatest value wins. Use a unique id for full
    *                      determinism.
    * @return all `left` columns + payload columns (null when no prior right
    *         row exists for the key)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String,
           payload: Map[String, String],
           rightTieBreak: Option[String] = None): DataFrame = {
    val passCols = left.columns.toSeq.filterNot(keyCols.contains)
    val payloadDsts = payload.values.toSeq

    val taggedRight = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__tag"),
        rightTieBreak.map(col).getOrElse(lit(0L)).cast("long").as("__tb"),
        struct(payload.toSeq.map { case (src, dst) => col(src).as(dst) }: _*)
          .as("__p")) ++
        passCols.map(c => lit(null).cast(left.schema(c).dataType).as(s"__l_$c")): _*)

    val payloadType = taggedRight.schema("__p").dataType
    val taggedLeft = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__tag"),
        lit(0L).as("__tb"),
        lit(null).cast(payloadType).as("__p")) ++
        passCols.map(c => col(c).as(s"__l_$c")): _*)

    // tag 0 (right) sorts before tag 1 (left) on time ties => inclusive <=.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t"), col("__tag"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    taggedRight.unionByName(taggedLeft)
      .withColumn("__filled", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(keyCols.map(col) ++
        passCols.map(c => col(s"__l_$c").as(c)) ++
        payloadDsts.map(d => col(s"__filled.$d").as(d)): _*)
  }
}
