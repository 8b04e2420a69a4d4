package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Funnel + retention-cohort analytics (x26/x27) factored to the
  * per-user REDUCED STATES the streaming sinks maintain — so the
  * one-shot queries and the at-ingest standing states share one
  * implementation and their parity is by construction, not by test
  * luck (round-15 verdict item 7).
  *
  * Both dashboards reduce to mergeable per-user monoids:
  *  - funnel (x26): per-user MIN timestamp per stage — mins of mins
  *    merge associatively, so batch boundaries cannot change the
  *    dashboard;
  *  - retention (x27): per-user (cohort_day = min active day, 8-bit
  *    mask of active days at offsets 0..7). The pair is CLOSED under
  *    merge: a newly-seen earlier day only shifts existing days to
  *    HIGHER offsets (some falling permanently out of the 8-day
  *    window, exactly as the one-shot filter would), never back in —
  *    so state is two longs per user at any corpus size.
  */
object Retention {

  /** Per-user earliest timestamp of each stage: one combinable
    * groupBy, no windows, no self-joins. Columns: userCol,
    * `t_<stage>`. */
  def stageMins(events: DataFrame, userCol: String, typeCol: String,
                tsCol: String, stages: Seq[String]): DataFrame = {
    val aggs = stages.map(t =>
      min(when(col(typeCol) === t, col(tsCol))).as(s"t_$t"))
    events.groupBy(userCol).agg(aggs.head, aggs.tail: _*)
  }

  /** The ordered-funnel dashboard row from a [[stageMins]] frame
    * (stage k counts only strictly after the user's earliest stage
    * k−1) — x26's exact output. */
  def funnelCounts(perUser: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.size == 3, "funnelCounts: the x26 3-stage form")
    val Seq(s1, s2, s3) = stages
    val staged = perUser
      .withColumn("__r1", col(s"t_$s1").isNotNull)
      .withColumn("__r2", col("__r1") && col(s"t_$s2") > col(s"t_$s1"))
      .withColumn("__r3", col("__r2") && col(s"t_$s3") > col(s"t_$s2"))
    staged.agg(
      count(lit(1)).as("n_users"),
      sum(col("__r1").cast("long")).as(s"n_$s1"),
      sum(col("__r2").cast("long")).as(s"n_${s1}_$s2"),
      sum(col("__r3").cast("long")).as(s"n_${s1}_${s2}_$s3"))
  }

  /** Distinct (user, day) activity pairs. */
  def activeDays(events: DataFrame, userCol: String,
                 tsUsCol: String): DataFrame =
    events.select(col(userCol).cast("long").as("user_id"),
      expr(s"$tsUsCol DIV 86400000000").as("day")).distinct()

  /** Per-user retention state from raw (user_id, day) pairs:
    * (user_id, cohort_day, mask) where bit i of mask = active at
    * offset i ∈ [0, 7]. */
  def retentionState(act: DataFrame): DataFrame = {
    val cohort = act.groupBy("user_id").agg(min("day").as("cohort_day"))
    act.join(cohort, "user_id")
      .withColumn("offset", col("day") - col("cohort_day"))
      .filter(col("offset") <= 7)
      .groupBy("user_id", "cohort_day")
      .agg(expr("bit_or(shiftleft(1L, CAST(offset AS INT)))").as("mask"))
  }

  /** A retention state exploded back to its (user_id, day) pairs —
    * the merge carrier (state ∪ fresh pairs → [[retentionState]]
    * again; closure argued in the object comment). */
  def stateDays(state: DataFrame): DataFrame =
    state.select(col("user_id"), explode(expr(
      """filter(transform(sequence(0, 7),
           i -> IF((mask & shiftleft(1L, i)) != 0,
                   cohort_day + CAST(i AS BIGINT),
                   CAST(NULL AS BIGINT))),
         x -> x IS NOT NULL)""")).as("day"))

  /** The activation dashboard (x27's exact output) from a retention
    * state: every user appears in one state row, so the per-(cohort,
    * offset) distinct-user count is a plain count after the explode. */
  def retentionTable(state: DataFrame): DataFrame =
    stateDays(state)
      .join(state.select("user_id", "cohort_day"), "user_id")
      .withColumn("offset", col("day") - col("cohort_day"))
      .groupBy("cohort_day", "offset")
      .agg(count(lit(1)).as("n_active"))
}
