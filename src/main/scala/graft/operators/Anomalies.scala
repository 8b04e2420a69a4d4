package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based anomaly flagging (SURVEY §2.10 Q7-Q8; reference:
  * BBT-ETL-DW scripts/etl_transform/anomalies.py:44-68, 84-126).
  *
  * The reference encodes priority by a hand-ordered when-chain (Future Date
  * > Unrealistic Quantity > Low or Negative Amount); here the registry is a
  * Seq whose order IS the priority, so the chain is data, not code.
  */
object Anomalies {

  final case class AnomalyRule(label: String, cond: Column)

  /** First-match-wins label column; `okLabel` when no rule fires. */
  def label(rules: Seq[AnomalyRule], okLabel: String = "ok"): Column =
    rules.foldRight(lit(okLabel): Column)((r, acc) =>
      when(r.cond, r.label).otherwise(acc))

  /** Flag + keep all rows (the reference's sales path writes the full
    * frame with `anomaly_type`, anomalies.py:71-79).
    */
  def flag(df: DataFrame, rules: Seq[AnomalyRule],
           outCol: String = "anomaly_type"): DataFrame =
    df.withColumn(outCol, label(rules))

  /** Per-label counts + total (the accounting in anomalies.py:137-155). */
  def accounting(df: DataFrame, rules: Seq[AnomalyRule]): DataFrame =
    flag(df, rules).groupBy("anomaly_type").agg(count(lit(1)).as("n"))
}
