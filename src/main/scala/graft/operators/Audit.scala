package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Data-quality audit operators (SURVEY §2.10 Q1-Q4; reference:
  * BBT-ETL-DW scripts/audit_report.py).
  *
  * Differences from the reference, by design:
  *  - the reference runs one Spark job per rule and collect()s violating-id
  *    lists to the driver (audit_report.py:87-100) — O(rules) jobs and
  *    driver memory proportional to violations. Here the whole profile is
  *    ONE aggregate job, and violation scans return DataFrames (callers cap
  *    the sample themselves), so the audit stays distributed at 100 TB.
  *  - duplicate-row counting is one shuffle (group-count) instead of the
  *    reference's two full jobs (count vs dropDuplicates().count(),
  *    audit_report.py:58).
  */
object Audit {

  /** One entry of the reference's `data_type_and_format_inconsistencies`
    * array (audit_report.py:87-100): the violated column, its count, the
    * human-readable expected-type string the cleaner dispatches on
    * (data_cleaning.py:139-179), and a (capped) sample of violating row
    * ids. `errorIds` keeps the source id type — ints serialize unquoted,
    * strings quoted — matching the committed reference reports.
    */
  final case class FormatIssue(
      column: String,
      errorCount: Long,
      expectedType: String,
      errorIds: Seq[Any])

  /** Typed audit result consumed by [[Cleaning]] — the reference's
    * audit_report.json document (audit_report.py:152-181) as a case class.
    * `formatViolations` keeps every rule's count (including zeros);
    * `inconsistencies` carries the reference-parity entries (only rules
    * with errors, with expected_type + error_ids) when the report was
    * built with an id column.
    */
  final case class AuditReport(
      missingValues: Map[String, Long],
      duplicateRows: Long,
      duplicateColumnGroups: Map[String, Seq[String]],
      formatViolations: Map[String, Long],
      inconsistencies: Seq[FormatIssue] = Nil,
      /** Whether error-id samples were collected: distinguishes "id
        * column given, zero violations" (serialize an EMPTY parity
        * array, like the reference) from "built without an id column"
        * (serialize count-only entries).
        */
      hasIdSamples: Boolean = false)

  private def isNullOrNan(df: DataFrame, c: String): Column = {
    val base = col(c).isNull
    df.schema(c).dataType match {
      case DoubleType | FloatType => base || isnan(col(c))
      case _ => base
    }
  }

  /** Per-column null/NaN counts in one pass (audit_report.py:52-54). */
  def nullProfile(df: DataFrame): DataFrame =
    df.select(df.columns.toSeq.map(c =>
      count(when(isNullOrNan(df, c), lit(1))).as(c)): _*)

  /** Full-row duplicate count in one shuffle (audit_report.py:57-60). */
  def duplicateRowCount(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val keys = if (cols.nonEmpty) cols else df.columns.toSeq
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .agg((sum("cnt") - count(lit(1))).cast("long").as("dup_rows"))
  }

  private val DupCol = "^([A-Za-z]+)(\\d+)$".r

  /** Duplicate-source-column detection: names matching stem+digits grouped
    * by stem, groups of >1 flagged (audit_report.py:62-84 — Spark's CSV
    * reader renames a twice-occurring header `OrderID` to
    * `OrderID0`/`OrderID14`). Metadata-only: touches no data.
    */
  def duplicateColumnGroups(columns: Seq[String]): Map[String, Seq[String]] =
    columns.collect { case c @ DupCol(stem, _) => stem -> c }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .filter(_._2.size > 1)

  /** [[duplicateColumnGroups]] as a one-row-per-group DataFrame. */
  def duplicateColumnsDf(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    val groups = duplicateColumnGroups(df.columns.toSeq).toSeq
      .map { case (stem, cols) => (stem, cols.size.toLong) }
      .sortBy(_._1)
    groups.toDF("stem", "n_cols")
  }

  /** One named violation rule: rows where `bad` holds violate it.
    * `expectedType` is the reference's dispatch string (e.g. "positive
    * float", "date in YYYY-MM-DD format" — audit_report.py:103-138);
    * empty when the caller doesn't need report parity.
    */
  final case class FormatRule(name: String, bad: Column,
                              expectedType: String = "")

  /** The reference's audit predicates (audit_report.py:113-138), with
    * Spark-3 comparison semantics reproduced under Spark 4 ANSI mode:
    * its `stringCol < 0` coerced the string to INT with decimal
    * truncation ("-12.5" -> -12 counted, "-0.15" -> 0 not counted) —
    * pinned against the committed golden report in AuditGoldenSpec.
    */
  object RefRules {
    val phonePattern = "^[0-9.()\\- ]*$"
    def intCoerced(c: String): Column =
      col(c).try_cast("double").cast("int")
    def posFloat(c: String): Column =
      col(c).try_cast("float").isNull || intCoerced(c) < 0
    def posFloatStrict(c: String): Column =
      col(c).try_cast("float").isNull || intCoerced(c) <= 0
    def posInt(c: String): Column =
      col(c).try_cast("int").isNull || intCoerced(c) < 0
    def posIntStrict(c: String): Column =
      col(c).try_cast("int").isNull || intCoerced(c) <= 0
    def badPhone(c: String): Column = !col(c).rlike(phonePattern)
    def nonAlpha(c: String): Column = !col(c).rlike("^[a-zA-Z ]+$")
    def notIsoDate(c: String): Column =
      !col(c).rlike("^\\d{4}-\\d{2}-\\d{2}$")
  }

  /** All rules counted in ONE pass (vs audit_report.py:89's
    * job-per-rule + collect): a single aggregate emitting one column per
    * rule.
    */
  def violationCounts(df: DataFrame, rules: Seq[FormatRule]): DataFrame =
    df.select(rules.map(r => count(when(r.bad, lit(1))).as(r.name)): _*)

  /** Violating rows for one rule, as a DataFrame (caller limits/collects). */
  def violations(df: DataFrame, rule: FormatRule): DataFrame =
    df.filter(rule.bad)

  /** Assemble the typed report. The three aggregates are tiny (one row
    * each); collecting them is driver-side by nature, not a scale concern.
    *
    * When `idColumn` is given, each rule with errors also collects a
    * violating-id sample for the reference-parity `error_ids` field
    * (audit_report.py:96-100 collects ALL ids — unbounded driver memory;
    * here the sample is capped at `maxErrorIds` via `limit`, which
    * terminates the scan early instead of materializing every violation,
    * so the report stays safe at any scale). Only rules that fired run an
    * id job, mirroring the reference's append-if-nonzero behavior.
    */
  def report(df: DataFrame, rules: Seq[FormatRule],
             idColumn: Option[String] = None,
             maxErrorIds: Int = 10000,
             jobTimeout: scala.concurrent.duration.Duration =
               scala.concurrent.duration.Duration(15, "min")): AuditReport = {
    import scala.concurrent.{Await, ExecutionContext, Future}

    // a DEDICATED pool, not ExecutionContext.global: report() may itself
    // be called from a future (the parity pipeline audits sources
    // concurrently), and nested blocking on the shared global pool can
    // starve it once maxExtraThreads compensation runs out. The finite
    // jobTimeout turns a wedged Spark job into a clear TimeoutException
    // instead of an audit that hangs forever.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      // the duplicate-row count needs its own shuffle job — overlap it
      // with the profile scan (Spark schedules jobs from separate threads
      // side by side)
      val fDups = Future(duplicateRowCount(df).collect()(0).getLong(0))

      // null counts and rule-violation counts are both one-row conditional
      // aggregates over the same rows: ONE fused scan instead of two
      val nCols = df.columns.length
      val profile: Row = df.select(
        df.columns.toSeq.map(c =>
          count(when(isNullOrNan(df, c), lit(1))).as(s"__null_$c")) ++
          rules.map(r => count(when(r.bad, lit(1))).as(s"__vio_${r.name}"))
          : _*).collect()(0)
      val missing = df.columns.zipWithIndex
        .map { case (c, i) => c -> profile.getLong(i) }.toMap
      val vioMap = rules.zipWithIndex
        .map { case (r, i) => r.name -> profile.getLong(nCols + i) }.toMap

      val issues = idColumn.toSeq.flatMap { id =>
        // the per-rule id scans are independent little jobs — run them
        // concurrently instead of serially paying scan latency per rule
        val fired = rules.filter(r => vioMap(r.name) > 0)
        val futures = fired.map { r =>
          Future {
            val ids = df.filter(r.bad).select(id).limit(maxErrorIds)
              .collect().map(_.get(0)).toSeq
            FormatIssue(r.name, vioMap(r.name), r.expectedType, ids)
          }
        }
        futures.map(f => Await.result(f, jobTimeout))
      }
      AuditReport(missing, Await.result(fDups, jobTimeout),
        duplicateColumnGroups(df.columns.toSeq), vioMap, issues,
        hasIdSamples = idColumn.isDefined)
    } finally pool.shutdown()
  }
}
