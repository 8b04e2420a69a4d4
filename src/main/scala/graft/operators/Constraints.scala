package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints ("expectations"): uniqueness,
  * referential integrity, and row predicates, each evaluated as a
  * violation COUNT in distributed form (no collect of violating rows —
  * callers sample via [[violations]] when they need examples).
  *
  * This is the assert-style layer SURVEY §2.11 G6 sketches for the
  * warehouse load ("optionally assert referential integrity with
  * anti-joins pre-load") — generalized to any table.
  */
object Constraints {

  sealed trait Constraint { def name: String }
  final case class Unique(name: String, cols: Seq[String]) extends Constraint
  final case class NotNull(name: String, col: String) extends Constraint
  final case class Check(name: String, predicate: Column) extends Constraint
  /** every `fkCols` value combination must exist in `ref`'s `refCols` */
  final case class ForeignKey(name: String, fkCols: Seq[String],
                              ref: DataFrame, refCols: Seq[String])
      extends Constraint

  /** Violation count for one constraint (0 = holds). */
  def violationCount(df: DataFrame, c: Constraint): DataFrame = c match {
    case Unique(n, cols) =>
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("cnt"))
        .agg(coalesce(sum(when(col("cnt") > 1, col("cnt") - 1)), lit(0L))
          .cast("long").as(n))
    case NotNull(n, c0) =>
      df.agg(count(when(col(c0).isNull, lit(1))).as(n))
    case Check(n, p) =>
      df.agg(count(when(!coalesce(p, lit(false)), lit(1))).as(n))
    case ForeignKey(n, fk, ref, rk) =>
      val refKeys = ref.select(rk.zip(fk).map { case (r, f) =>
        col(r).as(s"__ref_$f") }: _*).distinct()
      val cond = fk.map(f => col(f) === col(s"__ref_$f")).reduce(_ && _)
      df.join(refKeys, cond, "left_anti")
        .agg(count(lit(1)).as(n))
  }

  /** All constraints in one result row. Row-level constraints (NotNull,
    * Check) FUSE into a single scan — they are conditional counts over
    * the same rows, so k of them cost one aggregation, not k. Unique and
    * ForeignKey need their own shuffle/join shapes and stay separate;
    * the one-row results assemble via crossJoin (1x1 rows — the one
    * legitimate cartesian in this codebase).
    */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    val rowLevel = constraints.collect {
      case NotNull(n, c0) => count(when(col(c0).isNull, lit(1))).as(n)
      case Check(n, p) => count(when(!coalesce(p, lit(false)), lit(1))).as(n)
    }
    val heavy = constraints.filter {
      case _: NotNull | _: Check => false
      case _ => true
    }
    val frames =
      (if (rowLevel.nonEmpty)
        Seq(df.agg(rowLevel.head, rowLevel.tail: _*)) else Nil) ++
        heavy.map(violationCount(df, _))
    frames.reduce((a, b) => a.crossJoin(b))
      .select(constraints.map(c => col(c.name)): _*)
  }

  /** The violating rows for one constraint (for samples/quarantine). */
  def violations(df: DataFrame, c: Constraint): DataFrame = c match {
    case Unique(_, cols) =>
      val dupKeys = df.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("__cnt")).filter(col("__cnt") > 1)
        .drop("__cnt")
      df.join(broadcast(dupKeys), cols, "left_semi")
    case NotNull(_, c0) => df.filter(col(c0).isNull)
    case Check(_, p) => df.filter(!coalesce(p, lit(false)))
    case ForeignKey(_, fk, ref, rk) =>
      val refKeys = ref.select(rk.zip(fk).map { case (r, f) =>
        col(r).as(s"__ref_$f") }: _*).distinct()
      val cond = fk.map(f => col(f) === col(s"__ref_$f")).reduce(_ && _)
      df.join(refKeys, cond, "left_anti")
  }
}
