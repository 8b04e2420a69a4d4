package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optimizer pushdown barrier for filters on EXPENSIVE derived columns.
  *
  * The trap (found twice by round-12 probes, each worth a multiple of
  * the operator's whole cost): a deterministic filter on a computed
  * column is pushed below the projection that computes it, with the
  * full expression tree substituted into the condition — so every row
  * pays the derivation TWICE (condition + projection), and for
  * self-referential expressions the inlining multiplies further.
  * Measured: 160 s → 12 s on the 30M-row URL blocklist
  * (SCALE_r12.md §7); the shingle tables behind every dedup operator
  * evaluated their tokenize+shingle HOF — their dominant cost — twice
  * per row the same way.
  *
  * `filterAbove` pins the condition ABOVE the projection, where it
  * tests the already-computed attribute: both filter pushdown and
  * project collapse require every projected field to be deterministic,
  * so one rand() column blocks them — and it must be REFERENCED by the
  * condition, because an unused column (even a non-deterministic one)
  * is pruned, restoring determinism and silently re-enabling the push.
  * `rand() >= -1` is always true but cannot be folded through the
  * attribute. Costs one PRNG draw per row.
  */
object Barrier {

  def filterAbove(df: DataFrame, cond: Column): DataFrame =
    df.withColumn("__pushdown_barrier", rand())
      .filter(cond && col("__pushdown_barrier") >= lit(-1.0))
      .drop("__pushdown_barrier")
}
