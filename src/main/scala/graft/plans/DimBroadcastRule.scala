package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{HintInfo, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.catalyst.plans.logical.BROADCAST

/** Optimizer rule (SURVEY §7.5's custom-`Rule` tier): force a broadcast
  * hint onto join build sides that scan known DIMENSION tables.
  *
  * Why a rule and not just size stats: Catalyst's auto-broadcast trusts
  * `sizeInBytes`, which lies for wide-but-short dims behind filters or
  * column-pruned scans, and disappears entirely when operators without
  * stats propagation sit in between. Warehouse dims are broadcastable by
  * DESIGN (they grow with the business, not the data volume) — encoding
  * that domain fact as a rule survives stat estimation misses.
  *
  * The dim list is name-based over the scanned file paths (our testdata
  * and gold-layer naming); a production deployment would key on catalog
  * table properties instead.
  */
class DimBroadcastRule extends Rule[LogicalPlan] {

  private val dimTables =
    Set("nation", "region", "supplier", "part", "customer")

  private def scansOnlyDims(plan: LogicalPlan): Boolean = {
    val leaves = plan.collectLeaves()
    leaves.nonEmpty && leaves.forall {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        val paths = fs.location.rootPaths.map(_.toString)
        paths.nonEmpty && paths.forall(p =>
          dimTables.exists(d => p.endsWith(s"$d.parquet") ||
            p.contains(s"/$d/")))
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(_, right, Inner | LeftOuter, _, hint)
        if hint.rightHint.isEmpty && scansOnlyDims(right) =>
      j.copy(hint = hint.copy(rightHint =
        Some(HintInfo(strategy = Some(BROADCAST)))))
  }
}
