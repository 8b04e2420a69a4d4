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
  * DESIGN — encoding that domain fact as a rule survives stat estimation
  * misses.
  *
  * Two tiers of "dim", because they scale differently:
  *  - BOUNDED dims (nation: 25 rows, region: 5) have schema-fixed
  *    cardinality at any SF — always hinted.
  *  - SCALING dims (customer/part/supplier grow linearly with SF) are
  *    hinted only while their size estimate stays under
  *    [[DimBroadcast.maxBytesConf]]; past the bound the rule stands down
  *    and the planner shuffles — at the 100 TB north star, customer is
  *    terabytes and a forced hint would OOM the driver.
  *
  * The dim list is name-based over the scanned file paths (our testdata
  * and gold-layer naming); a production deployment would key on catalog
  * table properties instead.
  */
class DimBroadcastRule extends Rule[LogicalPlan] {

  private val boundedDims = Set("nation", "region")
  private val scalingDims = Set("supplier", "part", "customer")

  private def scansOnly(plan: LogicalPlan, dims: Set[String]): Boolean = {
    val leaves = plan.collectLeaves()
    leaves.nonEmpty && leaves.forall {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        val paths = fs.location.rootPaths.map(_.toString)
        paths.nonEmpty && paths.forall(p =>
          dims.exists(d => p.endsWith(s"$d.parquet") || p.contains(s"/$d/")))
      case _ => false
    }
  }

  private def maxBytes: BigInt = BigInt(conf.getConfString(
    DimBroadcast.maxBytesConf, DimBroadcast.defaultMaxBytes.toString))

  private def broadcastable(plan: LogicalPlan): Boolean =
    scansOnly(plan, boundedDims) ||
      (scansOnly(plan, boundedDims ++ scalingDims) &&
        plan.stats.sizeInBytes <= maxBytes)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(_, right, Inner | LeftOuter, _, hint)
        if hint.rightHint.isEmpty && broadcastable(right) =>
      j.copy(hint = hint.copy(rightHint =
        Some(HintInfo(strategy = Some(BROADCAST)))))
  }
}
