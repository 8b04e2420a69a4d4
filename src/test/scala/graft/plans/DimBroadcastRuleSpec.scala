package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class DimBroadcastRuleSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def withAutoBroadcastOff[T](f: => T): T = {
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("a dim-table build side broadcasts even with auto-broadcast off " +
    "and no explicit hint") {
    withAutoBroadcastOff {
      val joined = Tables.lineitem(s, sf)
        .join(Tables.part(s, sf), col("l_partkey") === col("p_partkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(800))
      // and the join still answers correctly
      assert(joined.count() == 6000)
    }
  }

  test("fact-to-fact joins are left alone (no false broadcasts)") {
    withAutoBroadcastOff {
      val plan = Tables.lineitem(s, sf)
        .join(Tables.orders(s, sf), col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), plan.take(800))
      assert(plan.contains("SortMergeJoin"), plan.take(800))
    }
  }

  test("an explicit user hint still wins (rule only fills empty hints)") {
    withAutoBroadcastOff {
      // user explicitly broadcasts the LEFT side; rule must not fight it
      val plan = broadcast(Tables.nation(s, sf))
        .join(Tables.supplier(s, sf),
          col("n_nationkey") === col("s_nationkey"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"))
    }
  }
}
