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

  private def withMaxBytes[T](bytes: Long)(f: => T): T = {
    s.conf.set(DimBroadcast.maxBytesConf, bytes.toString)
    try f finally s.conf.unset(DimBroadcast.maxBytesConf)
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

  test("DimBroadcast.hint broadcasts a scaling dim that fits the bound") {
    withAutoBroadcastOff {
      val joined = Tables.lineitem(s, sf)
        .join(DimBroadcast.hint(Tables.part(s, sf)),
          col("l_partkey") === col("p_partkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), plan.take(800))
      assert(joined.count() == 6000)
    }
  }

  test("a scaling dim over the bound degrades to a shuffle join and still " +
    "answers correctly") {
    withAutoBroadcastOff {
      withMaxBytes(1L) {
        // j3's shape: fact x scaling dim through the size-aware hint. With
        // the bound at 1 byte the hint must stand down AND the optimizer
        // rule must not re-hint — the plan has to shuffle, not broadcast.
        val joined = Tables.lineitem(s, sf)
          .join(DimBroadcast.hint(Tables.part(s, sf)),
            col("l_partkey") === col("p_partkey"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastHashJoin"), plan.take(800))
        assert(plan.contains("SortMergeJoin") ||
          plan.contains("ShuffledHashJoin"), plan.take(800))
        assert(joined.count() == 6000)
      }
    }
  }

  test("bounded dims (nation/region) still broadcast when the scaling " +
    "bound is exhausted") {
    withAutoBroadcastOff {
      withMaxBytes(1L) {
        val plan = Tables.supplier(s, sf)
          .join(Tables.nation(s, sf),
            col("s_nationkey") === col("n_nationkey"))
          .queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin"), plan.take(800))
      }
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
