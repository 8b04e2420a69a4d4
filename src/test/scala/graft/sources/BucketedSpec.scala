package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class BucketedSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("joining two same-bucketed tables runs with ZERO shuffle " +
    "exchanges and matches the plain join") {
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("graft_bucket_spec")
    Bucketed.writeBucketed(
      Tables.lineitem(s, dir).select("l_orderkey", "l_extendedprice"),
      "spec_b_lineitem", "l_orderkey", 4, s"$tmp/lineitem")
    Bucketed.writeBucketed(
      Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
      "spec_b_orders", "o_orderkey", 4, s"$tmp/orders")

    // force the join path bucketing exists for (no broadcast escape
    // hatch: at real scale neither fact side fits in memory)
    val prevAuto = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = s.table("spec_b_lineitem")
        .join(s.table("spec_b_orders"),
          col("l_orderkey") === col("o_orderkey"))
      val n = joined.collect().length
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be exchange-free:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      // the bucketed layout never changes the DATA
      val plainN = Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(n.toLong == plainN)
    } finally
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
  }
}
