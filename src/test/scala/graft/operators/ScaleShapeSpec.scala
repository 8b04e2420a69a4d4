package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Plan-shape evidence for the 100 TB design claims: bucketed co-located
  * joins (no exchange), partition pruning at the scan, and salted skew
  * handling that preserves results.
  */
class ScaleShapeSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables co-locate the join: sort-merge join with NO " +
    "shuffle exchange on either side") {
    val wh = s"graft_li_b${System.nanoTime()}"
    val (t1, t2) = (s"${wh}_lineitem", s"${wh}_orders")
    Tables.lineitem(s, sf).write.bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").format("parquet").saveAsTable(t1)
    Tables.orders(s, sf).write.bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").format("parquet").saveAsTable(t2)
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = s.table(t1).join(s.table(t2),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(1500)}")
      // and it still computes the right thing
      assert(joined.count() ==
        Tables.lineitem(s, sf).join(Tables.orders(s, sf),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql(s"DROP TABLE IF EXISTS $t1")
      s.sql(s"DROP TABLE IF EXISTS $t2")
    }
  }

  test("AQE splits a skewed join partition at runtime: final adaptive " +
    "plan shows skew=true and the result is unchanged") {
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      // coalescing would merge the split partitions straight back
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // 95% of left rows pile onto key 0 -> one shuffle partition dwarfs
      // the rest; payload width makes the hot partition exceed the
      // (lowered) skew threshold
      val left = s.range(100000).select(
        when(col("id") % 100 < 95, lit(0L)).otherwise(col("id")).as("k"),
        concat(lit("p"), col("id"),
          lit("x" * 120)).as("payload"))
      val right = s.range(200).select(col("id").as("k"),
        (col("id") * 10).as("rv"))
      val joined = left.join(right, "k")
      // collect() drives THIS Dataset's queryExecution (foreach/count
      // would execute a separate clone), so the adaptive plan below is
      // the one that actually ran
      val rows = joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      assert(plan.contains("skew=true"),
        s"AQE should have split the hot partition:\n${plan.take(2000)}")
      // correctness unaffected by the split: 95000 hot-key matches plus
      // the 10 non-hot left keys under 200 ({95..99, 195..199})
      assert(rows.length == 95010)
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("runtime bloom-filter pruning: a selective dim filter injects a " +
    "might_contain predicate into the fact scan side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // production thresholds (10 GB application side) exist to avoid
      // overhead on small scans; lower them so the testdata-sized join
      // demonstrates the 100 TB mechanism
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val selectiveOrders = Tables.orders(s, sf)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderdate")
      val joined = Tables.lineitem(s, sf)
        .join(selectiveOrders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderdate").agg(count(lit(1)).as("n"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"bloom filter should be injected:\n${optimized.take(1500)}")
      // and the result matches the unfiltered-plan answer
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      val expected = Tables.lineitem(s, sf)
        .join(selectiveOrders, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderdate").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.get(0), r.getLong(1))).toSet
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      val actual = joined.collect().map(r => (r.get(0), r.getLong(1))).toSet
      assert(actual == expected)
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  test("hive-partitioned lake layout prunes partitions at the scan") {
    val root = Files.createTempDirectory("graft_part").toString
    Tables.orders(s, sf)
      .withColumn("yr", year(col("o_orderdate")))
      .write.partitionBy("yr").mode("overwrite").parquet(root)
    val pruned = s.read.parquet(root).filter(col("yr") === 1998)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan.take(800))
    assert(scan.contains("(yr#") || scan.contains("yr = 1998") ||
      scan.contains("= 1998"), scan.take(800))
    val expected = Tables.orders(s, sf)
      .filter(year(col("o_orderdate")) === 1998).count()
    assert(pruned.count() == expected)
  }

  test("salted aggregation equals the direct aggregation on a skewed key") {
    import s.implicits._
    // 10k rows of one hot key + uniform tail
    val skewed = s.range(10000).select(lit("hot").as("k"),
        (col("id") % 7).cast("double").as("v"))
      .union(s.range(3000).select(
        concat(lit("k"), col("id") % 50).as("k"),
        (col("id") % 11).cast("double").as("v")))
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("v_sum"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    val salted = Skew.saltedSum(skewed, "k", "v", salts = 8,
        saltFrom = Seq("v"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .toSet
    assert(salted == direct)
  }

  test("salted left join equals the plain left join") {
    import s.implicits._
    val left = s.range(5000).select(lit(1L).as("k"), col("id").as("payload"))
      .union(s.range(100).select((col("id") % 10).as("k"), col("id")))
    val right = Seq((1L, "hot-dim"), (2L, "cold-dim")).toDF("k", "attr")
    val plain = left.join(right, Seq("k"), "left")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    val salted = Skew.saltedLeftJoin(left, right, "k", salts = 4,
        saltFrom = Seq("payload"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)))).toSet
    assert(salted == plain)
  }

  test("x5p KMV sketch: global k-min plans as TakeOrdered (the " +
    "per-partition sketch-merge shape, no full sort) and the estimate " +
    "lands within the k=256 error envelope") {
    val q = graft.SparkEntry.queries("x5p_kmv_distinct")(s, sf)
    val rows = q.collect()
    assert(q.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"))
    val r = rows.head
    val err = r.getAs[Double]("rel_err")
    // 1/sqrt(256) ~ 6%; 3x headroom for the small-SF key population
    assert(err < 0.20, s"KMV rel_err $err out of envelope")
    assert(r.getAs[Long]("true_distinct") > 0)
  }

  test("x26 funnel and x27 retention plan WINDOW-FREE: combinable " +
    "aggregates only — a per-user window (or a global one) would " +
    "serialize exactly where user counts explode at scale") {
    for (name <- Seq("x26_funnel", "x27_retention_cohorts")) {
      val q = graft.SparkEntry.queries(name)(s, sf)
      q.collect()
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$name plans a Window:\n" +
        plan.take(1200))
      assert(plan.contains("HashAggregate") ||
        plan.contains("SortAggregate"), s"$name lost its aggregate")
    }
    // x25's signature side plans as TakeOrdered (the x5p shape): the
    // k-min scan must never be a full global sort
    val sig = graft.operators.DistinctSketch.kminHashes(
      graft.core.Tables.documents(s, sf),
      org.apache.spark.sql.functions.col("text"), 64)
    sig.collect()
    assert(sig.queryExecution.executedPlan.toString
      .contains("TakeOrderedAndProject"),
      "kminHashes must plan as TakeOrdered, not Sort+Limit")
  }
}
