package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Dev-only: isolate which x22 change moves the needle — edge feed
  * (union vs explode) x loop shape (per-iter deg join vs edeg pre-join).
  * usage: runMain graft.tools.ProbeX22 <sfDir> <reps>
  */
object ProbeX22 {

  private def edgesUnion(s: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    e0.union(e0.select(col("dst").as("src"), col("src").as("dst")))
  }

  private def edgesExplode(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("__e"))
      .select(col("__e.src").as("src"), col("__e.dst").as("dst"))

  /** old loop: per-iteration e join deg join r */
  private def prOld(edges: DataFrame, iters: Int): DataFrame = {
    val scale = 1L << 20; val dampNum = 85L; val dampDen = 100L
    val e = edges.cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg")).cache()
    val base = scale * (dampDen - dampNum) / dampDen
    var r = nodes.withColumn("r", lit(scale))
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      val contrib = e.join(deg, "src").join(r, e("src") === r("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("r DIV outdeg")).as("__in"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), (lit(base) + expr(
          s"($dampNum * coalesce(__in, 0L)) DIV $dampDen")).as("r"))
        .cache()
      next.count()
      if (prev != null) prev.unpersist(blocking = false)
      prev = r; r = next
    }
    e.unpersist(false); deg.unpersist(false); nodes.unpersist(false)
    r
  }

  /** new loop: edeg pre-join (lazy) */
  private def prNew(edges: DataFrame, iters: Int): DataFrame = {
    val scale = 1L << 20; val dampNum = 85L; val dampDen = 100L
    val e = edges.cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val edeg = e.join(deg, "src").cache()
    val base = scale * (dampDen - dampNum) / dampDen
    var r = nodes.withColumn("r", lit(scale))
    var prev: DataFrame = null
    for (_ <- 1 to iters) {
      val contrib = edeg.join(r, edeg("src") === r("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("r DIV outdeg")).as("__in"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), (lit(base) + expr(
          s"($dampNum * coalesce(__in, 0L)) DIV $dampDen")).as("r"))
        .cache()
      next.count()
      if (prev != null) prev.unpersist(blocking = false)
      prev = r; r = next
    }
    e.unpersist(false); edeg.unpersist(false); nodes.unpersist(false)
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val s = graft.core.Sessions.build("graft-probe-x22",
      graft.core.Sessions.cpusFromEnv(32))
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "union+old" -> (() => prOld(edgesUnion(s, dir), 4)),
      "explode+old" -> (() => prOld(edgesExplode(s, dir), 4)),
      "union+new" -> (() => prNew(edgesUnion(s, dir), 4)),
      "explode+new" -> (() => prNew(edgesExplode(s, dir), 4)))
    // warm: one run of each at tiny sf
    variants.foreach { case (_, f) => () }
    (1 to reps).foreach { rep =>
      variants.foreach { case (name, f) =>
        s.catalog.clearCache()
        val t0 = System.nanoTime()
        val r = f()
        r.write.format("noop")
          .mode(org.apache.spark.sql.SaveMode.Overwrite).save()
        val dt = (System.nanoTime() - t0) / 1e9
        r.unpersist(blocking = false)
        println(f"PROBE rep=$rep $name%-14s $dt%7.3f s")
      }
    }
    s.stop()
  }
}
