package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Sessions

/** Dev-only: inflate the driver-generated testdata to larger scale
  * factors by key-shifted replication, preserving every distribution the
  * operators care about (values, dates, text, per-key fan-outs) while
  * keeping referential integrity (each copy's orders reference that
  * copy's customers, etc.). Bounded dims (nation, region — fixed by
  * schema, not SF) are copied unchanged, exactly as TPC-H scales.
  *
  * Copy i shifts every key column by i * base where base = max(key) + 1
  * of the source table, so key spaces never collide. Embedding vectors
  * get a small deterministic per-copy perturbation (exact-duplicate
  * vectors would degenerate cosine ranking into ties); document text is
  * replicated EXACTLY — the worst case for the dedup operators, which is
  * the point of a stress run.
  *
  * Usage: runMain graft.tools.ScaleGen <baseDir> <outDir> <factor>
  *   e.g. ScaleGen /root/testdata/sf0.1 testdata-scale/sf0.5 5
  */
object ScaleGen {

  private def maxOf(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).collect()(0).getLong(0) + 1L

  def main(args: Array[String]): Unit = {
    val Array(baseDir, outDir, factorStr) = args.take(3)
    val k = factorStr.toInt
    val spark = Sessions.build("graft-scalegen", Sessions.cpusFromEnv(32))

    def read(t: String) = spark.read.parquet(s"$baseDir/$t.parquet")

    // key bases from the SOURCE tables (computed once; referenced by the
    // tables that point at them)
    val custBase = maxOf(read("customer"), "c_custkey")
    val suppBase = maxOf(read("supplier"), "s_suppkey")
    val partBase = maxOf(read("part"), "p_partkey")
    val orderBase = maxOf(read("orders"), "o_orderkey")
    val eventBase = maxOf(read("events"), "event_id")
    val userBase = maxOf(read("events"), "user_id")
    val docBase = maxOf(read("documents"), "doc_id")
    val vecBase = maxOf(read("embeddings"), "vec_id")

    /** Union k copies of `df`, copy i adding i*base to each listed key. */
    def inflate(df: DataFrame, shifts: Map[String, Long],
                perCopy: (DataFrame, Int) => DataFrame = (d, _) => d)
        : DataFrame =
      (0 until k).map { i =>
        val shifted = shifts.foldLeft(df) { case (d, (c, base)) =>
          d.withColumn(c, (col(c) + lit(i * base)).cast(d.schema(c).dataType))
        }
        perCopy(shifted, i)
      }.reduce(_ unionByName _)

    val tables: Seq[(String, DataFrame)] = Seq(
      "region" -> read("region"),
      "nation" -> read("nation"),
      "customer" -> inflate(read("customer"), Map("c_custkey" -> custBase)),
      "supplier" -> inflate(read("supplier"), Map("s_suppkey" -> suppBase)),
      "part" -> inflate(read("part"), Map("p_partkey" -> partBase)),
      "orders" -> inflate(read("orders"),
        Map("o_orderkey" -> orderBase, "o_custkey" -> custBase)),
      "lineitem" -> inflate(read("lineitem"),
        Map("l_orderkey" -> orderBase, "l_partkey" -> partBase,
          "l_suppkey" -> suppBase)),
      "events" -> inflate(read("events"),
        Map("event_id" -> eventBase, "user_id" -> userBase)),
      "documents" -> inflate(read("documents"), Map("doc_id" -> docBase)),
      "embeddings" -> inflate(read("embeddings"), Map("vec_id" -> vecBase),
        perCopy = (d, i) =>
          if (i == 0) d
          else d.withColumn("embedding", expr(
            s"""zip_with(embedding, sequence(0, size(embedding) - 1),
                (x, j) -> CAST(x + 0.01D * sin(CAST(j AS DOUBLE) * 1.7D
                  + CAST(vec_id AS DOUBLE)) AS FLOAT))"""))))

    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[scalegen] $name -> $outDir/$name.parquet")
    }
    spark.stop()
  }
}
