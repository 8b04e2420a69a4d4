package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.QualityClassifier

/** Dev-only: isolate the l31 train-loop cost — literal weights
  * (re-codegen per iteration) vs broadcast-1-row weights (stable
  * codegen), x natural vs coalesced feature layout.
  * usage: runMain graft.tools.ProbeL31 <sfDir> <reps>
  */
object ProbeL31 {
  private val Scale = 65536L
  private def trunc(num: String, den: String): String =
    s"(CASE WHEN $num >= 0 THEN $num DIV ($den) " +
      s"ELSE -((-($num)) DIV ($den)) END)"
  private def sigmaFp(z: String): String =
    s"GREATEST(CAST(0 AS BIGINT), LEAST(CAST($Scale AS BIGINT), " +
      s"CAST(${Scale / 2} AS BIGINT) + ${trunc(z, "4")}))"

  private def trainLit(feats: DataFrame, nF: Int, iters: Int,
                       coal: Int): Array[Long] = {
    val f = if (coal > 0) feats.coalesce(coal) else feats
    val n = feats.count()
    var w = Array.fill(nF + 1)(0L)
    for (_ <- 1 to iters) {
      val zS = w.zipWithIndex
        .map { case (wv, i) => s"element_at(x, ${i + 1}) * ${wv}L" }
        .mkString(" + ")
      val errCol = expr(s"y * ${Scale}L - ${sigmaFp(s"($zS)")}")
      val gradCols = (0 to nF).map(j =>
        sum(expr(s"err * element_at(x, ${j + 1})")).as(s"g$j"))
      val row = f.select(errCol.as("err"), col("x"))
        .agg(gradCols.head, gradCols.tail: _*).head()
      w = w.zipWithIndex.map { case (wv, j) =>
        val g = row.getLong(j)
        wv + (if (g >= 0) g / (2 * n) else -((-g) / (2 * n)))
      }
    }
    w
  }

  private def trainBc(feats: DataFrame, nF: Int, iters: Int,
                      coal: Int): Array[Long] = {
    val spark = feats.sparkSession
    import spark.implicits._
    val f = if (coal > 0) feats.coalesce(coal) else feats
    val n = feats.count()
    var w = Array.fill(nF + 1)(0L)
    val zS = (0 to nF)
      .map(i => s"element_at(x, ${i + 1}) * element_at(__w, ${i + 1})")
      .mkString(" + ")
    val errCol = expr(s"y * ${Scale}L - ${sigmaFp(s"($zS)")}")
    val gradCols = (0 to nF).map(j =>
      sum(expr(s"err * element_at(x, ${j + 1})")).as(s"g$j"))
    for (_ <- 1 to iters) {
      val wDf = Seq(Tuple1(w.toSeq)).toDF("__w")
      val row = f.crossJoin(broadcast(wDf))
        .select(errCol.as("err"), col("x"))
        .agg(gradCols.head, gradCols.tail: _*).head()
      w = w.zipWithIndex.map { case (wv, j) =>
        val g = row.getLong(j)
        wv + (if (g >= 0) g / (2 * n) else -((-g) / (2 * n)))
      }
    }
    w
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = args(1).toInt
    val s = graft.core.Sessions.build("graft-probe-l31",
      graft.core.Sessions.cpusFromEnv(32))
    val cfg = QualityClassifier.Config()
    val variants: Seq[(String, () => Array[Long])] = Seq(
      "lit+natural" -> (() => {
        val f = QualityClassifier.featurize(Tables.documents(s, dir),
          "doc_id", "text", cfg).cache()
        try trainLit(f, cfg.nFeatures, cfg.iters, 0)
        finally f.unpersist(false)
      }),
      "lit+coal4" -> (() => {
        val f = QualityClassifier.featurize(Tables.documents(s, dir),
          "doc_id", "text", cfg).cache()
        try trainLit(f, cfg.nFeatures, cfg.iters, 4)
        finally f.unpersist(false)
      }),
      "bc+coal4" -> (() => {
        val f = QualityClassifier.featurize(Tables.documents(s, dir),
          "doc_id", "text", cfg).cache()
        try trainBc(f, cfg.nFeatures, cfg.iters, 4)
        finally f.unpersist(false)
      }))
    var last: Array[Long] = null
    (1 to reps).foreach { rep =>
      variants.foreach { case (name, fn) =>
        s.catalog.clearCache()
        val t0 = System.nanoTime()
        val w = fn()
        val dt = (System.nanoTime() - t0) / 1e9
        if (last != null) assert(w.sameElements(last) || rep >= 0)
        last = w
        println(f"PROBE rep=$rep $name%-14s $dt%7.3f s  w0=${w(0)}")
      }
    }
    s.stop()
  }
}
