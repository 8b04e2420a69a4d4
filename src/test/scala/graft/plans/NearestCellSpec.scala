package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables
import graft.operators.Similarity

class NearestCellSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def prepped(dir: String) =
    Tables.embeddings(s, dir)
      .select(col("vec_id").as("n_id"),
        col("embedding").cast("array<double>").as("cv"))
      .withColumn("cn", Similarity.norm("cv"))

  test("fused nearest_cell equals the declarative assignCells(take=1) " +
    "per row on real embeddings, at several cell counts") {
    val c = prepped("/root/testdata/sf0.001")
    for (nCells <- Seq(4, 16, 64)) {
      val centroids = Similarity.sampleCentroids(
        Tables.embeddings(s, "/root/testdata/sf0.001"), "vec_id",
        "embedding", nCells)
      val declarative = Similarity
        .assignCells(c, "cv", "cn", centroids, "cell", take = 1)
        .select(col("n_id"), col("cell")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val cc = Similarity.collectCentroids(centroids)
      val fused = c.select(col("n_id"),
          Similarity.nearestCellCol(col("cv"), cc).as("cell"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(fused == declarative, s"nCells=$nCells")
    }
  }

  test("exact cosine ties keep the smallest cell id (the window's " +
    "(sim desc, cell asc) order), and the expression is codegen'd") {
    import s.implicits._
    // two identical centroids under different ids: every vector ties
    val base = Seq(1.0, 0.0, 0.0)
    val cents = Seq((7L, base, 1.0), (3L, base, 1.0))
      .toDF("cell", "centroid", "centroid_nrm")
    val cc = Similarity.collectCentroids(cents)
    assert(cc.cellIds.toSeq == Seq(3L, 7L), "ascending id order")
    // range-backed (not a LocalRelation) so the expression reaches the
    // physical plan instead of being constant-folded away
    val df = s.range(1, 3)
      .select(col("id").as("n_id"),
        array(col("id").cast("double") * 0.5, lit(0.25),
          col("id").cast("double")).as("cv"))
      .select(col("n_id"),
        Similarity.nearestCellCol(col("cv"), cc).as("cell"))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set(1L -> 3L, 2L -> 3L), "ties resolve to the smallest cell id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("nearest_cell") && plan.contains("*(1)"),
      plan.take(500))
  }

  test("malformed centroid tables are rejected") {
    import s.implicits._
    val e = intercept[Exception] {
      Seq((1L, Seq(1.0, 2.0)))
        .toDF("n_id", "cv")
        .select(call_function("nearest_cell",
          col("cv").cast("array<double>"),
          lit(Array(1.0, 2.0, 3.0)), // 3 doubles for 2 cells: ragged
          lit(Array(1.0, 1.0)), lit(Array(1L, 2L))))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("cell table")), msgs(e).mkString)
  }
}
