package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.core.Tables

class SimilaritySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("brute-force top-k ranks by cosine with deterministic ties") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.01f)),  // nearly parallel to q
      (2L, Array(0.0f, 1.0f)),   // orthogonal
      (3L, Array(-1.0f, 0.0f)))  // opposite
      .toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0),
        "vec_id", "embedding", k = 3)
      .orderBy("rnk").collect()
      .map(r => (r.getAs[Long]("rnk"), r.getAs[Long]("n_id")))
    assert(out.toSeq == Seq((1L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("LSH ANN: bucketed candidates only, recall measured vs brute force") {
    val emb = Tables.embeddings(s, sf)
    val queries = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", k = 5)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
        k = 5, nPlanes = 4)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // ANN trades recall for candidate-set size; with 4 planes (16 buckets
    // over 500 vectors) the same-bucket constraint must still recover a
    // meaningful share of true neighbors, and everything it returns must
    // be a real vector pair (no fabrication).
    val recall = (ann & brute).size.toDouble / brute.size
    assert(recall >= 0.2, s"recall $recall")
    assert(ann.nonEmpty)
  }

  test("IVF ANN: probing more cells raises recall; single-cell assignment " +
    "keeps candidates bounded") {
    val emb = Tables.embeddings(s, sf)
    val queries = emb.filter(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", k = 5)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallAt(nProbe: Int): Double = {
      val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
          k = 5, nCells = 16, nProbe = nProbe)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (ivf & brute).size.toDouble / brute.size
    }
    val r2 = recallAt(2)
    val r8 = recallAt(8)
    assert(r8 >= r2, s"recall should not drop with more probes ($r2 -> $r8)")
    assert(r8 >= 0.4, s"recall@nProbe=8 was $r8")
  }

  test("cosine near-dup pairs: exact precision at the threshold, " +
    "bucket-blocked candidates only") {
    val emb = Tables.embeddings(s, sf)
    val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.95, nPlanes = 4)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    val rows = pairs.collect()
    // precision is exact by construction: every returned pair really has
    // cosine >= threshold (re-verify one against the brute-force scorer)
    rows.foreach(r => assert(r.getAs[Double]("cosine") >= 0.95))
  }

  test("ANN plan never materializes all pairs (join is on bucket id)") {
    val emb = Tables.embeddings(s, sf)
    val plan = Similarity.lshTopK(emb, emb.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nPlanes = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }
}
