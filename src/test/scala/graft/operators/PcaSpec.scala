package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class PcaSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("jacobiEigen solves a hand-checkable 2x2 exactly") {
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12)
    assert(math.abs(vals(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(math.abs(vecs(0)(0) - r) < 1e-12 &&
      math.abs(vecs(0)(1) - r) < 1e-12)
    // sign convention: largest-|coordinate| (first on tie) positive
    assert(math.abs(vecs(1)(0) - r) < 1e-12 &&
      math.abs(vecs(1)(1) + r) < 1e-12)
  }

  test("jacobiEigen: orthonormal vectors, A*v = λ*v, trace preserved " +
    "on a seeded random symmetric matrix") {
    val d = 16
    val rnd = new scala.util.Random(7)
    val m = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val x = rnd.nextDouble() - 0.5
      m(i)(j) = x; m(j)(i) = x
    }
    val (vals, vecs) = Pca.jacobiEigen(m)
    assert(vals.sliding(2).forall(p => p(0) >= p(1) - 1e-12),
      "eigenvalues must be descending")
    assert(math.abs(vals.sum - (0 until d).map(i => m(i)(i)).sum) < 1e-9,
      "trace must be preserved")
    for (a <- 0 until d; b <- a until d) {
      val dot = (0 until d).map(k => vecs(a)(k) * vecs(b)(k)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-9,
        s"orthonormality violated at ($a,$b): $dot")
    }
    for (a <- 0 until d; i <- 0 until d) {
      val av = (0 until d).map(k => m(i)(k) * vecs(a)(k)).sum
      assert(math.abs(av - vals(a) * vecs(a)(i)) < 1e-8,
        s"A*v != λ*v at vector $a row $i")
    }
  }

  test("fused MomentAgg equals the HOF formulation bit-for-bit, on real " +
    "embeddings and on negatives/rounding-tie values") {
    import s.implicits._
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val emb = Tables.embeddings(s, dir)
    assert(cells(Pca.momentSums(emb, "embedding", 64)) ==
      cells(Pca.momentSumsHof(emb, "embedding", 64)))
    val tricky = Seq(
      Seq(-1.4999995, 2.5e-6, -2.5e-6, 0.0),
      Seq(0.9999995, -0.9999995, 1.0000005, -1.0000005),
      Seq(-0.25, 0.125, -0.0625, 0.03125)).toDF("v").repartition(3)
    assert(cells(Pca.momentSums(tricky, "v", 4)) ==
      cells(Pca.momentSumsHof(tricky, "v", 4)))
  }

  test("uncentered (Gram) fit: full-rank projection preserves pairwise " +
    "dot products — the ANN-safe variant") {
    val emb = Tables.embeddings(s, dir)
    val m = Pca.fit(emb, "embedding", 64, center = false)
    assert(!m.centered)
    val rows = Pca.project(emb.filter(col("vec_id") < 12), m, 64,
      "embedding")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("x"),
        col("proj")).collect()
      .map(r => (r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray))
    for (a <- rows; b <- rows) {
      val raw = a._1.zip(b._1).map { case (x, y) => x * y }.sum
      val rot = a._2.zip(b._2).map { case (x, y) => x * y }.sum
      assert(math.abs(raw - rot) < 1e-9,
        s"rotation must preserve dots: $raw vs $rot")
    }
  }

  test("fit is bit-deterministic across partitionings (exact integer " +
    "moments)") {
    val emb = Tables.embeddings(s, dir)
    val m1 = Pca.fit(emb, "embedding", dim = 64)
    val m2 = Pca.fit(emb.repartition(13), "embedding", dim = 64)
    assert(m1.n == m2.n)
    assert(m1.mean.sameElements(m2.mean))
    assert(m1.eigenvalues.sameElements(m2.eigenvalues))
    assert(m1.components.zip(m2.components).forall {
      case (a, b) => a.sameElements(b)
    })
  }

  test("projected population variance matches the eigenvalue and " +
    "reconstruction error shrinks with k") {
    val emb = Tables.embeddings(s, dir)
    val model = Pca.fit(emb, "embedding", dim = 64)
    val k = 8
    // per-component variance via one pass on (c, coord)
    val rows = Pca.project(emb, model, k, "embedding")
      .select(posexplode(col("proj")).as(Seq("c", "x")))
      .groupBy("c")
      .agg(avg(col("x")).as("mu"), avg(col("x") * col("x")).as("m2"))
      .collect()
    rows.foreach { r =>
      val c = r.getInt(0)
      val varc = r.getDouble(2) - r.getDouble(1) * r.getDouble(1)
      val ev = model.eigenvalues(c)
      assert(math.abs(varc - ev) <= 1e-3 * math.max(ev, 1e-9),
        s"component $c: projected variance $varc vs eigenvalue $ev")
      // projection is centered: mean ≈ 0 (quantization-level residual)
      assert(math.abs(r.getDouble(1)) < 1e-5)
    }
    // variance explained is monotone in k and complete at k = dim
    val ve = (1 to 64).map(model.varianceExplained)
    assert(ve.sliding(2).forall(p => p(0) <= p(1) + 1e-12))
    assert(math.abs(ve.last - 1.0) < 1e-9)
    assert(ve.head > 0.0)
  }

  /** Low-rank-plus-noise synthetic corpus: r strong directions with
    * decaying scales, deterministic per-(row, dim) hash jitter — the
    * decaying-spectrum shape real embeddings have, where randomized
    * subspace iteration carries its error bound. */
  private def lowRank(n: Int, d: Int, r: Int) = {
    import s.implicits._
    // direction t = unit vector from a seeded Gaussian draw
    val rnd = new java.util.Random(7L)
    val dirs = Array.fill(r)(Array.fill(d)(rnd.nextGaussian()))
      .map { v => val nn = math.sqrt(v.map(x => x * x).sum)
        v.map(_ / nn) }
    val dirLit = dirs.map(v => v.mkString("array(", "D,", "D)"))
      .mkString("array(", ",", ")")
    (0 until n).map(_.toLong).toDF("id")
      .withColumn("embedding", expr(
        s"""transform(sequence(0, ${d - 1}), dd ->
             CAST(aggregate(sequence(0, ${r - 1}),
               CAST(0.0 AS DOUBLE),
               (acc, t) -> acc +
                 CAST(pmod(xxhash64(id, t), 4096L) - 2048L AS DOUBLE)
                   / 2048.0D
                 * CAST(pow(0.6D, t) AS DOUBLE)
                 * element_at(element_at($dirLit, t + 1), dd + 1))
             + CAST(pmod(xxhash64(id, dd, 99L), 4096L) - 2048L AS DOUBLE)
               / 2048.0D * 0.01D AS DOUBLE))"""))
  }

  test("fitRandomized: top-k eigenvalues and subspace agree with the " +
    "exact solve on decaying-spectrum data (centered and uncentered)") {
    val d = 48
    val df = lowRank(n = 3000, d = d, r = 6).cache()
    for (center <- Seq(true, false)) {
      val exact = Pca.fit(df, "embedding", dim = d, center = center)
      val rand = Pca.fitRandomized(df, "embedding", dim = d, k = 6,
        oversample = 6, powerIters = 2, center = center)
      assert(rand.n == exact.n)
      // eigenvalue agreement on the energetic components
      (0 until 6).foreach { c =>
        val e = exact.eigenvalues(c)
        val g = rand.eigenvalues(c)
        assert(math.abs(g - e) <= 0.01 * math.max(e, 1e-12),
          s"center=$center comp $c: randomized $g vs exact $e")
      }
      // subspace alignment: every exact top-6 axis lies (almost)
      // inside the randomized top-6 span
      (0 until 6).foreach { c =>
        val v = exact.components(c)
        val inSpan = (0 until 6).map { a =>
          val dot = v.zip(rand.components(a)).map(p => p._1 * p._2).sum
          dot * dot
        }.sum
        assert(inSpan > 0.999,
          s"center=$center exact axis $c only $inSpan in randomized span")
      }
      // components orthonormal
      (0 until 6).foreach { a =>
        val na = rand.components(a).map(x => x * x).sum
        assert(math.abs(na - 1.0) < 1e-9)
        ((a + 1) until 6).foreach { b =>
          val dot = rand.components(a).zip(rand.components(b))
            .map(p => p._1 * p._2).sum
          assert(math.abs(dot) < 1e-6, s"axes $a,$b not orthogonal: $dot")
        }
      }
    }
    df.unpersist(blocking = false)
  }

  test("fitRandomized: projection through the randomized model captures " +
    "the planted energy (reconstruction sanity at k = rank)") {
    val d = 48
    val df = lowRank(n = 2000, d = d, r = 6)
    val rand = Pca.fitRandomized(df, "embedding", dim = d, k = 6,
      oversample = 6, powerIters = 2, center = true)
    // ≥ 99% of variance is in the planted rank-6 subspace (noise 0.01)
    assert(rand.varianceExplained(6) > 0.99,
      s"only ${rand.varianceExplained(6)} of variance in top 6")
  }

  test("fitQuantized: integer power-iteration axes align with the " +
    "exact uncentered solve on a decaying spectrum, eigenvalue ratios " +
    "agree, and the fit is bit-deterministic across partitionings") {
    val d = 48
    val df = lowRank(n = 3000, d = d, r = 6).cache()
    try {
      val exact = Pca.fit(df, "embedding", dim = d, center = false)
      val q = Pca.fitQuantized(df, "embedding", dim = d, k = 4,
        iters = 20)
      // axis alignment: |cos(exact_c, quantized_c)| near 1 per rank
      // (signs may differ — power iteration has no sign convention)
      for (c <- 0 until 4) {
        val qv = q.components(c).map(_.toDouble)
        val qn = math.sqrt(qv.map(x => x * x).sum)
        val cos = exact.components(c).zip(qv).map(p => p._1 * p._2).sum /
          math.max(qn, 1e-300)
        assert(math.abs(cos) > 0.98,
          s"component $c misaligned: |cos| = ${math.abs(cos)}")
      }
      // Rayleigh-quotient ratios track the exact eigenvalue ratios
      // (the scaled integers share one unknown scale factor, so only
      // RATIOS are comparable)
      for (c <- 1 until 4) {
        val exactRatio = exact.eigenvalues(c) / exact.eigenvalues(0)
        val qRatio = q.eigenvaluesScaled(c).toDouble /
          q.eigenvaluesScaled(0).toDouble
        assert(math.abs(exactRatio - qRatio) < 0.02,
          s"eigenvalue ratio $c: exact $exactRatio vs quantized $qRatio")
      }
      // bit-determinism: the fit consumes exact integer moments, so
      // any partitioning must produce the identical component table
      val q13 = Pca.fitQuantized(df.repartition(13), "embedding",
        dim = d, k = 4, iters = 20)
      assert(q.components.map(_.toSeq).toSeq ==
        q13.components.map(_.toSeq).toSeq)
      assert(q.eigenvaluesScaled.toSeq == q13.eigenvaluesScaled.toSeq)
    } finally df.unpersist(blocking = false)
  }
}
