package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Pins [[Pq]]: the fused encode against a JVM argmin mirror, the
  * nested-sample distortion monotonicity (the guarantee the
  * rank-ordered codebook design buys), Lloyd's k-means monotonicity
  * from that init, and the ADC score's exact float-order contract.
  */
class PqSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"
  private val dim = 64

  private def corpus = Tables.embeddings(s, sf)

  private def collectVecs(): Map[Long, Array[Double]] =
    corpus.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap

  private def jvmEncode(v: Array[Double], m: Pq.Model): Array[Long] =
    (0 until m.m).map { s =>
      var best = Double.PositiveInfinity
      var bestC = 0L
      for (c <- 0 until m.ksub) {
        val cw = m.codeword(s, c)
        var acc = 0.0
        for (i <- 0 until m.dsub) {
          val d = v(s * m.dsub + i) - cw(i)
          acc += d * d
        }
        if (acc < best) { best = acc; bestC = c.toLong }
      }
      bestC
    }.toArray

  private def reconError(vecs: Map[Long, Array[Double]],
                         codes: Map[Long, Array[Long]],
                         m: Pq.Model): Double =
    vecs.map { case (id, v) =>
      codes(id).zipWithIndex.map { case (c, s) =>
        val cw = m.codeword(s, c.toInt)
        (0 until m.dsub).map { i =>
          val d = v(s * m.dsub + i) - cw(i); d * d
        }.sum
      }.sum
    }.sum

  private def engineCodes(m: Pq.Model): Map[Long, Array[Long]] =
    Pq.encode(corpus, "vec_id", "embedding", m)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

  test("fused pq_encode_all equals the JVM argmin mirror on every " +
    "vector") {
    val m = Pq.fit(corpus, "vec_id", "embedding", dim, m = 8, ksub = 16)
    val vecs = collectVecs()
    val codes = engineCodes(m)
    assert(codes.size == vecs.size)
    vecs.foreach { case (id, v) =>
      assert(codes(id).sameElements(jvmEncode(v, m)), s"vec $id")
    }
    // codes are well-formed: m of them, all inside [0, ksub)
    codes.values.foreach { cs =>
      assert(cs.length == 8 && cs.forall(c => c >= 0 && c < 16))
    }
  }

  test("nested-sample monotonicity: distortion never increases as ksub " +
    "grows (larger rank samples are supersets)") {
    val vecs = collectVecs()
    val errs = Seq(4, 8, 16).map { k =>
      val m = Pq.fit(corpus, "vec_id", "embedding", dim, m = 8, ksub = k)
      reconError(vecs, engineCodes(m), m)
    }
    assert(errs(0) >= errs(1) && errs(1) >= errs(2), errs.toString)
    assert(errs(2) > 0.0, "sampled codebooks cannot be lossless here")
  }

  test("Lloyd refinement monotonically reduces total distortion from " +
    "the sampled init") {
    val vecs = collectVecs()
    val init = Pq.fit(corpus, "vec_id", "embedding", dim, m = 8,
      ksub = 8)
    val e0 = reconError(vecs, engineCodes(init), init)
    val r1 = Pq.refine(corpus, "embedding", init, iters = 1)
    val e1 = reconError(vecs, engineCodes(r1), r1)
    val r2 = Pq.refine(corpus, "embedding", r1, iters = 1)
    val e2 = reconError(vecs, engineCodes(r2), r2)
    assert(e1 <= e0, s"one Lloyd step increased distortion: $e0 -> $e1")
    assert(e2 <= e1, s"second Lloyd step increased distortion: $e1 -> $e2")
    assert(e1 < e0 * 0.999, "refinement should actually move the init")
  }

  test("ADC score contract: adc_ip equals the JVM per-subspace-dot " +
    "sum over the assigned codewords, in ascending-s order") {
    val m = Pq.fit(corpus, "vec_id", "embedding", dim, m = 8, ksub = 16)
    val codes = Pq.encode(corpus, "vec_id", "embedding", m)
    val out = Pq.adcTopK(codes, corpus.filter(col("vec_id") < 3),
        "vec_id", "embedding", m, k = 5)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) ->
        r.getAs[Double]("adc_ip")).toMap
    assert(out.size == 15)
    val vecs = collectVecs()
    val codeMap = engineCodes(m)
    out.foreach { case ((q, n), score) =>
      var acc = 0.0
      val cs = codeMap(n)
      for (s <- 0 until m.m) {
        val cw = m.codeword(s, cs(s).toInt)
        var sd = 0.0
        for (i <- 0 until m.dsub)
          sd += vecs(q)(s * m.dsub + i) * cw(i)
        acc += sd
      }
      assert(score == acc, s"pair ($q, $n): engine $score vs jvm $acc")
    }
  }

  test("ADC candidates cover the exact-IP top-k usefully and the " +
    "exact re-rank contract composes (recall == coverage)") {
    val m = Pq.fit(corpus, "vec_id", "embedding", dim, m = 8, ksub = 16,
      lloydIters = 2)
    val codes = Pq.encode(corpus, "vec_id", "embedding", m)
    val vecs = collectVecs()
    def exactTop(q: Long, k: Int): Set[Long] =
      vecs.collect { case (n, v) if n != q =>
        n -> vecs(q).zip(v).map { case (a, b) => a * b }.sum
      }.toSeq.sortBy { case (n, ip) => (-ip, n) }.take(k).map(_._1).toSet
    val qIds = (0L until 10L).toSet
    val cand = Pq.adcTopK(codes,
        corpus.filter(col("vec_id") < 10), "vec_id", "embedding", m,
        k = 50)
      .collect().groupBy(_.getAs[Long]("q_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_id")).toSet).toMap
    val recall = qIds.toSeq.map { q =>
      (exactTop(q, 5) & cand(q)).size / 5.0
    }.sum / qIds.size
    assert(recall >= 0.5,
      f"ADC@50 should cover most exact-IP top-5 (got $recall%.2f)")
  }

  test("degenerate ksub=1: every code is 0 and the model is the single " +
    "sampled vector") {
    val m = Pq.fit(corpus, "vec_id", "embedding", dim, m = 4, ksub = 1)
    assert(engineCodes(m).values.forall(_.forall(_ == 0L)))
  }

  test("residual IVF-PQ: the score is dot(q, centroid) + residual ADC " +
    "exactly, and residual quantization beats the global codebook on " +
    "clustered data") {
    import s.implicits._
    // controlled clustered fixture: 4 well-separated centers, small
    // deterministic jitter
    val vecs = (0 until 200).map { i =>
      val center = i % 4
      val v = Array.tabulate(dim) { d =>
        (if (d % 4 == center) 1.0 else 0.0) +
          0.05 * (((i.toLong * 31 + d) * 2654435761L % 1000) / 1000.0)
      }
      (i.toLong, v.toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding")
    // identity rank: ids 0..3 are one vector per cluster, so the 4-cell
    // structure matches the generative clusters (a scrambled sample can
    // double-draw a cluster and miss another, which makes residuals of
    // the missed cluster's vectors centroid-DIFFERENCE sized and the
    // beats-global assertion meaningless)
    val centroids = Similarity.sampleCentroids(df, "vec_id", "embedding",
      nCells = 4, centroidRank = c => c).cache()
    val resModel = Pq.fitResidual(df, "vec_id", "embedding", dim,
      m = 8, ksub = 8, centroids,
      rank = Similarity.portableCentroidRank)
    val globModel = Pq.fit(df, "vec_id", "embedding", dim, m = 8,
      ksub = 8, rank = Similarity.portableCentroidRank)

    // score contract vs a JVM mirror
    val queries = df.filter(col("vec_id") < 3)
    val out = Pq.ivfPqTopKResidual(df, queries, "vec_id", "embedding",
        k = 5, resModel, centroids, nProbe = 4)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) ->
        r.getAs[Double]("adc_ip")).toMap
    assert(out.size == 15)
    val cents = centroids.collect().map(r =>
      r.getAs[Long]("cell") -> r.getSeq[Double](1).toArray).toMap
    val resRows = Pq.encodeResidual(df, "vec_id", "embedding",
        centroids, resModel)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cell"), r.getSeq[Long](2).toArray)).toMap
    val vmap = vecs.map { case (id, v) => id -> v.toArray }.toMap
    out.foreach { case ((qid, nid), score) =>
      val (cell, codes) = resRows(nid)
      val qv = vmap(qid)
      var acc = qv.zip(cents(cell)).map { case (a, b) => a * b }.sum
      for (sub <- 0 until resModel.m) {
        val cw = resModel.codeword(sub, codes(sub).toInt)
        var sd = 0.0
        for (i <- 0 until resModel.dsub)
          sd += qv(sub * resModel.dsub + i) * cw(i)
        acc += sd
      }
      assert(math.abs(score - acc) < 1e-9,
        s"pair ($qid, $nid): engine $score vs jvm $acc")
    }

    // residual reconstruction beats global at the same ksub budget
    def reconErr(decode: Long => Array[Double]): Double =
      vmap.map { case (id, v) =>
        v.zip(decode(id)).map { case (a, b) =>
          val d = a - b; d * d
        }.sum
      }.sum
    val globCodes = Pq.encode(df, "vec_id", "embedding", globModel)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    def decodeWith(m: Pq.Model, codes: Array[Long],
                   base: Array[Double]): Array[Double] =
      Array.tabulate(dim) { d =>
        base(d) + m.codeword(d / m.dsub, codes(d / m.dsub).toInt)(d % m.dsub)
      }
    val zero = Array.fill(dim)(0.0)
    val eGlob = reconErr(id =>
      decodeWith(globModel, globCodes(id), zero))
    val eRes = reconErr { id =>
      val (cell, codes) = resRows(id)
      decodeWith(resModel, codes, cents(cell))
    }
    assert(eRes < eGlob,
      f"residual recon $eRes%.4f should beat global $eGlob%.4f")
  }

  test("IVF-PQ degenerate identity: probing ALL cells equals the plain " +
    "ADC scan bit for bit (every vector lives in exactly one cell)") {
    val m = Pq.fit(corpus, "vec_id", "embedding", dim, m = 8, ksub = 16,
      rank = Similarity.portableCentroidRank)
    val queries = corpus.filter(col("vec_id") < 5)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rnk"),
        r.getAs[Long]("n_id"), r.getAs[Double]("adc_ip"))).toSet
    val full = rows(Similarity.ivfPqTopK(corpus, queries, "vec_id",
      "embedding", k = 5, m, nCells = 16, nProbe = 16,
      centroidRank = Similarity.portableCentroidRank))
    val adc = rows(Pq.adcTopK(
      Pq.encode(corpus, "vec_id", "embedding", m), queries,
      "vec_id", "embedding", m, k = 5))
    assert(full == adc)
    // pruning actually prunes: nProbe=1 returns a (possibly different)
    // well-formed top-5 per query
    val pruned = Similarity.ivfPqTopK(corpus, queries, "vec_id",
      "embedding", k = 5, m, nCells = 16, nProbe = 1,
      centroidRank = Similarity.portableCentroidRank)
    val byQ = pruned.collect().groupBy(_.getAs[Long]("q_id"))
    assert(byQ.nonEmpty && byQ.values.forall(_.length <= 5))
  }
}
