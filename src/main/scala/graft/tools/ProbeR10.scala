package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.core.Sessions
import graft.operators.{Similarity, TextAnalysis}

/** Dev-only: the round-10 scale-evidence runs behind SCALE_r10.md.
  *
  * Modes (arg 1), sfDir (arg 2):
  *  - `bm25hot`: l27b batch BM25 where the query table deliberately
  *    carries the HIGHEST-df terms in the corpus ('the'/'a' are the
  *    designated stopwords of the synthetic documents) — the case where
  *    round 8's window-over-scored-stream form funneled the whole
  *    matched corpus into one task. The claim to check: max task time
  *    stays a small fraction of wall (the BoundedTopK partial
  *    aggregation keeps per-task work at O(rows/partitions + k)).
  *  - `annrecall`: recall-vs-exact of l6 (hyperplane LSH) and l11 (IVF)
  *    for the 10 standard query vectors, on the uniform corpus AND on
  *    the 8-hot-vector zipf overlay (ProbeR8's annskew measured
  *    occupancy and COST under skew; this closes the recall half).
  *  - `mg`: x18's sketch scan pass with the round-10 mutable-buffer
  *    MisraGries vs the round-8 immutable-Map form (inlined here as
  *    OldMisraGries) — the per-token persistent-map rebuild was the
  *    last known constant-factor waste on the 100 TB scan path.
  */
object ProbeR10 {

  /** The pre-round-10 MisraGries reduce/merge, verbatim (immutable Map
    * rebuilt per token) — kept ONLY as the probe's comparison baseline.
    */
  private class OldMisraGries(capacity: Int)
      extends org.apache.spark.sql.expressions.Aggregator[
        String, graft.functions.MisraGries.Buf,
        graft.functions.MisraGries.Buf] {
    import graft.functions.MisraGries.Buf
    override def zero: Buf = Buf(Map.empty, 0L)
    override def reduce(b: Buf, t: String): Buf = {
      val counts = b.counts
      val next =
        if (counts.contains(t)) counts.updated(t, counts(t) + 1L)
        else if (counts.size < capacity) counts.updated(t, 1L)
        else counts.flatMap { case (k, v) =>
          if (v > 1L) Some(k -> (v - 1L)) else None
        }
      Buf(next, b.n + 1L)
    }
    override def merge(a: Buf, b: Buf): Buf = {
      val sum = b.counts.foldLeft(a.counts) { case (m, (k, v)) =>
        m.updated(k, m.getOrElse(k, 0L) + v)
      }
      val trimmed =
        if (sum.size <= capacity) sum
        else {
          val cut = sum.valuesIterator.toArray
            .sorted(Ordering[Long].reverse).apply(capacity)
          sum.flatMap { case (k, v) =>
            if (v > cut) Some(k -> (v - cut)) else None
          }
        }
      Buf(trimmed, a.n + b.n)
    }
    override def finish(b: Buf): Buf = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.kryo[Buf]
  }

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.build("graft-probe-r10", Sessions.cpusFromEnv(32))
    val metrics = TaskMetricsListener.installed(spark)

    def timed(name: String, df: => DataFrame, reps: Int = 3): Unit = {
      var out = Seq.empty[String]
      for (i <- 1 to reps) {
        spark.catalog.clearCache()
        metrics.reset()
        val t0 = System.nanoTime()
        df.write.format("noop").mode(SaveMode.Overwrite).save()
        val secs = (System.nanoTime() - t0) / 1e9
        metrics.drain()
        out :+= f"rep$i ${secs}%.2f s shuffle=${metrics.shuffleWriteMb} MB" +
          f" spill=${metrics.spillMb} MB maxTask=${metrics.maxTaskSec}%.1f s"
      }
      println(s"PROBE10 $name ${out.mkString(" | ")}")
    }

    mode match {
      case "bm25hot" =>
        import spark.implicits._
        val docs = graft.core.Tables.documents(spark, sfDir)
        // 'the' and 'a' are the corpus stopwords (near-df=N); query 3
        // mixes a hot term with a rare one (the realistic shape)
        val hotQueries = Seq((1L, "the"), (2L, "a"), (2L, "the"),
          (3L, "the"), (3L, "dup"))
          .toDF("query_id", "term")
        val nDocs = docs.count()
        println(s"PROBE10 bm25hot corpus_docs=$nDocs sf=$sfDir")
        timed("l27b_hot_df", TextAnalysis.bm25BatchTopK(docs, "doc_id",
          "text", hotQueries, k = 10))

      case "annrecall" =>
        val emb = graft.core.Tables.embeddings(spark, sfDir)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("embedding"))
        // identical 8-hot-vector zipf overlay to ProbeR8's annskew
        val u = (pmod(xxhash64(col("vec_id"), lit(97)), lit(1000000L))
          .cast("double") / lit(1000000.0d))
        val rank = least(lit(7L),
          floor(exp(u / lit(0.3d) * lit(math.log(9.0)))) - 1)
        val hotIds = emb.filter(col("vec_id") < 8)
          .select(col("vec_id").as("__hid"),
            col("embedding").as("__hvec"))
        val skewed = emb
          .withColumn("__h", when(u < 0.3, rank))
          .join(broadcast(hotIds), col("__h") === col("__hid"), "left")
          .select(col("vec_id"),
            coalesce(col("__hvec"), col("embedding")).as("embedding"))
        val queries = emb.filter(col("vec_id") < 10)
        val k = 5
        def pairs(df: DataFrame): Set[(Long, Long)] = df
          .select("q_id", "n_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        for ((label, corpus) <- Seq("uniform" -> emb, "zipf8" -> skewed)) {
          val exact = pairs(Similarity.bruteForceTopK(corpus, queries,
            "vec_id", "embedding", k))
          val lsh = pairs(Similarity.lshTopK(corpus, queries, "vec_id",
            "embedding", k = k, dim = 64, nPlanes = 8, nTables = 4))
          val lshMp1 = pairs(Similarity.lshTopK(corpus, queries, "vec_id",
            "embedding", k = k, dim = 64, nPlanes = 8, nTables = 4,
            multiProbe = 1))
          val lshMp2 = pairs(Similarity.lshTopK(corpus, queries, "vec_id",
            "embedding", k = k, dim = 64, nPlanes = 8, nTables = 4,
            multiProbe = 2))
          val ivf = pairs(Similarity.ivfTopK(corpus, queries, "vec_id",
            "embedding", k = k, nCells = 16, nProbe = 4))
          val ivf8 = pairs(Similarity.ivfTopK(corpus, queries, "vec_id",
            "embedding", k = k, nCells = 16, nProbe = 8))
          val ivfKm = pairs(Similarity.ivfTopK(corpus, queries, "vec_id",
            "embedding", k = k, nCells = 16, nProbe = 4,
            refineIters = 2))
          def recall(ann: Set[(Long, Long)]): Double =
            if (exact.isEmpty) 1.0
            else ann.intersect(exact).size.toDouble / exact.size
          println(f"PROBE10 annrecall_$label exact_pairs=${exact.size} " +
            f"lsh_recall=${recall(lsh)}%.3f " +
            f"lsh_mp1=${recall(lshMp1)}%.3f " +
            f"lsh_mp2=${recall(lshMp2)}%.3f " +
            f"ivf_recall=${recall(ivf)}%.3f " +
            f"ivf_probe8=${recall(ivf8)}%.3f " +
            f"ivf_kmeans2=${recall(ivfKm)}%.3f")
        }

      case "mg" =>
        import spark.implicits._
        val cap = 99 // x18's design point
        val toks = graft.core.Tables.documents(spark, sfDir)
          .select(explode(TextAnalysis.tokens("text")).as("t"))
        // the sketch column is written out as-is (projecting it away
        // would let column pruning drop the aggregation being measured)
        timed("mg_mutable_r10",
          toks.as[String]
            .select(new graft.functions.MisraGries(cap)
              .toColumn.name("s")).toDF(), reps = 7)
        timed("mg_immutable_r8",
          toks.as[String]
            .select(new OldMisraGries(cap).toColumn.name("s")).toDF(),
          reps = 7)
        // ...and under TRIM pressure (capacity far below the vocabulary,
        // so the old path's full-map rebuild fires per insert miss)
        timed("mg_mutable_r10_cap12",
          toks.as[String]
            .select(new graft.functions.MisraGries(12)
              .toColumn.name("s")).toDF(), reps = 7)
        timed("mg_immutable_r8_cap12",
          toks.as[String]
            .select(new OldMisraGries(12).toColumn.name("s")).toDF(),
          reps = 7)
    }
    spark.stop()
  }
}
