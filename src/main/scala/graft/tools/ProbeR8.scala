package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.core.Sessions
import graft.operators.{CorpusAssembly, Dedup, Similarity, TextAnalysis}
import graft.queries.Registry

/** Dev-only: the round-8 scale-evidence runs behind SCALE_r08.md.
  *
  * Modes (arg 1), sfDir (arg 2):
  *  - `hashed`: l23 vs l23h (and l2 vs l2h) — wall time AND shuffle
  *    write bytes via [[TaskMetricsListener]], plus an output-identity
  *    check (the hashed path must produce value-identical rows).
  *  - `sketch`: x5p / x12p timings (the mergeable-sketch operators) at
  *    an inflated SF — their scale story is "one pass, O(k)/O(buckets)
  *    state"; the numbers back it.
  *  - `pack`: l25's distributed prefix sum vs the naive global-window
  *    cumsum on a synthetic token table where the single-partition
  *    collapse is visible (`synth:<rows>` as arg 3).
  *  - `quota`: l26 exact window vs l26h histogram on one giant source
  *    (arg 3 = row count), plus an aggregate-identity check.
  *  - `surprisal`: l24 unigram vs l24b bigram scoring cost across SFs
  *    (the claim: the model stays broadcast-bounded and the scoring
  *    pass adds no shuffle beyond the per-doc lag window).
  *  - `annskew`: l6 (hyperplane LSH) and l11 (IVF) ANN under an
  *    8-hot-key embedding distribution (30% of vectors replaced by one
  *    of the 8 hottest base vectors, rank probability ∝ 1/rank — the
  *    embedding analogue of ScaleGen's zipf key remap): reports
  *    (table, bucket) / cell occupancy and the query-time impact vs the
  *    unskewed corpus.
  */
object ProbeR8 {
  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.build("graft-probe-r8", Sessions.cpusFromEnv(32))
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
      println(s"PROBE8 $name ${out.mkString(" | ")}")
    }

    mode match {
      case "hashed" =>
        // optional arg 3: comma list of ops ("l23,l2"); l2's uncapped
        // pair materialization is kept off the biggest SFs (l2b is the
        // documented scale form — SCALE_r06)
        val ops = (if (args.length > 2) args(2) else "l23,l2")
          .split(",").toSet
        val docs = graft.core.Tables.documents(spark, sfDir)
        if (ops("l23")) {
          timed("l23_string",
            Dedup.dupSpanRemoval(docs, "doc_id", "text", 8))
          timed("l23_hashed", Dedup.dupSpanRemoval(docs, "doc_id", "text",
            8, hashedGramKeys = true))
          // value identity at this SF (both directions)
          val a = Dedup.dupSpanRemoval(docs, "doc_id", "text", 8)
          val b = Dedup.dupSpanRemoval(docs, "doc_id", "text", 8,
            hashedGramKeys = true)
          val d1 = a.except(b).count(); val d2 = b.except(a).count()
          println(s"PROBE8 l23_identity except_counts=$d1/$d2")
        }
        if (ops("l2")) {
          timed("l2_string", Dedup.ngramJaccardPairs(docs, "doc_id",
            "text", 3, 0.2))
          timed("l2_hashed", Dedup.ngramJaccardPairs(docs, "doc_id",
            "text", 3, 0.2, hashedShingles = true))
        }
        if (ops("l2b")) {
          timed("l2b_string", Dedup.ngramJaccardPairs(docs, "doc_id",
            "text", 3, 0.2, maxDocFreq = 10))
          timed("l2b_hashed", Dedup.ngramJaccardPairs(docs, "doc_id",
            "text", 3, 0.2, maxDocFreq = 10, hashedShingles = true))
        }

      case "sketch" =>
        Seq("x5p_kmv_distinct", "x12p_histogram_quantiles").foreach { n =>
          val q = Registry.all.find(_.name == n).get
          timed(n, q.run(spark, sfDir))
        }
        // the 100 TB form of x5p: the bounded KMV Aggregator (buffer =
        // k longs per partition, merged k-way) instead of the oracle
        // form's distinct -> top-k (which shuffles every distinct hash
        // plus an exact countDistinct cross-check)
        locally {
          import spark.implicits._
          val sketch = new graft.functions.KmvSketch(256).toColumn
          timed("x5agg_kmv_aggregator",
            graft.core.Tables.lineitem(spark, sfDir)
              .select(col("l_orderkey")).as[Long]
              .select(sketch.name("est_distinct")).toDF())
        }

      case "pack" =>
        // l25's distributed prefix sum vs the naive global window form
        // (identical output — CorpusAssemblySpec; this measures the
        // single-partition collapse the design avoids). Parquet corpora
        // at test SFs are small enough that ONE task absorbs them, so
        // arg 3 `synth:<rows>` swaps in a spark.range token table at a
        // row count where the collapse is visible.
        import org.apache.spark.sql.expressions.Window
        val toks =
          if (args.length > 2 && args(2).startsWith("synth:")) {
            val n = args(2).stripPrefix("synth:").toLong
            spark.range(n).select(col("id").as("doc_id"),
              pmod(xxhash64(col("id")), lit(200L)).as("n_tokens"))
          } else {
            graft.core.Tables.documents(spark, sfDir)
              .select(col("doc_id"), graft.operators.TextAnalysis
                .tokenCount("text").as("n_tokens"))
          }
        def binned(cum: DataFrame): DataFrame = cum
          .withColumn("bin", expr("(cum_tokens - n_tokens) div 2048L"))
          .groupBy("bin").agg(count(lit(1)).as("n_docs"),
            sum("n_tokens").as("bin_tokens"))
        timed("pack_prefix_sum",
          binned(graft.operators.CorpusAssembly
            .prefixSum(toks, "doc_id", "n_tokens", "cum_tokens")))
        timed("pack_global_window",
          binned(toks.withColumn("cum_tokens",
            sum("n_tokens").over(Window.orderBy("doc_id")
              .rowsBetween(Window.unboundedPreceding, 0)))))

      case "quota" =>
        // l26's exact per-source window vs l26h's histogram form on ONE
        // giant source — the exact form's worst case (the whole corpus
        // lands in a single window task). Synthetic PRE-SCORED frame
        // (per the scoreDocs/quotaExact split): generating text and
        // scoring it would pay interpreted HOF lambdas and measure the
        // scorer, not the quota machinery. quality in [0,200) mirrors
        // a distinct-token score's cardinality; n_tokens in [1,100].
        val n = if (args.length > 2) args(2).toLong else 20000000L
        val scored = spark.range(n).select(
          col("id").as("doc_id"), lit("s0").as("source"),
          pmod(xxhash64(col("id")), lit(200L)).as("quality"),
          (pmod(xxhash64(col("id") + 7), lit(100L)) + lit(1L))
            .as("n_tokens"))
        // ~1/3 of the expected token mass: the edge bucket fires
        // mid-distribution, so all three bucket classes are populated
        val budget = n * 50L / 3L
        def keptAgg(df: DataFrame): DataFrame = df.groupBy("source").agg(
          sum(col("kept").cast("long")).as("n_kept"),
          sum(when(col("kept"), col("n_tokens")).otherwise(lit(0L)))
            .as("tokens_kept"))
        timed("quota_exact", keptAgg(CorpusAssembly.quotaExact(
          scored, "source", "doc_id", budget)))
        timed("quota_hist", keptAgg(CorpusAssembly.quotaHistogram(
          scored, "source", "doc_id", budget)))
        val d = keptAgg(CorpusAssembly.quotaExact(
            scored, "source", "doc_id", budget))
          .except(keptAgg(CorpusAssembly.quotaHistogram(
            scored, "source", "doc_id", budget))).count()
        println(s"PROBE8 quota_identity except_count=$d")

      case "surprisal" =>
        val docs = graft.core.Tables.documents(spark, sfDir)
        timed("l24_unigram", TextAnalysis.unigramSurprisal(
          docs, "doc_id", "text", keepBelowBits = 4.93))
        timed("l24b_bigram", TextAnalysis.bigramSurprisal(
          docs, "doc_id", "text", keepBelowBits = 4.93))

      case "retrieval" =>
        // l27 BM25 + x18 heavy hitters across SFs. Both rebuild from
        // scratch per rep (the by-name df re-runs x18's candidate
        // sketch job too, so its wall time is the honest two-pass
        // cost). On the zipf corpora the hot duplicated texts skew the
        // token distribution — x18's trim pressure at scale.
        val docs = graft.core.Tables.documents(spark, sfDir)
        timed("l27_bm25", TextAnalysis.bm25TopK(docs, "doc_id", "text",
          Seq("dup", "spark", "vector", "flink"), k = 25))
        timed("x18_heavy", TextAnalysis.heavyHitters(
          docs, "text", phi = 0.02, capacity = 99))

      case "annskew" =>
        val emb = graft.core.Tables.embeddings(spark, sfDir)
          .select(col("vec_id"),
            // parquet stores array<float>; lsh_buckets is array<double>
            col("embedding").cast("array<double>").as("embedding"))
        // 8-hot-vector zipf overlay: u uniform from a salted hash; with
        // probability 0.3 the vector is REPLACED by hot vector rank
        // floor(exp(u ln 9)) - 1 (P(rank r) ∝ 1/r) — re-crawled /
        // default-valued embeddings at corpus scale
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
        def queries(c: DataFrame) = c.filter(col("vec_id") < 10)
        for ((label, corpus) <- Seq("uniform" -> emb, "zipf8" -> skewed)) {
          // bucket occupancy under l6's design point (8 planes x 4 tables)
          val occ = corpus
            .select(col("vec_id"), posexplode(Similarity.lshBucketsAll(
              "embedding", nPlanes = 8, dim = 64, nTables = 4))
              .as(Seq("tbl", "bucket")))
            .groupBy("tbl", "bucket").agg(count(lit(1)).as("n"))
          val st = occ.agg(max("n"), expr("approx_percentile(n, 0.5)"),
            count(lit(1))).collect()(0)
          val top = occ.orderBy(col("n").desc).limit(5)
            .collect().map(_.getLong(2)).mkString(",")
          println(s"PROBE8 l6_occupancy_$label max=${st.get(0)} " +
            s"median=${st.get(1)} cells=${st.get(2)} top5=$top")
          timed(s"l6_ann_$label", Similarity.lshTopK(corpus, queries(emb),
            "vec_id", "embedding", k = 5, dim = 64, nPlanes = 8,
            nTables = 4))
          // IVF cell occupancy at l11's design point (16 cells, 4 probes)
          timed(s"l11_ivf_$label", Similarity.ivfTopK(corpus, queries(emb),
            "vec_id", "embedding", k = 5, nCells = 16, nProbe = 4))
        }
    }
    spark.stop()
  }
}
