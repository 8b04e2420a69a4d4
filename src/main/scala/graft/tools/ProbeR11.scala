package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.core.Sessions
import graft.operators.{IngestPipeline, Similarity}

/** Dev-only: the round-11 scale-evidence runs behind SCALE_r11.md.
  *
  * Modes (arg 1), sfDir (arg 2):
  *  - `annrecall`: the honest at-scale ANN recall table. Round 10's sf5
  *    rows were vacuous (replica inflation makes every query's true
  *    top-k its own copies — recall 1.000 for anything); this probe
  *    expects a `ScaleGen ... cluster`-generated corpus, where inflated
  *    vectors cluster around 64 base-corpus seed centers with unique
  *    per-vector jitter, so exact top-k is non-trivial at 250k vectors.
  *    Measures LSH (8 planes x 4 tables) at probe radius 0/1/2, the
  *    generalized Hamming-ball generator at 12 planes x 2 tables radius
  *    2/3, and IVF at 4/8 probes.
  *  - `ingest`: the composed l28 pipeline (incremental dedup -> span
  *    removal -> histogram quota -> splits) at sf5 — 250k standing docs,
  *    the l28 recrawl/revision/fresh batch shape scaled with it, quota
  *    budget scaled to stay non-vacuous. Reports wall, shuffle bytes,
  *    spill, max task over 3 reps (first rep codegen-cold), plus stage
  *    row counts so every stage is provably non-vacuous.
  */
object ProbeR11 {

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.build("graft-probe-r11", Sessions.cpusFromEnv(32))
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
      println(s"PROBE11 $name ${out.mkString(" | ")}")
    }

    mode match {
      case "annrecall" =>
        val emb = graft.core.Tables.embeddings(spark, sfDir)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("embedding"))
        val k = 5
        val n = emb.count()
        def pairs(df: DataFrame): Set[(Long, Long)] = df
          .select("q_id", "n_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        // two query regimes: cluster SEEDS (vec_id < 10 — their top-k
        // is their own tight cluster, the easy case) and NON-seeds
        // (100 <= vec_id < 110 — base vectors no cluster centers on,
        // whose true neighbors sit at moderate cosine: the hard case
        // that separates the methods)
        val regimes = Seq(
          "seedq" -> emb.filter(col("vec_id") < 10),
          "nonseedq" -> emb.filter(col("vec_id") >= 100 &&
            col("vec_id") < 110))
        for ((label, queries) <- regimes) {
          val exact = pairs(Similarity.bruteForceTopK(emb, queries,
            "vec_id", "embedding", k))
          def recall(ann: Set[(Long, Long)]): Double =
            if (exact.isEmpty) 1.0
            else ann.intersect(exact).size.toDouble / exact.size
          def lsh(planes: Int, tables: Int, mp: Int) =
            recall(pairs(Similarity.lshTopK(emb, queries, "vec_id",
              "embedding", k = k, dim = 64, nPlanes = planes,
              nTables = tables, multiProbe = mp)))
          def ivf(nProbe: Int) =
            recall(pairs(Similarity.ivfTopK(emb, queries, "vec_id",
              "embedding", k = k, nCells = 16, nProbe = nProbe)))
          println(f"PROBE11 annrecall_$label corpus=$n " +
            f"exact_pairs=${exact.size} " +
            f"lsh8x4_r0=${lsh(8, 4, 0)}%.3f " +
            f"lsh8x4_r1=${lsh(8, 4, 1)}%.3f " +
            f"lsh8x4_r2=${lsh(8, 4, 2)}%.3f " +
            f"lsh12x2_r2=${lsh(12, 2, 2)}%.3f " +
            f"lsh12x2_r3=${lsh(12, 2, 3)}%.3f " +
            f"ivf_p4=${ivf(4)}%.3f ivf_p8=${ivf(8)}%.3f")
        }

      case "annperf" =>
        // cost of the BoundedTopK-ranked multi-probe query path at
        // scale (the round-11 lshTopK change): wall/shuffle/maxTask of
        // radius-2 probing over the clustered corpus
        val embp = graft.core.Tables.embeddings(spark, sfDir)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("embedding"))
        val qs = embp.filter(col("vec_id") < 100)
        timed("lsh8x4_mp2_100q", Similarity.lshTopK(embp, qs, "vec_id",
          "embedding", k = 5, dim = 64, nPlanes = 8, nTables = 4,
          multiProbe = 2))
        timed("brute_100q", Similarity.bruteForceTopK(embp, qs,
          "vec_id", "embedding", k = 5))

      case "budgetops" =>
        // the round-11 trained/packing operators at sf5 (250k docs):
        // FFD packing (per-group bounded folds over the global rank),
        // BPE merge learning (corpus pass + vocab-sized iterations),
        // classifier training (one codegen'd gradient job/iteration)
        val docs = graft.core.Tables.documents(spark, sfDir)
        timed("l25b_ffd_pack", graft.operators.CorpusAssembly
          .packFirstFitDecreasing(docs, "doc_id", "text", budget = 2048L,
            groupSize = 256))
        for (rep <- 1 to 2) {
          val t0 = System.nanoTime()
          val m = graft.operators.Bpe.train(docs, "text", 16)
          println(f"PROBE11 bpe_train rep$rep ${
            (System.nanoTime() - t0) / 1e9}%.2f s merges=${m.size}")
        }
        val cfg = graft.operators.QualityClassifier.Config()
        val feats = graft.operators.QualityClassifier
          .featurize(docs, "doc_id", "text", cfg).cache()
        feats.count()
        for (rep <- 1 to 2) {
          val t0 = System.nanoTime()
          val w = graft.operators.QualityClassifier.train(feats, cfg)
          println(f"PROBE11 qc_train rep$rep ${
            (System.nanoTime() - t0) / 1e9}%.2f s nonzero=${
            w.count(_ != 0L)}")
        }
        feats.unpersist(blocking = false)

      case "ingest" =>
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "source", "text")
        val nDocs = docs.count()
        // the l28 fixture shape, scaled: recrawls (exact dups of the
        // standing corpus), revisions (near dups -> span removal), and
        // fresh docs (reversed text), id-shifted past the corpus
        val shift = 100000000L
        val recrawled = docs.filter(pmod(col("doc_id"), lit(5L)) === 0L)
          .select((col("doc_id") + lit(shift)).as("doc_id"),
            col("source"), col("text"))
        val revised = docs.filter(pmod(col("doc_id"), lit(7L)) === 0L)
          .select((col("doc_id") + lit(2 * shift)).as("doc_id"),
            col("source"), concat(col("text"), lit(" rev2")).as("text"))
        val fresh = docs.filter(pmod(col("doc_id"), lit(11L)) === 0L)
          .select((col("doc_id") + lit(3 * shift)).as("doc_id"),
            col("source"),
            expr("""array_join(reverse(filter(split(text, ' '),
                   t -> length(t) > 0)), ' ')""").as("text"))
        val batch = recrawled.unionByName(revised).unionByName(fresh)
        println(s"PROBE11 ingest corpus_docs=$nDocs " +
          s"batch_docs=${batch.count()}")
        // budget scaled with the corpus (l28 uses 100 tokens/source on
        // ~500 docs); sf5 is 500x the doc count
        val budget = 50000L
        timed("l28_sf5", IngestPipeline.run(
          standing = docs.select("doc_id", "text"), batch = batch,
          idCol = "doc_id", textCol = "text", sourceCol = "source",
          spanN = 8, budgetPerSource = budget, trainPct = 80,
          valPct = 10))
        // non-vacuosity: stage outcomes at this scale
        val out = IngestPipeline.run(
          standing = docs.select("doc_id", "text"), batch = batch,
          idCol = "doc_id", textCol = "text", sourceCol = "source",
          spanN = 8, budgetPerSource = budget, trainPct = 80,
          valPct = 10)
        out.orderBy("source", "split").collect().foreach { r =>
          println(s"PROBE11 ingest_row $r")
        }

      case "decontam" =>
        // l15 vs l15b with the benchmark index too big to broadcast —
        // the regime the bloom prefilter exists for. Fixture honesty,
        // learned twice: (a) a raw doc slice as the benchmark is
        // vacuous at this SF (the inflated corpus holds 49 copies of
        // every base doc — every corpus shingle is a true member);
        // (b) even a reversed-text benchmark stays vacuous, because the
        // synthetic generator's 3-gram space is tiny and shared (at
        // sf0.01, 85% of corpus docs overlap a 25-doc benchmark — both
        // earlier probe runs measured identical ~1.37 GB shuffles for
        // the two forms). Real decontamination is the OPPOSITE regime:
        // natural-text shingles are mostly doc-unique and the corpus is
        // overwhelmingly clean of the eval set. So this fixture salts
        // every token with `doc_id % 9973`: shingles become per-doc
        // strings, and the only corpus∩benchmark overlap is the organic
        // one — a replica of a benchmark doc landing on the same salt
        // residue (~0.5% of benchmark docs), which plays the role of
        // true leakage.
        val saltedAll = graft.core.Tables.documents(spark, sfDir)
          .select(col("doc_id"),
            expr("""array_join(transform(
                     filter(split(text, ' '), t -> length(t) > 0),
                     t -> concat(t, '_',
                       CAST(pmod(doc_id, 9973) AS STRING))), ' ')""")
              .as("text"))
        val sCorpus = saltedAll.filter(col("doc_id") >= 2500)
        val sBench = saltedAll.filter(col("doc_id") < 2500)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        timed("l15_direct_nobcast", graft.operators.Dedup
          .contaminationScores(sCorpus, sBench, "doc_id", "text", n = 3))
        timed("l15b_bloom_nobcast", graft.operators.Dedup
          .contaminationScoresBloom(sCorpus, sBench, "doc_id", "text",
            n = 3))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
          (10L * 1024 * 1024).toString)
        val hits = graft.operators.Dedup.contaminationScoresBloom(
          sCorpus, sBench, "doc_id", "text", n = 3).count()
        println(s"PROBE11 decontam_scored_docs $hits (organic leakage " +
          "only — must be a tiny fraction of the 247k corpus docs)")

      case "l30vdebug" =>
        // stage decomposition of the l30v wall: which of (replace-chain
        // encode, token posexplode, vocab build, id join) owns the time
        val dd = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text")
        val tr = dd.filter(graft.operators.TextAnalysis
          .splitAssign("doc_id", 80, 10) === "train")
        val mg = graft.operators.Bpe.train(tr, "text", 16)
        val vc = graft.operators.Bpe.vocabTable(tr, "text", mg)
        timed("vocab_only", vc)
        timed("encode_counts_only", graft.operators.Bpe
          .encodeCounts(dd, "text", mg)
          .groupBy().agg(sum("bpe_tokens")))
        timed("tokens_only", graft.operators.Bpe
          .tokens(dd, "doc_id", "text", mg)
          .groupBy().agg(count(lit(1))))
        timed("token_ids_full", graft.operators.Bpe
          .tokenIds(dd, "doc_id", "text", mg, vc)
          .groupBy("token_id").agg(count(lit(1))))
        timed("token_ids_repart64", graft.operators.Bpe
          .tokenIds(dd.repartition(64), "doc_id", "text", mg, vc)
          .groupBy("token_id").agg(count(lit(1))))

      case "newops2" =>
        // third-wave round-11 operators at sf5: bucketized range join
        // (5M events x 15k windows), fixed-point PageRank (the 4-
        // iteration shuffle chain over ~15M directed edges), and HTML
        // extraction (regex-heavy map pass over 250k synthesized pages)
        val ev5 = graft.core.Tables.eventsWithTsUs(spark, sfDir)
          .select(col("event_id"), expr("ts_us DIV 3600000000").as("hr"))
        // anchor spread scales with window count: the gate query's %600
        // span is right for 155 windows, but replaying it with 50x the
        // windows over the same 27-day event span makes every event
        // TRULY match ~300 windows — a 1.5B-row correct answer (the
        // first run of this probe sat single-core producing it). Range
        // joins are sized by match multiplicity, not row counts; %30000
        // keeps ~12 true matches per event at this SF.
        val win5 = graft.core.Tables.orders(spark, sfDir)
          .filter(pmod(col("o_orderkey"), lit(97L)) === 0L)
          .select(col("o_orderkey"),
            (lit(473352L) + pmod(col("o_orderkey"), lit(30000L)))
              .as("start_hr"))
          .withColumn("end_hr", col("start_hr") + lit(47L))
        println(s"PROBE11 rangejoin_sizes events=${ev5.count()} " +
          s"windows=${win5.count()} " +
          s"matches=${graft.operators.RangeJoin.pointInInterval(ev5,
            win5, "hr", "start_hr", "end_hr", 24L).count()}")
        timed("x21_range_join", graft.operators.RangeJoin
          .pointInInterval(ev5, win5, "hr", "start_hr", "end_hr", 24L)
          .groupBy("o_orderkey").agg(count(lit(1)).as("n")))
        // the default SMJ exchanges on __b: ~27 live time buckets hash
        // to <=27 reducers and the hottest bucket is ONE task (AQE
        // can't split it — reducer INPUT is kilobytes, the blowup is
        // join OUTPUT). The two operator cures, measured:
        timed("x21_range_join_salt8", graft.operators.RangeJoin
          .pointInInterval(ev5, win5, "hr", "start_hr", "end_hr", 24L,
            salt = 8)
          .groupBy("o_orderkey").agg(count(lit(1)).as("n")))
        timed("x21_range_join_bcast", graft.operators.RangeJoin
          .pointInInterval(ev5, win5, "hr", "start_hr", "end_hr", 24L,
            broadcastIntervals = true)
          .groupBy("o_orderkey").agg(count(lit(1)).as("n")))
        val e0 = graft.core.Tables.lineitem(spark, sfDir)
          .join(graft.core.Tables.orders(spark, sfDir),
            col("l_orderkey") === col("o_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
        val eAll = e0.union(
          e0.select(col("dst").as("src"), col("src").as("dst")))
        timed("x22_pagerank_4it", graft.operators.GraphRank
          .pageRankFixedPoint(eAll, "src", "dst", iters = 4), reps = 2)
        val docs5 = graft.core.Tables.documents(spark, sfDir)
        val synth =
          """concat('<html><head><script>var x = "1 < 2";</script>',
             '<style>p { }</style></head><body><p>', text,
             '</p><div><a href="/h">home nav</a></div>',
             CASE WHEN doc_id % 3 = 0
               THEN concat('<p><a href="/x">', substring(text, 1, 40),
                           '</a></p>')
               ELSE '' END, '</body></html>')"""
        timed("l34_html_extract", docs5
          .withColumn("__html", expr(synth))
          .select(col("doc_id"),
            expr(graft.operators.Html.cleanTextSql("__html"))
              .as("clean"),
            graft.operators.Html.linkDensity("__html").as("ld"))
          .groupBy().agg(sum(length(col("clean"))),
            sum(when(col("ld") > 0.1, 1L).otherwise(0L))))

      case "newops" =>
        // the second-wave round-11 operators at sf5: bloom-prefiltered
        // decontamination (the no-broadcast regime it exists for),
        // z-order layout write + pruning payoff, epoch shuffle, BPE
        // token-id encode, and the streamed-ANN-index search path.
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text")

        // --- x20: z-order write cost vs a plain same-file-count write,
        // then the pruning payoff for a one-dimension range scan
        val li = graft.core.Tables.lineitem(spark, sfDir).select(
          col("l_orderkey"), col("l_quantity"),
          (col("l_partkey") % 65536L).cast("long").as("zx"),
          (col("l_suppkey") % 65536L).cast("long").as("zy"))
        val liZ = li.withColumn("z", graft.operators.ZOrder
          .zvalue(col("zx"), col("zy")))
        val zDir = "/tmp/scale/probe_zorder"
        val pDir = "/tmp/scale/probe_plain"
        for ((name, write) <- Seq[(String, () => Unit)](
          ("x20_zorder_write", () => graft.operators.ZOrder
            .writeZOrdered(liZ, "z", zDir, numFiles = 64)),
          ("x20_plain_write", () => liZ.repartition(64)
            .write.mode(SaveMode.Overwrite).parquet(pDir)))) {
          metrics.reset()
          val t0 = System.nanoTime()
          write()
          println(f"PROBE11 $name ${(System.nanoTime() - t0) / 1e9}%.2f s" +
            f" shuffle=${metrics.shuffleWriteMb} MB" +
            f" maxTask=${metrics.maxTaskSec}%.1f s")
        }
        def touched(dir: String, c: String, lo: Long, hi: Long): Int =
          new java.io.File(dir).listFiles()
            .filter(f => f.getName.startsWith("part-") &&
              f.getName.endsWith(".parquet"))
            .count { f =>
              val r = spark.read.parquet(f.getAbsolutePath)
                .agg(min(col(c)), max(col(c))).head()
              r.getLong(0) <= hi && r.getLong(1) >= lo
            }
        val zyHi = 2047L // 1/32 of the 16-bit bucket space
        println(s"PROBE11 x20_files_touched zy<=${zyHi}: " +
          s"zorder=${touched(zDir, "zy", 0L, zyHi)}/64 " +
          s"plain=${touched(pDir, "zy", 0L, zyHi)}/64")
        for ((name, dir) <- Seq(("x20_scan_zorder", zDir),
                                ("x20_scan_plain", pDir))) {
          for (rep <- 1 to 3) {
            val t0 = System.nanoTime()
            val s0 = spark.read.parquet(dir)
              .filter(col("zy") <= zyHi)
              .agg(sum("l_quantity"), count(lit(1))).head()
            println(f"PROBE11 $name rep$rep ${
              (System.nanoTime() - t0) / 1e9}%.2f s rows=${s0.getLong(1)}")
          }
        }

        // --- l32: 3-epoch shuffle of the full corpus (range-sort shape)
        timed("l32_epochs3", graft.operators.CorpusAssembly
          .epochOrder(docs, "doc_id", epochs = 3, seed = 7L))

        // --- l30v: token-id streams over the whole corpus (map-only
        // replace chain + broadcast vocab join); merges trained on the
        // sf5 train split itself
        val trainDocs = docs.filter(graft.operators.TextAnalysis
          .splitAssign("doc_id", 80, 10) === "train")
        val t0b = System.nanoTime()
        val merges = graft.operators.Bpe.train(trainDocs, "text", 16)
        println(f"PROBE11 l30_train_sf5 ${
          (System.nanoTime() - t0b) / 1e9}%.2f s merges=${merges.size}")
        val vocab = graft.operators.Bpe.vocabTable(trainDocs, "text",
          merges)
        timed("l30v_token_ids", graft.operators.Bpe.tokenIds(docs,
          "doc_id", "text", merges, vocab)
          .groupBy("token_id").agg(count(lit(1)).as("n")))
        // the wall above is read-granularity-bound, not operator-bound:
        // FilePartition bin-packs the 32 ~10 MB fixture files into ~3
        // scan partitions at the default 128 MB maxPartitionBytes, so a
        // CPU-heavy per-doc map pass (16 codegen'd replaces per doc)
        // runs ~3-wide on a 32-core box. On a cluster the corpus is
        // thousands of files; locally, splitting finer recovers the
        // parallelism — measured side by side:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
        timed("l30v_token_ids_4mb_splits", graft.operators.Bpe
          .tokenIds(docs, "doc_id", "text", merges, vocab)
          .groupBy("token_id").agg(count(lit(1)).as("n")))
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128m")

        // --- streaming ANN index: build via 4 sink batches, then the
        // pruned search vs a full-index scan at 100 queries
        val emb = graft.core.Tables.embeddings(spark, sfDir)
          .select(col("vec_id"),
            col("embedding").cast("array<double>").as("embedding"))
        // serving shape: 256 cells, a 10-query lookup batch probing 8
        // cells each — <=80 of 256 directories should ever be listed
        // (the first probe ran 100 queries over 64 cells: the probe
        // union covered every cell and "pruning" just added the
        // probe-collect job — the pruned path is for ONLINE lookups,
        // not bulk all-pairs scoring, and the fixture should look like
        // one)
        val centroids = Similarity.sampleCentroids(emb, "vec_id",
          "embedding", nCells = 256).cache()
        centroids.count()
        val idxPath = "/tmp/scale/probe_annidx"
        org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(idxPath), true)
        val sink = graft.streaming.StreamOps.annIndexForeachBatch(
          idxPath, centroids, "vec_id", "embedding")
        val tIdx = System.nanoTime()
        for (b <- 0 until 4)
          sink(emb.filter(pmod(col("vec_id"), lit(4L)) === b.toLong),
            b.toLong)
        println(f"PROBE11 annidx_build_4batches ${
          (System.nanoTime() - tIdx) / 1e9}%.2f s")
        val qs = emb.filter(col("vec_id") < 10)
        timed("annidx_search_pruned", graft.streaming.StreamOps
          .annSearchFromIndex(spark, idxPath, qs, "vec_id", "embedding",
            centroids, k = 5, nProbe = 8))
        // full-scan comparator: same candidates, no cell pruning
        println(s"PROBE11 annidx_probed_cells " +
          graft.streaming.StreamOps.annIndex(spark, idxPath)
            .select("cell").distinct().count() + " total cells on disk")
        val qPrep = qs.select(col("vec_id").as("q_id"),
            col("embedding").cast("array<double>").as("qv"))
          .withColumn("qn", Similarity.norm("qv"))
        val probedAll = Similarity.assignCells(qPrep, "qv", "qn",
          centroids, "cell", take = 8)
        timed("annidx_search_fullscan", Similarity.rankTopKByCosine(
          graft.streaming.StreamOps.annIndex(spark, idxPath)
            .join(broadcast(probedAll), Seq("cell"))
            .filter(col("q_id") =!= col("n_id"))
            .withColumn("cosine", Similarity.dot("qv", "cv")
              / (col("qn") * col("cn"))), k = 5))

      case other =>
        throw new IllegalArgumentException(s"unknown probe mode $other")
    }
    spark.stop()
  }
}
