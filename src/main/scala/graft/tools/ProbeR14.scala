package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Sessions

/** Dev-only: the round-14 scale-evidence runs behind SCALE_r14.md.
  *
  * Modes (arg 1), sfDir (arg 2 — a ScaleGen `textdiv` corpus for the
  * text modes):
  *  - `kn`: the KN model-join broadcast→shuffle switch MEASURED
  *    (RISKS.md row 3): broadcast-hint form vs shuffleModelJoin form
  *    on the same diverse-text corpus — wall, shuffle bytes, bigram
  *    type count (the broadcast-size driver), and a result checksum
  *    proving the two forms agree at scale.
  *  - `warcfiles`: container-FILE ingest throughput — synthesizes a
  *    real multi-member .warc.gz on disk from the corpus docs (one
  *    gzip member per record, the CommonCrawl layout), then times
  *    WarcFiles.records end to end (splits → resync → inflate →
  *    warc_parse), records/s and MB/s FROM FILES, vs the in-column
  *    parse of the same payloads.
  */
object ProbeR14 {

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.build("graft-probe-r14", Sessions.cpusFromEnv(32))
    val metrics = TaskMetricsListener.installed(spark)

    def timed[T](name: String, reps: Int = 3)(body: => T): Unit =
      for (rep <- 1 to reps) {
        metrics.reset()
        val t0 = System.nanoTime()
        val r = body
        metrics.drain()
        println(f"PROBE14 $name rep$rep " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s result=$r " +
          f"shuffle=${metrics.shuffleWriteMb} MB " +
          f"spill=${metrics.spillMb} MB " +
          f"maxTask=${metrics.maxTaskSec}%.1f s")
      }

    mode match {
      case "kn" =>
        import graft.operators.TextAnalysis
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text").cache()
        val nDocs = docs.count()
        // model-size row: the broadcast-ceiling driver
        val nBigrams = docs
          .select(explode(expr(
            """transform(filter(split(text, ' '), x -> x <> ''),
               (x, i) -> struct(x AS t, i AS p))""")).as("s"),
            col("doc_id"))
          .select(col("doc_id"), col("s.t"), col("s.p"))
          .withColumn("is_train",
            TextAnalysis.splitAssign("doc_id", 80, 10) === "train")
          .filter(col("is_train"))
          .count()
        println(s"PROBE14 kn_corpus docs=$nDocs train_tokens~$nBigrams")
        // bit_xor, not sum: ANSI mode overflows on summed 64-bit hashes
        def checksum(df: DataFrame): Long =
          df.agg(expr(
            "bit_xor(xxhash64(doc_id, n_tokens, total_bits, keep))"))
            .collect()(0).getLong(0)
        timed("kn_broadcast")(checksum(
          TextAnalysis.knBigramSurprisal(docs, "doc_id", "text",
            keepBelowBits = 14.0)))
        // force what a >threshold table forces on a cluster: with the
        // thresholds at -1 only an explicit hint could broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
          "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        timed("kn_shuffle")(checksum(
          TextAnalysis.knBigramSurprisal(docs, "doc_id", "text",
            keepBelowBits = 14.0, shuffleModelJoin = true)))

      case "warcfiles" =>
        import java.util.zip.GZIPOutputStream
        val crlf = "\r\n"
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text")
        // build N real .warc.gz files on disk, one gzip member per
        // record, writer-side parallel (foreachPartition — each
        // partition writes its own file; driver never sees the bytes)
        val dir = java.nio.file.Files.createTempDirectory("warc14")
          .toString // String, not Path: the closure must serialize
        // few LARGE files (the CommonCrawl shape: ~1 GB each, far fewer
        // files than tasks) so the split machinery — not file-level
        // parallelism — is what's measured; 4 copies per doc → 100k
        // records
        val nFiles = 4
        val copies = 4
        docs.repartition(nFiles).foreachPartition {
          it: Iterator[org.apache.spark.sql.Row] =>
            if (it.hasNext) {
              val f = java.nio.file.Files.createTempFile(
                java.nio.file.Paths.get(dir), "part-", ".warc.gz")
              val out = new java.io.BufferedOutputStream(
                new java.io.FileOutputStream(f.toFile), 1 << 20)
              it.foreach { r =>
                for (rep <- 0 until copies) {
                  val id = r.getLong(0) + rep.toLong * 10000000L
                  val body = "<html><body><p>" + r.getString(1) +
                    s" copy $rep</p></body></html>"
                  val http = "HTTP/1.1 200 OK" + crlf +
                    "Content-Type: text/html" + crlf + crlf + body
                  val httpB = http.getBytes("UTF-8")
                  val rec = ("WARC/1.0" + crlf +
                    "WARC-Type: response" + crlf +
                    s"WARC-Target-URI: http://x/$id" + crlf +
                    "Content-Type: application/http" + crlf +
                    s"Content-Length: ${httpB.length}" + crlf + crlf)
                    .getBytes("UTF-8") ++ httpB ++
                    (crlf + crlf).getBytes("UTF-8")
                  // close() releases the native Deflater (finish()
                  // alone leaks one per record); the shield keeps the
                  // shared file stream open across members — and must
                  // override the BULK write (FilterOutputStream's
                  // default is byte-at-a-time) and not flush per
                  // member (finish() already pushed all bytes)
                  val shield = new java.io.FilterOutputStream(out) {
                    override def write(b: Array[Byte], o: Int,
                                       n: Int): Unit = out.write(b, o, n)
                    override def close(): Unit = ()
                  }
                  val g = new GZIPOutputStream(shield)
                  g.write(rec); g.close()
                }
              }
              out.close()
            }
        }
        val mb = {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.list(java.nio.file.Paths.get(dir))
            .iterator().asScala
            .map(p => java.nio.file.Files.size(p)).sum / 1e6
        }
        println(f"PROBE14 warcfiles corpus $mb%.1f MB compressed in " +
          s"$nFiles files at $dir")
        for (split <- Seq(1L << 20, 32L << 20))
          timed(s"warcfiles_records_split${split >> 20}m")(
            graft.sources.WarcFiles.records(spark, s"$dir/*.warc.gz",
              splitBytes = split).count())
        timed("warcfiles_response_texts")(
          graft.sources.WarcFiles.responseTexts(spark,
            s"$dir/*.warc.gz", splitBytes = 32L << 20)
            .agg(sum(length(col("text")))).collect()(0).getLong(0))

      case "packshard" =>
        import graft.operators.CorpusAssembly
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text")
          .withColumn("shard", expr("doc_id div 1000")).cache()
        val nDocs = docs.count()
        println(s"PROBE14 packshard docs=$nDocs shards=${
          docs.select("shard").distinct().count()}")
        def cks(df: DataFrame): Long = df.agg(expr(
          "bit_xor(xxhash64(doc_id, cum_tokens, bin, straddles_next))"))
          .collect()(0).getLong(0)
        timed("pack_global")(cks(CorpusAssembly.sequencePack(
          docs, "doc_id", "text", 2048L)))
        timed("pack_sharded")(cks(CorpusAssembly.sequencePackSharded(
          docs, "shard", "doc_id", "text", 2048L)
          .drop("shard")))
        // the incremental-append shape: ONE new shard packed alone
        val newShard = docs.filter(col("shard") === 24L)
        val prior = docs.filter(col("shard") < 24L)
          .agg(sum(graft.operators.TextAnalysis.tokenCount("text")))
          .collect()(0).getLong(0)
        timed("pack_append_one_shard")(cks(
          CorpusAssembly.sequencePackSharded(newShard, "shard",
            "doc_id", "text", 2048L, baseOffset = prior).drop("shard")))

      case "rsvd" =>
        import graft.operators.Pca
        // deterministic wide synthetic vectors: 4 planted decaying
        // directions (hash-derived) + hash noise — the decaying-spectrum
        // shape; generation is interpreted-HOF and excluded from timing
        def gen(n: Int, d: Int) = spark.range(0, n, 1, 32)
          .withColumn("embedding", expr(
            s"""transform(sequence(0, ${d - 1}), dd -> CAST(
                 CAST(pmod(xxhash64(id, dd), 4096L) - 2048L AS DOUBLE)
                   / 2048.0D * 0.05D
               + CAST(pmod(xxhash64(id, CAST(dd % 4 AS BIGINT), 7L),
                   4096L) - 2048L AS DOUBLE) / 2048.0D
                 * CAST(pow(0.5D, CAST(dd % 4 AS DOUBLE)) AS DOUBLE)
               AS DOUBLE))"""))
          .select("embedding").cache()
        for (d <- Seq(256, 1024)) {
          val df = gen(20000, d)
          df.count()
          timed(s"rsvd_exact_d$d", reps = 2)(
            Pca.fit(df, "embedding", dim = d).eigenvalues(0))
          timed(s"rsvd_rand_d$d", reps = 2)(
            Pca.fitRandomized(df, "embedding", dim = d, k = 16,
              powerIters = 1).eigenvalues(0))
          df.unpersist(blocking = true)
        }
        // past the exact wall: d=4096 — MomentAgg's triangle is 8.4M
        // cells (67 MB buffer/partition, ~2 GB merged) and the driver
        // Jacobi is ~7e10 flops/sweep; the randomized form is the one
        // still standing
        locally {
          val d = 4096
          val df = gen(20000, d)
          df.count()
          timed(s"rsvd_rand_d$d", reps = 2)(
            Pca.fitRandomized(df, "embedding", dim = d, k = 16,
              powerIters = 1).eigenvalues(0))
          df.unpersist(blocking = true)
        }

      case "l71ck" =>
        // checkpointed-stage curation pipeline vs the in-memory form
        // at scale: materialization overhead + the restart dividend
        import graft.operators.CurationPipeline
        val docs = graft.core.Tables.documents(spark, sfDir)
        val raw = docs.select(col("doc_id"), col("source"),
          concat(
            lit("<html><head><script>var x = 1;</script></head><body><p>"),
            col("text"),
            when(pmod(col("doc_id"), lit(2L)) === 0L,
              lit(" of and that have with")).otherwise(lit("")),
            lit("</p><a href=\"/n\">nav</a></body></html>")).as("html"),
          concat(lit("https://site"), pmod(col("doc_id"), lit(5L)),
            when(pmod(col("doc_id"), lit(5L)) === 2L,
              lit(".spam-domain.com/x")).otherwise(lit(".example.org/x")))
            .as("u"))
        val lineDf = (docs.count() / 10).max(4L)
        def runMem() = CurationPipeline.run(raw, "doc_id", "source",
          "html", "u", blockedDomains = Seq("spam-domain.com"),
          lineMaxDf = lineDf, gopherMinWords = 20, jaccN = 3,
          jaccThreshold = 0.2, jaccMaxDocFreq = 10,
          budgetPerSource = 100000L, packBudget = 2048L,
          trainPct = 80, valPct = 10,
          reline = c => concat(lit("nav home menu\n"),
            regexp_replace(c, " (the|a) ", "\n"),
            lit("\ncopyright footer 2024"))).collect()
        def runCk(dir: String) = CurationPipeline.runCheckpointed(raw,
          "doc_id", "source", "html", "u",
          blockedDomains = Seq("spam-domain.com"),
          lineMaxDf = lineDf, gopherMinWords = 20, jaccN = 3,
          jaccThreshold = 0.2, jaccMaxDocFreq = 10,
          budgetPerSource = 100000L, packBudget = 2048L,
          trainPct = 80, valPct = 10, stageDir = dir,
          reline = c => concat(lit("nav home menu\n"),
            regexp_replace(c, " (the|a) ", "\n"),
            lit("\ncopyright footer 2024"))).collect()
        timed("l71ck_inmemory", reps = 2)(runMem().length)
        val ckDir = java.nio.file.Files
          .createTempDirectory("l71ck").toString
        timed("l71ck_checkpointed_cold", reps = 1)(runCk(ckDir).length)
        // restart dividend: everything complete -> funnel reads only
        timed("l71ck_restart_all_complete", reps = 1)(runCk(ckDir).length)
        // kill stage 9 (the pair graph + components, the expensive one)
        java.nio.file.Files.delete(
          java.nio.file.Paths.get(s"$ckDir/s9/_SUCCESS"))
        timed("l71ck_restart_from_s9", reps = 1)(runCk(ckDir).length)

      case "wp" =>
        // WordPiece at scale: train rate (one extra symbol-count
        // aggregate per merge vs BPE) and greedy-encode throughput
        // (vs unigram Viterbi's 0.9-1.8M words/s, SCALE_r13 §2)
        import graft.operators.{Bpe, WordPiece}
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text").cache()
        val nWords = docs.select(explode(expr(
          "regexp_extract_all(lower(text), '[a-z]+', 0)")))
          .count()
        println(s"PROBE14 wp corpus words=$nWords")
        for (n <- Seq(16, 64)) {
          val t0 = System.nanoTime()
          val wm = WordPiece.train(docs, "text", n)
          val tw = (System.nanoTime() - t0) / 1e9
          val t1 = System.nanoTime()
          val bm = Bpe.train(docs, "text", n)
          val tb = (System.nanoTime() - t1) / 1e9
          println(f"PROBE14 wp_train n=$n wp=${tw}%.1f s " +
            f"(${n / tw}%.1f merges/s) bpe=${tb}%.1f s " +
            f"(${n / tb}%.1f merges/s) tables_differ=${wm != bm}")
          if (n == 64) {
            // batched trainer (the RISKS row-4 lever applied to this
            // family): merges/s at batch=8 vs the sequential rate
            val t2 = System.nanoTime()
            val wb = WordPiece.trainBatched(docs, "text", n, batch = 8)
            val t8 = (System.nanoTime() - t2) / 1e9
            println(f"PROBE14 wp_train_batched n=$n batch=8 " +
              f"${t8}%.1f s (${n / t8}%.1f merges/s) " +
              f"head_kept=${wb.head == wm.head}")
            val vocab = WordPiece.vocabTokens(docs, "text", wm)
            timed("wp_encode_64merge")(
              WordPiece.encode(docs, "doc_id", "text", vocab)
                .agg(sum("n_pieces")).collect()(0).getLong(0))
          }
        }

      case "sketch100m" =>
        // HLL at cluster-ish row counts: 100M rows, 30M distinct keys,
        // one combinable aggregate (register-max) — the x24 shape with
        // the corpus pass as the only cost. Exact distinct for the
        // error check.
        val n = 100L * 1000 * 1000
        val keys = spark.range(n).select(
          pmod(xxhash64(col("id")), lit(30000000L)).as("k"))
        // Exact distinct computed, NOT assumed: pmod(xxhash64, 30M)
        // over 100M rows leaves ~3.5% of residues unoccupied
        // (E[occupied] = 30M·(1−e^(−10/3)) ≈ 28.93M), so treating 30M
        // as the truth would fold that coverage gap into the reported
        // HLL error (the round-14 record's −3.24% was almost entirely
        // this baseline artifact, corrected in SCALE_r14.md §10).
        val exact = keys.distinct().count()
        timed("hll_100m_rows") {
          val est = keys.agg(hll_sketch_estimate(
            hll_sketch_agg(col("k"), lit(12)))).collect()(0).getLong(0)
          f"est=$est exact=$exact " +
            f"err=${(est - exact).toDouble / exact * 100}%.2f%%"
        }
        timed("kmv_100m_rows") {
          val sig = graft.operators.DistinctSketch
            .kminHashes(keys, col("k"), 4096)
          sig.count()
        }

      case "ccinc" =>
        // Incremental CC economics: history = 5M random edges over 1M
        // nodes already labeled (the standing state); a 20k-edge batch
        // arrives. full = CC over all 5.02M edges (what a per-arrival
        // recompute pays, growing with history); incremental = CC over
        // star(state) ∪ batch (≤|V| + 20k edges, flat in history).
        import graft.operators.GraphRank
        val nNodes = 1000000L
        val hist = spark.range(5000000L).select(
          pmod(xxhash64(col("id")), lit(nNodes)).as("src"),
          pmod(xxhash64(col("id") + lit(7L)), lit(nNodes)).as("dst"))
          .filter(col("src") =!= col("dst"))
        val batch = spark.range(20000L).select(
          pmod(xxhash64(col("id") + lit(99L)), lit(nNodes)).as("src"),
          pmod(xxhash64(col("id") + lit(424242L)), lit(nNodes)).as("dst"))
          .filter(col("src") =!= col("dst"))
        val state = GraphRank.connectedComponents(hist, "src", "dst")
        state.count() // labeled standing state, excluded from timings
        val star = state.filter(col("node") =!= col("component"))
          .select(col("node").as("src"), col("component").as("dst"))
          .localCheckpoint(true)
        timed("ccinc_full_recompute", reps = 2) {
          val r = GraphRank.connectedComponents(
            hist.unionByName(batch), "src", "dst")
          val n = r.select(countDistinct(col("component"))).collect()(0)
            .getLong(0)
          r.unpersist(blocking = false); n
        }
        timed("ccinc_star_plus_batch", reps = 2) {
          val r = GraphRank.connectedComponents(
            star.unionByName(batch), "src", "dst")
          val n = r.select(countDistinct(col("component"))).collect()(0)
            .getLong(0)
          r.unpersist(blocking = false); n
        }
        state.unpersist(blocking = false)

      case "kmv" =>
        // KMV corpus-overlap at scale: two half-corpora of sf5textdiv
        // 3-gram shingles. exact = distinct+distinct+join (what x25's
        // certification side pays); kmv = two independent signature
        // scans (k rows each) + a 2k-row estimate — the form that
        // never joins the corpora and whose signatures persist per
        // snapshot.
        import graft.operators.{Dedup, DistinctSketch}
        val k = 4096
        val docs = graft.core.Tables.documents(spark, sfDir)
        def corpus(m: Int*) = docs
          .filter(pmod(col("doc_id"), lit(3))
            .isin(m.map(_.toLong): _*))
          .select(explode(Dedup.shingles("text", 3)).as("g"))
        val a = corpus(0, 1)
        val b = corpus(1, 2)
        timed("kmv_exact_join") {
          val na = a.distinct().count()
          val nb = b.distinct().count()
          val ni = a.distinct().join(b.distinct(), "g").count()
          (na, nb, ni)
        }
        timed("kmv_signatures_estimate") {
          val est = DistinctSketch.overlapEstimate(
            DistinctSketch.kminHashes(a, col("g"), k),
            DistinctSketch.kminHashes(b, col("g"), k), k).collect()(0)
          (math.round(est.getDouble(1)), math.round(est.getDouble(2)),
            est.getBoolean(3))
        }

      case "graph" =>
        // Pre-partitioned iterative graph loops (RISKS row 2): 20M
        // synthetic edges over 2M nodes — the rank table (2M rows,
        // ~32 MB) is past both broadcast thresholds, so the per-
        // iteration joins run shuffled exactly as they would at 100 TB.
        // plain: every iteration re-exchanges the 20M-row cached edge
        // list on src; prepart: the edge list is exchanged ONCE at
        // cache time and each iteration shuffles only the (dst,
        // contrib) aggregate.
        import graft.operators.GraphRank
        val nEdges = 20L * 1000 * 1000
        val nNodes = 2L * 1000 * 1000
        val e = spark.range(nEdges).select(
          pmod(xxhash64(col("id")), lit(nNodes)).as("src"),
          pmod(xxhash64(col("id") + lit(nEdges)), lit(nNodes)).as("dst"))
          .filter(col("src") =!= col("dst"))
        for (pre <- Seq(false, true)) {
          timed(s"pagerank_20m_pre=$pre", reps = 2) {
            val r = GraphRank.pageRankFixedPoint(e, "src", "dst",
              iters = 6, prePartitionEdges = pre)
            val chk = r.agg(sum(col("r"))).collect()(0).getLong(0)
            r.unpersist(blocking = false)
            spark.sharedState.cacheManager.clearCache()
            chk
          }
        }

      case other => sys.error(s"unknown mode: $other")
    }
    spark.stop()
  }
}
