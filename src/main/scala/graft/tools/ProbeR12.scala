package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.core.Sessions

/** Dev-only: the round-12 scale-evidence runs behind SCALE_r12.md.
  *
  * Modes (arg 1), sfDir (arg 2):
  *  - `zwrite`: the x20 z-order write premium, re-measured after the
  *    interleave_bits codegen fix (round 11 measured 10.1 s vs 4.9 s
  *    plain with the Morton key silently evaluated INTERPRETED — the
  *    premium should now be mostly the range-sort, not per-row eval).
  *  - `pqbloom`: x23 parquet native blooms at scale — a 30M-row
  *    high-cardinality hash table, needle point-probe. Reports ROW
  *    GROUPS READ with the bloom consulted vs not (direct
  *    parquet-hadoop measurement: the same footer, the same equality
  *    predicate, useBloomFilter on/off), plus the Spark-side needle
  *    scan wall on the bloom-written vs plain layout.
  *  - `autosalt`: RangeJoin.AutoSalt on the round-11 output-blowup
  *    skew fixture vs the hand-picked salt=8 — the chosen factor and
  *    whether auto matches manual's cure.
  *  - `bpe1k`: BPE merge-learning rate at a REAL vocabulary size —
  *    1000 merges over the text-diverse sf5 corpus (ScaleGen
  *    `textdiv`), the sequential-iteration ceiling the 16-merge design
  *    point never exercised. Reports merges learned, wall, merges/sec.
  */
object ProbeR12 {

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.build("graft-probe-r12", Sessions.cpusFromEnv(32))
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
      println(s"PROBE12 $name ${out.mkString(" | ")}")
    }

    mode match {
      case "wave8" =>
        // the wave-8 operators, timed AS REGISTERED (construction
        // inside the clock — l66's greedy steps run driver-paced jobs
        // during construction, m3's decode cost is the whole cost):
        // l63/l64 map-only batteries, m3 decode+DCT+band join, l66
        // k=8 MMR passes, l65 pairs→closure→LCG composition.
        for (q <- Seq("l63_gopher_rules", "l64_mojibake_repair",
            "m3_phash_near_dup", "l66_mmr_select",
            "l65_leakage_safe_split"))
          timed(q, graft.SparkEntry.queries(q)(spark, sfDir), reps = 2)

      case "wave9" =>
        // l67: the DoReMi excess pass is the corpus-scale cost (token
        // explode + two vocab aggs + the clipped-excess join); the 12
        // weight iterations are K-row driver math. l68: map-side
        // digests, (id, digest)-only full outer join.
        timed("l67_doremi_weights",
          graft.SparkEntry.queries("l67_doremi_weights")(spark, sfDir),
          reps = 2)
        timed("l68_snapshot_diff",
          graft.SparkEntry.queries("l68_snapshot_diff")(spark, sfDir),
          reps = 2)

      case "wave10" =>
        // l69 on a WIDE domain at 30M rows: xxhash64 values (63-bit
        // nonneg) force the multi-pass narrowing; reports passes
        // implicitly via wall (each pass = one filtered histogram agg
        // whose range filter reaches the scan). l70 at 250k docs.
        val wide = spark.range(0, 30000000L, 1, 32)
          .select(col("id"),
            expr("xxhash64(id) & 9223372036854775807").as("v"))
          .cache()
        wide.count()
        for (rep <- 1 to 3) {
          metrics.reset()
          val t0 = System.nanoTime()
          val thr = graft.operators.Quantiles.kthLargest(
            wide, "v", "id", k = 3000000L, buckets = 65536)
          metrics.drain()
          println(f"PROBE12 l69_kth_30m rep$rep " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s thr=$thr " +
            f"shuffle=${metrics.shuffleWriteMb} MB " +
            f"maxTask=${metrics.maxTaskSec}%.1f s")
        }
        wide.unpersist()
        timed("l70h_sentence_dedup",
          graft.SparkEntry.queries("l70h_sentence_dedup_hashed")(
            spark, sfDir), reps = 2)

      case "wave8m3" =>
        // m3 re-probed after the magic-byte sniff (skip ImageIO's
        // per-row reader search on non-image payloads)
        timed("m3_phash_near_dup",
          graft.SparkEntry.queries("m3_phash_near_dup")(spark, sfDir),
          reps = 3)

      case "zwrite" =>
        val li = graft.core.Tables.lineitem(spark, sfDir).select(
          col("l_orderkey"), col("l_quantity"),
          (col("l_partkey") % 65536L).cast("long").as("zx"),
          (col("l_suppkey") % 65536L).cast("long").as("zy"))
        val liZ = li.withColumn("z", graft.operators.ZOrder
          .zvalue(col("zx"), col("zy")))
        val zDir = "/tmp/scale/probe12_zorder"
        val pDir = "/tmp/scale/probe12_plain"
        for (rep <- 1 to 2;
             (name, write) <- Seq[(String, () => Unit)](
               ("x20_zorder_write", () => graft.operators.ZOrder
                 .writeZOrdered(liZ, "z", zDir, numFiles = 64)),
               ("x20_plain_write", () => liZ.repartition(64)
                 .write.mode(SaveMode.Overwrite).parquet(pDir)))) {
          metrics.reset()
          val t0 = System.nanoTime()
          write()
          metrics.drain()
          println(f"PROBE12 $name rep$rep ${
            (System.nanoTime() - t0) / 1e9}%.2f s" +
            f" shuffle=${metrics.shuffleWriteMb} MB" +
            f" maxTask=${metrics.maxTaskSec}%.1f s")
        }
        // pruning payoff unchanged in kind from r11 — re-pin one row so
        // the re-probe stands alone
        def touched(dir: String, c: String, lo: Long, hi: Long): Int =
          new java.io.File(dir).listFiles()
            .filter(f => f.getName.startsWith("part-") &&
              f.getName.endsWith(".parquet"))
            .count { f =>
              val r = spark.read.parquet(f.getAbsolutePath)
                .agg(min(col(c)), max(col(c))).head()
              r.getLong(0) <= hi && r.getLong(1) >= lo
            }
        println(s"PROBE12 x20_files_touched zy<=2047: " +
          s"zorder=${touched(zDir, "zy", 0L, 2047L)}/64 " +
          s"plain=${touched(pDir, "zy", 0L, 2047L)}/64")

      case "pqbloom" =>
        import graft.sources.Formats
        val n = 30000000L
        val t = spark.range(0L, n, 1L, 32)
          .select(col("id"), md5(col("id").cast("string")).as("h"))
        val bDir = "/tmp/scale/probe12_bloom"
        val pDir = "/tmp/scale/probe12_nobloom"
        // ~1M distinct hashes per file/row group
        Formats.writeParquetBloom(t, bDir, Seq("h"),
          expectedNdv = n / 32)
        t.write.mode("overwrite").parquet(pDir)
        val needleId = 12345678L
        val needle = t.filter(col("id") === needleId)
          .select("h").head().getString(0)

        // direct row-group measurement: same files, same equality
        // predicate, bloom consulted vs not (stats/dictionary pruning
        // disabled both times so the delta is the bloom alone)
        def rowGroups(dir: String, useBloom: Boolean): (Int, Int) = {
          import org.apache.parquet.filter2.compat.FilterCompat
          import org.apache.parquet.filter2.predicate.FilterApi
          import org.apache.parquet.hadoop.{ParquetFileReader}
          import org.apache.parquet.hadoop.util.HadoopInputFile
          import org.apache.parquet.io.api.Binary
          val conf = spark.sparkContext.hadoopConfiguration
          val pred = FilterCompat.get(FilterApi.eq(
            FilterApi.binaryColumn("h"), Binary.fromString(needle)))
          var total = 0
          var read = 0
          new java.io.File(dir).listFiles()
            .filter(f => f.getName.endsWith(".parquet")).foreach { f =>
              val in = HadoopInputFile.fromPath(
                new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf)
              val all = ParquetFileReader.open(in)
              try total += all.getRowGroups.size()
              finally all.close()
              val opts = org.apache.parquet.HadoopReadOptions
                .builder(conf)
                .withRecordFilter(pred)
                .useBloomFilter(useBloom)
                .useStatsFilter(false)
                .useDictionaryFilter(false)
                .build()
              val r = ParquetFileReader.open(in, opts)
              try read += r.getRowGroups.size()
              finally r.close()
            }
          (read, total)
        }
        val (withB, tot) = rowGroups(bDir, useBloom = true)
        val (withoutB, _) = rowGroups(bDir, useBloom = false)
        println(s"PROBE12 pqbloom_rowgroups needle-probe over $n rows: " +
          s"bloom=$withB/$tot read, nobloom=$withoutB/$tot read")

        // Spark-side needle scan wall, bloom layout vs plain layout
        for ((name, dir) <- Seq(("pqbloom_scan_bloom", bDir),
                                ("pqbloom_scan_plain", pDir));
             rep <- 1 to 3) {
          metrics.reset()
          val t0 = System.nanoTime()
          val c = spark.read.parquet(dir)
            .filter(col("h") === needle).count()
          println(f"PROBE12 $name rep$rep ${
            (System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
        }

      case "autosalt" =>
        val ev5 = graft.core.Tables.eventsWithTsUs(spark, sfDir)
          .select(col("event_id"), expr("ts_us DIV 3600000000").as("hr"))
        val win5 = graft.core.Tables.orders(spark, sfDir)
          .filter(pmod(col("o_orderkey"), lit(97L)) === 0L)
          .select(col("o_orderkey"),
            (lit(473352L) + pmod(col("o_orderkey"), lit(30000L)))
              .as("start_hr"))
          .withColumn("end_hr", col("start_hr") + lit(47L))
        val chosen = graft.operators.RangeJoin
          .chooseSalt(ev5, "hr", 24L)
        println(s"PROBE12 autosalt_chosen salt=$chosen")
        timed("x21_salt8_manual", graft.operators.RangeJoin
          .pointInInterval(ev5, win5, "hr", "start_hr", "end_hr", 24L,
            salt = 8)
          .groupBy("o_orderkey").agg(count(lit(1)).as("n")), reps = 2)
        timed("x21_salt_auto", graft.operators.RangeJoin
          .pointInInterval(ev5, win5, "hr", "start_hr", "end_hr", 24L,
            salt = graft.operators.RangeJoin.AutoSalt)
          .groupBy("o_orderkey").agg(count(lit(1)).as("n")), reps = 2)

      case "bpe1k" =>
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text")
        val tr = docs.filter(graft.operators.TextAnalysis
          .splitAssign("doc_id", 80, 10) === "train")
        val nM = if (args.length > 2) args(2).toInt else 1000
        val t0 = System.nanoTime()
        val merges = graft.operators.Bpe.train(tr, "text", nM)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"PROBE12 bpe1k merges=${merges.size} wall=${secs}%.1f s" +
          f" merges_per_sec=${merges.size / secs}%.2f")
        // the learned table must be a real sub-word vocabulary, not the
        // base alphabet: show the tail merges
        println(s"PROBE12 bpe1k_tail ${merges.takeRight(5)
          .map(m => s"${m.a}+${m.b}").mkString(" ")}")

      case "bpebatch" =>
        // the block-greedy cure for the sequential ceiling bpe1k
        // measured: same corpus, same merge budget, batch=32 adoptions
        // per driver round
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text")
        val tr = docs.filter(graft.operators.TextAnalysis
          .splitAssign("doc_id", 80, 10) === "train")
        val nM = if (args.length > 2) args(2).toInt else 1000
        val bsz = if (args.length > 3) args(3).toInt else 32
        val t0 = System.nanoTime()
        val merges = graft.operators.Bpe.trainBatched(tr, "text", nM, bsz)
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"PROBE12 bpebatch batch=$bsz merges=${merges.size} " +
          f"wall=${secs}%.1f s merges_per_sec=${merges.size / secs}%.2f")
        println(s"PROBE12 bpebatch_tail ${merges.takeRight(5)
          .map(m => s"${m.a}+${m.b}").mkString(" ")}")

      case "newops12" =>
        // l35 unicode clean + l36 URL canonicalization at scale — both
        // are map-only codegen'd projections, so the claim to verify is
        // ZERO shuffle and linear wall, not clever distribution
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text")
        timed("l35_unicode_clean", graft.operators.TextAnalysis
          .unicodeClean(docs.withColumn("__dirty",
            concat(col("text"), lit(" nai\u0308ve cafe\u0301"),
              when(col("doc_id") % 3 === 0, lit("\u200Bzw\u0001ctl"))
                .otherwise(lit("")))), "doc_id", "__dirty")
          .groupBy().agg(sum("removed_chars"), count(lit(1))))
        val urls = spark.range(0L, 30000000L, 1L, 32)
          .select(col("id").as("doc_id"),
            concat(lit("HTTP://Host"), pmod(col("id"), lit(100000L)),
              lit(".Example.COM:80/p/"), col("id"),
              lit("?utm_source=x&q="), pmod(col("id"), lit(7L)),
              lit("#f")).as("u"))
        timed("l36_canonicalize_30m", graft.operators.Urls
          .canonicalize(urls, "u")
          .groupBy().agg(count(col("url_canonical")),
            approx_count_distinct(col("url_domain"))))
        import spark.implicits._
        val block = (0L until 100000L).map(i => s"host$i.example.com")
          .toDF("domain")
        timed("l36_blocklist_100k_30m", graft.operators.Urls
          .filterBlockedDomains(urls, "u", block)
          .groupBy().agg(count(lit(1))))
        // l14b at 250k docs (3 regex passes, map-only)
        timed("l14b_redact_pii", docs
          .withColumn("__dirty", concat(col("text"),
            lit(" contact bob"), col("doc_id"), lit("@ex-"),
            col("doc_id"), lit(".com or 10.0."),
            pmod(col("doc_id"), lit(256L)), lit(".7 acct 9912345")))
          .select(col("doc_id"),
            graft.operators.TextAnalysis.redactPii("__dirty").as("red"))
          .groupBy().agg(sum(length(col("red")))))
        // l37 domain-cap window at 30M rows, in BOTH distribution
        // shapes. The rank filter becomes a WindowGroupLimit pushed
        // BELOW the exchange (plan-verified: `l37plan`), so each map
        // task forwards at most 40 rows per domain it sees — which
        // makes the single-hot-domain shape (all 30M URLs under one
        // registrable domain: the `hostN.example.com` synth collapses
        // to example.com) cost only the map-side sort, ~zero shuffle.
        def capQuery(src: org.apache.spark.sql.DataFrame) = {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("url_domain")
            .orderBy(col("h"), col("doc_id"))
          graft.operators.Barrier.filterAbove(
              graft.operators.Urls.canonicalize(src, "u"),
              col("url_domain").isNotNull)
            .withColumn("h", expr(
              "pmod(pmod(doc_id, 100000007) * 1103515245 + 12345, " +
                "1000000)"))
            .withColumn("rnk", row_number().over(w).cast("long"))
            .filter(col("rnk") <= 40L)
            .groupBy().agg(count(lit(1)), sum("h"))
        }
        timed("l37_cap_30m_one_hot_domain", capQuery(urls))
        val urlsMany = spark.range(0L, 30000000L, 1L, 32)
          .select(col("id").as("doc_id"),
            concat(lit("https://www.site"), pmod(col("id"), lit(100000L)),
              lit(".org/p/"), col("id")).as("u"))
        timed("l37_cap_30m_100k_domains", capQuery(urlsMany))

      case "urlplan" =>
        val urls = spark.range(0L, 1000L, 1L, 4)
          .select(col("id").as("doc_id"),
            concat(lit("HTTP://Host"), pmod(col("id"), lit(100000L)),
              lit(".Example.COM:80/p/"), col("id"),
              lit("?utm_source=x&q="), pmod(col("id"), lit(7L)),
              lit("#f")).as("u"))
        import spark.implicits._
        val block = (0L until 100L).map(i => s"host$i.example.com")
          .toDF("domain")
        val q = graft.operators.Urls.filterBlockedDomains(urls, "u",
          block).groupBy().agg(count(lit(1)))
        println(q.queryExecution.executedPlan.toString.take(8000))

      case "shingleplan" =>
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text")
        for ((label, sh) <- Seq(
          "bare_filter" -> docs.select(col("doc_id").as("doc"),
              graft.operators.Dedup.shingles("text", 3).as("sh"))
            .filter(size(col("sh")) > 0),
          "barrier" -> graft.operators.Barrier.filterAbove(
            docs.select(col("doc_id").as("doc"),
              graft.operators.Dedup.shingles("text", 3).as("sh")),
            size(col("sh")) > 0))) {
          val plan = sh.queryExecution.executedPlan.toString
          val n = "element_at\\(transform".r.findAllIn(plan).size
          // wall of one full materialization (the cache-fill cost)
          val t0 = System.nanoTime()
          sh.write.format("noop").mode(SaveMode.Overwrite).save()
          println(f"PROBE12 shingleplan_$label " +
            f"transform_occurrences=$n " +
            f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
        }

      case "l38probe" =>
        // cluster-balance at the sf5 clustered-embedding corpus (100k
        // vectors, 64 natural clusters): 256 cells, cap 200 — the cap
        // must bind on the dense clusters and pass the sparse tail
        val emb = graft.core.Tables.embeddings(spark, sfDir)
        timed("l38_cluster_balance_100k", graft.operators.Similarity
          .clusterBalancedSample(emb, "vec_id", "embedding",
            nCells = 256, cap = 200)
          .groupBy().agg(count(lit(1)),
            sum(when(col("kept"), 1L).otherwise(0L))))
        val kept = graft.operators.Similarity
          .clusterBalancedSample(emb, "vec_id", "embedding",
            nCells = 256, cap = 200)
          .agg(count(lit(1)).as("n"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("k")).head()
        println(s"PROBE12 l38_kept ${kept.getLong(1)}/${kept.getLong(0)}")

      case "l37plan" =>
        val urls = spark.range(0L, 10000L, 1L, 4)
          .select(col("id").as("doc_id"),
            concat(lit("HTTP://Host"), pmod(col("id"), lit(100L)),
              lit(".Example.COM:80/p/"), col("id")).as("u"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("url_domain")
          .orderBy(col("h"), col("doc_id"))
        val q = graft.operators.Barrier.filterAbove(
            graft.operators.Urls.canonicalize(urls, "u"),
            col("url_domain").isNotNull)
          .withColumn("h", expr(
            "pmod(pmod(doc_id, 100000007) * 1103515245 + 12345, 1000000)"))
          .withColumn("rnk", row_number().over(w).cast("long"))
          .filter(col("rnk") <= 40L)
          .groupBy().agg(count(lit(1)), sum("h"))
        q.collect()
        println(q.queryExecution.executedPlan.toString.take(4000))

      case "ccprobe" =>
        // connected components at the 100 TB dedup-graph shape:
        // 3M 10-member dup clusters as stars (27M edges, diameter 2 —
        // the shape near-dup pair graphs actually have), plus a 1M-leaf
        // hot star (join-key skew on the hub), plus (separately timed)
        // a 10k chain — the adversarial-diameter case that drives the
        // round count, isolated so its cost is attributable.
        import graft.operators.GraphRank
        val stars = spark.range(0L, 27000000L, 1L, 32)
          .select((col("id") / 9L).cast("long").as("c"),
            col("id").as("i"))
          .select((col("c") * 10L).as("src"),
            (col("c") * 10L + pmod(col("i"), lit(9L)) + 1L).as("dst"))
        val hot = spark.range(0L, 1000000L, 1L, 32)
          .select(lit(900000000L).as("src"),
            (lit(900000001L) + col("id")).as("dst"))
        val big = stars.union(hot)
        for (rep <- 1 to 2) {
          spark.catalog.clearCache()
          metrics.reset()
          val t0 = System.nanoTime()
          val (cc, rounds) = GraphRank
            .connectedComponentsWithStats(big, "src", "dst")
          val n = cc.groupBy().agg(countDistinct("component")).head()
          val secs = (System.nanoTime() - t0) / 1e9
          metrics.drain()
          println(f"PROBE12 cc_28m_edges rep$rep ${secs}%.1f s " +
            f"rounds=$rounds comps=${n.getLong(0)} " +
            f"shuffle=${metrics.shuffleWriteMb} MB " +
            f"spill=${metrics.spillMb} MB maxTask=${metrics.maxTaskSec}%.1f s")
          cc.unpersist(blocking = false)
        }
        val chain = spark.range(0L, 10000L, 1L, 8)
          .select(col("id").as("src"), (col("id") + 1L).as("dst"))
        val t1 = System.nanoTime()
        val (cc2, rounds2) = GraphRank
          .connectedComponentsWithStats(chain, "src", "dst")
        val c2 = cc2.groupBy().agg(countDistinct("component")).head()
        println(f"PROBE12 cc_chain_10k ${(System.nanoTime() - t1) / 1e9}%.1f s " +
          f"rounds=$rounds2 comps=${c2.getLong(0)}")
        cc2.unpersist(blocking = false)

      case "dsirscale" =>
        // DSIR at the honest regime: the sf5textdiv corpus mixes the
        // ORIGINAL sf0.1 docs (copy 0, shared engine-word vocabulary)
        // with power-law regenerated copies — two genuinely different
        // token distributions. Target = the originals; DSIR should
        // pull the kept set overwhelmingly from the original
        // distribution (the "steer the crawl toward the target" claim,
        // measured, not asserted).
        val docs = graft.core.Tables.documents(spark, sfDir)
        // copy 0 keeps the original sf0.1 ids; copies shift by i*base
        val origMax = graft.core.Tables
          .documents(spark, "/root/testdata/sf0.1")
          .agg(max("doc_id")).head().getLong(0)
        val pred = col("doc_id") <= lit(origMax)
        timed("l41_dsir_250k", graft.operators.Dsir.importanceResample(
          docs, "doc_id", "text", targetPred = pred,
          buckets = 65536, topK = 5000))
        val kept = graft.operators.Dsir.importanceResample(
            docs, "doc_id", "text", targetPred = pred,
            buckets = 65536, topK = 5000)
          .filter(col("keep") === 1L)
          .agg(count(lit(1)).as("n"),
            sum(when(pred, 1L).otherwise(0L)).as("orig")).head()
        println(s"PROBE12 l41_kept_from_target ${kept.getLong(1)}/" +
          s"${kept.getLong(0)}")

      case "neardupstream" =>
        // streaming near-dup index at a 250k-doc standing corpus:
        // batch 0 seeds the index (one-time O(corpus) signature build),
        // batch 1 is 10k planted near-dups (standing docs + one token)
        // + 5k fresh docs — the daily-crawl shape. The batch cost is
        // what scales: the candidate join broadcasts the batch's bands
        // over ONE standing bucket scan, verification broadcasts the
        // candidate ids over standing shingle scans — no
        // standing-sized shuffle anywhere (asserted by metrics).
        val root = "/tmp/scale/probe12_neardup"
        org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(root), true)
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        val sink = graft.streaming.StreamOps.nearDupIndexForeachBatch(
          s"$root/index", s"$root/pairs", "doc_id", "text")
        metrics.reset()
        val t0 = System.nanoTime()
        sink(docs, 0L)
        println(f"PROBE12 neardup_seed_250k ${(System.nanoTime() - t0) / 1e9}%.1f s " +
          f"shuffle=${metrics.shuffleWriteMb} MB spill=${metrics.spillMb} MB " +
          f"maxTask=${metrics.maxTaskSec}%.1f s")
        val planted = docs.filter(pmod(col("doc_id"), lit(25L)) === 0L)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            concat(col("text"), lit(" xqz")).as("text"))
        // fresh docs with per-doc-unique tokens (no cross-doc shingles)
        val fresh = spark.range(0L, 5000L, 1L, 8)
          .select((col("id") + 20000000L).as("doc_id"),
            expr("""concat_ws(' ', transform(sequence(0, 9),
              j -> concat('w', id, 'x', j)))""").as("text"))
        val batch = planted.unionByName(fresh)
        metrics.reset()
        val t1 = System.nanoTime()
        sink(batch, 1L)
        val secs1 = (System.nanoTime() - t1) / 1e9
        val nPairs1 = spark.read.parquet(s"$root/pairs/batch=1").count()
        println(f"PROBE12 neardup_batch_15k ${secs1}%.1f s " +
          f"pairs=$nPairs1 shuffle=${metrics.shuffleWriteMb} MB " +
          f"spill=${metrics.spillMb} MB maxTask=${metrics.maxTaskSec}%.1f s")
        // the PATHOLOGICAL batch (5k mutually-near-dup docs — one hot
        // bucket family) under the cap: bounded star pairs, not m^2
        val hotSink = graft.streaming.StreamOps.nearDupIndexForeachBatch(
          s"$root/index", s"$root/pairs", "doc_id", "text",
          maxBucket = 16)
        val hotBatch = spark.range(0L, 5000L, 1L, 8)
          .select((col("id") + 30000000L).as("doc_id"),
            concat(lit("hot boiler plate qa qb qc qd qe qf qg qh tail "),
              col("id")).as("text"))
        metrics.reset()
        val t2 = System.nanoTime()
        hotSink(hotBatch, 2L)
        val secs2 = (System.nanoTime() - t2) / 1e9
        val nPairs2 = spark.read.parquet(s"$root/pairs/batch=2").count()
        println(f"PROBE12 neardup_hot5k_capped ${secs2}%.1f s " +
          f"pairs=$nPairs2 shuffle=${metrics.shuffleWriteMb} MB " +
          f"spill=${metrics.spillMb} MB maxTask=${metrics.maxTaskSec}%.1f s")
        // fold each batch's pair log into standing cluster labels —
        // the downstream dupClusterForeachBatch at the same scale
        val ccSink = graft.streaming.StreamOps
          .dupClusterForeachBatch(s"$root/cc")
        for (b <- 1L to 2L) {
          metrics.reset()
          val t3 = System.nanoTime()
          ccSink(spark.read.parquet(s"$root/pairs/batch=$b"), b)
          val secs3 = (System.nanoTime() - t3) / 1e9
          val nLbl = graft.streaming.StreamOps.dupClusters(spark,
            s"$root/cc").count()
          println(f"PROBE12 dupcc_fold_batch$b ${secs3}%.1f s " +
            f"labels=$nLbl shuffle=${metrics.shuffleWriteMb} MB " +
            f"maxTask=${metrics.maxTaskSec}%.1f s")
        }

      case "prefixstream" =>
        // streaming prefix-filter (l54) index at a 250k-doc standing
        // corpus — the exact-recall counterpart of `neardupstream`:
        // batch 0 seeds (freezes the df order + one-time prefix build),
        // batch 1 = 10k planted near-dups + 5k fresh docs.
        val root = "/tmp/scale/probe12_prefix"
        org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
          .delete(new org.apache.hadoop.fs.Path(root), true)
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
        val sink = graft.streaming.StreamOps.prefixDupIndexForeachBatch(
          s"$root/index", s"$root/pairs", "doc_id", "text",
          threshold = 0.8)
        metrics.reset()
        val t0 = System.nanoTime()
        sink(docs, 0L)
        println(f"PROBE12 prefix_seed_250k ${
          (System.nanoTime() - t0) / 1e9}%.1f s " +
          f"shuffle=${metrics.shuffleWriteMb} MB " +
          f"spill=${metrics.spillMb} MB " +
          f"maxTask=${metrics.maxTaskSec}%.1f s")
        val planted = docs.filter(pmod(col("doc_id"), lit(25L)) === 0L)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            concat(col("text"), lit(" xqz")).as("text"))
        val fresh = spark.range(0L, 5000L, 1L, 8)
          .select((col("id") + 20000000L).as("doc_id"),
            expr("""concat_ws(' ', transform(sequence(0, 9),
              j -> concat('w', id, 'x', j)))""").as("text"))
        metrics.reset()
        val t1 = System.nanoTime()
        sink(planted.unionByName(fresh), 1L)
        val secs1 = (System.nanoTime() - t1) / 1e9
        val nPairs1 = spark.read.parquet(s"$root/pairs/batch=1").count()
        println(f"PROBE12 prefix_batch_15k ${secs1}%.1f s " +
          f"pairs=$nPairs1 shuffle=${metrics.shuffleWriteMb} MB " +
          f"spill=${metrics.spillMb} MB maxTask=${metrics.maxTaskSec}%.1f s")
        val px = spark.read.parquet(s"$root/index/prefixes/d=0").count()
        val sh = spark.read.parquet(s"$root/index/shingles/d=0").count()
        println(s"PROBE12 prefix_state seed_prefix_rows=$px " +
          s"seed_docs=$sh")

      case "semdedupscale" =>
        // the FULL l42 SemDeDup pipeline at 100k clustered vectors
        // (sf5 `cluster` mode — 64 natural clusters, the honest ANN
        // regime): capped cosine pair stage -> connected components ->
        // min-id keeper. Stage-split timing so the closure's share is
        // attributable; kept fraction shows the dedup genuinely bites
        // on a clustered corpus.
        val emb = graft.core.Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding"))
        metrics.reset()
        val tp = System.nanoTime()
        val pr = graft.operators.Similarity.cosineNearDupPairsCapped(
          emb, "vec_id", "embedding", threshold = 0.9, dim = 64,
          nPlanes = 12, nTables = 8, maxBucket = 64)
          .cache()
        val nPairs = pr.count()
        val pSec = (System.nanoTime() - tp) / 1e9
        println(f"PROBE12 semdedup_pairs_100k ${pSec}%.1f s " +
          f"pairs=$nPairs shuffle=${metrics.shuffleWriteMb} MB " +
          f"spill=${metrics.spillMb} MB maxTask=${metrics.maxTaskSec}%.1f s")
        metrics.reset()
        val tc = System.nanoTime()
        val (cc, rounds) = graft.operators.GraphRank
          .connectedComponentsWithStats(pr, "doc_a", "doc_b")
        val stats = cc.agg(count(lit(1)).as("n"),
          countDistinct("component").as("k")).head()
        val cSec = (System.nanoTime() - tc) / 1e9
        val total = emb.count()
        val kept = total - stats.getLong(0) + stats.getLong(1)
        println(f"PROBE12 semdedup_closure_100k ${cSec}%.1f s " +
          f"rounds=$rounds clustered=${stats.getLong(0)} " +
          f"clusters=${stats.getLong(1)} kept=$kept/$total " +
          f"shuffle=${metrics.shuffleWriteMb} MB " +
          f"maxTask=${metrics.maxTaskSec}%.1f s")
        cc.unpersist(blocking = false)
        pr.unpersist(blocking = false)

      case "pca" =>
        // distributed PCA at 100k clustered vectors (sf5 `cluster`
        // fixture): (1) the exact moment pass — the only distributed
        // cost, shuffle must stay O(partitions·d²); (2) fit wall incl.
        // the driver eigensolve; (3) map-only projection; (4) the
        // honesty row: ANN recall@10 of exact search in PCA-k space vs
        // exact search in the full 64-d space, for k = 8/16/32 — what
        // the cheap space actually loses on a clustered corpus.
        val emb = graft.core.Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding")).cache()
        val total = emb.count()
        timed("pca_moments_100k",
          graft.operators.Pca.momentSums(emb, "embedding", 64))
        // timed()'s clearCache dropped the emb cache — rematerialize so
        // every later stage reads memory, not parquet
        emb.cache().count()
        val tf = System.nanoTime()
        val model = graft.operators.Pca.fit(emb, "embedding", 64)
        val fitSec = (System.nanoTime() - tf) / 1e9
        // eigensolve-only wall: re-solve the fitted covariance
        // (reconstructed from the spectrum — same matrix, same work)
        val cov = Array.tabulate(64, 64)((i, j) =>
          (0 until 64).map(c => model.eigenvalues(c) *
            model.components(c)(i) * model.components(c)(j)).sum)
        val te = System.nanoTime()
        graft.operators.Pca.jacobiEigen(cov)
        val eigSec = (System.nanoTime() - te) / 1e9
        println(f"PROBE12 pca_fit_100k n=$total fit=${fitSec}%.1f s " +
          f"eigensolve_only=${eigSec * 1000}%.0f ms " +
          f"ve8=${model.varianceExplained(8)}%.3f " +
          f"ve16=${model.varianceExplained(16)}%.3f " +
          f"ve32=${model.varianceExplained(32)}%.3f")
        timed("pca_project16_100k",
          graft.operators.Pca.project(emb, model, 16, "embedding"))
        emb.cache().count() // timed() cleared it again
        def topk(df: DataFrame, vc: String): Map[(Long, Long), Boolean] =
          graft.operators.Similarity.bruteForceTopK(
            df, df.filter(col("vec_id") < 100), "vec_id", vc, k = 10)
            .select(col("q_id"), col("n_id")).collect()
            .map(r => (r.getLong(0), r.getLong(1)) -> true).toMap
        // ONE full brute pass feeds both the recall base and the
        // effectiveness base (it was run twice before — the first
        // collect just dropped the cosine column)
        val baseCos: Map[(Long, Long), Double] =
          graft.operators.Similarity.bruteForceTopK(
            emb, emb.filter(col("vec_id") < 100), "vec_id", "embedding",
            k = 10).select(col("q_id"), col("n_id"), col("cosine"))
            .collect()
            .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
            .toMap
        val base: Map[(Long, Long), Boolean] =
          baseCos.map { case (k, _) => k -> true }
        val gram = graft.operators.Pca.fit(emb, "embedding", 64,
          center = false)
        for ((label, m) <- Seq("centered" -> model, "gram" -> gram);
             k <- Seq(8, 16, 32)) {
          val proj = graft.operators.Pca.project(emb, m, k,
            "embedding").select(col("vec_id"), col("proj")).cache()
          proj.count()
          val t0 = System.nanoTime()
          val got = topk(proj, "proj")
          val sec = (System.nanoTime() - t0) / 1e9
          val hit = base.keys.count(got.contains)
          println(f"PROBE12 pca_ann_recall_$label k=$k " +
            f"recall@10=${hit.toDouble / base.size}%.3f " +
            f"search=${sec}%.1f s")
          proj.unpersist(blocking = false)
        }
        // the two production-relevant readings of a reduced space:
        // (a) retrieval effectiveness — the FULL-space cosine of what
        //     reduced-space search returns, relative to the exact
        //     top-10's: set-recall can collapse just because ranks
        //     scramble among near-equal neighbors, while a ratio ≈ 1
        //     means the returned neighbors are as close as the true
        //     ones for every downstream thresholded consumer
        //     (near-dup, SemDeDup);
        // (b) two-stage retrieval — top-C candidates in PCA-k space,
        //     re-ranked exactly in full space: recall of the final
        //     top-10 vs exact full-space top-10 (the ANN production
        //     pattern; candidate generation is where the 4x-8x byte
        //     cut pays, the re-rank touches only C vectors/query).
        val baseAvg = baseCos.values.sum / baseCos.size
        for (k <- Seq(8, 16)) {
          val proj = graft.operators.Pca.project(emb, gram, k,
            "embedding").select(col("vec_id"), col("proj")).cache()
          proj.count()
          val red10 = graft.operators.Similarity.bruteForceTopK(
            proj, proj.filter(col("vec_id") < 100), "vec_id", "proj",
            k = 10).select(col("q_id"), col("n_id")).collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          // full-space cosine of the reduced-space picks, via one
          // bounded lookup of the touched vectors
          val ids = (red10.map(_._1) ++ red10.map(_._2)).distinct
          val vecs = emb.filter(col("vec_id").isin(ids: _*))
            .select(col("vec_id"),
              expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
            .collect()
            .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
          def cos(a: Array[Double], b: Array[Double]): Double = {
            var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
            while (i < a.length) {
              d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i)
              i += 1
            }
            d / (math.sqrt(na) * math.sqrt(nb))
          }
          val redAvg = red10.map { case (q, n) =>
            cos(vecs(q), vecs(n)) }.sum / red10.length
          val c = 100
          val cand = graft.operators.Similarity.bruteForceTopK(
            proj, proj.filter(col("vec_id") < 100), "vec_id", "proj",
            k = c).select(col("q_id"), col("n_id"))
          // exact full-space re-rank keeps any true top-10 member that
          // is IN the candidate set, so candidate coverage of the full
          // top-10 IS the two-stage recall
          val candSet = cand.collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
          val covered = base.keys.count(candSet.contains)
          println(f"PROBE12 pca_reduced_regimes k=$k " +
            f"ret_cosine=${redAvg}%.4f exact_cosine=${baseAvg}%.4f " +
            f"ratio=${redAvg / baseAvg}%.3f " +
            f"twostage_cand$c${"_recall@10="}${covered.toDouble / base.size}%.3f")
          proj.unpersist(blocking = false)
        }
        // the operator-ized two-stage path (l46 shape) vs one full-space
        // brute pass, wall-to-wall at 100 queries
        val projStore = graft.operators.Pca.project(emb, gram, 16,
          "embedding", "__r").select(col("vec_id"), col("__r")).cache()
        projStore.count() // the ingest-time projection, amortized
        for ((nm, df) <- Seq(
          "brute64" -> graft.operators.Similarity.bruteForceTopK(
            emb, emb.filter(col("vec_id") < 100), "vec_id", "embedding",
            k = 10),
          "twostage_inline" -> graft.operators.Similarity.twoStageTopK(
            emb, emb.filter(col("vec_id") < 100), "vec_id", "embedding",
            gram, kReduced = 16, kCand = 100, k = 10),
          "twostage_preproj" -> graft.operators.Similarity
            .twoStageFromProjected(projStore, emb,
              emb.filter(col("vec_id") < 100), "vec_id", "embedding",
              gram, kReduced = 16, kCand = 100, k = 10))) {
          val t0 = System.nanoTime()
          df.write.format("noop").mode(SaveMode.Overwrite).save()
          println(f"PROBE12 pca_search_wall $nm " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s")
        }
        projStore.unpersist(blocking = false)
        emb.unpersist(blocking = false)

      case "pcawide" =>
        // the dim regime where reduction PAYS: 100k synthetic 512-d
        // vectors (real text embeddings are 768-4096-d; 64-d was too
        // cheap for two-stage to beat one brute pass — §16). Spectrum
        // decays with dim index so a 32-d cut is meaningful; vectors
        // are deterministic (hash-folded), so the row reproduces.
        val dimW = 512
        val wide = spark.range(100000).select(col("id").as("vec_id"),
          expr(s"""transform(sequence(0, ${dimW - 1}), j ->
            CAST((pmod(xxhash64(id * $dimW + j), 1000000) - 500000)
              AS DOUBLE) / 1000000.0D / (1.0D + CAST(j AS DOUBLE) / 32.0D)
          )""").as("embedding")).cache()
        wide.count()
        val tw = System.nanoTime()
        val gw = graft.operators.Pca.fit(wide, "embedding", dimW,
          center = false)
        println(f"PROBE12 pcawide_fit_512d " +
          f"${(System.nanoTime() - tw) / 1e9}%.1f s " +
          f"ve32=${gw.varianceExplained(32)}%.3f " +
          f"ve64=${gw.varianceExplained(64)}%.3f")
        val store = graft.operators.Pca.project(wide, gw, 32,
          "embedding", "__r").select(col("vec_id"), col("__r")).cache()
        store.count()
        val qs = wide.filter(col("vec_id") < 100)
        def wall(nm: String, df: => DataFrame): Unit = {
          for (i <- 1 to 2) {
            val t0 = System.nanoTime()
            df.write.format("noop").mode(SaveMode.Overwrite).save()
            println(f"PROBE12 pcawide_$nm rep$i " +
              f"${(System.nanoTime() - t0) / 1e9}%.1f s")
          }
        }
        wall("brute512", graft.operators.Similarity.bruteForceTopK(
          wide, qs, "vec_id", "embedding", k = 10))
        wall("twostage32_preproj", graft.operators.Similarity
          .twoStageFromProjected(store, wide, qs, "vec_id", "embedding",
            gw, kReduced = 32, kCand = 100, k = 10))
        // stage 1 as an INDEX over the reduced store (ivf in 32-d),
        // stage 2 the pluggable exact re-rank — the shape the reduction
        // is FOR (the brute reduced scan pays the same pair-stream
        // machinery as full brute; the index avoids the scan entirely)
        val pq32 = graft.operators.Pca.project(qs, gw, 32, "embedding",
          "__r").select(col("vec_id"), col("__r")).cache()
        pq32.count()
        def ivfRerank = {
          val cand = graft.operators.Similarity.ivfTopK(store, pq32,
            "vec_id", "__r", k = 100, nCells = 64, nProbe = 8)
            .select(col("q_id"), col("n_id"))
          graft.operators.Similarity.rerankTopK(cand, wide, qs,
            "vec_id", "embedding", 10)
        }
        wall("ivf32x8_rerank", ivfRerank)
        val iv = ivfRerank.select("q_id", "n_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        // recall of the two-stage against brute (coverage == recall)
        val b512 = graft.operators.Similarity.bruteForceTopK(wide, qs,
          "vec_id", "embedding", k = 10).select("q_id", "n_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        val t512 = graft.operators.Similarity.twoStageFromProjected(
          store, wide, qs, "vec_id", "embedding", gw, 32, 100, 10)
          .select("q_id", "n_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"PROBE12 pcawide_recall@10 " +
          f"twostage=${b512.count(t512.contains).toDouble / b512.size}%.3f " +
          f"ivf_rerank=${b512.count(iv.contains).toDouble / b512.size}%.3f")
        pq32.unpersist(blocking = false)
        store.unpersist(blocking = false)
        wide.unpersist(blocking = false)

      case "fhash" =>
        // feature hashing at 250k diverse-text docs (sf5textdiv): the
        // sparse pass (explode -> native poly_hash -> (doc,bucket)
        // hash-agg), the dense pivot, and the full no-embeddings-shipped
        // composition: hash-embed -> PCA fit -> project. Shuffle must
        // stay <= dim rows/doc for the sparse pass.
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text")).cache()
        val nd = docs.count()
        println(s"PROBE12 fhash_docs n=$nd")
        timed("fhash_sparse_250k", graft.operators.TextAnalysis
          .featureHashSparse(docs, "doc_id", "text", 64))
        val dense = graft.operators.TextAnalysis
          .featureHashDense(docs, "doc_id", "text", 64).cache()
        timed("fhash_dense_250k", dense, reps = 2)
        // timed()'s clearCache dropped the dense cache — rematerialize
        // so the fit/project rows measure THEIR work, not the pivot's
        dense.cache().count()
        val tc = System.nanoTime()
        // hashed weights are integer-valued: digits = 0 is already exact
        val m = graft.operators.Pca.fit(dense, "fh_vec", 64, digits = 0)
        val cSec = (System.nanoTime() - tc) / 1e9
        println(f"PROBE12 fhash_pca_fit ${cSec}%.1f s " +
          f"ve16=${m.varianceExplained(16)}%.3f")
        timed("fhash_pca_project16", graft.operators.Pca
          .project(dense, m, 16, "fh_vec"), reps = 2)
        dense.unpersist(blocking = false)
        docs.unpersist(blocking = false)

      case "pcastream" =>
        // the standing moment state folded over 10 batches of 10k
        // vectors: per-batch cost must be flat (each batch contributes
        // ONE 2,080-cell frame; the fold is state∪batch groupBy-sum on
        // 4,160 rows), and the any-time model read is state-sized.
        val root = "/tmp/scale/probe12_pcastream"
        val fs = org.apache.hadoop.fs.FileSystem.get(
          spark.sparkContext.hadoopConfiguration)
        fs.delete(new org.apache.hadoop.fs.Path(root), true)
        val sink = graft.streaming.StreamOps.pcaMomentForeachBatch(
          s"$root/state", "embedding", 64)
        val all = graft.core.Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding")).cache()
        all.count()
        for (b <- 0 until 10) {
          val batch = all.filter(pmod(col("vec_id"), lit(10L)) === b)
          val t0 = System.nanoTime()
          sink(batch, b.toLong)
          println(f"PROBE12 pcastream_batch$b " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s")
        }
        val tm = System.nanoTime()
        val sm = graft.streaming.StreamOps.pcaModelFromState(spark,
          s"$root/state", 64)
        println(f"PROBE12 pcastream_model_read " +
          f"${(System.nanoTime() - tm) / 1e9}%.1f s " +
          f"n=${sm.n} ve16=${sm.varianceExplained(16)}%.3f")
        val bm = graft.operators.Pca.fit(all, "embedding", 64)
        println(s"PROBE12 pcastream_parity model_bitequal=" +
          (sm.n == bm.n && sm.eigenvalues.sameElements(bm.eigenvalues) &&
            sm.components.zip(bm.components)
              .forall { case (a, c) => a.sameElements(c) }))
        all.unpersist(blocking = false)

      case "pcasemdedup" =>
        // does reduction make the PAIR STAGE cheaper? §15 ran the full
        // l42 SemDeDup pipeline in 64-d (pairs 10.0 s / 600,900 pairs).
        // Here: candidates in PCA-16 space at a slacked threshold, then
        // FULL-space verify at tau=0.9 — the candidate economics of the
        // two-stage pattern applied to the engine's heaviest semantic
        // op, with cluster recovery as the ground truth.
        val emb = graft.core.Tables.embeddings(spark, sfDir)
          .select(col("vec_id"), col("embedding")).cache()
        val total = emb.count()
        val gram = graft.operators.Pca.fit(emb, "embedding", 64,
          center = false)
        val proj = graft.operators.Pca.project(emb, gram, 16,
          "embedding").select(col("vec_id"), col("proj")).cache()
        proj.count()
        metrics.reset()
        val tp = System.nanoTime()
        val candRed = graft.operators.Similarity.cosineNearDupPairsCapped(
          proj, "vec_id", "proj", threshold = 0.7, dim = 16,
          nPlanes = 12, nTables = 8, maxBucket = 64).cache()
        val nCand = candRed.count()
        val pSec = (System.nanoTime() - tp) / 1e9
        println(f"PROBE12 pcasemdedup_cand16 ${pSec}%.1f s " +
          f"cand=$nCand shuffle=${metrics.shuffleWriteMb} MB " +
          f"maxTask=${metrics.maxTaskSec}%.1f s")
        metrics.reset()
        val tv = System.nanoTime()
        val ev = emb.select(col("vec_id"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
          .withColumn("nrm", graft.operators.Similarity.norm("v"))
        val verified = candRed
          .join(ev.select(col("vec_id").as("doc_a"), col("v").as("va"),
            col("nrm").as("na")), "doc_a")
          .join(ev.select(col("vec_id").as("doc_b"), col("v").as("vb"),
            col("nrm").as("nb")), "doc_b")
          .withColumn("full_cos", graft.operators.Similarity
            .dot("va", "vb") / (col("na") * col("nb")))
          .filter(col("full_cos") >= 0.9)
          .select(col("doc_a"), col("doc_b")).cache()
        val nVer = verified.count()
        val vSec = (System.nanoTime() - tv) / 1e9
        println(f"PROBE12 pcasemdedup_verify ${vSec}%.1f s " +
          f"pairs=$nVer shuffle=${metrics.shuffleWriteMb} MB")
        val tc = System.nanoTime()
        val (cc, rounds) = graft.operators.GraphRank
          .connectedComponentsWithStats(verified, "doc_a", "doc_b")
        val st = cc.agg(count(lit(1)).as("n"),
          countDistinct("component").as("k")).head()
        val cSec = (System.nanoTime() - tc) / 1e9
        println(f"PROBE12 pcasemdedup_closure ${cSec}%.1f s " +
          f"rounds=$rounds clustered=${st.getLong(0)} " +
          f"clusters=${st.getLong(1)} " +
          f"kept=${total - st.getLong(0) + st.getLong(1)}/$total")
        cc.unpersist(blocking = false)
        verified.unpersist(blocking = false)
        candRed.unpersist(blocking = false)
        proj.unpersist(blocking = false)
        emb.unpersist(blocking = false)

      case "bpedebug" =>
        val tr = graft.core.Tables.documents(spark, sfDir)
          .filter(graft.operators.TextAnalysis
            .splitAssign("doc_id", 80, 10) === "train")
        val ms = graft.operators.Bpe.trainBatched(tr, "text", 16, 8)
        println(s"PROBE12 bpedebug adopted=${ms.size} " +
          ms.map(m => s"${m.rank}:${m.a}+${m.b}").mkString(" "))

      // Edit-distance join at the 250k-doc diverse-text corpus: the
      // corpus is unioned with 10k deterministic edited twins (3 chars
      // substituted) so the verify stage has true pairs to find.
      // Reports candidate volume, pairs, and the stage walls.
      case "edjoin" =>
        import graft.operators.Dedup
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text")
        val twins = docs.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            concat(lit("zq"),
              expr("substring(text, 3, length(text) - 3)"),
              lit("x")).as("text"))
        val corpus = docs.unionByName(twins).cache()
        val n = corpus.count()
        val q = if (args.length > 2) args(2).toInt else 7
        val base = Dedup.edJoinBase(corpus, "doc_id", "text", k = 8, q = q)
        var t0 = System.nanoTime()
        base.count()
        println(f"PROBE12 edjoin_base docs=$n " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
        metrics.reset()
        t0 = System.nanoTime()
        val cand = Dedup.editDistanceCandidates(base, k = 8, q = q).cache()
        val nc = cand.count()
        metrics.drain()
        println(f"PROBE12 edjoin_cand_q$q candidates=$nc " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
          f"shuffle=${metrics.shuffleWriteMb} MB spill=${metrics.spillMb} MB " +
          f"maxTask=${metrics.maxTaskSec}%.1f s")
        metrics.reset()
        t0 = System.nanoTime()
        val np = Dedup.editDistanceJoin(corpus, "doc_id", "text",
          k = 8, q = q).count()
        metrics.drain()
        println(f"PROBE12 edjoin_full_q$q pairs=$np " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
          f"shuffle=${metrics.shuffleWriteMb} MB spill=${metrics.spillMb} MB " +
          f"maxTask=${metrics.maxTaskSec}%.1f s")

      // The PassJoin form on the same twinned corpus — the scale path.
      case "edjoinpass" =>
        import graft.operators.Dedup
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text")
        val twins = docs.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            concat(lit("zq"),
              expr("substring(text, 3, length(text) - 3)"),
              lit("x")).as("text"))
        val corpus = docs.unionByName(twins).cache()
        val n = corpus.count()
        for (bc <- Seq(false, true); rep <- 1 to 2) {
          spark.catalog.clearCache()
          corpus.count()
          metrics.reset()
          val t0 = System.nanoTime()
          val np = Dedup.editDistanceJoinPass(corpus, "doc_id", "text",
            k = 8, broadcastIndex = bc).count()
          metrics.drain()
          println(f"PROBE12 edjoinpass_k8 bc=$bc rep$rep docs=$n " +
            f"pairs=$np ${(System.nanoTime() - t0) / 1e9}%.1f s " +
            f"shuffle=${metrics.shuffleWriteMb} MB " +
            f"spill=${metrics.spillMb} MB " +
            f"maxTask=${metrics.maxTaskSec}%.1f s")
        }

      // Streaming edit-distance index at a 260k-doc standing corpus:
      // seed = the whole twinned corpus as batch 0 (prices the log
      // build), batch 1 = 5k docs (2.5k planted twins of standing docs
      // + 2.5k fresh) — prices the steady-state per-batch cost against
      // the standing key logs.
      case "eddiststream" =>
        val root = "/tmp/scale/probe12_eddist"
        val fs0 = new org.apache.hadoop.fs.Path(root)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs0.delete(new org.apache.hadoop.fs.Path(root), true)
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text")
        val twins0 = docs.filter(col("doc_id") % 25 === 0)
          .select((col("doc_id") + 10000000L).as("doc_id"),
            concat(lit("zq"),
              expr("substring(text, 3, length(text) - 3)"),
              lit("x")).as("text"))
        val seed = docs.unionByName(twins0).cache()
        val nSeed = seed.count()
        val sink = graft.streaming.StreamOps.edDistIndexForeachBatch(
          s"$root/index", s"$root/pairs", k = 8, "doc_id", "text")
        metrics.reset()
        var t0 = System.nanoTime()
        sink(seed, 0L)
        metrics.drain()
        println(f"PROBE12 eddist_seed docs=$nSeed " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
          f"shuffle=${metrics.shuffleWriteMb} MB " +
          f"spill=${metrics.spillMb} MB maxTask=${metrics.maxTaskSec}%.1f s")
        val batch1 = docs.filter(col("doc_id") % 100 === 1)
          .limit(2500)
          .select((col("doc_id") + 20000000L).as("doc_id"),
            concat(lit("xx"), expr("substring(text, 3, length(text))"))
              .as("text"))
          .unionByName(docs.filter(col("doc_id") % 100 === 2)
            .limit(2500)
            .select((col("doc_id") + 30000000L).as("doc_id"),
              expr("translate(text, 'aeiou', '01234')").as("text")))
          .cache()
        val nB1 = batch1.count()
        metrics.reset()
        t0 = System.nanoTime()
        sink(batch1, 1L)
        metrics.drain()
        val nPairs1 = spark.read
          .parquet(s"$root/pairs/batch=1").count()
        println(f"PROBE12 eddist_batch docs=$nB1 pairs=$nPairs1 " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
          f"shuffle=${metrics.shuffleWriteMb} MB " +
          f"spill=${metrics.spillMb} MB maxTask=${metrics.maxTaskSec}%.1f s")
        def du(p: String): Long = fs0.getContentSummary(
          new org.apache.hadoop.fs.Path(p)).getLength
        println(s"PROBE12 eddist_state_bytes segs=${du(s"$root/index/segs")} " +
          s"probes=${du(s"$root/index/probes")} " +
          s"texts=${du(s"$root/index/texts")}")

      // Count-Min sketch over the full diverse-text token stream:
      // one pass, O(partitions * depth * width) shuffle regardless of
      // corpus size; estimate quality reported against the exact top
      // tokens.
      case "cms" =>
        val docs = graft.core.Tables.documents(spark, sfDir)
        val (depth, width) = (4, 65536)
        for (rep <- 1 to 3) {
          spark.catalog.clearCache()
          metrics.reset()
          val t0 = System.nanoTime()
          val grid = graft.operators.TextAnalysis
            .cmsTokenSketch(docs, "text", depth, width)
            .head().getSeq[Long](0)
          metrics.drain()
          println(f"PROBE12 cms_sketch rep$rep " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
            f"shuffle=${metrics.shuffleWriteMb} MB " +
            f"maxTask=${metrics.maxTaskSec}%.1f s " +
            f"cells=${grid.count(_ != 0L)}/${grid.size}")
        }
        val top = graft.operators.TextAnalysis
          .cmsTopFrequencies(docs, "text", depth, width, topK = 20)
          .collect()
        val worst = top.map(r => r.getAs[Long]("est") -
          r.getAs[Long]("exact")).max
        val total = top.map(r => r.getAs[Long]("exact")).sum
        println(s"PROBE12 cms_estimates top20_worst_overcount=$worst " +
          s"top20_exact_total=$total")

      // Product quantization at 100k clustered vectors (sf5cluster):
      // fit + encode walls, stored-bytes compression vs raw vectors,
      // ADC search wall vs brute, and ADC recall vs exact-IP top-10.
      case "pqscale" =>
        import graft.operators.{Pq, Similarity}
        val emb = graft.core.Tables.embeddings(spark, sfDir)
          .select("vec_id", "embedding").cache()
        val nv = emb.count()
        var t0 = System.nanoTime()
        val model = Pq.fit(emb, "vec_id", "embedding", dim = 64,
          m = 8, ksub = 256, lloydIters = 2)
        println(f"PROBE12 pq_fit_lloyd2 vectors=$nv " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
        val codesDir = "/tmp/scale/probe12_pq_codes"
        val rawDir = "/tmp/scale/probe12_pq_raw"
        metrics.reset()
        t0 = System.nanoTime()
        Pq.encode(emb, "vec_id", "embedding", model)
          .write.mode(SaveMode.Overwrite).parquet(codesDir)
        println(f"PROBE12 pq_encode_write " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
        emb.write.mode(SaveMode.Overwrite).parquet(rawDir)
        def dirBytes(p: String): Long = {
          val fs = new org.apache.hadoop.fs.Path(p)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.getContentSummary(new org.apache.hadoop.fs.Path(p)).getLength
        }
        println(s"PROBE12 pq_bytes codes=${dirBytes(codesDir)} " +
          s"raw=${dirBytes(rawDir)} " +
          f"ratio=${dirBytes(rawDir).toDouble / dirBytes(codesDir)}%.1f x")
        val queries = emb.filter(col("vec_id") < 100).cache()
        queries.count()
        val codes = spark.read.parquet(codesDir)
        for (rep <- 1 to 3) {
          metrics.reset()
          t0 = System.nanoTime()
          Pq.adcTopK(codes, queries, "vec_id", "embedding", model, k = 10)
            .write.format("noop").mode(SaveMode.Overwrite).save()
          metrics.drain()
          println(f"PROBE12 pq_adc_top10 rep$rep " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
            f"shuffle=${metrics.shuffleWriteMb} MB " +
            f"maxTask=${metrics.maxTaskSec}%.1f s")
        }
        for (rep <- 1 to 2) {
          metrics.reset()
          t0 = System.nanoTime()
          Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
              k = 10)
            .write.format("noop").mode(SaveMode.Overwrite).save()
          metrics.drain()
          println(f"PROBE12 brute_top10 rep$rep " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
            f"shuffle=${metrics.shuffleWriteMb} MB " +
            f"maxTask=${metrics.maxTaskSec}%.1f s")
        }
        // recall of ADC top-10 vs exact INNER-PRODUCT top-10 (the
        // objective ADC approximates)
        val qv = queries.select(col("vec_id").as("q_id"),
          col("embedding").cast("array<double>").as("qv"))
        val cv = emb.select(col("vec_id").as("n_id"),
          col("embedding").cast("array<double>").as("cv"))
        val exact = Similarity.rankTopKByCosine(
          cv.join(broadcast(qv), col("q_id") =!= col("n_id"))
            .withColumn("cosine", expr("vec_dot(qv, cv)"))
            .select("q_id", "n_id", "cosine"), 10)
          .select(col("q_id"), col("n_id")).withColumn("hit", lit(1L))
        val adc = Pq.adcTopK(codes, queries, "vec_id", "embedding",
          model, k = 10).select("q_id", "n_id")
        val rec = adc.join(exact, Seq("q_id", "n_id"), "left")
          .agg((sum(coalesce(col("hit"), lit(0L))).cast("double") /
            count(lit(1))).as("recall"))
          .head().getDouble(0)
        println(f"PROBE12 pq_adc_recall@10_vs_exact_ip $rec%.3f")
        // two-stage coverage: exact-IP top-10 found inside the ADC
        // top-N candidate set (== final recall after an exact re-rank,
        // the rerankTopK contract)
        for (nCand <- Seq(50, 200)) {
          val candN = Pq.adcTopK(codes, queries, "vec_id", "embedding",
            model, k = nCand).select("q_id", "n_id").withColumn("c", lit(1L))
          val cov = exact.join(candN, Seq("q_id", "n_id"), "left")
            .agg((sum(coalesce(col("c"), lit(0L))).cast("double") /
              count(lit(1))).as("cov"))
            .head().getDouble(0)
          println(f"PROBE12 pq_twostage_cand${nCand}_recall@10 $cov%.3f")
        }
        // what a thresholded consumer sees: mean IP of the ADC picks
        // vs mean IP of the exact picks (the §16 ratio reading)
        val qv2 = queries.select(col("vec_id").as("q_id"),
          col("embedding").cast("array<double>").as("qv"))
        val cv2 = emb.select(col("vec_id").as("n_id"),
          col("embedding").cast("array<double>").as("cv"))
        def meanIp(pairs: org.apache.spark.sql.DataFrame): Double = pairs
          .join(qv2, "q_id").join(cv2, "n_id")
          .agg(avg(expr("vec_dot(qv, cv)"))).head().getDouble(0)
        val ipAdc = meanIp(adc)
        val ipExact = meanIp(exact.select("q_id", "n_id"))
        println(f"PROBE12 pq_pick_quality adc_ip=$ipAdc%.4f " +
          f"exact_ip=$ipExact%.4f ratio=${ipAdc / ipExact}%.3f")
        // IVF-PQ: probed-cell pruning on top of the codes (256 cells,
        // probe 16 = 1/16th of the corpus scanned)
        for (rep <- 1 to 3) {
          metrics.reset()
          t0 = System.nanoTime()
          Similarity.ivfPqTopK(emb, queries, "vec_id", "embedding",
              k = 10, model, nCells = 256, nProbe = 16)
            .write.format("noop").mode(SaveMode.Overwrite).save()
          metrics.drain()
          println(f"PROBE12 ivfpq_c256_p16_top10 rep$rep " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
            f"shuffle=${metrics.shuffleWriteMb} MB " +
            f"maxTask=${metrics.maxTaskSec}%.1f s")
        }
        val ivfpq = Similarity.ivfPqTopK(emb, queries, "vec_id",
            "embedding", k = 10, model, nCells = 256, nProbe = 16)
          .select("q_id", "n_id")
        val ipIvf = meanIp(ivfpq)
        val covIvf = exact.join(ivfpq.withColumn("c", lit(1L)),
            Seq("q_id", "n_id"), "left")
          .agg((sum(coalesce(col("c"), lit(0L))).cast("double") /
            count(lit(1))).as("cov")).head().getDouble(0)
        println(f"PROBE12 ivfpq_pick_quality ip=$ipIvf%.4f " +
          f"ratio_vs_exact=${ipIvf / ipExact}%.3f " +
          f"recall@10_vs_exact_ip=$covIvf%.3f")
        // residual IVF-PQ (the FAISS IVFPQ form): same cells, codebook
        // trained on residuals — measures what the residual refinement
        // buys on clustered data at the same ksub budget
        val rCentroids = Similarity.sampleCentroids(emb, "vec_id",
          "embedding", nCells = 256).cache()
        rCentroids.count()
        t0 = System.nanoTime()
        val rModel = Pq.fitResidual(emb, "vec_id", "embedding",
          dim = 64, m = 8, ksub = 256, rCentroids, lloydIters = 2)
        println(f"PROBE12 ivfpq_residual_fit " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s")
        for (rep <- 1 to 3) {
          metrics.reset()
          t0 = System.nanoTime()
          Pq.ivfPqTopKResidual(emb, queries, "vec_id", "embedding",
              k = 10, rModel, rCentroids, nProbe = 16)
            .write.format("noop").mode(SaveMode.Overwrite).save()
          metrics.drain()
          println(f"PROBE12 ivfpq_residual_top10 rep$rep " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
            f"shuffle=${metrics.shuffleWriteMb} MB " +
            f"maxTask=${metrics.maxTaskSec}%.1f s")
        }
        val resTop = Pq.ivfPqTopKResidual(emb, queries, "vec_id",
            "embedding", k = 10, rModel, rCentroids, nProbe = 16)
          .select("q_id", "n_id")
        val ipRes = meanIp(resTop)
        val covRes = exact.join(resTop.withColumn("c", lit(1L)),
            Seq("q_id", "n_id"), "left")
          .agg((sum(coalesce(col("c"), lit(0L))).cast("double") /
            count(lit(1))).as("cov")).head().getDouble(0)
        println(f"PROBE12 ivfpq_residual_quality ip=$ipRes%.4f " +
          f"ratio_vs_exact=${ipRes / ipExact}%.3f " +
          f"recall@10_vs_exact_ip=$covRes%.3f")
        emb.unpersist(); queries.unpersist(); rCentroids.unpersist()

      case "wave5" =>
        // ---- l54 prefix-filter exact Jaccard at 250k diverse docs ----
        import graft.operators.{CorpusAssembly, Dedup, Multimodal, TextAnalysis}
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text").cache()
        val nDocs = docs.count()
        println(s"PROBE12 wave5_docs $nDocs")
        // the avoided volume: what an UNCAPPED inverted-index join would
        // generate (sum df*(df-1)/2 over shingles) — computed as one
        // aggregate, not by running it
        val dfAgg = docs.select(explode(Dedup.shingles("text", 3))
            .as("sh"))
          .groupBy("sh").agg(count(lit(1)).as("df"))
          .agg(sum(expr("df * (df - 1) div 2")).as("pairs"),
            max("df").as("max_df"), count(lit(1)).as("n_shingles"))
          .head()
        println(s"PROBE12 l54_uncapped_would_generate pairs=" +
          s"${dfAgg.getLong(0)} max_df=${dfAgg.getLong(1)} " +
          s"shingle_types=${dfAgg.getLong(2)}")
        for (rep <- 1 to 3) {
          metrics.reset()
          val t0 = System.nanoTime()
          val nCand = Dedup.prefixFilterCandidates(docs, "doc_id", "text",
            n = 3, threshold = 0.8, hashedShingles = true).count()
          metrics.drain()
          println(f"PROBE12 l54_prefix_cand rep$rep " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s cand=$nCand " +
            f"shuffle=${metrics.shuffleWriteMb} MB " +
            f"spill=${metrics.spillMb} MB " +
            f"maxTask=${metrics.maxTaskSec}%.1f s")
        }
        for (rep <- 1 to 3) {
          metrics.reset()
          val t0 = System.nanoTime()
          val nPairs = Dedup.prefixFilterJaccardPairs(docs, "doc_id",
            "text", n = 3, threshold = 0.8, hashedShingles = true).count()
          metrics.drain()
          println(f"PROBE12 l54_full rep$rep " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s pairs=$nPairs " +
            f"shuffle=${metrics.shuffleWriteMb} MB " +
            f"spill=${metrics.spillMb} MB " +
            f"maxTask=${metrics.maxTaskSec}%.1f s")
        }
        // the capped comparison point (recall-weakened, l2bh's shape)
        for (rep <- 1 to 2) {
          metrics.reset()
          val t0 = System.nanoTime()
          val nCap = Dedup.ngramCandidates(docs, "doc_id", "text", n = 3,
            maxDocFreq = 10).count()
          metrics.drain()
          println(f"PROBE12 l54_capped_cand_df10 rep$rep " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s cand=$nCap " +
            f"shuffle=${metrics.shuffleWriteMb} MB")
        }

        // ---- l55 KN surprisal: model sizes + the pruning knob ----
        val modelRows = docs
          .select(col("doc_id").as("doc"),
            expr("filter(split(text, ' '), t -> length(t) > 0)").as("arr"))
          .select(col("doc"), posexplode(col("arr")).as(Seq("pos", "t")),
            col("arr"))
          .withColumn("prev", get(col("arr"), col("pos") - 1))
          .filter(col("prev").isNotNull)
          .groupBy("prev", "t").agg(count(lit(1)).as("c"))
          .agg(count(lit(1)).as("types"),
            sum(when(col("c") >= 2L, 1L).otherwise(0L)).as("types_ge2"))
          .head()
        println(s"PROBE12 l55_bigram_types total=${modelRows.getLong(0)} " +
          s"ge2=${modelRows.getLong(1)}")
        for ((label, mc) <- Seq(("exact_mc1", 1L), ("pruned_mc2", 2L))) {
          for (rep <- 1 to 2) {
            metrics.reset()
            val t0 = System.nanoTime()
            TextAnalysis.knBigramSurprisal(docs, "doc_id", "text",
                keepBelowBits = 5.0, minCount = mc)
              .write.format("noop").mode(SaveMode.Overwrite).save()
            metrics.drain()
            println(f"PROBE12 l55_$label rep$rep " +
              f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
              f"shuffle=${metrics.shuffleWriteMb} MB " +
              f"spill=${metrics.spillMb} MB " +
              f"maxTask=${metrics.maxTaskSec}%.1f s")
          }
        }

        // ---- l56 systematic weighted sample at 30M rows ----
        val rows30 = spark.range(0L, 30000000L, 1L, 32)
          .select(col("id"),
            (pmod(expr("xxhash64(id)"), lit(100L)) + 1L).as("wt"))
        for (rep <- 1 to 3) {
          metrics.reset()
          val t0 = System.nanoTime()
          val drawn = CorpusAssembly.systematicWeightedSample(rows30,
              "id", "wt", k = 1000000L, seed = 7L)
            .agg(sum("n_draws")).head().getLong(0)
          metrics.drain()
          println(f"PROBE12 l56_30m_k1m rep$rep " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s draws=$drawn " +
            f"shuffle=${metrics.shuffleWriteMb} MB " +
            f"spill=${metrics.spillMb} MB " +
            f"maxTask=${metrics.maxTaskSec}%.1f s")
        }

        // ---- m2 interleave assembly at 250k docs ----
        val media = docs
          .withColumn("n_chars", length(col("text")))
          .filter(expr("n_chars div 120 >= 1"))
          .select(col("doc_id"), explode(
            expr("sequence(0, cast(n_chars div 120 as int) - 1)"))
            .as("media_idx"))
        for (rep <- 1 to 3) {
          metrics.reset()
          val t0 = System.nanoTime()
          Multimodal.interleaveSequences(docs, "doc_id", "text", media,
              "doc_id", "media_idx", chunkTokens = 16, imageTokens = 32,
              budget = 2048L)
            .write.format("noop").mode(SaveMode.Overwrite).save()
          metrics.drain()
          println(f"PROBE12 m2_interleave rep$rep " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s " +
            f"shuffle=${metrics.shuffleWriteMb} MB " +
            f"spill=${metrics.spillMb} MB " +
            f"maxTask=${metrics.maxTaskSec}%.1f s")
        }
        docs.unpersist()

      case "wave6" =>
        import graft.operators.{Dedup, TextAnalysis}
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text").cache()
        val nDocs = docs.count()
        println(s"PROBE12 wave6_docs $nDocs")

        // ---- l59 line-frequency boilerplate at 250k docs ----
        // lined corpus: nav header + footer planted on every doc, a mid
        // boilerplate line on every 3rd doc, content cut into 12-token
        // lines (construction cached OUTSIDE the timed runs)
        val tks = "filter(split(text, ' '), t -> length(t) > 0)"
        val lined = docs.select(col("doc_id"), concat(
            lit("nav home menu about contact\n"),
            when(col("doc_id") % 3 === 0,
              lit("subscribe to our newsletter today\n")).otherwise(lit("")),
            expr(s"""array_join(transform(
                 sequence(0, (size($tks) - 1) div 12),
                 i -> array_join(slice($tks, i * 12 + 1, 12), ' ')),
               chr(10))"""),
            lit("\ncopyright footer 2026")).as("text"))
          .cache()
        lined.count()
        val st = Dedup.lineFrequencyFilter(lined, "doc_id", "text",
            maxDocFreq = 1000, hashedLineKeys = true)
          .agg(sum("n_lines").as("t"), sum("n_kept_lines").as("k")).head()
        println(s"PROBE12 l59_lines total=${st.getLong(0)} " +
          s"kept=${st.getLong(1)}")
        for ((label, hashed) <- Seq(("l59_hashed", true),
                                    ("l59_string", false)))
          timed(label, Dedup.lineFrequencyFilter(lined, "doc_id", "text",
            maxDocFreq = 1000, hashedLineKeys = hashed))

        // streaming form: seed the 250k-doc state, then a 15k batch
        val lfRoot = "/tmp/scale/probe12_linefreq"
        org.apache.commons.io.FileUtils
          .deleteDirectory(new java.io.File(lfRoot))
        val lfSink = graft.streaming.StreamOps
          .lineFreqForeachBatch(s"$lfRoot/state", "doc_id", "text")
        val batch15 = lined.filter(col("doc_id") % 17 === 0)
          .withColumn("doc_id", col("doc_id") + 10000000L).cache()
        val nB = batch15.count()
        for ((label, run) <- Seq[(String, () => Unit)](
            ("lfstream_seed_250k", () => lfSink(lined, 0L)),
            (s"lfstream_batch_$nB", () => lfSink(batch15, 1L)),
            (s"lfstream_filter_batch_$nB", () =>
              graft.streaming.StreamOps.lineFreqFilterWithState(
                  batch15, "doc_id", "text", maxDocFreq = 1000,
                  s"$lfRoot/state")
                .write.format("noop").mode(SaveMode.Overwrite).save()))) {
          metrics.reset()
          val t0 = System.nanoTime()
          run()
          metrics.drain()
          println(f"PROBE12 $label ${(System.nanoTime() - t0) / 1e9}%.1f s" +
            f" shuffle=${metrics.shuffleWriteMb} MB" +
            f" spill=${metrics.spillMb} MB" +
            f" maxTask=${metrics.maxTaskSec}%.1f s")
        }
        lined.unpersist(blocking = false)
        batch15.unpersist(blocking = false)

        // ---- l60 blocklist scaling: AC vs regex alternation vs
        // chained contains. RARE terms (every alternative fails at most
        // positions — the regime that motivates the automaton; real
        // blocklist terms are rare by nature).
        val rare = docs.select(explode(expr(tks)).as("t"))
          .groupBy("t").agg(count(lit(1)).as("c"))
          .filter(length(col("t")) >= 4)
          .orderBy(col("c").asc, col("t")).limit(10000)
          .collect().map(_.getString(0)).toIndexedSeq
        println(s"PROBE12 l60_terms n=${rare.length}")
        for (k <- Seq(10, 100, 1000, 10000)) {
          val pats = rare.take(k)
          timed(s"l60_ac_k$k", docs.select(col("doc_id"),
            (TextAnalysis.blocklistHits(col("text"), pats) > 0)
              .cast("long").as("blocked")), reps = 2)
          if (k <= 1000)
            timed(s"l60_rlike_k$k", docs.select(col("doc_id"),
              col("text").rlike(pats.mkString("(", "|", ")"))
                .cast("long").as("blocked")), reps = 2)
          if (k <= 100)
            timed(s"l60_contains_k$k", docs.select(col("doc_id"),
              pats.map(t => col("text").contains(t)).reduce(_ || _)
                .cast("long").as("blocked")), reps = 2)
        }
        // decision parity: AC vs rlike on 1000 terms (plain [a-z]+
        // tokens — no regex metachars, so rlike IS substring semantics)
        val disagree = docs.select(
            (TextAnalysis.blocklistHits(col("text"), rare.take(1000)) > 0)
              .as("ac"),
            col("text").rlike(rare.take(1000).mkString("(", "|", ")"))
              .as("re"))
          .filter(col("ac") =!= col("re")).count()
        println(s"PROBE12 l60_parity_k1000 disagreements=$disagree")
        docs.unpersist()

      case "wave7" =>
        // l61 containment join at 250k + 10k planted wrappers: the
        // directional sub-document detector. Candidate volume is the
        // observable; tau=0.9 probes ~0.1*m rarest shingles per doc
        // against the full inverted list.
        import graft.operators.Dedup
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text").cache()
        val nDocs = docs.count()
        val nxt = docs.select((col("doc_id") - 1).as("doc_id"),
          col("text").as("t2"))
        val wrapped = docs.filter(col("doc_id") % 25 === 0)
          .join(nxt, Seq("doc_id"))
          .select((col("doc_id") + 10000000L).as("doc_id"),
            concat(col("text"), lit(" "), col("t2")).as("text"))
        val corpus = docs.unionByName(wrapped).cache()
        val nAll = corpus.count()
        println(s"PROBE12 wave7_corpus base=$nDocs all=$nAll")
        for (rep <- 1 to 3) {
          metrics.reset()
          val t0 = System.nanoTime()
          val nCand = Dedup.containmentCandidates(corpus, "doc_id",
            "text", n = 3, threshold = 0.9, hashedShingles = true).count()
          metrics.drain()
          println(f"PROBE12 l61_cand rep$rep " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s cand=$nCand " +
            f"shuffle=${metrics.shuffleWriteMb} MB " +
            f"spill=${metrics.spillMb} MB " +
            f"maxTask=${metrics.maxTaskSec}%.1f s")
        }
        for (rep <- 1 to 3) {
          metrics.reset()
          val t0 = System.nanoTime()
          val nPairs = Dedup.containmentPairs(corpus, "doc_id", "text",
            n = 3, threshold = 0.9, hashedShingles = true).count()
          metrics.drain()
          println(f"PROBE12 l61_full rep$rep " +
            f"${(System.nanoTime() - t0) / 1e9}%.1f s pairs=$nPairs " +
            f"shuffle=${metrics.shuffleWriteMb} MB " +
            f"spill=${metrics.spillMb} MB " +
            f"maxTask=${metrics.maxTaskSec}%.1f s")
        }
        corpus.unpersist()
        docs.unpersist()

      case other =>
        sys.error(s"unknown ProbeR12 mode: $other")
    }
    spark.stop()
  }
}
