package graft.tools

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.core.Sessions

/** Dev-only: the round-13 scale-evidence runs behind SCALE_r13.md.
  *
  * Modes (arg 1), sfDir (arg 2 — a ScaleGen `textdiv` corpus for the
  * text modes):
  *  - `l61hot`: the containment join's honest weak spot measured — a
  *    universal boilerplate line appended to EVERY doc (its interior
  *    shingles get df = corpus size), wrappers planted as in round 12's
  *    wave7. Uncapped candidate volume vs the df-capped variant
  *    (containmentPairsCapped, maxDf=64), planted recovery counted on
  *    both: the capped run must find every planted pair on rare-shingle
  *    evidence alone.
  *  - `uvit`: unigram-LM trainer (l72) at a real vocabulary size —
  *    seedTop=1500/vocabTop=800/iters=3 over the diverse-text corpus;
  *    wall per EM round and corpus-words/sec (the bpe1k-class ceiling
  *    row for the other tokenizer family).
  *  - `l71scale`: the composed curation pipeline end to end on the
  *    inflated corpus, funnel printed (per-stage docs/tokens) + wall —
  *    the composition's scale row, not a per-stage one.
  *  - `warc`: warc_parse throughput — every doc wrapped into a
  *    two-record WARC payload in-query (the m4 fixture at scale),
  *    parse+explode wall and MB/s.
  */
object ProbeR13 {

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.build("graft-probe-r13", Sessions.cpusFromEnv(32))
    val metrics = TaskMetricsListener.installed(spark)

    def timedCount(name: String, df: => DataFrame, reps: Int = 3): Unit =
      for (rep <- 1 to reps) {
        metrics.reset()
        val t0 = System.nanoTime()
        val n = df.count()
        metrics.drain()
        println(f"PROBE13 $name rep$rep " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s n=$n " +
          f"shuffle=${metrics.shuffleWriteMb} MB " +
          f"spill=${metrics.spillMb} MB " +
          f"maxTask=${metrics.maxTaskSec}%.1f s")
      }

    mode match {
      case "l61hot" =>
        import graft.operators.Dedup
        val boiler = " the terms of service apply to all visitors of" +
          " this site all rights reserved"
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select(col("doc_id"),
            concat(col("text"), lit(boiler)).as("text"))
          .cache()
        val nDocs = docs.count()
        val nxt = docs.select((col("doc_id") - 1).as("doc_id"),
          col("text").as("t2"))
        val wrapped = docs.filter(col("doc_id") % 25 === 0)
          .join(nxt, Seq("doc_id"))
          .select((col("doc_id") + 10000000L).as("doc_id"),
            concat(col("text"), lit(" "), col("t2")).as("text"))
        // the REAL adversarial arm: docs whose ENTIRE content is the
        // universal boilerplate — their rarest shingles ARE the hot
        // ones, so the rarest-first prefix (which makes the appended-
        // boiler shape benign: hot shingles never enter a prefix) has
        // nothing but hot shingles to probe, and each such doc fans
        // out against the full hot posting list
        val boilerOnly = spark.range(500)
          .select((col("id") + 20000000L).as("doc_id"),
            lit(boiler.trim).as("text"))
        val corpus = docs.unionByName(wrapped).unionByName(boilerOnly)
          .cache()
        val nAll = corpus.count()
        println(s"PROBE13 l61hot_corpus base=$nDocs all=$nAll " +
          s"boiler_shingles~12 df=$nAll each; boiler_only=500")
        timedCount("l61hot_cand_uncapped",
          Dedup.containmentCandidates(corpus, "doc_id", "text",
            n = 3, threshold = 0.9, hashedShingles = true))
        timedCount("l61hot_pairs_capped64",
          Dedup.containmentPairsCapped(corpus, "doc_id", "text",
            n = 3, threshold = 0.9, maxDf = 64L, hashedShingles = true))
        // planted recovery under the cap: every wrapper must still
        // contain its victim (and the next doc) on rare evidence alone
        val planted = Dedup.containmentPairsCapped(corpus, "doc_id",
            "text", n = 3, threshold = 0.9, maxDf = 64L,
            hashedShingles = true)
          .filter(col("doc_b") >= 10000000L &&
            col("doc_b") < 20000000L && col("doc_a") < 10000000L)
          .count()
        val expected = corpus.filter(col("doc_id") >= 10000000L &&
          col("doc_id") < 20000000L).count()
        println(s"PROBE13 l61hot_planted capped_found=$planted " +
          s"wrappers=$expected (expect ~2x wrappers: victim+next)")
        corpus.unpersist(); docs.unpersist()

      case "uvit" =>
        import graft.operators.UnigramLm
        val docs = graft.core.Tables.documents(spark, sfDir)
          .select("doc_id", "text").cache()
        val nDocs = docs.count()
        val nWords = docs
          .select(sum(size(split(col("text"), " "))).cast("long"))
          .collect()(0).getLong(0)
        println(s"PROBE13 uvit_corpus docs=$nDocs words~$nWords")
        for (rep <- 1 to 2) {
          val t0 = System.nanoTime()
          val vocab = UnigramLm.train(docs, "text", seedTop = 1500,
            vocabTop = 800, iters = 3)
          val nV = vocab.count()
          val secs = (System.nanoTime() - t0) / 1e9
          println(f"PROBE13 uvit_train rep$rep $secs%.1f s vocab=$nV " +
            f"words_per_sec=${nWords * 3 / secs}%.0f (3 EM passes)")
        }
        docs.unpersist()

      case "l71scale" =>
        import graft.operators.CurationPipeline
        val docs = graft.core.Tables.documents(spark, sfDir)
        val raw = docs.select(col("doc_id"), col("source"),
          concat(
            lit("<html><head><script>var x = 1;</script></head><body><p>"),
            col("text"),
            // stopword arm so the Gopher battery keeps a subset (the
            // l71 fixture note: the synthetic vocab has no stopwords)
            when(pmod(col("doc_id"), lit(2L)) === 0L,
              lit(" of and that have with")).otherwise(lit("")),
            lit("</p><a href=\"/n\">nav</a></body></html>")).as("html"),
          concat(lit("https://site"), pmod(col("doc_id"), lit(5L)),
            when(pmod(col("doc_id"), lit(5L)) === 2L,
              lit(".spam-domain.com/x")).otherwise(lit(".example.org/x")))
            .as("u"))
        for (rep <- 1 to 2) {
          metrics.reset()
          val t0 = System.nanoTime()
          val funnel = CurationPipeline.run(raw, "doc_id", "source",
            "html", "u", blockedDomains = Seq("spam-domain.com"),
            lineMaxDf = (docs.count() / 10).max(4L),
            gopherMinWords = 20, jaccN = 3, jaccThreshold = 0.2,
            jaccMaxDocFreq = 10,
            budgetPerSource = 100000L, packBudget = 2048L,
            trainPct = 80, valPct = 10,
            reline = c => concat(lit("nav home menu\n"),
              regexp_replace(c, " (the|a) ", "\n"),
              lit("\ncopyright footer 2024"))).collect()
          metrics.drain()
          val secs = (System.nanoTime() - t0) / 1e9
          println(f"PROBE13 l71scale rep$rep $secs%.1f s " +
            f"shuffle=${metrics.shuffleWriteMb} MB " +
            f"spill=${metrics.spillMb} MB")
          if (rep == 1) funnel.sortBy(r => (r.getLong(0), r.getString(1)))
            .foreach(r => println(s"PROBE13 l71scale_funnel " +
              s"${r.getLong(0)} ${r.getString(1)} docs=${r.getLong(2)} " +
              s"tokens=${r.getLong(3)}"))
        }

      case "warc" =>
        val crlf = "\r\n"
        val docs = graft.core.Tables.documents(spark, sfDir)
        val body = concat(lit("<html><body><p>"), col("text"),
          lit("</p></body></html>"))
        val http = concat(lit("HTTP/1.1 200 OK" + crlf +
          "Content-Type: text/html" + crlf + crlf), body)
        val metaB = concat(lit("fetchTimeMs: "), col("doc_id"), lit(crlf))
        val w = concat(
          lit("WARC/1.0" + crlf + "WARC-Type: response" + crlf +
            "WARC-Target-URI: http://x/"), col("doc_id"),
          lit(crlf + "Content-Type: application/http" + crlf +
            "Content-Length: "), length(http.cast("binary")),
          lit(crlf + crlf), http, lit(crlf + crlf),
          lit("WARC/1.0" + crlf + "WARC-Type: metadata" + crlf +
            "Content-Type: application/warc-fields" + crlf +
            "Content-Length: "), length(metaB.cast("binary")),
          lit(crlf + crlf),
          metaB, lit(crlf + crlf))
        val src = docs.select(col("doc_id"), w.cast("binary").as("w"))
          .cache()
        val totalMb = src.select(sum(length(col("w"))).cast("double"))
          .collect()(0).getDouble(0) / 1e6
        println(f"PROBE13 warc_corpus payload=${totalMb}%.1f MB")
        for (rep <- 1 to 3) {
          metrics.reset()
          val t0 = System.nanoTime()
          val n = graft.operators.Warc.records(src, "doc_id", "w")
            .count()
          metrics.drain()
          val secs = (System.nanoTime() - t0) / 1e9
          println(f"PROBE13 warc_parse rep$rep $secs%.1f s records=$n " +
            f"mb_per_sec=${totalMb / secs}%.0f")
        }
        src.unpersist()

      case "l71jobs" =>
        // per-job wall breakdown of the registered l71 query — the
        // composed pipeline's cost is ~fixed job overhead (it barely
        // moves from 5k to 25k docs), so the lever is JOB COUNT, not
        // data volume; this names the jobs
        val jobLog = new java.util.concurrent.ConcurrentLinkedQueue[
          (Int, Long, String)]()
        val starts = new java.util.concurrent.ConcurrentHashMap[
          Integer, (Long, String)]()
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onJobStart(
                e: org.apache.spark.scheduler.SparkListenerJobStart)
                : Unit = {
              val site = Option(e.properties)
                .flatMap(p => Option(p.getProperty(
                  "callSite.short"))).getOrElse("?")
              starts.put(e.jobId, (e.time, site)); ()
            }
            override def onJobEnd(
                e: org.apache.spark.scheduler.SparkListenerJobEnd)
                : Unit = {
              Option(starts.remove(e.jobId)).foreach { case (t0, st) =>
                jobLog.add((e.jobId, e.time - t0, st)); ()
              }
            }
          })
        val q = graft.queries.Registry.all
          .find(_.name == "l71_curation_pipeline").get
        for (rep <- 1 to 2) {
          jobLog.clear()
          val t0 = System.nanoTime()
          q.run(spark, sfDir).write.format("noop")
            .mode(SaveMode.Overwrite).save()
          Thread.sleep(400)
          val secs = (System.nanoTime() - t0) / 1e9
          import scala.jdk.CollectionConverters._
          val byJob = jobLog.asScala.toSeq.sortBy(_._1)
          println(f"PROBE13 l71jobs rep$rep $secs%.1f s " +
            s"jobs=${byJob.size} " +
            f"busy=${byJob.map(_._2).sum / 1e3}%.1f s")
          if (rep == 2) byJob.foreach { case (id, ms, site) =>
            println(f"PROBE13 l71job $id%3d $ms%5d ms  $site")
          }
        }

      case other =>
        sys.error(s"unknown ProbeR13 mode: $other")
    }
    spark.stop()
  }
}
