package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Sessions

/** Dev-only: round-17 optimization probes.
  *
  * Modes (arg 1):
  *  - `l61bloom <dir> [reps]`: the round-16 deferred guide-§3.2 item —
  *    A/B of [[graft.operators.Dedup.containmentPairs]] vs
  *    [[graft.operators.Dedup.containmentPairsBloom]] (probe-side
  *    Bloom pre-filter on the container inverted list) on `dir`'s
  *    documents table, with shuffle/spill task metrics and an exact
  *    result-equality check. Evaluated at sf1-scale corpora where the
  *    inverted-list shuffle dominates; adopt only if it beats the
  *    prefix filter alone.
  */
object ProbeR17 {

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val spark = Sessions.build("graft-probe-r17", Sessions.cpusFromEnv(32))
    val metrics = TaskMetricsListener.installed(spark)

    def timed[T](name: String, reps: Int = 3)(body: => T): Unit =
      for (rep <- 1 to reps) {
        metrics.reset()
        val t0 = System.nanoTime()
        val r = body
        metrics.drain()
        println(f"PROBE17 $name rep$rep " +
          f"${(System.nanoTime() - t0) / 1e9}%.1f s result=$r " +
          f"shuffle=${metrics.shuffleWriteMb} MB " +
          f"spill=${metrics.spillMb} MB " +
          f"maxTask=${metrics.maxTaskSec}%.1f s")
      }

    mode match {
      case "l61bloom" =>
        import graft.operators.Dedup
        val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
        val reps = if (args.length > 2) args(2).toInt else 3
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .select(col("doc_id"), col("text"))
        // the l61 fixture shape: every doc wrapped into a synthetic
        // container (text + next doc's text), hashed-shingle variant
        // (8-byte keys — the scale path)
        val base = docs
        val next = docs.select((col("doc_id") - 1).as("doc_id"),
          col("text").as("t2"))
        val wrapped = base.join(next, "doc_id")
          .select((col("doc_id") + 100000000L).as("doc_id"),
            concat(col("text"), lit(" "), col("t2")).as("text"))
        val corpus = base.unionByName(wrapped)
        def agg(dfr: org.apache.spark.sql.DataFrame) = {
          val r = dfr.agg(count(lit(1)),
            coalesce(expr("bit_xor(xxhash64(doc_a, doc_b))"), lit(0L)))
            .collect()(0)
          s"pairs=${r.getLong(0)} fp=${r.getLong(1)}"
        }
        timed("l61_prefix_only", reps) {
          spark.sharedState.cacheManager.clearCache()
          agg(Dedup.containmentPairs(corpus, "doc_id", "text",
            n = 3, threshold = 0.9, hashedShingles = true))
        }
        timed("l61_prefix_bloom", reps) {
          spark.sharedState.cacheManager.clearCache()
          agg(Dedup.containmentPairsBloom(corpus, "doc_id", "text",
            n = 3, threshold = 0.9, hashedShingles = true))
        }

      case "shjab" =>
        // Within-JVM alternating A/B of the AQE SMJ->SHJ conversion
        // (spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold 64m
        // vs 0) — verdict item 3. The conf is read at ACTION time, so
        // arms alternate per sample inside one session: JIT warmup and
        // box drift hit both arms equally, unlike a two-JVM A/B where
        // the first arm is systematically colder.
        import graft.queries.Registry
        import org.apache.spark.sql.SaveMode
        val dir = args(1)
        val reps = args(2).toInt
        val names = args.drop(3).toSeq
        val conf = "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold"
        names.foreach { n =>
          val run = Registry.queries(n)
          // two warm runs (codegen + JIT) before any timed sample
          (1 to 2).foreach { _ =>
            spark.sharedState.cacheManager.clearCache()
            try run(spark, dir).write.format("noop")
              .mode(SaveMode.Overwrite).save()
            catch { case e: Throwable => println(s"WARM FAIL $n: $e") }
          }
          val samples = scala.collection.mutable.Map(
            "64m" -> List.empty[Double], "0" -> List.empty[Double])
          (1 to 2 * reps).foreach { i =>
            val arm = if (i % 2 == 1) "64m" else "0"
            spark.conf.set(conf, arm)
            spark.sharedState.cacheManager.clearCache()
            val t0 = System.nanoTime()
            run(spark, dir).write.format("noop")
              .mode(SaveMode.Overwrite).save()
            samples(arm) ::= (System.nanoTime() - t0) / 1e9
          }
          spark.conf.set(conf, "64m")
          def med(xs: List[Double]) = {
            val s = xs.sorted
            if (s.size % 2 == 1) s(s.size / 2)
            else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
          }
          println(f"PROBE17 shjab $n%-40s on=${med(samples("64m"))}%6.2f " +
            f"off=${med(samples("0"))}%6.2f " +
            f"on_samples=${samples("64m").reverse.map(x => f"$x%.2f").mkString(",")} " +
            f"off_samples=${samples("0").reverse.map(x => f"$x%.2f").mkString(",")}")
        }

      case other =>
        throw new IllegalArgumentException(s"unknown mode $other")
    }
    spark.stop()
  }
}
