package graft.tools

import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Executor death DURING a streaming LSM fold — the intersection of
  * round 15's driver-death proof (RestartSpec: whole-JVM halt, batch
  * REPLAY path) and round 16's executor-death proof (ExecutorKill:
  * one executor JVM SIGKILLed mid-job, task-RETRY path). Here the
  * retry path is exercised INSIDE the stateful streaming fold: two
  * tiered dedup standing indexes are driven over the same batch
  * sequence, one undisturbed, one with an executor SIGKILLed while a
  * mid-run batch's fold (and, by cadence, a tiered compaction) is in
  * flight. Spark must complete the batch via task retry + shuffle
  * recompute inside the SAME foreachBatch invocation — no checkpoint
  * replay is involved — and the proof is that both arms end with
  * IDENTICAL at-arrival flags for every batch and an identical
  * logical standing index.
  *
  * Must run under SPARK_GRAFT_MASTER=local-cluster[n,c,m]. Exit 0 =
  * proof held; 3 = the kill landed after the kill-batch's fold
  * already finished (vacuous — re-run with a bigger batch or earlier
  * killDelayMs); anything else = real failure.
  *
  * usage: runMain graft.tools.ExecutorKillStream [batches] [killBatch]
  *          [killDelayMs] [docsPerBatch]
  */
object ExecutorKillStream {
  def main(args: Array[String]): Unit = {
    val batches = if (args.length > 0) args(0).toInt else 24
    val killBatch = if (args.length > 1) args(1).toLong else 12L
    val killDelayMs = if (args.length > 2) args(2).toLong else 150L
    val docsPer = if (args.length > 3) args(3).toInt else 30000
    require(sys.env.get("SPARK_GRAFT_MASTER")
        .exists(_.startsWith("local-cluster")),
      "ExecutorKillStream needs SPARK_GRAFT_MASTER=local-cluster[n,c,m]")
    val spark = graft.core.Sessions.build("graft-executor-kill-stream", 32)
    import spark.implicits._

    // batches with real cross-batch duplicate density: content keys
    // draw from a space ~2x one batch, so later batches mix first-seen
    // and already-indexed docs (both sides of the anti-join exercised)
    def batchDf(b: Long) =
      spark.range(0L, docsPer.toLong, 1L, 32)
        .select((lit(b) * 1000000L + col("id")).as("doc_id"),
          concat(lit("doc body "),
            ((col("id") * 2654435761L + lit(b) * 97L) %
              (docsPer * 2L)).cast("string"),
            lit(" trailing words")).as("text"))

    val root = java.nio.file.Files
      .createTempDirectory("graft_execkill_stream").toString
    def drive(arm: String, killAt: Option[Long]): Boolean = {
      val sink = StreamOps.dedupIndexForeachBatchTiered(
        s"$root/$arm/index", s"$root/$arm/flags", "doc_id", "text",
        maxDeltas = 4)
      var killLandedMidFold = false
      for (b <- 1L to batches.toLong) {
        @volatile var killedAtNs = 0L
        val killer = killAt.filter(_ == b).map { _ =>
          val t = new Thread(() => {
            Thread.sleep(killDelayMs)
            ExecProcs.executorPids().headOption.foreach { p =>
              killedAtNs = System.nanoTime()
              p.destroyForcibly()
              println(s"EXECKILLSTREAM SIGKILLed executor " +
                s"pid=${p.pid()} during batch $b")
            }
          })
          t.start(); t
        }
        sink(batchDf(b), b)
        val foldEndNs = System.nanoTime()
        killer.foreach { t =>
          t.join()
          killLandedMidFold = killedAtNs != 0L && killedAtNs < foldEndNs
        }
      }
      killLandedMidFold
    }

    println(s"EXECKILLSTREAM executors: " +
      s"${ExecProcs.executorPids().map(_.pid())}")
    drive("a", killAt = None)
    val landed = drive("b", killAt = Some(killBatch))
    if (!landed) {
      println("EXECKILLSTREAM VACUOUS: kill landed after the batch " +
        "fold finished — increase docsPerBatch or lower killDelayMs")
      spark.stop(); sys.exit(3)
    }

    // both arms: identical at-arrival flags for EVERY batch...
    def flags(arm: String) = spark.read
      .option("basePath", s"$root/$arm/flags")
      .parquet((1 to batches).map(b => s"$root/$arm/flags/batch=$b"): _*)
    val flagCols = flags("a").columns.sorted.map(col).toIndexedSeq
    val diffFlags = flags("a").select(flagCols: _*)
      .exceptAll(flags("b").select(flagCols: _*))
      .unionAll(flags("b").select(flagCols: _*)
        .exceptAll(flags("a").select(flagCols: _*))).count()
    // ...and an identical logical standing index (physical segment
    // layout may differ — the kill can shift WHICH batch a compaction
    // fired on, so compare the fold's semantics, not the dirs)
    def logical(arm: String) = StreamOps
      .dedupIndex(spark, s"$root/$arm/index")
      .groupBy("content_hash").agg(min("first_batch").as("first_batch"))
    val diffIndex = logical("a").exceptAll(logical("b"))
      .unionAll(logical("b").exceptAll(logical("a"))).count()
    val nA = logical("a").count()
    val survivors = ExecProcs.executorPids().map(_.pid())
    println(s"EXECKILLSTREAM flags_diff=$diffFlags " +
      s"index_diff=$diffIndex index_hashes=$nA " +
      s"executors_after=$survivors")
    require(diffFlags == 0L,
      s"at-arrival flags diverged across executor death: $diffFlags")
    require(diffIndex == 0L,
      s"standing index diverged across executor death: $diffIndex")
    require(nA > 0L, "vacuous: empty standing index")
    println("EXECKILLSTREAM PASS: streaming fold + tiered compaction " +
      "identical across executor death (task-retry path)")
    spark.stop()
    sys.exit(0)
  }
}
