package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SaveMode

import graft.core.Sessions
import graft.operators.Similarity
import graft.queries.LlmOps

/** Dev-only: the LSH-sizing evidence run behind SCALE_r06.md §3.
  *
  * cosineNearDupPairs' cell structure has 2^nPlanes cells per table; a
  * corpus far above ~a-few x 2^nPlanes SATURATES it (sf5's 500k vectors
  * on the sf0.1 design point of 12 planes = avg 122 members/cell), and
  * then NO within-cell strategy wins: the uncapped form spills on the
  * quadratic cell joins, a capped form floods its candidate stage. The
  * 100 TB rule is to size nPlanes with the corpus (avg cell O(1)) and
  * let the cap absorb the genuine mega-cluster TAIL. This probe times
  * uncapped vs capped at a chosen nPlanes on an inflated dir, with
  * spill/straggler from task metrics and a per-stage straggler
  * breakdown (the diagnostic that exposed the composed-bucketing
  * interpreted-fallback cliff — see plans/LshBuckets).
  *
  * Usage: runMain graft.tools.ProbeL12C <sfDir> <nPlanes> [cap] [mode]
  *   mode: both (default) | capped | uncapped.
  */
object ProbeL12C {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nPlanes = args(1).toInt
    val cap = if (args.length > 2) args(2).toInt else 64
    val mode = if (args.length > 3) args(3) else "both"
    val spark = Sessions.build("graft-probe-l12c", Sessions.cpusFromEnv(32))
    val metrics = TaskMetricsListener.installed(spark)

    // per-stage straggler attribution, beyond the shared task totals
    val stageMax =
      new scala.collection.concurrent.TrieMap[Int, (String, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val ms = te.taskInfo.duration
        stageMax.updateWith(te.stageId) {
          case Some((n, c, mx)) => Some((n, c + 1, math.max(mx, ms)))
          case None => Some((te.taskType, 1, ms))
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted)
          : Unit = {
        val si = sc.stageInfo
        stageMax.updateWith(si.stageId) {
          case Some((_, c, mx)) => Some((si.name.take(70), c, mx))
          case None => Some((si.name.take(70), si.numTasks, 0L))
        }
      }
    })

    def corpus = LlmOps.twinnedEmbeddings(spark, sfDir)

    def run(name: String, df: org.apache.spark.sql.DataFrame): String = {
      spark.catalog.clearCache()
      metrics.reset(); stageMax.clear()
      val t0 = System.nanoTime()
      df.write.format("noop").mode(SaveMode.Overwrite).save()
      val secs = (System.nanoTime() - t0) / 1e9
      metrics.drain()
      val (sp, mx) = (metrics.spillMb, metrics.maxTaskSec)
      stageMax.toSeq.sortBy(-_._2._3).take(6).foreach {
        case (sid, (n, c, ms)) =>
          println(f"[stage] $name s$sid%-5d ${ms / 1e3}%7.1fs max " +
            f"($c%4d tasks) $n")
      }
      spark.catalog.clearCache()
      val rows = df.count()
      s""""$name":{"secs":${math.rint(secs * 1000) / 1000},"rows":$rows,""" +
        s""""spill_mb":$sp,"max_task_sec":$mx}"""
    }

    val parts = Seq(
      "uncapped" -> (() => run("uncapped", Similarity.cosineNearDupPairs(
        corpus, "vec_id", "embedding", threshold = 0.9, dim = 64,
        nPlanes = nPlanes, nTables = 8))),
      "capped" -> (() => run("capped", Similarity.cosineNearDupPairsCapped(
        corpus, "vec_id", "embedding", threshold = 0.9, dim = 64,
        nPlanes = nPlanes, nTables = 8, maxBucket = cap)))
    ).collect { case (n, f) if mode == "both" || mode == n => f() }
    println(s"""{"probe_l12c":{"sf_dir":"$sfDir","n_planes":$nPlanes,""" +
      s""""cap":$cap,${parts.mkString(",")}}}""")
    spark.stop()
  }
}
