package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}
import graft.operators.Similarity

/** Dev-only: the LSH-sizing evidence run behind SCALE_r06.md §3.
  *
  * cosineNearDupPairs' cell structure has 2^nPlanes cells per table; a
  * corpus far above ~a-few x 2^nPlanes SATURATES it (sf5's 500k vectors
  * on the sf0.1 design point of 12 planes = avg 122 members/cell), and
  * then NO within-cell strategy wins: the uncapped form spills on the
  * quadratic cell joins, the capped form floods the verify joins with
  * nTables x corpus star candidates. The 100 TB rule is to size nPlanes
  * with the corpus (avg cell O(1)) and let the cap absorb the genuine
  * mega-cluster TAIL. This probe times uncapped vs capped at a chosen
  * nPlanes on an inflated dir, with spill/straggler from task metrics.
  *
  * Usage: runMain graft.tools.ProbeL12C <sfDir> <nPlanes> [cap] [mode]
  *   mode: both (default) | capped | uncapped. Per-stage straggler
  *   breakdown (stage name, tasks, max task sec) prints for every run.
  */
object ProbeL12C {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nPlanes = args(1).toInt
    val cap = if (args.length > 2) args(2).toInt else 64
    val mode = if (args.length > 3) args(3) else "both"
    val spark = Sessions.build("graft-probe-l12c", Sessions.cpusFromEnv(32))

    val spilled = new java.util.concurrent.atomic.AtomicLong(0L)
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val stageMax =
      new scala.collection.concurrent.TrieMap[Int, (String, Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach { m =>
          spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          val ms = te.taskInfo.duration
          var cur = maxTaskMs.get()
          while (ms > cur && !maxTaskMs.compareAndSet(cur, ms))
            cur = maxTaskMs.get()
          val sid = te.stageId
          val name = te.taskType
          stageMax.updateWith(sid) {
            case Some((n, c, mx)) => Some((n, c + 1, math.max(mx, ms)))
            case None => Some((name, 1, ms))
          }
        }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
          : Unit = {
        val si = sc.stageInfo
        stageMax.updateWith(si.stageId) {
          case Some((_, c, mx)) => Some((si.name.take(70), c, mx))
          case None => Some((si.name.take(70), si.numTasks, 0L))
        }
      }
    })

    def corpus = {
      val base = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
      val twins = base.select(
        (col("vec_id") + lit(1000000L)).as("vec_id"),
        expr("""zip_with(embedding, sequence(0, size(embedding) - 1),
                (x, d) -> x + CAST(0.04 * sin(CAST(d AS DOUBLE)
                  + CAST(vec_id AS DOUBLE)) AS FLOAT))""").as("embedding"))
      base.unionByName(twins)
    }

    def run(name: String, df: org.apache.spark.sql.DataFrame): String = {
      spark.catalog.clearCache()
      spilled.set(0L); maxTaskMs.set(0L); stageMax.clear()
      val t0 = System.nanoTime()
      df.write.format("noop").mode(SaveMode.Overwrite).save()
      val secs = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      val (sp, mx) = (spilled.get() >> 20, maxTaskMs.get() / 1e3)
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
