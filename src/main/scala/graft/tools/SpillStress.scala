package graft.tools

import org.apache.spark.sql.SaveMode

import graft.core.Sessions
import graft.queries.Registry

/** Memory-inflection probe for the heaviest registry entries: run them
  * at a large inflation (sf5 = 50x bench scale) and record the metrics
  * that foreshadow where a real cluster first feels memory pressure —
  * spill bytes (memory + disk), peak execution memory of any single
  * task, the straggler (max single-task wall time), and shuffle volume.
  *
  * The point is to find the next inflection BEFORE a 1000-executor run
  * does: a query that completes at 50x with zero spill has headroom; one
  * that starts spilling shows exactly which stage's per-task state
  * outgrows its memory share, and that stage is what needs a larger
  * shuffle partition count (or a cap/band redesign) at the next decade.
  *
  * Usage: runMain graft.tools.SpillStress <sfDir> [reps] [q1,q2,...]
  * Default queries: the three heaviest by BENCH_r05 (l12, l2b, g5).
  */
object SpillStress {

  private val defaultQueries =
    Seq("l12_cosine_near_dup", "l2b_ngram_jaccard_capped", "g5_fact_build")

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val names =
      if (args.length > 2) args(2).split(",").toSeq else defaultQueries
    val spark = Sessions.build("graft-spill-stress", Sessions.cpusFromEnv(32))
    val metrics = TaskMetricsListener.installed(spark)
    TaskMetricsListener.warmUp(spark, names)

    val parts = names.map { n =>
      val q = Registry.all.find(_.name == n)
        .getOrElse(sys.error(s"unknown query $n"))
      try {
        val secs = (1 to reps).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          q.run(spark, sfDir).write.format("noop")
            .mode(SaveMode.Overwrite).save()
          (System.nanoTime() - t0) / 1e9
        }.min
        // one inspected run for task metrics (noop write = full
        // materialization; a count() would let Catalyst prune the
        // computed columns and understate the memory story)
        spark.catalog.clearCache()
        metrics.reset()
        q.run(spark, sfDir).write.format("noop")
          .mode(SaveMode.Overwrite).save()
        metrics.drain()
        val (sp, pk, mx, sw) = (metrics.spillMb, metrics.peakExecMemMb,
          metrics.maxTaskSec, metrics.shuffleWriteMb)
        spark.catalog.clearCache()
        val rows = q.run(spark, sfDir).count()
        s""""$n":{"secs":${math.rint(secs * 1000) / 1000},"rows":$rows,""" +
          s""""spill_mb":$sp,""" +
          s""""peak_task_exec_mem_mb":$pk,""" +
          s""""max_task_sec":$mx,""" +
          s""""shuffle_write_mb":$sw}"""
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString.replace("\"", "'")
          s""""$n":{"error":"$msg"}"""
      }
    }
    println(s"""{"spill_stress":{"sf_dir":"$sfDir","reps":$reps,""" +
      s""""queries":{${parts.mkString(",")}}}}""")
    spark.stop()
  }
}
