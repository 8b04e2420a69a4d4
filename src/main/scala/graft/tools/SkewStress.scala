package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.core.Sessions
import graft.queries.Registry

/** Skewed-key scale stress (the classic 100 TB killer a uniform TPC-H
  * inflation never exercises): run the skew-sensitive headline queries
  * against a ZIPF-skewed directory (see [[ScaleGen]]'s `zipf` mode) and
  * its uniform twin, and show that AQE's skew-join split keeps wall time
  * and stragglers bounded where the skew actually lands in a shuffle
  * join.
  *
  * Threshold scaling, documented honestly: AQE only splits a partition
  * that exceeds `skewedPartitionThresholdInBytes` (256 MB default) AND
  * 5x the median. At 100 TB the hot key's partition exceeds that
  * naturally; at bench scale (~50 MB hot partition at sf1) it does not,
  * so this harness shrinks the byte thresholds proportionally — the
  * MECHANISM under test (detect skewed partition, split it, keep the
  * join correct) is identical, only the trigger scale moves.
  *
  * Per (query, dir, skew-join on/off): min-of-reps seconds, rows,
  * spill bytes, max single-task time (the straggler), and whether the
  * final adaptive plan contains a skew=true join.
  *
  * Usage: runMain graft.tools.SkewStress <uniformDir> <skewDir> [reps]
  */
object SkewStress {

  private val queries =
    Seq("a8_dashboard_revenue", "g5_fact_build", "l1_exact_dedup",
      "x1_sessionize")

  def main(args: Array[String]): Unit = {
    val uniformDir = args(0)
    val skewDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = Sessions.build("graft-skew-stress", Sessions.cpusFromEnv(32))

    // task-level skew evidence: spills and the slowest single task
    val spilled = new java.util.concurrent.atomic.AtomicLong(0L)
    val maxTaskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach { m =>
          spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          val ms = te.taskInfo.duration
          var cur = maxTaskMs.get()
          while (ms > cur && !maxTaskMs.compareAndSet(cur, ms))
            cur = maxTaskMs.get()
        }
    })

    // shrink the AQE skew trigger to bench scale (see scaladoc)
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")

    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      queries.foreach { n =>
        Registry.all.find(_.name == n).foreach { q =>
          try q.run(spark, warmDir).write.format("noop")
            .mode(SaveMode.Overwrite).save()
          catch { case _: Throwable => () }
        }
      }

    def skewMarked(df: DataFrame): Boolean = {
      // collect() through the SAME QueryExecution so the inspected plan
      // is the final adaptive one (foreach/count execute a clone)
      df.collect()
      df.queryExecution.executedPlan.toString.contains("skew=true")
    }

    final case class Cell(secs: Double, rows: Long, spillMb: Long,
                          maxTaskSec: Double, skewJoin: Boolean)

    def run(name: String, dir: String, skewJoinOn: Boolean): Cell = {
      val q = Registry.all.find(_.name == name).get
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
        skewJoinOn.toString)
      try {
        val secs = (1 to reps).map { _ =>
          spark.catalog.clearCache()
          val t0 = System.nanoTime()
          q.run(spark, dir).write.format("noop")
            .mode(SaveMode.Overwrite).save()
          (System.nanoTime() - t0) / 1e9
        }.min
        // one inspected execution for rows / plan / task metrics
        spark.catalog.clearCache()
        spilled.set(0L); maxTaskMs.set(0L)
        val df = q.run(spark, dir)
        val rows = df.collect().length.toLong
        Thread.sleep(300) // listener bus drain
        Cell(secs, rows, spilled.get() >> 20, maxTaskMs.get() / 1e3,
          df.queryExecution.executedPlan.toString.contains("skew=true"))
      } finally
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    }

    def jcell(c: Cell): String =
      s"""{"secs":${math.rint(c.secs * 1000) / 1000},"rows":${c.rows},""" +
        s""""spill_mb":${c.spillMb},""" +
        s""""max_task_sec":${math.rint(c.maxTaskSec * 1000) / 1000},""" +
        s""""skew_split":${c.skewJoin}}"""

    val parts = queries.map { n =>
      val uni = run(n, uniformDir, skewJoinOn = true)
      val skewOn = run(n, skewDir, skewJoinOn = true)
      val skewOff = run(n, skewDir, skewJoinOn = false)
      s""""$n":{"uniform":${jcell(uni)},"skewed_aqe":${jcell(skewOn)},""" +
        s""""skewed_noaqe":${jcell(skewOff)}}"""
    }
    println(s"""{"skew_stress":{"uniform_dir":"$uniformDir",""" +
      s""""skew_dir":"$skewDir","reps":$reps,""" +
      s""""queries":{${parts.mkString(",")}}}}""")
    spark.stop()
  }
}
