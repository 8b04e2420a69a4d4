package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.queries.Registry

/** Shared task-level measurement for the scale-evidence tools
  * (SkewStress / SpillStress / ProbeL12C): spill, straggler, peak task
  * memory, shuffle volume. One implementation so the tools whose
  * numbers are compared against each other measure identically.
  */
final class TaskMetricsListener extends SparkListener {
  val spilledBytes = new AtomicLong(0L)
  val maxTaskMs = new AtomicLong(0L)
  val peakExecMem = new AtomicLong(0L)
  val shuffleWriteBytes = new AtomicLong(0L)

  private def raiseTo(a: AtomicLong, v: Long): Unit = {
    var cur = a.get()
    while (v > cur && !a.compareAndSet(cur, v)) cur = a.get()
  }

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
    Option(te.taskMetrics).foreach { m =>
      spilledBytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      shuffleWriteBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      raiseTo(peakExecMem, m.peakExecutionMemory)
      raiseTo(maxTaskMs, te.taskInfo.duration)
    }

  def reset(): Unit = {
    spilledBytes.set(0L); maxTaskMs.set(0L)
    peakExecMem.set(0L); shuffleWriteBytes.set(0L)
  }

  /** Let the async listener bus deliver the last task events. */
  def drain(): Unit = Thread.sleep(300)

  def spillMb: Long = spilledBytes.get() >> 20
  def peakExecMemMb: Long = peakExecMem.get() >> 20
  def shuffleWriteMb: Long = shuffleWriteBytes.get() >> 20
  def maxTaskSec: Double = maxTaskMs.get() / 1e3
}

object TaskMetricsListener {
  def installed(spark: SparkSession): TaskMetricsListener = {
    val l = new TaskMetricsListener
    spark.sparkContext.addSparkListener(l)
    l
  }

  /** Codegen warm-up shared by the evidence tools: run each named
    * registry query once at the smallest SF so the timed runs measure
    * steady-state execution, not per-JVM compilation.
    */
  def warmUp(spark: SparkSession, names: Seq[String],
             warmDir: String = "/root/testdata/sf0.001"): Unit =
    if (new java.io.File(warmDir).isDirectory)
      names.foreach { n =>
        Registry.all.find(_.name == n).foreach { q =>
          try q.run(spark, warmDir).write.format("noop")
            .mode(SaveMode.Overwrite).save()
          catch { case _: Throwable => () }
        }
      }
}
