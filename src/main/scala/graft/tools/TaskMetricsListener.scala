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
  private val taskEndsSeen = new AtomicLong(0L)

  private def raiseTo(a: AtomicLong, v: Long): Unit = {
    var cur = a.get()
    while (v > cur && !a.compareAndSet(cur, v)) cur = a.get()
  }

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    taskEndsSeen.incrementAndGet()
    Option(te.taskMetrics).foreach { m =>
      spilledBytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      shuffleWriteBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      raiseTo(peakExecMem, m.peakExecutionMemory)
      raiseTo(maxTaskMs, te.taskInfo.duration)
    }
  }

  def reset(): Unit = {
    spilledBytes.set(0L); maxTaskMs.set(0L)
    peakExecMem.set(0L); shuffleWriteBytes.set(0L)
  }

  /** Wait for the async listener bus to go quiescent: poll the
    * task-end count until it is stable across two consecutive 100 ms
    * windows (a fixed 300 ms sleep undercounted under heavy stages,
    * where the bus lags behind the last action by more than that),
    * bounded at 5 s. Quiescence proves DELIVERY has caught up; it
    * cannot recover events the bus DROPPED outright — if
    * `spark.scheduler.listenerbus.eventqueue.capacity` (default 10000)
    * overflows, Spark logs the drop and the affected counters
    * undercount. None of the evidence tools' stages approach 10k
    * tasks, so stale delivery, not overflow, is the realistic risk.
    */
  def drain(): Unit = {
    val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
    var prev = -1L
    var stable = 0
    while (stable < 2 && System.nanoTime() < deadline) {
      Thread.sleep(100)
      val cur = taskEndsSeen.get()
      stable = if (cur == prev) stable + 1 else 0
      prev = cur
    }
  }

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
