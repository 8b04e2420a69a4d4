package graft.tools

import org.apache.spark.sql.SaveMode

import graft.core.Sessions
import graft.queries.Registry

/** Dev-only: time one registered query repeatedly and print its plan.
  * args: <queryName> [sfDir] [reps]
  */
object ProbePerf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Sessions.build("probe-perf", Sessions.cpusFromEnv(32))
    if (name == "ref_pipeline_e2e") {
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        val out = graft.pipeline.ReferenceParity.run(spark,
          "/root/reference/data/raw", "2024-11-24")
        val t1 = System.nanoTime()
        out.factSales.write.format("noop").mode(SaveMode.Overwrite).save()
        val t2 = System.nanoTime()
        out.dimProducts.write.format("noop").mode(SaveMode.Overwrite).save()
        val t3 = System.nanoTime()
        println(f"PROBE $name rep$i total ${(t3 - t0) / 1e9}%.2f s " +
          f"(run ${(t1 - t0) / 1e9}%.2f, fact ${(t2 - t1) / 1e9}%.2f, " +
          f"dims ${(t3 - t2) / 1e9}%.2f)")
      }
      spark.stop()
      return
    }
    val q = Registry.all.find(_.name == name).get
    graft.core.Tables.all.foreach { t =>
      try graft.core.Tables.t(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode(SaveMode.Overwrite).save()
      println(f"PROBE $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    println(q.run(spark, sfDir).queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
