package graft.tools

import org.apache.spark.sql.SaveMode

import graft.queries.Registry

/** Dev-only: isolated per-query timing with the Bench methodology (noop
  * sink so every column of every row is computed, clearCache between
  * samples so one run cannot serve another's work, median of k). Usage:
  *   runMain graft.tools.TimeQueries <sfDir> <reps> <name1> <name2> ...
  * Prints one line per query: name, median, min, max, all samples.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: TimeQueries <sfDir> <reps> <name1> [name2 ...]")
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = graft.core.Sessions.build("graft-time-queries",
      graft.core.Sessions.cpusFromEnv(32))
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.csv.CSVHeaderChecker",
      org.apache.logging.log4j.Level.ERROR)
    // same warmup discipline as Bench: touch inputs, then one cold run
    // per query at the smallest SF to pay codegen compilation
    graft.core.Tables.all.foreach { t =>
      try graft.core.Tables.t(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory) names.foreach { n =>
      try Registry.queries(n)(spark, warmDir)
        .write.format("noop").mode(SaveMode.Overwrite).save()
      catch { case _: Throwable => () }
    }
    names.foreach { n =>
      val run = Registry.queries.get(n).getOrElse(
        sys.error(s"unknown query: $n"))
      val samples = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        run(spark, sfDir).write.format("noop")
          .mode(SaveMode.Overwrite).save()
        (System.nanoTime() - t0) / 1e9
      }
      val s = samples.sorted
      val med = if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      println(f"TIMEQ $n%-40s med=$med%7.3f min=${s.head}%7.3f " +
        f"max=${s.last}%7.3f samples=${samples.map(x => f"$x%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
