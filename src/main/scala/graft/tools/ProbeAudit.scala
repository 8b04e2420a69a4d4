package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Sessions
import graft.operators.Audit
import graft.sources.Csv

/** Dev-only: isolate the parity audit's per-source cost — the fused
  * profile scan with and without the bounded-id sampler columns, solo
  * and with four sources concurrently.
  */
object ProbeAudit {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("probe-audit", Sessions.cpusFromEnv(32))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    import Audit.RefRules._
    val df = Csv.readInferred(spark,
      "/root/reference/data/raw/suppliers.csv").cache()
    df.count()
    val rules = Seq(
      Audit.FormatRule("Phone", badPhone("Phone"), "x"),
      Audit.FormatRule("Fax", badPhone("Fax"), "x"))

    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"[probe-audit] $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }

    for (i <- 1 to 4) {
      time(s"counts-only $i") {
        df.select(df.columns.toSeq.map(c =>
          count(when(col(c).isNull, lit(1))).as(s"n_$c")) ++
          rules.map(r => count(when(r.bad, lit(1))).as(r.name)): _*)
          .collect()
      }
      time(s"full report $i") {
        Audit.report(df, rules, idColumn = Some("SupplierID"))
      }
      time(s"report no-ids $i") {
        Audit.report(df, rules, idColumn = None)
      }
    }
    spark.stop()
  }
}
