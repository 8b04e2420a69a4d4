package graft.tools

/** Dev-only: print the current plan fingerprints of the golden-gated
  * queries as the Scala literal PlanGoldenSpec commits. Run after an
  * INTENTIONAL plan change, paste the diff, and say why in the commit.
  *
  * usage: runMain graft.tools.PlanGoldenGen [sfDir] [names...]
  */
object PlanGoldenGen {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.plans.PlanGolden.goldens.keys.toSeq.sorted
    val spark = graft.core.Sessions.build("graft-plan-golden-gen",
      graft.core.Sessions.cpusFromEnv(32))
    names.foreach { n =>
      val fp = graft.plans.PlanFingerprint.forQuery(spark, n, sfDir)
      println(s"""    "$n" -> ${graft.plans.PlanFingerprint.render(fp)},""")
    }
    spark.stop()
  }
}
