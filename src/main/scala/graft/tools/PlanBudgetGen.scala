package graft.tools

/** Dev-only: sweep EVERY registered query's static-plan budget
  * classes (global windows/sorts, cartesian products, nested-loop
  * joins) and print the non-zero hits — the measurement behind
  * PlanBudgetSpec's allowlist. Run after adding a query that
  * legitimately needs one of these, then justify the new allowlist
  * entry in the commit.
  *
  * usage: runMain graft.tools.PlanBudgetGen [sfDir]
  */
object PlanBudgetGen {
  val watched = Seq("GlobalWindow", "GlobalSort", "CartesianProduct",
    "BroadcastNestedLoopJoin")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val spark = graft.core.Sessions.build("graft-plan-budget-gen",
      graft.core.Sessions.cpusFromEnv(32))
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    var failed = 0
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val fp = graft.plans.PlanFingerprint.budgetForQuery(spark, n,
          sfDir)
        val hits = watched.flatMap(k => fp.get(k).map(v => s"$k=$v"))
        val ms = (System.nanoTime() - t0) / 1e6
        if (hits.nonEmpty)
          println(f"PLANBUDGET HIT  $n ${hits.mkString(",")} ($ms%.0f ms)")
        else println(f"PLANBUDGET ok   $n ($ms%.0f ms)")
      } catch {
        case e: Throwable =>
          failed += 1
          println(s"PLANBUDGET FAIL $n ${e.getClass.getName}: " +
            e.getMessage)
      }
    }
    println(s"PLANBUDGET done queries=${names.length} failed=$failed")
    spark.stop()
    sys.exit(if (failed == 0) 0 else 1)
  }
}
