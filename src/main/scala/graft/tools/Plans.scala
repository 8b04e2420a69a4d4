package graft.tools

import graft.queries.Registry

/** Dev-only: dump formatted physical plans of headline queries for the
  * scale audit (pushdown, broadcast, codegen spans, shuffle count).
  *
  * `--final` as the first name executes each query (collect through the
  * SAME QueryExecution — the skill-notes AQE gotcha) and prints the
  * FINAL adaptive plan, which is where runtime rewrites (AQE coalesce,
  * skew split, SMJ→shuffled-hash conversion) become visible; the
  * pre-execution `explain` only shows isFinalPlan=false.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val s = graft.core.Sessions.build("graft-plans",
      graft.core.Sessions.cpusFromEnv(4))
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val rest = args.drop(1).toSeq
    val finalMode = rest.headOption.contains("--final")
    val names = {
      val ns = if (finalMode) rest.drop(1) else rest
      if (ns.nonEmpty) ns else Registry.headlines.map(_.name)
    }
    names.foreach { n =>
      println(s"\n================ $n ================")
      val df = Registry.queries(n)(s, dir)
      if (finalMode) {
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else df.explain("formatted")
    }
    s.stop()
  }
}
