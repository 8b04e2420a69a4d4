package graft.tools

import graft.queries.Registry

/** Dev-only: dump formatted physical plans of headline queries for the
  * scale audit (pushdown, broadcast, codegen spans, shuffle count).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val s = graft.core.Sessions.build("graft-plans", 4)
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Registry.headlines.map(_.name)
    names.foreach { n =>
      println(s"\n================ $n ================")
      Registry.queries(n)(s, dir).explain("formatted")
    }
    s.stop()
  }
}
