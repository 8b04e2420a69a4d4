package graft.tools

/** Dev-only: times the full reference-parity pipeline end-to-end. */
object TimeParity {
  def main(args: Array[String]): Unit = {
    val s = graft.core.Sessions.build("graft-parity-time", 8)
    try {
      val t0 = System.nanoTime()
      val out = graft.pipeline.ReferenceParity.run(s,
        "/root/reference/data/raw", "2024-11-24")
      val n = out.factSales.count() + out.dimProducts.count() +
        out.dimCustomers.count() + out.salesFlagged.count()
      println(f"PARITY e2e: ${(System.nanoTime() - t0) / 1e9}%.1f s (rows touched: $n)")
    } finally s.stop()
  }
}
