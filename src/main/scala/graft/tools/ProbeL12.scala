package graft.tools

/** Dev-only: row counts for the l12 gate config at each SF.
  * args(0) overrides the testdata root (default /root/testdata).
  */
object ProbeL12 {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/root/testdata")
    val spark = graft.core.Tables.localSession("probe-l12")
    try {
      for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
        val n = graft.SparkEntry.queries("l12_cosine_near_dup")(
          spark, s"$root/$sf").count()
        println(s"L12 $sf rows=$n")
      }
    } finally spark.stop()
  }
}
