package graft.tools

/** Dev-only: drives SparkEntry.entry the way the driver's smoke check
  * does (rows > 0 on sf0.001).
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Sessions.build("graft-smoke", 4)
    try {
      val df = graft.SparkEntry.entry(spark)
      df.show(10, false)
      println(s"SMOKE rows=${df.count()}")
    } finally spark.stop()
  }
}
