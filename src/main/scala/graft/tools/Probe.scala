package graft.tools

/** Dev-only probe: verifies testdata readability (ns timestamps, float
  * arrays) under Spark 4. Not part of the engine surface.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.localSession("probe")
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      ev.printSchema()
      ev.show(3, false)
      val em = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      em.printSchema()
      em.show(2, false)
      println("OK-PROBE")
    } finally spark.stop()
  }
}
