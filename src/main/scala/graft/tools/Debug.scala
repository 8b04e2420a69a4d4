package graft.tools

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Dev-only scratch main: ad-hoc profiling of individual operators.
  * `runMain graft.tools.Debug minhash` times the MinHash-LSH stages.
  */
object Debug {
  def main(args: Array[String]): Unit = {
    val s = graft.core.Sessions.build("graft-debug", 8)
    try {
      args.headOption match {
        case Some("minhash") => minhash(s)
        case Some("edjoin") => edjoin(s,
          if (args.length > 1) args(1) else "/root/testdata/sf0.1",
          if (args.length > 2) args(2).toInt else 6)
        case _ => println("usage: Debug minhash|edjoin")
      }
    } finally s.stop()
  }

  private def minhash(s: org.apache.spark.sql.SparkSession): Unit = {
    import graft.operators.Dedup
    val docs = Tables.documents(s, "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    time("warm docs")(docs.count())
    val sh = docs.select(col("doc_id").as("doc"),
        Dedup.shingles("text", 3).as("sh"))
      .filter(size(col("sh")) > 0).cache()
    time("shingles materialize")(sh.count())
    time("full pairs")(Dedup.minHashLshPairs(docs, "doc_id", "text").count())
    time("full pairs again")(
      Dedup.minHashLshPairs(docs, "doc_id", "text").count())
  }

  private def edjoin(s: org.apache.spark.sql.SparkSession, dir: String,
                     q: Int): Unit = {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(s, dir)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"EDJOIN $label ${(System.nanoTime() - t0) / 1e9}%.2f s: $r")
      r
    }
    val base = Dedup.edJoinBase(docs, "doc_id", "text", k = 8, q = q)
    base.count()
    val cand = Dedup.editDistanceCandidates(base, k = 8, q = q).cache()
    time(s"q=$q candidates")(cand.count())
    time(s"q=$q verified")(
      Dedup.editDistanceJoin(docs, "doc_id", "text", k = 8, q = q).count())
    cand.unpersist(); base.unpersist()
  }
}
