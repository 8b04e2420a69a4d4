package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables
import graft.operators.TextAnalysis

/** Pins [[CountMin]]: linearity (the property everything else rides
  * on), partition-order independence, the one-sided est >= exact
  * guarantee, exactness in the collision-free regime, and the
  * JVM-vs-SQL bucket parity the l51 oracle depends on.
  */
class CountMinSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def sketchOf(docs: org.apache.spark.sql.DataFrame, depth: Int,
                       width: Int): Array[Long] =
    TextAnalysis.cmsTokenSketch(docs, "text", depth, width)
      .head().getSeq[Long](0).toArray

  test("partition-order independence: identical grid at 1, 7 and 32 " +
    "partitions") {
    val docs = Tables.documents(s, sf)
    val g1 = sketchOf(docs.repartition(1), 4, 32)
    val g7 = sketchOf(docs.repartition(7), 4, 32)
    val g32 = sketchOf(docs.repartition(32), 4, 32)
    assert(g1.sameElements(g7) && g7.sameElements(g32))
  }

  test("linearity: sketch(A union B) == sketch(A) + sketch(B) " +
    "elementwise") {
    val docs = Tables.documents(s, sf)
    val a = docs.filter(col("doc_id") % 2 === 0)
    val b = docs.filter(col("doc_id") % 2 =!= 0)
    val ga = sketchOf(a, 4, 32)
    val gb = sketchOf(b, 4, 32)
    val gu = sketchOf(docs, 4, 32)
    assert(gu.sameElements(ga.zip(gb).map { case (x, y) => x + y }))
  }

  test("est >= exact for EVERY token, and est == exact when the grid " +
    "is collision-free") {
    val docs = Tables.documents(s, sf)
    val exact = docs
      .select(explode(TextAnalysis.tokens("text")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tight grid: collisions certain at width 8
    val tight = sketchOf(docs, 4, 8)
    // wide grid: vocabulary (~50 tokens) spread over 4 x 4096
    val wide = sketchOf(docs, 4, 4096)
    def estIn(grid: Array[Long], width: Int, tok: String): Long = {
      val h = polyHash(tok)
      (0 until 4).map(r =>
        grid(r * width + CountMin.bucket(h, r, width).toInt)).min
    }
    exact.foreach { case (tok, n) =>
      assert(estIn(tight, 8, tok) >= n, s"tight grid undercounts $tok")
      assert(estIn(wide, 4096, tok) == n,
        s"collision-free grid should be exact for $tok")
    }
    // the tight grid actually inflates something (non-vacuous)
    assert(exact.exists { case (tok, n) => estIn(tight, 8, tok) > n })
  }

  test("estimate column matches the JVM-side min-of-counters (the l51 " +
    "read path)") {
    val docs = Tables.documents(s, sf)
    val out = TextAnalysis.cmsTopFrequencies(docs, "text", depth = 4,
        width = 8, topK = 10)
      .collect().map(r => (r.getAs[String]("token"),
        r.getAs[Long]("exact"), r.getAs[Long]("est")))
    val grid = sketchOf(docs, 4, 8)
    out.foreach { case (tok, exact, est) =>
      val h = polyHash(tok)
      val jvm = (0 until 4).map(r =>
        grid(r * 8 + CountMin.bucket(h, r, 8).toInt)).min
      assert(est == jvm && est >= exact, s"$tok: est=$est jvm=$jvm")
    }
  }

  test("bucketSql mirrors bucket() for adversarial hashes (incl. the " +
    "negative-input guard)") {
    val hs = Seq(0L, 1L, 7L, 1073741788L, CountMin.P - 1, CountMin.P,
      CountMin.P + 13, -5L)
    val exprs = for (h <- hs; r <- 0 until 4)
      yield expr(CountMin.bucketSql(h.toString, r, 16)).cast("long")
    val viaSql = s.range(1).select(exprs: _*).head()
      .toSeq.map(_.asInstanceOf[Long])
    val viaJvm = for (h <- hs; r <- 0 until 4)
      yield CountMin.bucket(h, r, 16)
    assert(viaSql == viaJvm)
  }

  /** In-JVM mirror of the engine's poly_hash (seed 7, base 31, mod
    * 1073741789 over the char codes).
    */
  private def polyHash(t: String): Long =
    t.foldLeft(7L)((a, c) => (a * 31 + c.toLong) % 1073741789L)
}
