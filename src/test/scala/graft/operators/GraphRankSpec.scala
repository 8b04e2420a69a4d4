package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class GraphRankSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  /** In-memory reference with the IDENTICAL integer arithmetic. */
  private def ref(edges: Seq[(Long, Long)], iters: Int,
                  scale: Long = 1L << 20, dampNum: Long = 85L,
                  dampDen: Long = 100L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val base = scale * (dampDen - dampNum) / dampDen
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 1 to iters) {
      val in = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, v) <- edges) in(v) += r(u) / outdeg(u)
      r = nodes.map(n => n -> (base + dampNum * in(n) / dampDen)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int, parts: Int) = {
    import s.implicits._
    GraphRank.pageRankFixedPoint(
        edges.toDF("src", "dst").repartition(parts), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("bit-exact vs the in-memory integer reference on a random graph, " +
    "under any partitioning") {
    val rnd = new scala.util.Random(5)
    val edges = Seq.fill(600)(
      (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)).distinct
    val want = ref(edges, iters = 4)
    assert(run(edges, 4, 7) == want)
    assert(run(edges, 4, 1) == want && run(edges, 4, 32) == want,
      "layout invariance")
  }

  test("a star's center out-ranks its leaves; a node with no in-edges " +
    "holds exactly the damping base; dangling nodes keep rank but " +
    "don't propagate") {
    // leaves 1..10 -> center 0 and back; 99 -> 0 only (99 has no
    // in-edges); 0 -> 50 where 50 is dangling (no out-edges)
    val star = (1L to 10L).flatMap(l => Seq((l, 0L), (0L, l)))
    val edges = star ++ Seq((99L, 0L), (0L, 50L))
    val got = run(edges, 4, 3)
    val want = ref(edges, 4)
    assert(got == want)
    val base = (1L << 20) * 15L / 100L
    assert(got(99L) == base, "no in-edges => pure damping base")
    assert(got(0L) > got(1L) && got(0L) > got(50L), "center dominates")
    assert(got(50L) > base, "dangling node still RECEIVES rank")
  }
}
