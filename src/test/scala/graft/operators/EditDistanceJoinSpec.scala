package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Dedup.editDistanceJoin]] against an in-JVM brute-force
  * Levenshtein ground truth: the blocking stage is a theorem (exact
  * recall), so the operator's output must EQUAL the brute pair set —
  * including the short-string tier the count filter cannot cover, exact
  * duplicates (distance 0), pairs at exactly k, and pairs at k+1
  * (excluded). Also pins the plan shape: no CartesianProduct /
  * BroadcastNestedLoop anywhere (the short tier is a length-bucket
  * equi-join, not a nested loop).
  */
class EditDistanceJoinSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private def lev(a: String, b: String): Int = {
    val prev = new Array[Int](b.length + 1)
    val cur = new Array[Int](b.length + 1)
    for (j <- 0 to b.length) prev(j) = j
    for (i <- 1 to a.length) {
      cur(0) = i
      for (j <- 1 to b.length) {
        val cost = if (a(i - 1) == b(j - 1)) 0 else 1
        cur(j) = math.min(math.min(cur(j - 1) + 1, prev(j) + 1),
          prev(j - 1) + cost)
      }
      Array.copy(cur, 0, prev, 0, b.length + 1)
    }
    prev(b.length)
  }

  private def brute(docs: Seq[(Long, String)],
                    k: Int): Set[(Long, Long, Long)] =
    (for {
      (ia, ta) <- docs
      (ib, tb) <- docs
      if ia < ib
      d = lev(ta, tb)
      if d <= k
    } yield (ia, ib, d.toLong)).toSet

  private def run(docs: Seq[(Long, String)], k: Int,
                  q: Int): Set[(Long, Long, Long)] =
    Dedup.editDistanceJoin(docs.toDF("doc_id", "text"), "doc_id", "text",
        k = k, q = q)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("dist")))
      .toSet

  private def randomEditCorpus(seed: Int): Seq[(Long, String)] = {
    val rnd = new Random(seed)
    val alpha = "abcdefgh "
    def randStr(len: Int): String =
      (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    def edit(t: String, nEdits: Int): String = {
      var cur = t
      for (_ <- 0 until nEdits) {
        val op = rnd.nextInt(3)
        val p = if (cur.isEmpty) 0 else rnd.nextInt(cur.length)
        cur = op match {
          case 0 if cur.nonEmpty => // substitute
            cur.updated(p, alpha(rnd.nextInt(alpha.length)))
          case 1 => // insert
            cur.substring(0, p) + alpha(rnd.nextInt(alpha.length)) +
              cur.substring(p)
          case _ if cur.nonEmpty => // delete
            cur.substring(0, p) + cur.substring(p + 1)
          case _ => cur
        }
      }
      cur
    }
    val bases = (0 until 20).map(i => randStr(40 + rnd.nextInt(120)))
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    var id = 0L
    bases.foreach { b =>
      docs += ((id, b)); id += 1
      // planted neighbors at distances around the threshold
      docs += ((id, edit(b, 1 + rnd.nextInt(4)))); id += 1
      docs += ((id, edit(b, 6 + rnd.nextInt(6)))); id += 1
    }
    // exact duplicate (distance 0)
    docs += ((id, bases.head)); id += 1
    docs.toSeq
  }

  test("equals brute force on a random planted-edit corpus (k=5, q=3)") {
    val docs = randomEditCorpus(7)
    assert(run(docs, k = 5, q = 3) == brute(docs, 5))
  }

  test("equals brute force at a different design point (k=3, q=2)") {
    val docs = randomEditCorpus(11)
    assert(run(docs, k = 3, q = 2) == brute(docs, 3))
  }

  test("short-string tier: strings below the count-filter floor still " +
    "join exactly, including empty and sub-q strings") {
    // k=4, q=3 -> shorts are len <= 14; several below q (no grams at all)
    val docs = Seq[(Long, String)](
      (1L, ""), (2L, "ab"), (3L, "abcd"), (4L, "abcdefg"),
      (5L, "abcdefgzzzz"), (6L, "xy"), (7L, "abcdefghijklmnopqr"),
      (8L, "abcdefghijklmnopqrstuvwx"), (9L, "abcdefghijklmnopqrstuvwxyz"))
    assert(run(docs, k = 4, q = 3) == brute(docs, 4))
  }

  test("distance-k pairs kept, k+1 excluded, and dist is the true " +
    "levenshtein value") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val atK = base.take(base.length - 4) // 4 deletions -> dist 4
    val overK = base.take(base.length - 5) // dist 5
    val docs = Seq((1L, base), (2L, atK), (3L, overK))
    val out = run(docs, k = 4, q = 3)
    assert(out.contains((1L, 2L, 4L)))
    assert(!out.exists { case (a, b, _) => (a, b) == ((1L, 3L)) })
    // (2,3): one more deletion -> dist 1
    assert(out.contains((2L, 3L, 1L)))
  }

  private def runPass(docs: Seq[(Long, String)],
                      k: Int): Set[(Long, Long, Long)] =
    Dedup.editDistanceJoinPass(docs.toDF("doc_id", "text"), "doc_id",
        "text", k = k)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("dist")))
      .toSet

  test("PassJoin equals brute force on the random planted-edit corpus " +
    "(k=5)") {
    val docs = randomEditCorpus(7)
    assert(runPass(docs, k = 5) == brute(docs, 5))
  }

  test("PassJoin equals brute force at k=3 and k=8") {
    val docs = randomEditCorpus(11)
    assert(runPass(docs, k = 3) == brute(docs, 3))
    assert(runPass(docs, k = 8) == brute(docs, 8))
  }

  test("PassJoin short tier: sub-(k+1) documents and their bounded " +
    "partners join exactly") {
    val docs = Seq[(Long, String)](
      (1L, ""), (2L, "ab"), (3L, "abcd"), (4L, "abcdefg"),
      (5L, "abcdefgzzzz"), (6L, "xy"), (7L, "abcdefghijklmnopqr"),
      (8L, "abcdefghijklmnopqrstuvwx"), (9L, "abcdefghijklmnopqrstuvwxyz"))
    assert(runPass(docs, k = 4) == brute(docs, 4))
  }

  test("plan: no cartesian product or nested-loop join in either tier") {
    val docs = randomEditCorpus(3) ++
      Seq((9000L, "ab"), (9001L, "abc")) // populate the short tier
    val plan = Dedup.editDistanceJoin(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = 4, q = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }
}
