package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class UnigramLmSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Brute-force reference: enumerate ALL segmentations into pieces of
    * length <= maxLen, cost = vocab cost or unknown for single chars;
    * returns the minimal total cost. No shared code with the operator.
    */
  private def bruteMinCost(w: String, vocab: Map[String, Long],
                           maxLen: Int, unk: Long): Long = {
    if (w.isEmpty) return 0L
    val memo = scala.collection.mutable.Map.empty[Int, Long]
    def go(i: Int): Long = { // min cost of suffix from i
      if (i == w.length) 0L
      else memo.getOrElseUpdate(i, {
        var best = Long.MaxValue
        for (l <- 1 to math.min(maxLen, w.length - i)) {
          val p = w.substring(i, i + l)
          val c = vocab.get(p) match {
            case Some(x) => x
            case None if l == 1 => unk
            case None => Long.MaxValue
          }
          if (c != Long.MaxValue) {
            val rest = go(i + l)
            if (rest != Long.MaxValue && c + rest < best) best = c + rest
          }
        }
        best
      })
    }
    go(0)
  }

  test("unigram_viterbi: minimal cost matches brute-force enumeration " +
    "on random words, result is a valid tiling, deterministic") {
    val rnd = new scala.util.Random(72L)
    val alphabet = "abcd"
    // random vocab: all singles + random multis with random costs
    val singles = alphabet.map(c => c.toString -> (3L + rnd.nextInt(5)))
    val multis = (1 to 30).map { _ =>
      val len = 2 + rnd.nextInt(3)
      val p = Array.fill(len)(alphabet(rnd.nextInt(4))).mkString
      p -> (2L + rnd.nextInt(8))
    }.distinct
    val vocab = (singles ++ multis).toMap.toSeq
    val words = (1 to 120).map { _ =>
      Array.fill(1 + rnd.nextInt(12))(alphabet(rnd.nextInt(4))).mkString
    }.distinct
    val df = words.toDF("word")
    val got = df.select(col("word"),
        UnigramLm.segmentCol(col("word"), vocab, maxPieceLen = 4)
          .as("pieces"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    val vm = vocab.toMap
    for (w <- words) {
      val pieces = got(w)
      assert(pieces.mkString("") == w, s"'$w' tiling broken: $pieces")
      val cost = pieces.map(p =>
        vm.getOrElse(p,
          { assert(p.length == 1, s"unknown multi piece $p"); 1048576L }))
        .sum
      val want = bruteMinCost(w, vm, 4, 1048576L)
      assert(cost == want, s"'$w': viterbi cost $cost != brute $want")
    }
    // determinism across partitioning
    val again = df.repartition(7).select(col("word"),
        UnigramLm.segmentCol(col("word"), vocab, 4).as("pieces"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(again == got)
  }

  test("unigram_viterbi: tie-break prefers the longest piece walking " +
    "back from the end; unknown chars fall back to singles") {
    // 'ab' cost 4 == 'a'(2) + 'b'(2): tie -> the 2-piece and 1-piece
    // paths cost the same; backtrace must take 'ab'
    val vocab = Seq("a" -> 2L, "b" -> 2L, "ab" -> 4L)
    val got = Seq("ab", "abz").toDF("w")
      .select(col("w"), UnigramLm.segmentCol(col("w"), vocab, 4)
        .as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(got("ab") == Seq("ab"), s"tie must go long: ${got("ab")}")
    // 'z' not in vocab: unknown single fallback, tiling still valid
    assert(got("abz") == Seq("ab", "z"), got("abz").toString)
  }

  test("train: singles always survive, multis bounded, vocabulary " +
    "layout-invariant and non-vacuous on testdata") {
    val docs = Tables.documents(s, sf)
    val v1 = UnigramLm.train(docs, "text", seedTop = 200,
      vocabTop = 80, iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val singles = v1.filter(_._1.length == 1)
    val multis = v1.filter(_._1.length > 1)
    assert(multis.nonEmpty, "training must keep some multi-char pieces")
    assert(multis.length <= 80, s"prune cap violated: ${multis.length}")
    assert(multis.forall(_._2 >= 1L), "kept multis must be used")
    // every corpus character is a single piece (coverage invariant)
    val corpusChars = docs.select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty)
        .flatMap(_.take(16))).toSet
    assert(corpusChars.subsetOf(singles.map(_._1.head).toSet),
      "coverage invariant broken")
    // layout invariance
    val v2 = UnigramLm.train(docs.repartition(13), "text", seedTop = 200,
      vocabTop = 80, iters = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(v1.sortBy(_._1).toSeq == v2.sortBy(_._1).toSeq)
  }

  test("encode: per-doc piece stream tiles the truncated words in " +
    "order") {
    val docs = Tables.documents(s, sf).limit(50)
    val vocabDf = UnigramLm.train(docs, "text", seedTop = 200,
      vocabTop = 80, iters = 1)
    val vocab = vocabDf.collect()
      .map(r => (r.getString(0), r.getLong(2))).toSeq
    val enc = UnigramLm.encode(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[String](1), r.getLong(2)))).toMap
    val raw = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, (pieces, n)) <- enc) {
      assert(n == pieces.length.toLong)
      val wordsJoined = raw(id).split(" ").filter(_.nonEmpty)
        .map(_.take(16)).mkString("")
      assert(pieces.mkString("") == wordsJoined,
        s"doc $id stream does not tile its words")
    }
  }
}
