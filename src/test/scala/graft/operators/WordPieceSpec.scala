package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** WordPiece: likelihood-scored merge training vs an independent
  * in-memory reference, greedy longest-match-first encode semantics,
  * and the family-separation claim (the score, not the shared
  * machinery, decides the merges).
  */
class WordPieceSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Independent in-memory WordPiece trainer (Maps + the same score). */
  private def bruteTrain(words: Map[String, Long],
                         nMerges: Int): Seq[(String, String)] = {
    var seqs: Map[Vector[String], Long] =
      words.groupBy(_._1.toVector.map(_.toString))
        .map { case (k, m) => k -> m.values.sum }
    val out = Vector.newBuilder[(String, String)]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val sym = scala.collection.mutable.Map[String, Long]()
      val pair = scala.collection.mutable.Map[(String, String), Long]()
      seqs.foreach { case (syms, cnt) =>
        syms.foreach(x => sym(x) = sym.getOrElse(x, 0L) + cnt)
        syms.sliding(2).foreach {
          case Vector(a, b) =>
            pair((a, b)) = pair.getOrElse((a, b), 0L) + cnt
          case _ => ()
        }
      }
      if (pair.isEmpty) done = true
      else {
        val best = pair.toSeq.map { case ((a, b), t) =>
          // the EXACT expression shape both engines compute
          (t.toDouble / (sym(a).toDouble * sym(b).toDouble), a, b)
        }.minBy { case (sc, a, b) => (-sc, a, b) }
        val (_, a, b) = best
        out += ((a, b))
        seqs = seqs.toSeq.map { case (syms, cnt) =>
          // left-to-right single-pass replace, matching replace()
          val buf = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == a &&
              syms(i + 1) == b) { buf += a + b; i += 2 }
            else { buf += syms(i); i += 1 }
          }
          (buf.result(), cnt)
        }.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
        r += 1
      }
    }
    out.result()
  }

  test("train == an independent in-memory likelihood-scored trainer " +
    "on random corpora") {
    import s.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val alphabet = "abcde"
      val words = (1 to 40).map { _ =>
        (1 to (2 + rnd.nextInt(6)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val docs = words.zipWithIndex
        .map { case (w, i) => (i.toLong, (w + " ") * (1 + i % 3)) }
        .toDF("doc_id", "text")
      val got = WordPiece.train(docs, "text", nMerges = 6)
        .map(m => (m.a, m.b))
      val wc = words.zipWithIndex
        .flatMap { case (w, i) => Seq.fill(1 + i % 3)(w) }
        .groupBy(identity).map { case (w, g) => w -> g.size.toLong }
      assert(got == bruteTrain(wc, 6), s"trial $trial diverged")
    }
  }

  test("the likelihood score separates the family: WordPiece merges " +
    "differ from BPE's frequency merges on the real corpus") {
    val docs = Tables.documents(s, dir)
    val wp = WordPiece.train(docs, "text", 8).map(m => (m.a, m.b))
    val bpe = Bpe.train(docs, "text", 8).map(m => (m.a, m.b))
    assert(wp != bpe,
      "frequency and likelihood argmax must diverge on real text — " +
        "if they agree the score is not exercising anything")
  }

  test("trainBatched: batch=1 is exactly train; larger batches keep " +
    "the argmax head, full rank cover, and determinism under " +
    "partitioning") {
    import s.implicits._
    val rnd = new scala.util.Random(29)
    val alphabet = "abcdef"
    val words = (1 to 60).map { _ =>
      (1 to (2 + rnd.nextInt(6)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val df = words.zipWithIndex
      .map { case (w, i) => (i.toLong, (w + " ") * (1 + i % 3)) }
      .toDF("doc_id", "text")
    val seq = WordPiece.train(df, "text", 10).map(m => (m.a, m.b))
    assert(WordPiece.trainBatched(df, "text", 10, batch = 1)
      .map(m => (m.a, m.b)) == seq,
      "batch=1 must be the exact sequential likelihood order")
    for (parts <- Seq(1, 7)) {
      val b4 = WordPiece.trainBatched(df.repartition(parts), "text", 10,
        batch = 4)
      assert(b4.map(_.rank) == (1 to 10), s"parts=$parts")
      // the first adoption of the first round IS the global argmax —
      // batching can only defer same-round-created pairs, never demote
      // the head
      assert((b4.head.a, b4.head.b) == seq.head, s"parts=$parts")
      // every adopted surface is buildable from the ones before it +
      // the alphabet (a valid agglomerative table)
      val known = scala.collection.mutable.Set[String]()
      known ++= alphabet.map(_.toString)
      b4.foreach { m =>
        assert(known(m.a) && known(m.b),
          s"merge (${m.a},${m.b}) uses an unbuildable symbol")
        known += m.merged
      }
    }
    // determinism: two identical runs learn identical tables
    assert(WordPiece.trainBatched(df, "text", 10, batch = 4) ==
      WordPiece.trainBatched(df, "text", 10, batch = 4))
  }

  test("greedy longest-match encode: longest wins, UNK per unseen " +
    "char, pieces reconstruct the word") {
    import s.implicits._
    val docs = Seq((1L, "abcab"), (2L, "axb"), (3L, "zzz ab"))
      .toDF("doc_id", "text")
    val vocab = Seq("a", "b", "ab", "abc")
    val got = WordPiece.encode(docs, "doc_id", "text", vocab)
      .select("doc_id", "pieces")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("abc", "ab"), s"longest-first: ${got(1L)}")
    assert(got(2L) == Seq("a", "[UNK]", "b"))
    assert(got(3L) == Seq("[UNK]", "[UNK]", "[UNK]", "ab"))
    // reconstruction: non-UNK pieces concatenate back to the word
    assert(got(1L).mkString == "abcab")
  }

  test("encode over the real corpus: trained vocab covers the train " +
    "alphabet (no UNK on train docs), every piece is vocab or UNK") {
    val train = Tables.documents(s, dir)
      .filter(TextAnalysis.splitAssign("doc_id", 80, 10) === "train")
    val merges = WordPiece.train(train, "text", 8)
    val vocab = WordPiece.vocabTokens(train, "text", merges)
    val enc = WordPiece.encode(train, "doc_id", "text", vocab)
    val distinctPieces = enc
      .select(explode(col("pieces")).as("p")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(!distinctPieces.contains("[UNK]"),
      "train docs can never produce UNK — their alphabet is in vocab")
    assert(distinctPieces.subsetOf(vocab.toSet))
    // conservation: total piece characters == total word characters
    val pieceChars = enc.select(explode(col("pieces")).as("p"))
      .agg(sum(length(col("p")))).collect()(0).getLong(0)
    val wordChars = train.select(explode(expr(
        "regexp_extract_all(lower(text), '[a-z]+', 0)")).as("w"))
      .agg(sum(length(col("w")))).collect()(0).getLong(0)
    assert(pieceChars == wordChars)
  }
}
