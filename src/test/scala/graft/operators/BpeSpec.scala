package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[Bpe]] against a NAIVE in-memory reference implementation of
  * Sennrich-style BPE (pair counting over a word-frequency map, greedy
  * left-to-right merge application) — the dataflow version must learn
  * the identical merge table and produce identical token counts, and
  * must do so under any input partitioning.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  // ---- naive reference: words as symbol vectors --------------------
  private def refApply(w: Vector[String], a: String,
                       b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      if (i + 1 < w.length && w(i) == a && w(i + 1) == b) {
        out += (a + b); i += 2 // greedy left-to-right, non-overlapping
      } else { out += w(i); i += 1 }
    }
    out.result()
  }

  private def refTrain(texts: Seq[String],
                       n: Int): Seq[(String, String)] = {
    var vocab: Map[Vector[String], Long] =
      texts.flatMap("[a-z]+".r.findAllIn(_))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
        .map { case (w, c) => w.map(_.toString).toVector -> c }
    val merges = Vector.newBuilder[(String, String)]
    var r = 0
    var done = false
    while (r < n && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      for ((w, c) <- vocab; i <- 0 until w.length - 1)
        counts((w(i), w(i + 1))) = counts.getOrElse((w(i), w(i + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        // count desc, then lexicographically smallest pair — Bpe.train's
        // total argmax order
        val (a, b) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head._1
        merges += ((a, b))
        vocab = vocab.groupMapReduce(kv => refApply(kv._1, a, b))(_._2)(_ + _)
        r += 1
      }
    }
    merges.result()
  }

  private def refEncodeCount(text: String,
                             merges: Seq[(String, String)]): Long =
    "[a-z]+".r.findAllIn(text.toLowerCase).map { w =>
      merges.foldLeft(w.map(_.toString).toVector) { case (v, (a, b)) =>
        refApply(v, a, b)
      }.length.toLong
    }.sum

  private val corpus = Seq(
    (1L, "the cat sat on the mat with another cat"),
    (2L, "the bat and the cat chat that matter"),
    (3L, "aaa aaaa aa banana bandana"),
    (4L, "Mixed CASE and d1g1ts 42 splitting words"),
    (5L, "chatter chat chart charts the theme there"),
    (6L, ""))

  test("train learns the naive-reference merge table (incl. greedy " +
    "overlap on aaa-style runs) and is invariant to partitioning") {
    import s.implicits._
    val df = corpus.toDF("doc_id", "text")
    val expected = refTrain(corpus.map(_._2.toLowerCase), 12)
    for (parts <- Seq(1, 7)) {
      val merges = Bpe.train(df.repartition(parts), "text", 12)
      assert(merges.map(m => (m.a, m.b)) == expected,
        s"parts=$parts")
      assert(merges.map(_.rank) == (1 to 12))
    }
  }

  test("encodeCounts matches the naive per-doc reference counts and " +
    "never merges across word boundaries") {
    import s.implicits._
    val df = corpus.toDF("doc_id", "text")
    val merges = Bpe.train(df, "text", 12)
    val got = Bpe.encodeCounts(df, "text", merges)
      .select("doc_id", "n_words", "bpe_tokens")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val refMerges = merges.map(m => (m.a, m.b))
    corpus.foreach { case (id, text) =>
      val words = "[a-z]+".r.findAllIn(text.toLowerCase).size.toLong
      assert(got(id) == ((words, refEncodeCount(text, refMerges))),
        s"doc $id")
    }
    // cross-word-boundary guard: "ab ba" must not merge b+b even when
    // (b, b) is forced into the table
    val pair = Seq((1L, "ab ba")).toDF("doc_id", "text")
    val forced = Seq(Bpe.Merge(1, "b", "b"))
    val n = Bpe.encodeCounts(pair, "text", forced)
      .select("bpe_tokens").head().getLong(0)
    assert(n == 4L, "b|b spans a word seam and must not merge")
  }

  test("trainBatched: batch=1 is exactly train; larger batches keep " +
    "the argmax head, determinism under partitioning, and encode " +
    "consistency; the deviation stays within-round") {
    import s.implicits._
    val df = corpus.toDF("doc_id", "text")
    val seq = Bpe.train(df, "text", 12)
    assert(Bpe.trainBatched(df, "text", 12, batch = 1)
      .map(m => (m.a, m.b)) == seq.map(m => (m.a, m.b)),
      "batch=1 must be exact Sennrich order")
    for (parts <- Seq(1, 7)) {
      val b4 = Bpe.trainBatched(df.repartition(parts), "text", 12,
        batch = 4)
      assert(b4.map(_.rank) == (1 to 12), s"parts=$parts")
      // the first adoption of the first round IS the global argmax —
      // batching can only defer same-round-created pairs, never demote
      // the head
      assert((b4.head.a, b4.head.b) == (seq.head.a, seq.head.b),
        s"parts=$parts")
      // encode correctness is rank-order application, independent of
      // how the table was learned: the dataflow encode must match the
      // naive reference under the batched table too
      val refMerges = b4.map(m => (m.a, m.b))
      val got = Bpe.encodeCounts(df, "text", b4)
        .select("doc_id", "bpe_tokens").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      corpus.foreach { case (id, text) =>
        assert(got(id) == refEncodeCount(text, refMerges),
          s"doc $id parts=$parts")
      }
    }
    // determinism: two identical runs learn identical tables
    assert(Bpe.trainBatched(df, "text", 12, batch = 4) ==
      Bpe.trainBatched(df, "text", 12, batch = 4))
  }

  test("training exhausts gracefully when every word is fully merged") {
    import s.implicits._
    val tiny = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val merges = Bpe.train(tiny, "text", 10)
    assert(merges.map(m => (m.a, m.b)) == Seq(("a", "b")),
      "one merge possible, then the pair stream is empty")
  }

  test("vocabTable: alphabet-sorted-then-merge-rank ids; surface " +
    "collisions keep the first-learned id") {
    import s.implicits._
    val train = Seq((1L, "cab cab ba")).toDF("doc_id", "text")
    // alphabet {a, b, c} -> ids 0, 1, 2; then merges by rank
    val merges = Seq(Bpe.Merge(1, "c", "a"), Bpe.Merge(2, "ca", "b"),
      Bpe.Merge(3, "c", "ab")) // rank 3 collides with rank 2's "cab"
    val v = Bpe.vocabTable(train, "text", merges)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v == Map("a" -> 0L, "b" -> 1L, "c" -> 2L,
      "ca" -> 3L, "cab" -> 4L),
      s"deterministic dense layout, min id on collision; got $v")
  }

  test("tokenIds: ids follow the vocab, positions stay dense, and " +
    "held-out chars the train split never saw map to UNK -1") {
    import s.implicits._
    val train = Seq((1L, "abab aba")).toDF("doc_id", "text")
    val merges = Bpe.train(train, "text", 2)
    val vocab = Bpe.vocabTable(train, "text", merges)
    // 'z' never occurs in training: alphabet is {a, b}
    val held = Seq((9L, "abaz")).toDF("doc_id", "text")
    val ids = Bpe.tokenIds(held, "doc_id", "text", merges, vocab)
      .orderBy("pos").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq
    // merges learned on "abab abab aba": rank1 (a,b)->ab, rank2 varies;
    // recompute expectations from the trained table itself
    val tok = Bpe.tokens(held, "doc_id", "text", merges)
      .orderBy("pos").collect().map(_.getString(2)).toSeq
    val vm = vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = tok.zipWithIndex.map { case (t, i) =>
      ((i + 1).toLong, vm.getOrElse(t, -1L)) }
    assert(ids == expect, s"ids $ids != vocab-mapped tokens $expect")
    assert(tok.contains("z") && vm.get("z").isEmpty &&
      ids.exists(_._2 == -1L), "the OOV branch must actually fire")
    assert(ids.map(_._1) == (1L to ids.length).toSeq, "dense positions")
  }
}
