package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins [[QualityClassifier]]'s fixed-point training: bit-identical
  * weights under any partitioning (the whole point of integer-only
  * gradient folds), a classifier that actually separates the classes
  * (not the degenerate keep-all/drop-all fixed points raw-count
  * features fall into), and well-formed features on edge docs.
  */
class QualityClassifierSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  private val cfg = QualityClassifier.Config()

  private def corpus = {
    import s.implicits._
    // positives: stopword-rich English-like text; negatives: word salad
    val pos = (0 until 40).map(i =>
      (i.toLong, s"the quick fox $i jumped over the lazy dog and ran " +
        "to the river bank of a green valley"))
    val neg = (40 until 80).map(i =>
      (i.toLong, s"zzq$i blorp klax wibble frotz grue zork plugh " +
        s"xyzzy$i quux"))
    (pos ++ neg :+ (99L, "")).toDF("doc_id", "text")
  }

  test("training is bit-deterministic under repartitioning (integer " +
    "folds have no partial-order nondeterminism)") {
    val w1 = QualityClassifier.train(
      QualityClassifier.featurize(corpus.repartition(1), "doc_id",
        "text", cfg), cfg)
    val w7 = QualityClassifier.train(
      QualityClassifier.featurize(corpus.repartition(7), "doc_id",
        "text", cfg), cfg)
    assert(w1.toSeq == w7.toSeq)
    assert(w1.length == cfg.nFeatures + 1)
    assert(w1.exists(_ != 0L), "training moved no weight at all")
  }

  test("the trained separator beats the base rate on its own corpus " +
    "and keeps neither everything nor nothing") {
    val feats = QualityClassifier
      .featurize(corpus, "doc_id", "text", cfg).cache()
    val w = QualityClassifier.train(feats, cfg)
    val scored = QualityClassifier.score(feats, w)
      .select("doc", "y", "kept").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    feats.unpersist(blocking = false)
    val n = scored.length
    val kept = scored.count(_._3)
    assert(kept > 0 && kept < n, s"degenerate keep set: $kept/$n")
    val acc = scored.count { case (_, y, k) => (y == 1L) == k }.toDouble / n
    assert(acc >= 0.9,
      s"clean synthetic classes must separate almost fully, got $acc")
  }

  test("featurize keeps empty docs (all-zero presence + bias) and " +
    "emits binary features only") {
    val feats = QualityClassifier.featurize(corpus, "doc_id", "text", cfg)
    val empty = feats.filter(col("doc") === 99L)
      .select("y", "x").collect()
    assert(empty.length == 1)
    val x = empty(0).getSeq[Long](1)
    assert(empty(0).getLong(0) == 0L)
    assert(x.length == cfg.nFeatures + 1)
    assert(x.init.forall(_ == 0L) && x.last == 1L)
    val all = feats.select(explode(col("x")).as("v"))
      .agg(min("v"), max("v")).head()
    assert(all.getLong(0) == 0L && all.getLong(1) == 1L)
  }

  test("featurize's aggregates stay whole-stage-compiled at the " +
    "registered config (codegen.maxFields cliff guard)") {
    // The F+2-field aggregate falls out of whole-stage codegen past
    // spark.sql.codegen.maxFields (default 100) — a silent 10-20x
    // interpreted cliff invisible at toy SF (see featurize's scaladoc).
    // Pin: at the REGISTERED config every HashAggregate in the static
    // plan renders inside a WholeStageCodegen span (the `*(n)` prefix).
    val prev = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = QualityClassifier
        .featurize(corpus, "doc_id", "text", cfg)
        .queryExecution.executedPlan.toString
      val aggLines = plan.linesIterator
        .filter(_.contains("HashAggregate")).toSeq
      assert(aggLines.nonEmpty, plan.take(800))
      val bare = aggLines.filterNot(_.trim
        .dropWhile(c => c == '+' || c == '-' || c == ' ' || c == ':')
        .startsWith("*("))
      assert(bare.isEmpty,
        s"HashAggregate fell out of whole-stage codegen (maxFields " +
          s"cliff? F=${cfg.nFeatures}):\n${bare.mkString("\n")}")
    } finally s.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
