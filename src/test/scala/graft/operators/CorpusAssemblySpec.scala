package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CorpusAssemblySpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("prefixSum == the global single-partition window on random data, " +
    "regardless of input partitioning") {
    import s.implicits._
    val rnd = new scala.util.Random(42)
    // negative values included: partition offsets must be true partition
    // sums, not running-sum maxima (which only coincide when values >= 0)
    val rows = (1L to 5000L).map(i => (i, rnd.nextInt(100).toLong - 30L))
    for (parts <- Seq(1, 7, 32)) {
      val df = rows.toDF("id", "v").repartition(parts)
      val got = CorpusAssembly.prefixSum(df, "id", "v", "cum")
        .select("id", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = rows.toDF("id", "v")
        .withColumn("cum", sum("v").over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, 0)))
        .select("id", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want, s"parts=$parts")
    }
  }

  test("prefixSum's only partition-less window runs over the bounded " +
    "per-partition totals table, not the data") {
    import s.implicits._
    val df = (1L to 1000L).map(i => (i, 1L)).toDF("id", "v")
    val plan = CorpusAssembly.prefixSum(df, "id", "v", "cum")
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    val (global, parted) = windows.partition(_.partitionSpec.isEmpty)
    assert(parted.nonEmpty, "per-partition running sum must be windowed")
    // every partition-less window must consume an Aggregate (the
    // per-partition totals), never the raw data relation
    global.foreach { w =>
      val feedsFromAgg = w.child.collectFirst {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }.isDefined
      assert(feedsFromAgg,
        s"global window must sit on the totals aggregate, got:\n$w")
    }
  }

  test("sequencePack: bins, straddlers, and zero-token docs on a " +
    "handcrafted corpus") {
    import s.implicits._
    // budget 10; docs in id order with token counts 4, 4, 4, 0, 8
    val docs = Seq(
      (1L, "a b c d"),          // cum 4,  bin 0
      (2L, "e f g h"),          // cum 8,  bin 0
      (3L, "i j k l"),          // cum 12, bin 0, straddles into bin 1
      (4L, "   "),              // 0 tokens: bin of cum 12 div 10 = 1
      (5L, "m n o p q r s t")   // cum 20, bin 1, last token exactly at
                                // position 20 -> (20-1) div 10 = 1: stays
    ).toDF("doc_id", "text")
    val got = CorpusAssembly.sequencePack(docs, "doc_id", "text", 10L)
      .select("doc_id", "n_tokens", "cum_tokens", "bin", "straddles_next")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    assert(got == Set(
      (1L, 4L, 4L, 0L, false),
      (2L, 4L, 8L, 0L, false),
      (3L, 4L, 12L, 0L, true),
      (4L, 0L, 12L, 1L, false),
      (5L, 8L, 20L, 1L, false)))
  }

  test("qualityQuotaSelect keeps the quality-ranked prefix under the " +
    "budget, per source, with doc_id tiebreak") {
    import s.implicits._
    // src A: qualities 4, 3, 2 with 4/3/2 tokens; budget 7 keeps the
    // first two (cum 4, 7) and drops the third (cum 9).
    // src B: tie on quality=2 -> doc 11 ranks before doc 12.
    val docs = Seq(
      (10L, "A", "w x y z"),     // q=4 n=4
      (11L, "A", "p q r"),       // q=3 n=3
      (12L, "A", "m n"),         // q=2 n=2
      (20L, "B", "a b"),         // q=2 n=2
      (21L, "B", "c d")          // q=2 n=2
    ).toDF("doc_id", "source", "text")
    val got = CorpusAssembly.qualityQuotaSelect(docs, "source", "doc_id",
        "text", budgetPerSource = 7L)
      .select("doc_id", "rank", "cum_tokens", "kept")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSet
    assert(got == Set(
      (10L, 1L, 4L, true),
      (11L, 2L, 7L, true),
      (12L, 3L, 9L, false),
      (20L, 1L, 2L, true),
      (21L, 2L, 4L, true)))
  }

  test("sequencePack conserves tokens: bin totals sum to the corpus " +
    "total and every bin except the last is full up to straddle") {
    import s.implicits._
    val docs = graft.core.Tables.documents(s, "/root/testdata/sf0.001")
    val packed = CorpusAssembly.sequencePack(docs, "doc_id", "text", 512L)
    val corpusTotal = docs
      .select(sum(TextAnalysis.tokenCount("text"))).collect()(0).getLong(0)
    val binTotal = packed.select(sum("n_tokens")).collect()(0).getLong(0)
    assert(binTotal == corpusTotal)
    // bin of the LAST cum position == max bin: no empty trailing bins
    val maxCum = packed.select(max("cum_tokens")).collect()(0).getLong(0)
    val maxBin = packed.select(max("bin")).collect()(0).getLong(0)
    assert(maxBin <= (maxCum - 1) / 512L)
  }
}
