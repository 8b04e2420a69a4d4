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

  test("sequencePackSharded: bit-equal to the global form on a " +
    "multi-shard layout (shard boundaries never on bin boundaries)") {
    import s.implicits._
    // 200 docs, varied lengths; shard = doc_id div 23 (9 shards whose
    // token boundaries land mid-bin for budget 64); shard order ==
    // id order, so the global pack over doc_id is the reference
    val docs = (0L until 200L).map { i =>
      (i, ("w" + i + " ") * (1 + (i * 13 % 17)).toInt)
    }.toDF("doc_id", "text")
    val global = CorpusAssembly.sequencePack(docs, "doc_id", "text", 64L)
      .select("doc_id", "n_tokens", "cum_tokens", "bin", "straddles_next")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    val sharded = CorpusAssembly.sequencePackSharded(
        docs.withColumn("shard", expr("doc_id div 23")),
        "shard", "doc_id", "text", 64L)
      .select("doc_id", "n_tokens", "cum_tokens", "bin", "straddles_next")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSet
    assert(sharded == global)
  }

  test("sequencePackSharded: incremental append — a NEW shard packed " +
    "alone with baseOffset lands exactly where a full repack would " +
    "put it; prior shards untouched") {
    import s.implicits._
    val docs = (0L until 150L).map { i =>
      (i, ("t" + i + " ") * (1 + (i * 7 % 11)).toInt)
    }.toDF("doc_id", "text")
      .withColumn("shard", expr("doc_id div 50"))
    val full = CorpusAssembly.sequencePackSharded(docs, "shard",
        "doc_id", "text", 32L)
      .select("doc_id", "cum_tokens", "bin", "straddles_next")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // pack ONLY shard 2, passing the token total of shards 0-1
    val prefixTokens = docs.filter(col("shard") < 2)
      .agg(sum(graft.operators.TextAnalysis.tokenCount("text")))
      .collect()(0).getLong(0)
    val appended = CorpusAssembly.sequencePackSharded(
        docs.filter(col("shard") === 2), "shard", "doc_id", "text", 32L,
        baseOffset = prefixTokens)
      .select("doc_id", "cum_tokens", "bin", "straddles_next")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(appended.nonEmpty)
    appended.foreach { case (id, cum, bin, st) =>
      assert(full(id) == ((cum, bin, st)),
        s"doc $id diverged from the full repack")
    }
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

  test("quotaHistogram kept flags == quotaExact on a random corpus " +
    "across all-drop / edge / all-keep budgets") {
    import s.implicits._
    val rnd = new scala.util.Random(7)
    val words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta")
    // 8-word vocab so qualities collide heavily (ties exercise the
    // in-bucket id ordering); ~8% blank docs; one dominating source
    val docs = (1L to 400L).map { i =>
      val src = if (i % 5 < 3) "big" else if (i % 5 == 3) "mid" else "small"
      val n = rnd.nextInt(12)
      val text = if (n == 0) "  "
        else Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" ")
      (i, src, text)
    }.toDF("doc_id", "source", "text")
    val scored = CorpusAssembly.scoreDocs(docs, "source", "doc_id", "text")
    for (budget <- Seq(0L, 40L, 1000000L)) {
      val exact = CorpusAssembly
        .quotaExact(scored, "source", "doc_id", budget)
        .select(col("doc_id"), col("kept").as("kept_e"))
      val hist = CorpusAssembly
        .quotaHistogram(scored, "source", "doc_id", budget)
        .select(col("doc_id"), col("kept").as("kept_h"))
      assert(hist.count() == 400L, s"budget=$budget")
      val diff = exact.join(hist, "doc_id")
        .filter(col("kept_e") =!= col("kept_h")).count()
      assert(diff == 0L, s"budget=$budget")
    }
  }

  test("quotaHistogram boundary cases: keep/edge/drop buckets and " +
    "zero-token docs at the exact budget line") {
    import s.implicits._
    // budget 8: bucket q4 (id 0, 4 tokens) -> keep class (0+4 <= 8);
    // bucket q3 (ids 1-2, 6 tokens) -> edge (4 <= 8 < 10): id 1 kept
    // (4+3 <= 8), id 2 dropped; bucket q0 (blank id 3) -> drop class
    // (cum_before 10 > 8)
    val docs = Seq(
      (0L, "A", "a b c d"),
      (1L, "A", "p q r"),
      (2L, "A", "s t u"),
      (3L, "A", "   ")
    ).toDF("doc_id", "source", "text")
    val scored = CorpusAssembly.scoreDocs(docs, "source", "doc_id", "text")
    val got = CorpusAssembly.quotaHistogram(scored, "source", "doc_id", 8L)
      .select("doc_id", "kept").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got == Map(0L -> true, 1L -> true, 2L -> false, 3L -> false))
    // zero-token doc EXACTLY at the budget line stays kept: cum_before
    // == budget and bucket_tokens == 0 must classify keep, not drop
    val boundary = Seq((1L, "B", "a b c d e"), (2L, "B", "   "))
      .toDF("doc_id", "source", "text")
    val got2 = CorpusAssembly.quotaHistogram(
        CorpusAssembly.scoreDocs(boundary, "source", "doc_id", "text"),
        "source", "doc_id", 5L)
      .select("doc_id", "kept").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got2 == Map(1L -> true, 2L -> true))
  }

  test("quotaHistogram plan: per-source windows sit on the bounded " +
    "histogram aggregate; doc-level windows partition by (source, " +
    "quality)") {
    import s.implicits._
    val docs = Seq((1L, "A", "a b"), (2L, "A", "c"), (3L, "B", "d e f"))
      .toDF("doc_id", "source", "text")
    val plan = CorpusAssembly.qualityQuotaSelectHistogram(docs, "source",
        "doc_id", "text", 3L).queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach { w =>
      assert(w.partitionSpec.nonEmpty, s"no global windows allowed:\n$w")
      if (w.partitionSpec.size == 1) {
        val onAgg = w.child.collectFirst {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }.isDefined
        assert(onAgg, s"source-only window must sit on the histogram:\n$w")
      } else assert(w.partitionSpec.size == 2,
        s"doc window must partition by (source, quality):\n$w")
    }
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

  test("temperature mixing: histogram kept flags == exact windowed form " +
    "on skewed group sizes (incl. one giant group), targets honor the " +
    "sqrt reweighting, and a tiny group can saturate") {
    import s.implicits._
    // group sizes 4000 / 400 / 40 / 4: sqrt weights 63.2 / 20 / 6.3 / 2
    val rows =
      (1L to 4000L).map(i => ("giant", i)) ++
      (1L to 400L).map(i => ("mid", 10000L + i)) ++
      (1L to 40L).map(i => ("small", 20000L + i)) ++
      (1L to 4L).map(i => ("tiny", 30000L + i))
    val df = rows.toDF("grp", "id").repartition(13)
    val total = 500L
    def kept(sel: org.apache.spark.sql.DataFrame): Map[Long, Boolean] =
      sel.collect().map(r => r.getLong(1) -> r.getBoolean(3)).toMap
    val exact = CorpusAssembly.temperatureMixSelect(df, "grp", "id", total)
    val hist = CorpusAssembly.temperatureMixSelectHistogram(df, "grp",
      "id", total, nBuckets = 16)
    assert(kept(exact) == kept(hist),
      "histogram form must make identical per-doc decisions")
    val targets = CorpusAssembly.temperatureMixTargets(df, "grp", total)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // sqrt reweighting: the giant group's KEEP RATE is far below the
    // tiny group's (proportional sampling would keep ~11% everywhere)
    val (gn, gt) = targets("giant")
    val (tn, tt) = targets("tiny")
    assert(gt.toDouble / gn < 0.1, s"giant keep rate ${gt.toDouble / gn}")
    assert(tt >= tn, "tiny group saturates: target >= its size")
    val keptByGrp = exact.filter(col("kept")).groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptByGrp("tiny") == tn, "saturated group keeps everything")
    targets.foreach { case (g, (n, t)) =>
      assert(keptByGrp(g) == math.min(n, t), s"group $g")
    }
  }

  test("FFD packing: equals a naive in-memory first-fit-decreasing " +
    "fold per group, conserves tokens, never splits a doc, never " +
    "overfills a bin (oversized docs get singleton bins), and is " +
    "invariant to partitioning") {
    import s.implicits._
    val B = 100L
    val docs = Seq(
      (1L, 60L), (2L, 60L), (3L, 45L), (4L, 40L), (5L, 30L), (6L, 25L),
      (7L, 130L), // longer than the budget: must sit alone
      (8L, 10L), (9L, 10L), (10L, 0L)) // zero-length doc still assigned
      .map { case (id, n) => (id, ("x " * n.toInt).trim) }
      .toDF("doc_id", "text")
    def packed(parts: Int) = CorpusAssembly
      .packFirstFitDecreasing(docs.repartition(parts), "doc_id", "text",
        budget = B, groupSize = 256)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val p1 = packed(1)
    assert(p1.toSeq == packed(5).toSeq, "layout changed the packing")
    assert(p1.map(_._1).toSeq == (1L to 10L), "every doc assigned once")
    // token conservation: bin loads sum to the corpus total
    assert(p1.map(_._2).sum == 60 + 60 + 45 + 40 + 30 + 25 + 130 + 20)
    // no bin over budget unless it is a singleton oversized doc
    val byBin = p1.groupBy(t => (t._3, t._4)).values
    byBin.foreach { bin =>
      val load = bin.map(_._2).sum
      assert(load <= B || (bin.length == 1 && bin.head._2 > B),
        s"overfull non-singleton bin: $bin")
    }
    // naive FFD over (n desc, id) — one group, so global == per-group
    val order = Seq((7L, 130L), (1L, 60L), (2L, 60L), (3L, 45L),
      (4L, 40L), (5L, 30L), (6L, 25L), (8L, 10L), (9L, 10L), (10L, 0L))
    val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
    val expect = order.map { case (id, n) =>
      val j = loads.indexWhere(_ + n <= B)
      if (j < 0) { loads += n; id -> loads.length.toLong }
      else { loads(j) += n; id -> (j + 1).toLong }
    }.toMap
    p1.foreach { case (id, _, grp, bin) =>
      assert(grp == 0L && bin == expect(id),
        s"doc $id: got bin $bin, naive FFD says ${expect(id)}")
    }
    // groups bound the fold: a small groupSize splits ranks 1-3 / 4-6...
    val grps = CorpusAssembly
      .packFirstFitDecreasing(docs, "doc_id", "text", budget = B,
        groupSize = 3)
      .select("grp").distinct().count()
    assert(grps == 4L)
  }

  test("mixing fails fast on a non-integral id column instead of " +
    "silently NULL-coercing it into the hash") {
    import s.implicits._
    val df = Seq(("web", "doc-1"), ("web", "doc-2")).toDF("grp", "id")
    val e = intercept[IllegalArgumentException] {
      CorpusAssembly.temperatureMixSelect(df, "grp", "id", 1L)
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    intercept[IllegalArgumentException] {
      CorpusAssembly.mixBucketHistogram(df, "grp", "id", 16)
    }
  }

  test("epochOrder: each epoch is a fresh exact permutation, equal to " +
    "the naive per-epoch window on any input layout, and seeds matter") {
    import s.implicits._
    val n = 500
    val ids = (0L until n.toLong).toDF("doc_id")
    def runAt(parts: Int, seed: Long) =
      CorpusAssembly.epochOrder(ids.repartition(parts), "doc_id",
          epochs = 3, seed = seed)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = runAt(7, seed = 7L)
    // permutation property per epoch
    for (e <- 1L to 3L) {
      val ep = got.filter(_._1 == e)
      assert(ep.map(_._2) == (1L to n.toLong).toSet, s"epoch $e ords")
      assert(ep.map(_._3) == (0L until n.toLong).toSet, s"epoch $e ids")
    }
    // layout invariance (the prefix-sum rank is value-deterministic)
    assert(runAt(1, 7L) == got && runAt(32, 7L) == got)
    // equals the naive global-window reference
    val naive = ids
      .select(col("doc_id"), explode(expr("sequence(1, 3)")).as("epoch"))
      .withColumn("epoch", col("epoch").cast("long"))
      .withColumn("hk", expr(CorpusAssembly.epochHashSql("doc_id", 7L)))
      .withColumn("ord", row_number().over(org.apache.spark.sql
        .expressions.Window.partitionBy("epoch")
        .orderBy("hk", "doc_id")).cast("long"))
      .select("epoch", "ord", "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == naive)
    // epochs genuinely reshuffle, and so does the seed
    def orderOf(set: Set[(Long, Long, Long)], e: Long) =
      set.filter(_._1 == e).toSeq.sortBy(_._2).map(_._3)
    assert(orderOf(got, 1L) != orderOf(got, 2L))
    assert(orderOf(got, 2L) != orderOf(got, 3L))
    assert(orderOf(runAt(7, 8L), 1L) != orderOf(got, 1L))
  }

  test("systematicWeightedSample: exactly k draws, per-doc multiplicity " +
    "within one of proportional, layout-independent, heavy docs draw " +
    "multiple times, zero weights never draw") {
    import s.implicits._
    val rnd = new scala.util.Random(17)
    val docs = ((0L until 200L).map(i => (i, 1L + rnd.nextInt(50).toLong))
      :+ (200L, 0L) :+ (201L, 5000L)) // a zero weight and a whale
      .toDF("doc_id", "wt")
    val k = 40L
    val out = CorpusAssembly.systematicWeightedSample(docs, "doc_id",
      "wt", k = k, seed = 3L)
    val rows = out.collect().map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("w"), r.getAs[Long]("n_draws")))
    val total = rows.map(_._2).sum
    val step = total / k
    assert(rows.map(_._3).sum == k, "systematic sampling must emit " +
      s"exactly k draws, got ${rows.map(_._3).sum}")
    assert(!rows.exists(_._1 == 200L), "zero-weight rows are excluded")
    // every doc's multiplicity is within 1 of w/step (the systematic
    // grid can't skip or double-count an interval by more)
    rows.foreach { case (id, w, d) =>
      assert(d >= w / step - 1 && d <= w / step + 1,
        s"doc $id w=$w drew $d times, step=$step")
    }
    assert(rows.find(_._1 == 201L).get._3 >= 2,
      "a doc heavier than step must draw with multiplicity")
    // layout independence: same assignment at any partitioning
    val re = CorpusAssembly.systematicWeightedSample(
        docs.repartition(13), "doc_id", "wt", k = k, seed = 3L)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("w"), r.getAs[Long]("n_draws"))).toSet
    assert(re == rows.toSet)
    // and the seed genuinely moves the sample
    val other = CorpusAssembly.systematicWeightedSample(docs, "doc_id",
        "wt", k = k, seed = 4L)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_draws"))).toSet
    assert(other != rows.map(r => (r._1, r._3)).toSet)
  }

  test("systematicWeightedSample: k > sum(weights) fails LOUDLY instead " +
    "of silently handing every draw to the hash-first row") {
    import s.implicits._
    val docs = Seq((1L, 3L), (2L, 4L)).toDF("doc_id", "wt") // total 7
    val ex = intercept[Exception] {
      CorpusAssembly.systematicWeightedSample(docs, "doc_id", "wt",
        k = 100L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("k <= sum(weights)")),
      s"expected the k-vs-total guard message, got: ${msgs(ex)}")
  }
}
