package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** End-to-end assertions for the composed curation pipeline (l71).
  * The DuckDB oracle pins exact values; this spec pins the STRUCTURAL
  * funnel invariants that make the composition meaningful — every
  * planted fixture class must actually exercise its stage.
  */
class CurationPipelineSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** The l71-shaped raw fixture, shared by the in-memory and
    * checkpointed-form arms. */
  private lazy val rawFixture: org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, sf).select("doc_id", "source", "text")
    val d0 = docs.select(col("doc_id"), col("source"),
      concat(col("text"),
        expr("""CASE CAST(doc_id % 4 AS INT)
           WHEN 0 THEN ' cafÃ© rÃ©sumÃ© dÃ©cor'
           WHEN 1 THEN ' â€œquoteâ€™â€¦â€'
           ELSE '' END"""),
        lit(" nai\u0308ve cafe\u0301"),
        when(pmod(col("doc_id"), lit(3L)) === 0L,
          lit("\u200Bzw\u0001ctl")).otherwise(lit("")),
        // the synthetic vocab has no English stopwords: without this
        // arm Gopher rule 7 zeroes the corpus (same arm as the l71
        // fixture; even ids keep the %6/%9 dup plants alive)
        when(pmod(col("doc_id"), lit(2L)) === 0L,
          lit(" of and that have with")).otherwise(lit(""))).as("t"))
    val ing0 = d0
      .unionByName(d0.filter(pmod(col("doc_id"), lit(6L)) === 0L)
        .select((col("doc_id") + lit(1000000L)).as("doc_id"),
          col("source"), col("t")))
      .unionByName(d0.filter(pmod(col("doc_id"), lit(9L)) === 0L)
        .select((col("doc_id") + lit(2000000L)).as("doc_id"),
          col("source"),
          concat(col("t"), lit(" tail nine extra marker")).as("t")))
    ing0.select(col("doc_id"), col("source"),
      concat(lit("<html><head><script>var x = 1;</script></head><body><p>"),
        col("t"),
        lit("""</p><div><a href="/h">home nav</a></div></body></html>"""))
        .as("html"),
      concat(lit("https://site"), pmod(col("doc_id"), lit(5L)),
        when(pmod(col("doc_id"), lit(5L)) === 2L,
          lit(".spam-domain.com/x")).otherwise(lit(".example.org/x")))
        .as("u"))
  }

  private val relineFixture: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column =
    c => concat(lit("nav home menu\n"),
      regexp_replace(c, " (the|a) ", "\n"),
      lit("\ncopyright footer 2024"))

  private def collectFunnel(df: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, Long, Long)] =
    df.collect().map(r => r.getString(1) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap

  private lazy val funnel: Map[String, (Long, Long, Long)] =
    collectFunnel(CurationPipeline.run(rawFixture,
      "doc_id", "source", "html", "u",
      blockedDomains = Seq("spam-domain.com"), lineMaxDf = 4L,
      gopherMinWords = 20, jaccN = 3, jaccThreshold = 0.2,
      jaccMaxDocFreq = 10, budgetPerSource = 400L, packBudget = 256L,
      trainPct = 80, valPct = 10, reline = relineFixture))

  test("funnel: every planted fixture class exercises its stage") {
    val f = funnel
    assert(f.size == 14, s"12 stages + 3 splits - 1 = 14 rows: ${f.keys}")
    def docs(k: String) = f(k)._1
    def toks(k: String) = f(k)._2
    def chars(k: String) = f(k)._3
    // blocklist drops the %5==2 arm, nothing else
    assert(docs("url_blocklist") < docs("ingest"))
    // extraction strips tags: tokens and chars both collapse
    assert(chars("html_extract") < chars("url_blocklist"))
    assert(docs("html_extract") == docs("url_blocklist"))
    // unicode clean: doc/token counts unchanged, chars strictly drop
    // (every doc recomposes the decomposed suffix; %3 docs lose dirt)
    assert(docs("unicode_clean") == docs("html_extract"))
    assert(toks("unicode_clean") == toks("html_extract"))
    assert(chars("unicode_clean") < chars("html_extract"))
    // mojibake repair: only char counts move (digraphs collapse)
    assert(docs("mojibake_repair") == docs("unicode_clean"))
    assert(chars("mojibake_repair") < chars("unicode_clean"))
    // line boilerplate: nav/footer (df = all docs) dies -> chars drop
    assert(docs("line_boilerplate") == docs("mojibake_repair"))
    assert(chars("line_boilerplate") < chars("mojibake_repair") +
      ("nav home menu".length + "copyright footer 2024".length + 2) *
        docs("mojibake_repair"))
    // gopher keeps a nonempty strict subset
    assert(docs("gopher_quality") > 0)
    // exact dedup kills the verbatim recrawl twins
    assert(docs("exact_dedup") < docs("gopher_quality"),
      "planted +1M twins must die at exact dedup")
    // splits partition the exact-dedup survivors
    assert(docs("split_train") + docs("split_val") + docs("split_test")
      == docs("exact_dedup"))
    assert(toks("split_train") + toks("split_val") + toks("split_test")
      == toks("exact_dedup"))
    // near dedup kills the planted +2M revisions
    assert(docs("near_dedup") < docs("exact_dedup"),
      "planted +2M near-dups must die at the keeper stage")
    // quota binds
    assert(docs("source_quota") < docs("near_dedup"))
    assert(toks("source_quota") <= toks("near_dedup"))
    // pack conserves tokens and chars, bins are fuller than docs
    assert(toks("pack") == toks("source_quota"))
    assert(chars("pack") == chars("source_quota"))
    assert(docs("pack") <= docs("source_quota"))
    assert(docs("pack") >= toks("source_quota") / 256L,
      "bin count below the token/budget floor")
  }

  test("leakage safety: planted near-dup pairs always land in the " +
    "same split (component-keyed LCG)") {
    // reconstruct the near-dup pair split assignment directly: the
    // pair (orig, orig + 2M) shares a component labeled min-id, so
    // both get the ORIGINAL's LCG bucket by construction; this pins
    // the key used by splitAssign in the pipeline
    val splitOf = TextAnalysis.splitAssign("component", 80, 10)
    val pairs = Seq((7L, 7L), (2000007L, 7L), (14L, 14L),
      (2000014L, 14L)).toDF("doc_id", "component")
    val got = pairs.withColumn("split", splitOf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(7L) == got(2000007L))
    assert(got(14L) == got(2000014L))
  }

  test("opt-in stages: sentence dedup (between boilerplate and gopher) " +
    "and KN-surprisal gate (after gopher) insert with shifted " +
    "numbering; default funnel rows are unchanged upstream") {
    val f = collectFunnel(CurationPipeline.run(rawFixture,
      "doc_id", "source", "html", "u",
      blockedDomains = Seq("spam-domain.com"), lineMaxDf = 4L,
      gopherMinWords = 20, jaccN = 3, jaccThreshold = 0.2,
      jaccMaxDocFreq = 10, budgetPerSource = 400L, packBudget = 256L,
      trainPct = 80, valPct = 10, reline = relineFixture,
      sentenceSplitter = Some(c =>
        filter(split(c, "\n"), x => length(x) > lit(0))),
      knKeepBelowBits = Some(14.0)))
    assert(f.contains("sentence_dedup") && f.contains("kn_surprisal"),
      s"opt-in stages missing: ${f.keys}")
    assert(f.size == 16, s"14 default rows + 2 opt-in: ${f.keys}")
    // stages UPSTREAM of the first opt-in arm are untouched
    Seq("ingest", "url_blocklist", "html_extract", "unicode_clean",
      "mojibake_repair", "line_boilerplate")
      .foreach(k => assert(f(k) == funnel(k), s"$k changed"))
    // sentence dedup: the planted +2M near-dup docs share most
    // sentences with their originals — content must strictly shrink,
    // and no doc may GAIN content
    assert(f("sentence_dedup")._3 < f("line_boilerplate")._3)
    assert(f("sentence_dedup")._1 <= f("line_boilerplate")._1)
    // the KN gate filters docs only (content of survivors untouched):
    // doc count within (0, gopher]; chars drop proportionally
    assert(f("kn_surprisal")._1 > 0)
    assert(f("kn_surprisal")._1 <= f("gopher_quality")._1)
    // the downstream chain still holds its invariants on the gated set
    assert(f("split_train")._1 + f("split_val")._1 + f("split_test")._1
      == f("exact_dedup")._1)
    assert(f("pack")._2 == f("source_quota")._2)
    assert(f("pack")._3 == f("source_quota")._3)
  }

  test("opt-in stages: checkpointed form matches the in-memory form " +
    "with both arms on", graft.SlowProof) {
    val dir = java.nio.file.Files.createTempDirectory("curation-ck-opt")
    val splitter: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column =
      c => filter(split(c, "\n"), x => length(x) > lit(0))
    val mem = collectFunnel(CurationPipeline.run(rawFixture,
      "doc_id", "source", "html", "u",
      blockedDomains = Seq("spam-domain.com"), lineMaxDf = 4L,
      gopherMinWords = 20, jaccN = 3, jaccThreshold = 0.2,
      jaccMaxDocFreq = 10, budgetPerSource = 400L, packBudget = 256L,
      trainPct = 80, valPct = 10, reline = relineFixture,
      sentenceSplitter = Some(splitter), knKeepBelowBits = Some(14.0)))
    val ck = collectFunnel(CurationPipeline.runCheckpointed(rawFixture,
      "doc_id", "source", "html", "u",
      blockedDomains = Seq("spam-domain.com"), lineMaxDf = 4L,
      gopherMinWords = 20, jaccN = 3, jaccThreshold = 0.2,
      jaccMaxDocFreq = 10, budgetPerSource = 400L, packBudget = 256L,
      trainPct = 80, valPct = 10, stageDir = dir.toString,
      reline = relineFixture,
      sentenceSplitter = Some(splitter), knKeepBelowBits = Some(14.0)))
    assert(ck == mem)
  }

  private def runCk(stageDir: java.nio.file.Path)
      : Map[String, (Long, Long, Long)] =
    collectFunnel(CurationPipeline.runCheckpointed(rawFixture,
      "doc_id", "source", "html", "u",
      blockedDomains = Seq("spam-domain.com"), lineMaxDf = 4L,
      gopherMinWords = 20, jaccN = 3, jaccThreshold = 0.2,
      jaccMaxDocFreq = 10, budgetPerSource = 400L, packBudget = 256L,
      trainPct = 80, valPct = 10, stageDir = stageDir.toString,
      reline = relineFixture))

  test("checkpointed form: funnel equals the in-memory form exactly; " +
    "every stage materialized as a parquet table with _SUCCESS") {
    val dir = java.nio.file.Files.createTempDirectory("curation-ck")
    assert(runCk(dir) == funnel)
    (1 to 12).foreach { k =>
      assert(java.nio.file.Files.exists(dir.resolve(s"s$k/_SUCCESS")),
        s"stage $k data table missing")
      assert(java.nio.file.Files.exists(
        dir.resolve(s"funnel_s$k/_SUCCESS")),
        s"stage $k funnel table missing")
    }
  }

  test("checkpointed form: a stageDir built by a DIFFERENT chain is " +
    "refused, not silently served back") {
    val dir = java.nio.file.Files.createTempDirectory("curation-ck-fp")
    runCk(dir)
    val e = intercept[IllegalArgumentException] {
      CurationPipeline.runCheckpointed(rawFixture,
        "doc_id", "source", "html", "u",
        blockedDomains = Seq("spam-domain.com"), lineMaxDf = 4L,
        gopherMinWords = 20, jaccN = 3, jaccThreshold = 0.2,
        jaccMaxDocFreq = 10, budgetPerSource = 999L, // changed
        packBudget = 256L, trainPct = 80, valPct = 10,
        stageDir = dir.toString, reline = relineFixture)
    }
    assert(e.getMessage.contains("DIFFERENT chain"))
  }

  test("checkpointed form: restart after a mid-stage kill recomputes " +
    "only from the killed stage; completed prefixes are read, not " +
    "re-derived", graft.SlowProof) {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("curation-ck")
    val first = runCk(dir)
    // simulate a kill during stage 7's write: its commit marker is
    // gone (Spark writes _SUCCESS last, so a torn write looks exactly
    // like this); stages 1-6 remain complete
    java.nio.file.Files.delete(dir.resolve("s7/_SUCCESS"))
    def mtimes(upTo: Int): Map[String, Long] =
      (1 to upTo).flatMap { k =>
        java.nio.file.Files.list(dir.resolve(s"s$k")).iterator().asScala
          .map(p => s"s$k/${p.getFileName}" ->
            java.nio.file.Files.getLastModifiedTime(p).toMillis)
      }.toMap
    val before = mtimes(6)
    val s7Before = java.nio.file.Files
      .getLastModifiedTime(dir.resolve("s7")).toMillis
    val second = runCk(dir)
    assert(second == first, "restart changed the funnel")
    assert(mtimes(6) == before,
      "a completed prefix stage was rewritten on restart")
    assert(java.nio.file.Files
      .getLastModifiedTime(dir.resolve("s7")).toMillis >= s7Before)
    assert(java.nio.file.Files.exists(dir.resolve("s7/_SUCCESS")),
      "killed stage must be recomputed to completion")
  }
}
