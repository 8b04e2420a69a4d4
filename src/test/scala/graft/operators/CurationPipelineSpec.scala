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

  private lazy val funnel: Map[String, (Long, Long, Long)] = {
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
    val raw = ing0.select(col("doc_id"), col("source"),
      concat(lit("<html><head><script>var x = 1;</script></head><body><p>"),
        col("t"),
        lit("""</p><div><a href="/h">home nav</a></div></body></html>"""))
        .as("html"),
      concat(lit("https://site"), pmod(col("doc_id"), lit(5L)),
        when(pmod(col("doc_id"), lit(5L)) === 2L,
          lit(".spam-domain.com/x")).otherwise(lit(".example.org/x")))
        .as("u"))
    CurationPipeline.run(raw, "doc_id", "source", "html", "u",
      blockedDomains = Seq("spam-domain.com"), lineMaxDf = 4L,
      gopherMinWords = 20, jaccN = 3, jaccThreshold = 0.2,
      jaccMaxDocFreq = 10, budgetPerSource = 400L, packBudget = 256L,
      trainPct = 80, valPct = 10,
      reline = c => concat(lit("nav home menu\n"),
        regexp_replace(c, " (the|a) ", "\n"),
        lit("\ncopyright footer 2024")))
      .collect()
      .map(r => r.getString(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
  }

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
}
