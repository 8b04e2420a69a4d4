package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class HtmlSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def run(html: String): (String, Double) = {
    import s.implicits._
    val r = Seq(Tuple1(html)).toDF("h")
      .select(Html.cleanText("h").as("c"),
        Html.linkDensity("h").as("d")).head()
    (r.getString(0), r.getDouble(1))
  }

  test("script/style content is removed WHOLE — including tag-looking " +
    "strings inside code — before any tag stripping") {
    val (c, _) = run(
      """<head><script>var a = "</p><p>fake words";</script>
        |<style>p:before { content: "<nope>" }</style></head>
        |<body><p>real text</p></body>""".stripMargin)
    assert(c == "real text", s"got '$c'")
  }

  test("tags become spaces (no word fusing), entities decode, " +
    "whitespace collapses") {
    val (c, _) = run("<p>alpha</p><p>beta</p>  a &amp; b &lt;tag&gt; " +
      "x&nbsp;y &quot;q&quot; it&#39;s")
    assert(c == "alpha beta a & b <tag> x y \"q\" it's", s"got '$c'")
  }

  test("link density counts <a> text (not <abbr>), against the whole " +
    "cleaned text; scripts' fake anchors don't count") {
    val nav = "<div><a href='/'>home</a> <a>about</a> <a>contact</a>" +
      "</div><p>hi</p>"
    val (cNav, dNav) = run(nav)
    assert(cNav == "home about contact hi")
    // 16 link chars ("home"+"about"+"contact" = 4+5+7) of the 21
    // cleaned chars
    assert(math.abs(dNav - 16.0 / cNav.length) < 1e-12, s"got $dNav")
    val (_, dAbbr) = run("<p><abbr>HTML</abbr> is markup</p>")
    assert(dAbbr == 0.0, "<abbr> must not count as a link")
    val (_, dFake) = run(
      "<script>var s = '<a>fake</a>';</script><p>words here</p>")
    assert(dFake == 0.0, "script anchors are code, not links")
    assert(run("")._2 == 0.0, "empty html defines density 0")
  }

  test("multiline and attribute-heavy anchors still extract") {
    val (c, d) = run(
      "<p>start</p><a class='x'\n   href='/y'>two\nwords</a><p>end</p>")
    assert(c == "start two words end")
    assert(math.abs(d - 9.0 / c.length) < 1e-12, s"got $d")
  }

  test("extractHrefs: all double-quoted hrefs in order, empty value " +
    "kept, single-quoted NOT matched (documented limitation), no-link " +
    "doc yields an empty array") {
    import s.implicits._
    def hrefs(html: String): Seq[String] =
      Seq(html).toDF("h")
        .select(Html.extractHrefs("h").as("u"))
        .head().getSeq[String](0)
    assert(hrefs("""<a href="/a">x</a><link href="s.css">""" +
      """<a id="z" href="">y</a>""") == Seq("/a", "s.css", ""))
    assert(hrefs("<a href='/single'>x</a>") == Seq.empty)
    assert(hrefs("<p>no links</p>") == Seq.empty)
  }
}
