package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class UrlsSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def canon(urls: (Long, String)*): Map[Long, (String, String)] = {
    import s.implicits._
    Urls.canonicalize(urls.toDF("id", "u"), "u")
      .select("id", "url_canonical", "url_domain").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
  }

  test("canonicalize: case, default ports, fragments, tracking params; " +
    "path case and param order preserved; non-default port kept") {
    val out = canon(
      1L -> "HTTP://Example.COM:80/Path/Pg?utm_source=a&id=7&utm_medium=b#f",
      2L -> "https://API.Site.org:443/v1?z=1&a=2",
      3L -> "https://host.net:8443/x",
      4L -> "http://host.com/a?gclid=1&fbclid=2&msclkid=3",
      5L -> "http://host.com")
    assert(out(1L) == (("http://example.com/Path/Pg?id=7", "example.com")))
    // param order NOT reordered (z before a stays)
    assert(out(2L) == (("https://api.site.org/v1?z=1&a=2", "site.org")))
    // non-default port is part of the resource identity
    assert(out(3L) == (("https://host.net:8443/x", "host.net")))
    // all-tracking query drops the '?' entirely
    assert(out(4L) == (("http://host.com/a", "host.com")))
    // empty path normalizes to '/'
    assert(out(5L) == (("http://host.com/", "host.com")))
  }

  test("registrable domain: two labels, deep subdomains, co.uk-style " +
    "second levels, single-label hosts; malformed URLs yield nulls") {
    import s.implicits._
    val out = canon(
      1L -> "https://a.b.c.example.com/x",
      2L -> "https://www.site.co.uk/x",
      3L -> "https://localhost/x",
      4L -> "https://deep.ac.gov.uk/x")
    assert(out(1L)._2 == "example.com")
    assert(out(2L)._2 == "site.co.uk")
    assert(out(3L)._2 == "localhost")
    // gov.uk is a suffix, so the registrable unit is ac.gov.uk
    assert(out(4L)._2 == "ac.gov.uk")
    val bad = Urls.canonicalize(
      Seq((9L, "no-scheme/path"), (10L, "http:///missing-host"))
        .toDF("id", "u"), "u")
      .select("url_canonical", "url_domain").collect()
    assert(bad.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("filterBlockedDomains drops blocklisted and malformed rows via " +
    "a broadcast anti-join, keeps the rest") {
    import s.implicits._
    val docs = Seq(
      (1L, "https://good.org/a"),
      (2L, "https://tracker.spam.com/b"),
      (3L, "https://sub.spam.com/c"),
      (4L, "malformed"),
      (5L, "https://fine.net/d")).toDF("id", "u")
    val block = Seq("spam.com").toDF("domain")
    val kept = Urls.filterBlockedDomains(docs, "u", block)
    assert(kept.select("id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 5L))
    val plan = kept.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") &&
      plan.contains("LeftAnti"), plan.take(600))
  }
}
