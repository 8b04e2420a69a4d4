package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** WARC container ingest: record framing, HTTP message split, and every
  * corrupt-degrade arm (the AviDemux discipline — corruption quarantines,
  * never throws, and offsets cannot stall).
  */
class WarcSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark
  import s.implicits._

  private def rec(headers: Seq[(String, String)], block: String,
                  magic: String = "WARC/1.0"): String = {
    val h = (Seq(magic) ++ headers.map { case (k, v) => s"$k: $v" })
      .mkString("\r\n")
    h + "\r\n\r\n" + block + "\r\n\r\n"
  }

  private def httpBlock(status: String, mime: String,
                        body: String): String =
    s"HTTP/1.1 $status\r\nContent-Type: $mime\r\n\r\n$body"

  private def parse(payloads: Seq[(Long, String)]) =
    Warc.records(payloads.toDF("doc_id", "w")
      .select(col("doc_id"), col("w").cast("binary").as("w")),
      "doc_id", "w")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)).orNull, Option(r.getString(3)).orNull,
        if (r.isNullAt(6)) -1L else r.getLong(6),
        Option(r.getString(7)).orNull, Option(r.getString(8)).orNull,
        Option(r.getString(9)).orNull))

  test("multi-record file: response + metadata both parsed, HTTP " +
    "message split, record indexes ordered") {
    val body = "<html><body><p>hello world</p></body></html>"
    val http = httpBlock("200 OK", "text/html", body)
    val meta = "fetchTimeMs: 12\r\n"
    val w =
      rec(Seq("WARC-Type" -> "response",
        "WARC-Target-URI" -> "http://a.example.org/x",
        "Content-Type" -> "application/http;msgtype=response",
        "Content-Length" -> http.length.toString), http) +
      rec(Seq("WARC-Type" -> "metadata",
        "WARC-Target-URI" -> "http://a.example.org/x",
        "Content-Type" -> "application/warc-fields",
        "Content-Length" -> meta.length.toString), meta)
    val got = parse(Seq((1L, w))).sortBy(_._2)
    assert(got.length == 2)
    val (_, i0, t0, u0, st0, mime0, body0, err0) = got(0)
    assert(i0 == 0L && t0 == "response" &&
      u0 == "http://a.example.org/x" && st0 == 200L &&
      mime0 == "text/html" && body0 == body && err0 == null)
    val (_, i1, t1, _, st1, _, body1, err1) = got(1)
    assert(i1 == 1L && t1 == "metadata" && st1 == -1L &&
      body1 == null && err1 == null)
  }

  test("header names are case-insensitive; non-2xx status is parsed " +
    "and filterable; responseTexts extracts page text") {
    val body = "<html><body><p>gone</p></body></html>"
    val http = httpBlock("404 Not Found", "text/html", body)
    val w = rec(Seq("warc-type" -> "response",
      "warc-target-uri" -> "http://b.example.org/y",
      "content-type" -> "application/http",
      "content-length" -> http.length.toString), http)
    val df = Seq((5L, w)).toDF("doc_id", "w")
      .select(col("doc_id"), col("w").cast("binary").as("w"))
    val all = Warc.responseTexts(df, "doc_id", "w", okOnly = false)
      .collect()
    assert(all.length == 1 && all(0).getLong(3) == 404L &&
      all(0).getString(5) == "gone")
    assert(Warc.responseTexts(df, "doc_id", "w").count() == 0L,
      "okOnly must drop the 404")
  }

  test("corrupt-degrade arms: bad magic, truncated header, bad and " +
    "truncated lengths, oversize u32-style length — all quarantine, " +
    "prior records survive") {
    val good = rec(Seq("WARC-Type" -> "metadata",
      "Content-Type" -> "application/warc-fields",
      "Content-Length" -> "2"), "ab")
    val arms = Seq(
      10L -> (good + rec(Seq("Content-Length" -> "1"), "x",
        magic = "WARX/1.0")) -> "bad-magic",
      11L -> (good + "WARC/1.0\r\nWARC-Type: response") ->
        "truncated-header",
      12L -> (good + rec(Seq("WARC-Type" -> "metadata",
        "Content-Length" -> "notanumber"), "x")) -> "bad-length",
      13L -> (good + rec(Seq("WARC-Type" -> "metadata",
        "Content-Length" -> "999999"), "x")) -> "truncated-block",
      14L -> (good + rec(Seq("WARC-Type" -> "metadata",
        "Content-Length" -> "4294967290"), "x")) -> "truncated-block")
    val rows = parse(arms.map { case ((id, w), _) => (id, w) })
    for (((id, _), want) <- arms) {
      val mine = rows.filter(_._1 == id).sortBy(_._2)
      assert(mine.length == 2, s"doc $id: good record must survive")
      assert(mine(0)._8 == null && mine(0)._3 == "metadata")
      assert(mine(1)._8 == want,
        s"doc $id: expected $want, got ${mine(1)._8}")
    }
    val q = Warc.quarantine(arms.map { case ((id, w), _) => (id, w) }
      .toDF("doc_id", "w")
      .select(col("doc_id"), col("w").cast("binary").as("w")),
      "doc_id", "w").collect()
    assert(q.length == arms.length)
    assert(q.forall(_.getLong(1) == 1L),
      "exactly one good record before each corrupt tail")
  }

  test("gzip payloads: single member, concatenated per-record members " +
    "(the WARC.gz layout), corrupt stream quarantines as bad-gzip") {
    def gz(s: String): Array[Byte] = {
      val bo = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bo)
      g.write(s.getBytes("UTF-8")); g.close()
      bo.toByteArray
    }
    val http = httpBlock("200 OK", "text/html", "<p>gzipped</p>")
    val recA = rec(Seq("WARC-Type" -> "response",
      "Content-Type" -> "application/http",
      "Content-Length" -> http.length.toString), http)
    val recB = rec(Seq("WARC-Type" -> "metadata",
      "Content-Type" -> "application/warc-fields",
      "Content-Length" -> "2"), "ab")
    val single = gz(recA + recB)
    val multi = gz(recA) ++ gz(recB) // one member per record
    val corrupt = {
      val c = gz(recA); c(c.length / 2) = (c(c.length / 2) ^ 0x55).toByte
      c
    }
    val df = Seq((30L, single), (31L, multi), (32L, corrupt))
      .toDF("doc_id", "w")
    val got = Warc.records(df, "doc_id", "w").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.getString(2)).orNull, Option(r.getString(9)).orNull))
    for (id <- Seq(30L, 31L)) {
      val mine = got.filter(_._1 == id).sortBy(_._2)
      assert(mine.length == 2 && mine.forall(_._4 == null),
        s"doc $id: both gzip layouts must parse clean: ${mine.toSeq}")
      assert(mine(0)._3 == "response" && mine(1)._3 == "metadata")
    }
    val bad = got.filter(_._1 == 32L)
    assert(bad.length == 1 && bad(0)._4 == "bad-gzip", bad.toSeq)
  }

  test("empty payload and separator-only payload parse to zero " +
    "records; missing trailing separator tolerated") {
    val got = parse(Seq((20L, ""), (21L, "\r\n\r\n")))
    assert(got.isEmpty)
    // record without its trailing \r\n\r\n (EOF right after block)
    val http = httpBlock("200 OK", "text/html", "<p>z</p>")
    val noSep = rec(Seq("WARC-Type" -> "response",
      "Content-Type" -> "application/http",
      "Content-Length" -> http.length.toString), http)
      .stripSuffix("\r\n\r\n")
    val one = parse(Seq((22L, noSep)))
    assert(one.length == 1 && one(0)._8 == null && one(0)._7 == "<p>z</p>")
  }
}
