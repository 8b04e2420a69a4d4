package graft.sources

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{CRC32, Deflater, GZIPOutputStream}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** WARC container-FILE reader: real multi-member .warc.gz files split
  * at gzip-member offsets — split-boundary resync, split-layout
  * invariance, quarantine isolation per split, FNAME header skip, and
  * the uncompressed fallback.
  */
class WarcFilesSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  private def rec(headers: Seq[(String, String)], block: String,
                  magic: String = "WARC/1.0"): String = {
    val h = (Seq(magic) ++ headers.map { case (k, v) => s"$k: $v" })
      .mkString("\r\n")
    h + "\r\n\r\n" + block + "\r\n\r\n"
  }

  private def httpBlock(status: String, mime: String,
                        body: String): String =
    s"HTTP/1.1 $status\r\nContent-Type: $mime\r\n\r\n$body"

  /** One WARC response record, Content-Length in BYTES (body may be
    * non-ASCII). */
  private def responseRecord(i: Int, body: String): Array[Byte] = {
    val http = httpBlock("200 OK", "text/html", body)
    val httpBytes = http.getBytes("UTF-8")
    rec(Seq("WARC-Type" -> "response",
      "WARC-Target-URI" -> s"http://t.example.org/doc/$i",
      "Content-Type" -> "application/http;msgtype=response",
      "Content-Length" -> httpBytes.length.toString), http)
      .getBytes("UTF-8")
  }

  private def gzipMember(content: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bos)
    g.write(content); g.close()
    bos.toByteArray
  }

  /** A gzip member with the FNAME flag set (exercises the optional-
    * field skip in gzipHeaderEnd — GZIPOutputStream never writes one). */
  private def gzipMemberWithName(content: Array[Byte],
                                 name: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 8)) // FLG = FNAME
    out.write(Array[Byte](0, 0, 0, 0, 0, -1))       // mtime, xfl, os
    out.write(name.getBytes("US-ASCII")); out.write(0)
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(content); d.finish()
    val buf = new Array[Byte](64 * 1024)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val crc = new CRC32(); crc.update(content)
    def le32(v: Long): Array[Byte] = Array(v, v >> 8, v >> 16, v >> 24)
      .map(x => (x & 0xff).toByte)
    out.write(le32(crc.getValue))
    out.write(le32(content.length.toLong))
    out.toByteArray
  }

  /** docBody(i): deterministic per-record page text; record 7 carries
    * non-ASCII so byte-vs-character framing is pinned. */
  private def docBody(i: Int): String = {
    val filler = ("w" + i + " ") * (20 + (i * 37) % 400)
    val accent = if (i == 7) " café naïve 世界" else ""
    s"<html><body><p>doc $i $filler$accent</p></body></html>"
  }

  private def writeWarcGz(n: Int, dir: java.nio.file.Path,
                          name: String): java.nio.file.Path = {
    val f = dir.resolve(name)
    val out = new FileOutputStream(f.toFile)
    (0 until n).foreach { i =>
      out.write(gzipMember(responseRecord(i, docBody(i))))
    }
    out.close()
    f
  }

  test("multi-member .warc.gz across many small splits == single-split " +
    "read; every record parsed exactly once with correct URIs") {
    val dir = Files.createTempDirectory("warcfiles")
    writeWarcGz(40, dir, "a.warc.gz")
    val whole = WarcFiles.records(s, dir.toString + "/*.warc.gz",
      splitBytes = 1L << 30)
      .select("member_off", "target_uri", "http_status", "error")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), Option(r.getString(3)).orNull)).sortBy(_._1)
    assert(whole.length == 40 && whole.forall(_._4 == null))
    assert(whole.map(_._2).toSet ==
      (0 until 40).map(i => s"http://t.example.org/doc/$i").toSet)
    // tiny splits force boundaries INSIDE members → resync must find
    // each member exactly once, never twice, never zero times
    for (splitBytes <- Seq(700L, 1501L, 4096L)) {
      val small = WarcFiles.records(s, dir.toString + "/*.warc.gz",
        splitBytes = splitBytes)
        .select("member_off", "target_uri", "http_status", "error")
        .collect().map(r => (r.getLong(0), r.getString(1),
          r.getLong(2), Option(r.getString(3)).orNull)).sortBy(_._1)
      assert(small.toSeq == whole.toSeq,
        s"splitBytes=$splitBytes changed the result")
    }
  }

  test("file-source records agree with the in-column warc_parse path " +
    "on the same logical content (body text included)") {
    import s.implicits._
    val dir = Files.createTempDirectory("warcfiles")
    writeWarcGz(12, dir, "b.warc.gz")
    val fromFiles = WarcFiles.records(s, dir.toString + "/b.warc.gz",
      splitBytes = 900L)
      .select("target_uri", "body").as[(String, String)]
      .collect().sortBy(_._1)
    // same records as ONE concatenated payload through Warc.records
    val concat = {
      val bos = new ByteArrayOutputStream()
      (0 until 12).foreach(i => bos.write(responseRecord(i, docBody(i))))
      bos.toByteArray
    }
    val inColumn = graft.operators.Warc.records(
      Seq((1L, concat)).toDF("doc_id", "w"), "doc_id", "w")
      .select("target_uri", "body").as[(String, String)]
      .collect().sortBy(_._1)
    assert(fromFiles.toSeq == inColumn.toSeq)
  }

  test("corrupt member quarantines its split and halts it; other " +
    "splits keep parsing (per-split isolation)") {
    val dir = Files.createTempDirectory("warcfiles")
    val f = writeWarcGz(30, dir, "c.warc.gz")
    // corrupt the middle of one member: find the 11th member offset by
    // re-walking the good file, then flip bytes inside its deflate data
    val bytes = Files.readAllBytes(f)
    val offs = scala.collection.mutable.ArrayBuffer[Int](0)
    var pos = 0
    while (pos < bytes.length) {
      WarcFiles.inflateMember(bytes, pos, Int.MaxValue) match {
        case Right((_, next)) => offs += next; pos = next
        case Left(e) => fail(s"fixture walk broke at $pos: $e")
      }
    }
    val target = offs(10) + 20 // inside member 10's deflate stream
    (0 until 8).foreach(i => bytes(target + i) =
      (bytes(target + i) ^ 0x5a).toByte)
    Files.write(f, bytes)
    val got = WarcFiles.records(s, f.toString, splitBytes = 2048L)
      .select("member_off", "target_uri", "error")
      .collect().map(r => (r.getLong(0), Option(r.getString(1)).orNull,
        Option(r.getString(2)).orNull))
    val bad = got.filter(_._3 != null)
    assert(bad.length >= 1, "corruption must surface as quarantine")
    val good = got.filter(_._3 == null)
    // every member outside the corrupted split region still parses —
    // at least the 10 before the corruption and the members owned by
    // later splits (halt is per-split, not per-file)
    assert(good.length >= 25, s"only ${good.length} good records")
    assert(good.map(_._1).distinct.length == good.length)
  }

  test("FNAME-flagged members and non-ASCII bodies frame correctly") {
    import s.implicits._
    val dir = Files.createTempDirectory("warcfiles")
    val f = dir.resolve("d.warc.gz")
    val out = new FileOutputStream(f.toFile)
    out.write(gzipMemberWithName(responseRecord(0, docBody(7)),
      "rec0.warc"))
    out.write(gzipMember(responseRecord(1, docBody(7))))
    out.close()
    val got = WarcFiles.records(s, f.toString, splitBytes = 256L)
      .filter(col("error").isNull)
      .select("target_uri", "body").as[(String, String)]
      .collect().sortBy(_._1)
    assert(got.length == 2)
    assert(got.forall(_._2.contains("café naïve 世界")))
  }

  test("uncompressed .warc falls back to whole-file parse; junk file " +
    "quarantines as not-warc") {
    val dir = Files.createTempDirectory("warcfiles")
    val plain = dir.resolve("e.warc")
    Files.write(plain, responseRecord(0, docBody(0)) ++
      responseRecord(1, docBody(1)))
    val got = WarcFiles.records(s, plain.toString)
      .select("target_uri", "error")
      .collect().map(r => (Option(r.getString(0)).orNull,
        Option(r.getString(1)).orNull))
    assert(got.length == 2 && got.forall(_._2 == null))
    val junk = dir.resolve("f.warc")
    Files.write(junk, "this is not a warc file at all".getBytes)
    val q = WarcFiles.records(s, junk.toString)
      .select("error").collect().map(_.getString(0))
    assert(q.toSeq == Seq("not-warc"))
  }

  test("adaptive window: a straddling member larger than the initial " +
    "1 MB read-ahead is recovered by window growth; an overrun budget " +
    "smaller than the member quarantines with the knob named") {
    val dir = Files.createTempDirectory("warcfiles")
    val f = dir.resolve("h.warc.gz")
    // one small member, then one HUGE (~2 MB compressed) member that
    // straddles the 1 MB split boundary, then another small one
    val rnd = new scala.util.Random(42)
    val bigBody = {
      val sb = new StringBuilder(4 << 20)
      while (sb.length < (4 << 20)) sb.append(rnd.nextLong().toHexString)
      sb.toString
    }
    val out = new FileOutputStream(f.toFile)
    out.write(gzipMember(responseRecord(0, docBody(0))))
    out.write(gzipMember(responseRecord(1,
      s"<html><body><p>big $bigBody</p></body></html>")))
    out.write(gzipMember(responseRecord(2, docBody(2))))
    out.close()
    val got = WarcFiles.records(s, f.toString, splitBytes = 1L << 20)
      .select("target_uri", "error")
      .collect().map(r => (Option(r.getString(0)).orNull,
        Option(r.getString(1)).orNull))
    assert(got.count(_._2 == null) == 3,
      s"all three records must parse: ${got.toSeq}")
    // same layout, overrun budget below the big member's size
    val starved = WarcFiles.records(s, f.toString, splitBytes = 1L << 20,
      overrunBytes = 64L << 10)
      .select("error").collect().map(r => Option(r.getString(0)).orNull)
    assert(starved.exists(e =>
      e != null && e.contains("member-exceeds-overrun")),
      s"expected the overrun quarantine, got: ${starved.toSeq}")
  }

  test("crawl-to-corpus composition: WARC files feed CurationPipeline " +
    "end to end (records -> html/url columns -> 12-stage funnel)") {
    val dir = Files.createTempDirectory("warcfiles")
    val f = dir.resolve("crawl.warc.gz")
    val out = new FileOutputStream(f.toFile)
    (0 until 30).foreach { i =>
      val dom = if (i % 5 == 2) "spam-domain.com" else "example.org"
      val body = "<html><body><p>" +
        (s"word$i content " * (25 + i % 7)) +
        "of and that have with</p>" +
        "<a href=\"/nav\">nav &amp; menu</a></body></html>"
      val http = httpBlock("200 OK", "text/html", body)
      val httpBytes = http.getBytes("UTF-8")
      out.write(gzipMember(rec(Seq(
        "WARC-Type" -> "response",
        "WARC-Target-URI" -> s"https://site$i.$dom/page/$i",
        "Content-Type" -> "application/http;msgtype=response",
        "Content-Length" -> httpBytes.length.toString), http)
        .getBytes("UTF-8")))
    }
    out.close()
    val raw = WarcFiles.records(s, f.toString, splitBytes = 2048L)
      .filter(col("error").isNull && col("warc_type") === "response")
      .select(
        xxhash64(col("path"), col("member_off")).as("doc_id"),
        col("path").as("source"),
        col("body").as("html"),
        col("target_uri").as("u"))
    val funnel = graft.operators.CurationPipeline.run(raw,
        "doc_id", "source", "html", "u",
        blockedDomains = Seq("spam-domain.com"), lineMaxDf = 50L,
        gopherMinWords = 10, jaccN = 3, jaccThreshold = 0.5,
        jaccMaxDocFreq = 10, budgetPerSource = 100000L,
        packBudget = 128L, trainPct = 80, valPct = 10)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(funnel("ingest") == 30L)
    assert(funnel("url_blocklist") == 24L, // the %5==2 arm dies
      s"blocklist kept ${funnel("url_blocklist")}")
    assert(funnel("gopher_quality") > 0L)
    assert(funnel.contains("pack"))
  }

  test("responseTexts extracts clean page text from files") {
    val dir = Files.createTempDirectory("warcfiles")
    writeWarcGz(6, dir, "g.warc.gz")
    val texts = WarcFiles.responseTexts(s, dir.toString + "/g.warc.gz",
      splitBytes = 1024L).select("text").collect().map(_.getString(0))
    assert(texts.length == 6)
    assert(texts.forall(t => t.startsWith("doc ") && !t.contains("<")))
  }
}
