package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** WARC (ISO 28500 / WARC/1.x) record splitter as a native expression:
  * `warc_parse(payload)` walks one crawl-container file and returns one
  * struct per record — the step BEFORE Html extraction in a real
  * CommonCrawl-shaped pipeline (fetch WARC → split records → keep
  * `response` records → parse the embedded HTTP message → hand the body
  * to the HTML cleaner).
  *
  * Structure parsed per record (anchored, no scanning heuristics):
  * `WARC/` version line; `Name: value` header lines up to a blank line
  * (names case-insensitive per the spec); a block of exactly
  * `Content-Length` BYTES; the `\r\n\r\n` record separator. For
  * `WARC-Type: response` records whose WARC-level Content-Type is
  * `application/http*`, the block is split as an HTTP/1.x message:
  * status code from the status line, `http_mime` from the message's own
  * Content-Type header, `body` = everything after the message's blank
  * line (decoded as UTF-8 — the downstream consumer is the HTML text
  * extractor; payloads that aren't text survive lossily rather than
  * killing the task).
  *
  * Corruption degrades, never throws (the AviDemux container-walk
  * discipline, `operators/Multimodal.scala`): a record whose magic is
  * wrong, whose header block never terminates, whose Content-Length is
  * missing/unparsable, or whose declared block runs past the payload
  * end yields ONE quarantine struct (`error` non-NULL, metadata parsed
  * so far retained) and ABORTS the rest of the file — after a framing
  * error the next record boundary is unknowable, and a resync heuristic
  * would make quarantine contents input-order-dependent. Offsets only
  * move forward; declared lengths go through Long arithmetic so a
  * crafted size >= 2^31 cannot wrap negative and stall the walk.
  *
  * Good-record struct: `error` IS NULL; non-response records carry NULL
  * `http_status`/`http_mime`/`body`. `content_length` is the declared
  * BYTE length (== character length only for ASCII payloads).
  *
  * Execution: per-row O(payload) byte walk, no regex on the hot path
  * (header names are matched with an ASCII case-insensitive scan), no
  * shuffle; pairs with `explode()` to fan one file into its records.
  */
object WarcParseModel extends Serializable {

  val recordType: StructType = StructType(Seq(
    StructField("rec_idx", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = true),
    StructField("http_status", LongType, nullable = true),
    StructField("http_mime", StringType, nullable = true),
    StructField("body", StringType, nullable = true),
    StructField("error", StringType, nullable = true)))

  private val Crlf2 = "\r\n\r\n".getBytes("US-ASCII")

  private def indexOfCrlf2(b: Array[Byte], from: Int): Int = {
    var i = from
    val last = b.length - Crlf2.length
    while (i <= last) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private def headerValue(lines: Array[String], name: String): String = {
    val want = name.toLowerCase(java.util.Locale.ROOT)
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      val c = l.indexOf(':')
      if (c > 0 &&
        l.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
          == want) return l.substring(c + 1).trim
      i += 1
    }
    null
  }

  private def mkRow(recIdx: Long, warcType: String, uri: String,
                    cType: String, cLen: java.lang.Long,
                    status: java.lang.Long, mime: String, body: String,
                    error: String): InternalRow = {
    def u(s: String): UTF8String =
      if (s == null) null else UTF8String.fromString(s)
    new GenericInternalRow(Array[Any](recIdx, u(warcType), u(uri),
      u(cType), cLen, status, u(mime), u(body), u(error)))
  }

  /** Decompressed-size cap: crawl archives are attacker-influenced
    * bytes, and a 100-byte gzip member can declare gigabytes (the
    * image-bomb gate's discipline, `operators/Multimodal.scala`).
    */
  val MaxInflatedBytes: Int = 256 * 1024 * 1024

  private def gunzipAll(payload: Array[Byte]): Array[Byte] = {
    // real WARC.gz files are CONCATENATED per-record gzip members;
    // GZIPInputStream reads multi-member streams transparently
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(payload))
    // multiply in Long: payloads over ~512 MB would overflow Int, hand
    // ByteArrayOutputStream a negative hint, and misquarantine the file
    val out = new java.io.ByteArrayOutputStream(
      math.min(payload.length.toLong * 4, 1L << 20).toInt)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) {
      if (out.size.toLong + n > MaxInflatedBytes)
        throw new java.util.zip.ZipException("inflated size cap")
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    in.close()
    out.toByteArray
  }

  /** Parse one WARC payload into its record structs. A payload that
    * starts with the gzip magic is inflated first (multi-member, size-
    * capped); a broken or bomb-sized gzip stream quarantines the whole
    * file as one `bad-gzip` record.
    */
  def parse(payload0: Array[Byte]): ArrayData = {
    val payload: Array[Byte] =
      if (payload0.length >= 2 && payload0(0) == 0x1f.toByte &&
        payload0(1) == 0x8b.toByte) {
        try gunzipAll(payload0)
        catch {
          case scala.util.control.NonFatal(_) =>
            return new GenericArrayData(Array[Any](mkRow(0L, null,
              null, null, null, null, null, null, "bad-gzip")))
        }
      } else payload0
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var off = 0
    var recIdx = 0L
    var halted = false
    while (!halted && off < payload.length) {
      // tolerate record separators / trailing CRLF runs between records
      while (off < payload.length &&
        (payload(off) == '\r' || payload(off) == '\n')) off += 1
      if (off >= payload.length) halted = true
      else {
        val hEnd = indexOfCrlf2(payload, off)
        if (hEnd < 0) {
          out += mkRow(recIdx, null, null, null, null, null, null, null,
            "truncated-header")
          halted = true
        } else {
          val header = new String(payload, off, hEnd - off, "US-ASCII")
          val lines = header.split("\r\n")
          if (!lines(0).startsWith("WARC/")) {
            out += mkRow(recIdx, null, null, null, null, null, null,
              null, "bad-magic")
            halted = true
          } else {
            val warcType = headerValue(lines, "WARC-Type")
            val uri = headerValue(lines, "WARC-Target-URI")
            val cType = headerValue(lines, "Content-Type")
            val cLenStr = headerValue(lines, "Content-Length")
            val cLen: java.lang.Long =
              if (cLenStr == null) null
              else try { java.lang.Long.valueOf(cLenStr) }
              catch { case _: NumberFormatException => null }
            val blockStart = hEnd + 4
            if (cLen == null || cLen.longValue < 0L) {
              out += mkRow(recIdx, warcType, uri, cType, null, null,
                null, null, "bad-length")
              halted = true
            } else if (blockStart.toLong + cLen.longValue >
              payload.length.toLong) {
              out += mkRow(recIdx, warcType, uri, cType, cLen, null,
                null, null, "truncated-block")
              halted = true
            } else {
              val blockEnd = (blockStart.toLong + cLen.longValue).toInt
              var status: java.lang.Long = null
              var mime: String = null
              var body: String = null
              val isHttpResponse = warcType != null &&
                warcType.equalsIgnoreCase("response") && cType != null &&
                cType.toLowerCase(java.util.Locale.ROOT)
                  .startsWith("application/http")
              if (isHttpResponse) {
                val mEnd = indexOfCrlf2(payload, blockStart)
                if (mEnd >= 0 && mEnd + 4 <= blockEnd) {
                  val msgHeader = new String(payload, blockStart,
                    mEnd - blockStart, "US-ASCII")
                  val mLines = msgHeader.split("\r\n")
                  val sParts = mLines(0).split(" ")
                  if (sParts.length >= 2 && sParts(0).startsWith("HTTP/"))
                    status =
                      try { java.lang.Long.valueOf(sParts(1)) }
                      catch { case _: NumberFormatException => null }
                  mime = headerValue(mLines, "Content-Type")
                  body = new String(payload, mEnd + 4, blockEnd -
                    (mEnd + 4), java.nio.charset.StandardCharsets.UTF_8)
                } else {
                  // declared an HTTP message but no header terminator
                  // inside the block: keep the record, no body split
                  body = new String(payload, blockStart,
                    blockEnd - blockStart,
                    java.nio.charset.StandardCharsets.UTF_8)
                }
              }
              out += mkRow(recIdx, warcType, uri, cType, cLen, status,
                mime, body, null)
              recIdx += 1L
              off = blockEnd
            }
          }
        }
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** `warc_parse(payload)` — see [[WarcParseModel]]. Accepts binary or
  * string input (a string is read as UTF-8 bytes).
  */
case class WarcParse(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType | StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"warc_parse requires a binary or string payload, got " +
          s"${t.simpleString(10)}")
    }

  override def dataType: DataType =
    ArrayType(WarcParseModel.recordType, containsNull = false)

  override def prettyName: String = "warc_parse"

  private def toBytes(v: Any): Array[Byte] = v match {
    case b: Array[Byte] => b
    case s: UTF8String => s.getBytes
  }

  override def nullSafeEval(v: Any): Any =
    WarcParseModel.parse(toBytes(v))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val model = WarcParseModel.getClass.getName.stripSuffix("$") + "$"
    val bytes = child.dataType match {
      case BinaryType => (s: String) => s
      case StringType => (s: String) => s"$s.getBytes()"
    }
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = $model.MODULE$$.parse(${bytes(s)});")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WarcParse = copy(child = newChild)
}

object WarcParse {
  /** Function-registry builder: exactly one argument. */
  def build(children: Seq[Expression]): WarcParse = {
    if (children.length != 1)
      throw new IllegalArgumentException(
        s"warc_parse(payload) takes 1 arg, got ${children.length}")
    WarcParse(children.head)
  }
}
