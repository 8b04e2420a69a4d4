package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** WARC container-FILE reader: splits `.warc.gz` crawl files at
  * gzip-member offsets so a single ~1 GB file fans out across tasks —
  * the production CommonCrawl ingest shape (the in-column `warc_parse`
  * path, `operators/Warc.scala`, parses an already-loaded payload
  * column; a real crawl job starts from container files on storage).
  *
  * WHY member offsets: CommonCrawl-style WARC.gz files are CONCATENATED
  * per-record gzip members, so any member boundary is a valid
  * decompression restart point. A task owning byte range [start, end)
  * of a file processes exactly the members whose FIRST byte lies in its
  * range (reading past `end` for the straddling tail — the same
  * ownership rule Hadoop's text line reader uses), so every member is
  * parsed exactly once with no coordination.
  *
  * RESYNC: a non-zero split start lands mid-member, so the task scans
  * forward for the gzip magic (1f 8b 08) and VALIDATES each candidate
  * by fully inflating it — CRC32 + ISIZE trailer check + the inflated
  * bytes starting with `WARC/` — before trusting it as a boundary.
  * A false positive (the 3-byte magic occurring inside compressed
  * data) fails inflation within a few bytes; surviving all three checks
  * by accident is cryptographically unlikely.
  *
  * CORRUPTION degrades, never throws (the `WarcParse` discipline): a
  * member that fails to inflate mid-walk yields ONE quarantine row and
  * halts that split (after corruption the next boundary is unknowable;
  * a resync heuristic would make quarantine contents split-layout-
  * dependent). An undersized decompression-bomb guard caps each
  * member's inflated size.
  *
  * SCALE shape: the driver lists files (bounded metadata) and emits
  * (path, start, end) splits; each task reads only its window
  * [start, min(end + overrun, size)) — O(splitBytes) memory, no
  * shuffle; record parsing is the same codegen'd `warc_parse`
  * expression downstream of an explode, so the whole read is map-only
  * and scales with executors × splits.
  */
object WarcFiles {

  /** One task's byte range of one file. `end` is exclusive; members
    * STARTING in [start, end) belong to this split. */
  case class WarcSplit(path: String, start: Long, end: Long, size: Long)

  /** One gzip member (or its quarantine stub): `member` is the
    * inflated bytes (null when quarantined), `member_off` the byte
    * offset of the member's first compressed byte in the file. */
  case class WarcMember(path: String, member_off: Long,
                        member: Array[Byte], error: String)

  /** Default split size — sized so a task's window (split + overrun)
    * stays well under executor task memory at 1000-way parallelism. */
  val DefaultSplitBytes: Long = 128L * 1024 * 1024

  /** How far past `end` the straddling last member may extend. A
    * member longer than this (compressed) quarantines rather than
    * growing the window unboundedly. */
  val DefaultOverrunBytes: Long = 32L * 1024 * 1024

  /** Per-member inflated-size cap (decompression-bomb gate — crawl
    * bytes are attacker-influenced). */
  val MaxInflatedBytes: Int = graft.plans.WarcParseModel.MaxInflatedBytes

  // ---------------------------------------------------------------
  // gzip member walk (pure byte-array functions; no Spark types)
  // ---------------------------------------------------------------

  /** End offset (exclusive) of the gzip header starting at `pos`, or
    * -1 when the bytes there are not a plausible RFC 1952 header. */
  private[sources] def gzipHeaderEnd(buf: Array[Byte], pos: Int): Int = {
    if (pos + 10 > buf.length) return -1
    if (buf(pos) != 0x1f.toByte || buf(pos + 1) != 0x8b.toByte ||
      buf(pos + 2) != 8) return -1
    val flg = buf(pos + 3) & 0xff
    if ((flg & 0xe0) != 0) return -1 // reserved flag bits must be zero
    var p = pos + 10
    if ((flg & 4) != 0) { // FEXTRA
      if (p + 2 > buf.length) return -1
      val xlen = (buf(p) & 0xff) | ((buf(p + 1) & 0xff) << 8)
      p += 2 + xlen
      if (p > buf.length) return -1
    }
    if ((flg & 8) != 0) { // FNAME (NUL-terminated)
      while (p < buf.length && buf(p) != 0) p += 1
      if (p >= buf.length) return -1
      p += 1
    }
    if ((flg & 16) != 0) { // FCOMMENT
      while (p < buf.length && buf(p) != 0) p += 1
      if (p >= buf.length) return -1
      p += 1
    }
    if ((flg & 2) != 0) { // FHCRC
      p += 2
      if (p > buf.length) return -1
    }
    p
  }

  private def le32(buf: Array[Byte], p: Int): Long =
    (buf(p) & 0xffL) | ((buf(p + 1) & 0xffL) << 8) |
      ((buf(p + 2) & 0xffL) << 16) | ((buf(p + 3) & 0xffL) << 24)

  /** Inflate ONE member starting at `pos`. Right((bytes, nextPos)) on
    * success — nextPos is the offset just past the 8-byte trailer;
    * Left(reason) when the bytes there are not a complete valid member
    * within the buffer. Validates the CRC32 and ISIZE trailer, so a
    * success is definitive (resync candidates can be trusted). */
  private[sources] def inflateMember(buf: Array[Byte], pos: Int,
      maxOut: Int): Either[String, (Array[Byte], Int)] = {
    val dataStart = gzipHeaderEnd(buf, pos)
    if (dataStart < 0) return Left("bad-gzip-header")
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(buf, dataStart, buf.length - dataStart)
      val out = new java.io.ByteArrayOutputStream(64 * 1024)
      val tmp = new Array[Byte](64 * 1024)
      while (!inf.finished()) {
        val n =
          try inf.inflate(tmp)
          catch { case _: java.util.zip.DataFormatException =>
            return Left("bad-deflate") }
        if (n == 0 && !inf.finished())
          return Left("truncated-member") // ran out of buffered input
        if (out.size.toLong + n > maxOut) return Left("inflate-bomb")
        out.write(tmp, 0, n)
      }
      val trailer = dataStart + inf.getBytesRead.toInt
      if (trailer + 8 > buf.length) return Left("truncated-trailer")
      val bytes = out.toByteArray
      val crc = new java.util.zip.CRC32()
      crc.update(bytes)
      if ((crc.getValue & 0xffffffffL) != le32(buf, trailer))
        return Left("crc-mismatch")
      if ((bytes.length.toLong & 0xffffffffL) != le32(buf, trailer + 4))
        return Left("isize-mismatch")
      Right((bytes, trailer + 8))
    } finally inf.end()
  }

  private def startsWithWarc(b: Array[Byte]): Boolean =
    b.length >= 5 && b(0) == 'W' && b(1) == 'A' && b(2) == 'R' &&
      b(3) == 'C' && b(4) == '/'

  /** Walk one split's window. `buf` holds file bytes
    * [split.start, split.start + buf.length); members must START at
    * relative offset < lim (= split.end - split.start).
    *
    * A member (or resync candidate) that runs past the window's end
    * while MORE FILE EXISTS beyond it yields the sentinel error
    * `window-exhausted`: the caller re-reads with a larger overrun
    * (adaptive windows — most tasks never read more than ~1 MB past
    * their split, instead of paying the full overrun up front). Only
    * when the window already reaches end-of-file is a short member a
    * genuine truncation quarantine. */
  private[sources] def walkWindow(split: WarcSplit, buf: Array[Byte],
      maxOut: Int): Iterator[WarcMember] = {
    val windowAtEof = split.start + buf.length >= split.size
    def needsMoreWindow(err: String): Boolean =
      (err == "truncated-member" || err == "truncated-trailer") &&
        !windowAtEof
    val lim = math.min(split.end - split.start, buf.length.toLong).toInt
    val out = scala.collection.mutable.ArrayBuffer[WarcMember]()
    var pos = 0
    var halted = false
    if (split.start == 0L && !(buf.length >= 3 &&
      buf(0) == 0x1f.toByte && buf(1) == 0x8b.toByte && buf(2) == 8)) {
      // uncompressed .warc support: whole file as one member, but only
      // when the file fits a single split's window (splitting plain
      // text would need a WARC/ resync heuristic — content-dependent)
      if (startsWithWarc(buf)) {
        if (split.size <= buf.length)
          out += WarcMember(split.path, 0L, buf, null)
        else
          // a short window here is never at EOF (buf.length < size by
          // the branch), so this is always the grow-or-quarantine
          // sentinel; walkSplit maps budget exhaustion to the
          // splitBytes-naming quarantine (the whole FILE must fit one
          // window — overrunBytes is the wrong knob)
          out += WarcMember(split.path, 0L, null,
            "window-exhausted-uncompressed")
      } else out += WarcMember(split.path, 0L, null, "not-warc")
      return out.iterator
    }
    if (split.start > 0L) {
      // resync: first VALIDATED member boundary at or after start
      var found = -1
      var p = 0
      while (found < 0 && p < lim) {
        if (p + 2 < buf.length && buf(p) == 0x1f.toByte &&
          buf(p + 1) == 0x8b.toByte && buf(p + 2) == 8) {
          inflateMember(buf, p, maxOut) match {
            case Right((bytes, next)) if startsWithWarc(bytes) =>
              out += WarcMember(split.path, split.start + p, bytes, null)
              found = p
              pos = next
            case Left(err) if needsMoreWindow(err) =>
              // can't tell a straddling candidate from garbage without
              // more bytes — hand back to the adaptive-window loop
              out += WarcMember(split.path, split.start + p, null,
                "window-exhausted")
              return out.iterator
            case _ => ()
          }
        }
        p += 1
      }
      if (found < 0) return out.iterator // no member starts here
    }
    while (!halted && pos < lim) {
      inflateMember(buf, pos, maxOut) match {
        case Right((bytes, next)) =>
          out += WarcMember(split.path, split.start + pos, bytes, null)
          pos = next
        case Left(err) =>
          // quarantine + halt: past corruption the next boundary is
          // unknowable (the WarcParse in-column discipline); a short
          // read against a longer file retries with a bigger window
          out += WarcMember(split.path, split.start + pos, null,
            if (needsMoreWindow(err)) "window-exhausted" else err)
          halted = true
      }
    }
    out.iterator
  }

  private def readWindow(split: WarcSplit, overrun: Long): Array[Byte] = {
    // task-side Hadoop conf: on a cluster this picks up core-site.xml
    // from the executor classpath; local file:// needs nothing
    val conf = new org.apache.hadoop.conf.Configuration()
    val p = new org.apache.hadoop.fs.Path(split.path)
    val fs = p.getFileSystem(conf)
    val winEnd = math.min(split.end + overrun, split.size)
    // fail CLEARLY instead of wrapping: a window is a JVM byte array,
    // so splitBytes + overrunBytes must stay under 2 GiB
    require(winEnd - split.start <= Int.MaxValue.toLong - 64,
      s"WarcFiles: window ${winEnd - split.start} bytes exceeds the " +
        "2 GiB JVM array limit — lower splitBytes and/or overrunBytes")
    val buf = new Array[Byte]((winEnd - split.start).toInt)
    val in = fs.open(p)
    try { in.seek(split.start); in.readFully(buf) } finally in.close()
    buf
  }

  /** Initial past-split read-ahead — grown geometrically toward
    * `overrunBytes` only when the straddling member needs it, so the
    * common task reads splitBytes + 1 MB, not splitBytes + overrun
    * (a flat 32 MB overrun is +25% read amplification at the default
    * split size). */
  private val InitialOverrunBytes: Long = 1L << 20

  /** Read-and-walk one split with the adaptive window. */
  private[sources] def walkSplit(split: WarcSplit, overrunBytes: Long,
      maxOut: Int): Iterator[WarcMember] = {
    var over = math.min(InitialOverrunBytes, overrunBytes)
    while (true) {
      val res = walkWindow(split, readWindow(split, over), maxOut).toVector
      val exhausted = res.exists(m => m.error == "window-exhausted" ||
        m.error == "window-exhausted-uncompressed")
      if (!exhausted) return res.iterator
      if (over >= overrunBytes)
        // out of window budget — a genuine quarantine, with the RIGHT
        // knob named per case (straddling member vs whole plain file)
        return res.map(m => m.error match {
          case "window-exhausted" =>
            m.copy(error = "member-exceeds-overrun (raise overrunBytes)")
          case "window-exhausted-uncompressed" =>
            m.copy(error = "uncompressed-exceeds-split (raise splitBytes)")
          case _ => m
        }).iterator
      over = math.min(over * 8, overrunBytes)
    }
    Iterator.empty // unreachable
  }

  // ---------------------------------------------------------------
  // Spark dataflow
  // ---------------------------------------------------------------

  /** Driver-side glob listing → (path, size) per matched file.
    * Metadata only: one globStatus call, no data reads — bounded by
    * file COUNT (~10⁵ at 100 TB), never by data. */
  def listFiles(spark: SparkSession, glob: String): Seq[(String, Long)] = {
    val pat = new org.apache.hadoop.fs.Path(glob)
    val fs = pat.getFileSystem(spark.sessionState.newHadoopConf())
    Option(fs.globStatus(pat)).getOrElse(Array.empty)
      .toSeq.filter(_.isFile)
      .map(st => (st.getPath.toString, st.getLen))
  }

  /** (path, size) pairs → byte-range splits. */
  def splitsForFiles(files: Seq[(String, Long)],
                     splitBytes: Long = DefaultSplitBytes): Seq[WarcSplit] = {
    require(splitBytes > 0, s"splitBytes must be positive: $splitBytes")
    files.flatMap { case (path, size) =>
      if (size == 0L) Seq.empty
      else (0L until size by splitBytes).map { off =>
        WarcSplit(path, off, math.min(off + splitBytes, size), size)
      }
    }
  }

  /** Driver-side listing → (path, start, end, size) splits. Metadata
    * only: one globStatus call, no data reads. */
  def splits(spark: SparkSession, glob: String,
             splitBytes: Long = DefaultSplitBytes): Seq[WarcSplit] =
    splitsForFiles(listFiles(spark, glob), splitBytes)

  /** Inflated gzip members of every matched file, one row per member
    * (or per quarantine stub): `(path, member_off, member, error)`. */
  def members(spark: SparkSession, glob: String,
              splitBytes: Long = DefaultSplitBytes,
              overrunBytes: Long = DefaultOverrunBytes): Dataset[WarcMember] =
    membersForSplits(spark, splits(spark, glob, splitBytes), overrunBytes)

  /** [[members]] over precomputed splits — the entry the incremental
    * ingest uses to read an EXPLICIT file set (no re-glob race between
    * planning and reading). */
  def membersForSplits(spark: SparkSession, ss: Seq[WarcSplit],
      overrunBytes: Long = DefaultOverrunBytes): Dataset[WarcMember] = {
    implicit val enc = Encoders.product[WarcMember]
    val rdd = spark.sparkContext
      .parallelize(ss, math.max(1, ss.size)) // one split per task
    spark.createDataset(rdd.mapPartitions(_.flatMap { sp =>
      walkSplit(sp, overrunBytes, MaxInflatedBytes)
    }))
  }

  /** All WARC records of every matched file — the file-source analogue
    * of [[graft.operators.Warc.records]]: `(path, member_off, rec_idx,
    * warc_type, target_uri, content_type, content_length, http_status,
    * http_mime, body, error)`. Quarantined members surface as rows with
    * `error` set; good members go through the same codegen'd
    * `warc_parse` expression as the in-column path (ONE parse pass —
    * the quarantine branch is a CASE over the same scan, not a second
    * read of the files). */
  def records(spark: SparkSession, glob: String,
              splitBytes: Long = DefaultSplitBytes,
              overrunBytes: Long = DefaultOverrunBytes): DataFrame =
    recordsFromMembers(
      members(spark, glob, splitBytes, overrunBytes).toDF())

  /** [[records]] over an explicit file set (see [[membersForSplits]]). */
  def recordsForFiles(spark: SparkSession, files: Seq[(String, Long)],
                      splitBytes: Long = DefaultSplitBytes,
                      overrunBytes: Long = DefaultOverrunBytes): DataFrame =
    recordsFromMembers(membersForSplits(spark,
      splitsForFiles(files, splitBytes), overrunBytes).toDF())

  private def recordsFromMembers(m: DataFrame): DataFrame = {
    val quarantineStub = array(named_struct(
      lit("rec_idx"), lit(0L),
      lit("warc_type"), lit(null).cast("string"),
      lit("target_uri"), lit(null).cast("string"),
      lit("content_type"), lit(null).cast("string"),
      lit("content_length"), lit(null).cast("long"),
      lit("http_status"), lit(null).cast("long"),
      lit("http_mime"), lit(null).cast("string"),
      lit("body"), lit(null).cast("string"),
      lit("error"), col("error")))
    m.select(col("path"), col("member_off"),
        explode(when(col("error").isNotNull, quarantineStub)
          .otherwise(call_function("warc_parse", col("member"))))
          .as("__r"))
      .select(col("path"), col("member_off"),
        col("__r.rec_idx").as("rec_idx"),
        col("__r.warc_type").as("warc_type"),
        col("__r.target_uri").as("target_uri"),
        col("__r.content_type").as("content_type"),
        col("__r.content_length").as("content_length"),
        col("__r.http_status").as("http_status"),
        col("__r.http_mime").as("http_mime"),
        col("__r.body").as("body"),
        col("__r.error").as("error"))
  }

  /** THE single definition of the file-source response gate + text
    * projection (shared by [[responseTexts]] and the incremental
    * ingest tick, so the two consumers cannot drift — the
    * `Warc.responseTextsFromRecords` discipline applied to the file
    * reader's column set). */
  def responseTextsFromRecords(recs: DataFrame,
                               okOnly: Boolean = true): DataFrame = {
    val base = recs
      .filter(col("error").isNull &&
        lower(col("warc_type")) === "response" && col("body").isNotNull)
    val gated =
      if (okOnly) base.filter(col("http_status") >= 200L &&
        col("http_status") < 300L)
      else base
    gated.select(col("path"), col("member_off"), col("rec_idx"),
      col("target_uri"), col("http_status"), col("http_mime"),
      graft.operators.Html.cleanText("body").as("text"))
  }

  /** Good HTTP-response records with extracted page text — the rows a
    * curation pipeline starts from ([[graft.operators.Html.cleanText]]
    * applied, non-2xx dropped when `okOnly`). */
  def responseTexts(spark: SparkSession, glob: String,
                    splitBytes: Long = DefaultSplitBytes,
                    okOnly: Boolean = true): DataFrame =
    responseTextsFromRecords(records(spark, glob, splitBytes), okOnly)
}
