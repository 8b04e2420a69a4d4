package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque binary columns + typed
  * metadata, with per-partition batch decoding.
  *
  * IMAGE decode is REAL: image-MIME payloads go through the JDK's
  * `javax.imageio` (PNG/JPEG/BMP/GIF readers ship with the JVM — no
  * external codec needed), yielding true pixel dimensions. AUDIO decode
  * is REAL for WAV/AIFF/AU: `javax.sound.sampled` parses the container
  * and streams the PCM frames ([[AudioCodec]], consumed by
  * [[extractAudioFeatures]]). VIDEO demux is REAL for AVI/MJPEG
  * ([[AviDemux]]: structural RIFF chunk walk, true container dims,
  * frames that are self-contained JPEGs). Only containers with no
  * JVM-parsable structure remain behind [[FakeCodec]], a deterministic
  * fake with the identical signature, so the Spark-side contract is
  * fully exercised either way: the binary column representation, the
  * metadata struct schema, the mapPartitions batch shape (one codec
  * instance per partition, streamed rows, no per-row setup), and the
  * partitioning contract (decode is embarrassingly parallel, no
  * shuffle).
  */
object Multimodal {

  /** One media item: payload + metadata the way a 100 TB lake would store
    * it (binary column next to typed metadata, never parsed-at-read).
    */
  final case class MediaItem(id: Long, payload: Array[Byte], mediaType: String,
                             sizeBytes: Long)

  /** Extracted features from a decoded item. `width`/`height` are what a
    * real image decode would fill; the fake derives them from content so
    * tests can assert determinism.
    */
  final case class MediaFeatures(id: Long, mediaType: String, sizeBytes: Long,
                                 width: Int, height: Int, checksum: Long)

  /** Deterministic stand-in for codecs this container lacks (audio,
    * video). A real deployment replaces exactly this object (same
    * signature) with JNI/library calls.
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, Long) = {
      var checksum = 7L
      var i = 0
      while (i < payload.length) {
        checksum = (checksum * 31 + (payload(i) & 0xff)) % 1000000007L
        i += 1
      }
      val width = 16 + (checksum % 1024).toInt
      val height = 16 + ((checksum / 1024) % 1024).toInt
      (width, height, checksum)
    }
  }

  /** REAL image decode via the JDK's ImageIO: true width/height from the
    * pixel data, checksum folded over the decoded ARGB rasters (not the
    * compressed bytes — two encodings of the same pixels checksum alike).
    * Returns None when the payload is not a decodable image, so callers
    * can fall back rather than poison a 100 TB batch job on one corrupt
    * file.
    */
  object ImageCodec {
    // ImageIO's default stream cache spills every decode through a temp
    // FILE on local disk — pure waste for in-memory payloads, and per-row
    // in the batch path. Disabled once per JVM.
    javax.imageio.ImageIO.setUseCache(false)

    def decode(payload: Array[Byte]): Option[(Int, Int, Long)] = {
      // the JDK decoders throw unchecked exceptions (not just
      // IOException) on malformed headers — any decode failure must fall
      // back, never kill the task
      val img = try {
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      } catch { case scala.util.control.NonFatal(_) => null }
      Option(img).map { i =>
        val (w, h) = (i.getWidth, i.getHeight)
        var checksum = 7L
        val rowBuf = new Array[Int](w)
        var y = 0
        while (y < h) {
          // bulk row fetch: per-pixel getRGB pays a color-model
          // conversion call per pixel
          i.getRGB(0, y, w, 1, rowBuf, 0, w)
          var x = 0
          while (x < w) {
            checksum = (checksum * 31 + (rowBuf(x) & 0xffffffL)) %
              1000000007L
            x += 1
          }
          y += 1
        }
        (w, h, checksum)
      }
    }
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV / AIFF /
    * AU parsers ship with the JVM): true sample rate / channel count /
    * bit depth from the container header, frame count and checksum from
    * streaming the PCM payload (bounded 8 KB buffer — a long recording
    * never materializes in memory). Returns None for payloads that are
    * not a supported audio container, so batch jobs fall back rather
    * than die on one corrupt file.
    */
  object AudioCodec {
    final case class AudioInfo(sampleRate: Int, channels: Int,
                               bitsPerSample: Int, nFrames: Long,
                               durationMs: Long, checksum: Long)

    def decode(payload: Array[Byte]): Option[AudioInfo] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val fmt = in.getFormat
          val frameSize = math.max(1, fmt.getFrameSize)
          val buf = new Array[Byte](8192 - 8192 % frameSize)
          var bytes = 0L
          var checksum = 7L
          var read = in.read(buf)
          while (read > 0) {
            var i = 0
            while (i < read) {
              checksum = (checksum * 31 + (buf(i) & 0xff)) % 1000000007L
              i += 1
            }
            bytes += read
            read = in.read(buf)
          }
          val nFrames = bytes / frameSize
          Some(AudioInfo(fmt.getSampleRate.round, fmt.getChannels,
            fmt.getSampleSizeInBits, nFrames,
            math.round(nFrames * 1000.0 / fmt.getSampleRate), checksum))
        } finally in.close()
      } catch {
        // UnsupportedAudioFileException for non-audio; the PCM read can
        // also throw on truncated containers
        case scala.util.control.NonFatal(_) => None
      }
  }

  /** Typed per-item audio features. */
  final case class AudioFeatures(id: Long, sampleRate: Int, channels: Int,
                                 bitsPerSample: Int, nFrames: Long,
                                 durationMs: Long, checksum: Long)

  /** Batch audio feature extraction — the audio sibling of
    * [[extractFeatures]]/[[resizeImages]]: same mapPartitions shape
    * (per-partition codec, streamed rows, no shuffle, parallelism =
    * input partitions). Non-audio MIME and undecodable payloads are
    * DROPPED (flatMap) — the items kept are exactly those a training
    * pipeline can consume.
    */
  def extractAudioFeatures(items: Dataset[MediaItem])
      : Dataset[AudioFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { rows =>
      rows.flatMap { item =>
        if (!item.mediaType.startsWith("audio/")) Iterator.empty
        else AudioCodec.decode(item.payload).iterator.map(a =>
          AudioFeatures(item.id, a.sampleRate, a.channels, a.bitsPerSample,
            a.nFrames, a.durationMs, a.checksum))
      }
    }
  }

  /** Wrap a text table as media items (the testdata has no true binary
    * media; utf-8 payloads exercise the identical plumbing).
    */
  def asMediaItems(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("text/plain").as("mediaType"),
      octet_length(col(textCol)).cast("long").as("sizeBytes"))

  /** One sampled "frame" of a media item. For demuxed containers
    * (GIF), `offset` is the frame ordinal in the stream (the LZW stream
    * exposes no per-frame byte offsets) and `frameBytes` is the decoded
    * frame re-encoded as a self-contained PNG; for the byte-chunk
    * fallback, `offset` is the true byte offset of the chunk.
    */
  final case class Frame(id: Long, frameIndex: Int, offset: Long,
                         frameBytes: Array[Byte])

  /** REAL multi-frame container demux: GIF through the JDK's
    * frame-indexed ImageReader (the one multi-frame container format
    * with a JVM-built-in codec). Returns None for non-GIF or undecodable
    * payloads so batch jobs fall back instead of dying on one bad file.
    */
  object GifDemux {
    def frames(payload: Array[Byte])
        : Option[Vector[java.awt.image.BufferedImage]] = {
      val in = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            // getNumImages(true) walks the stream counting image
            // descriptors — exactly a demuxer's index pass
            val n = r.getNumImages(true)
            Some((0 until n).map(r.read).toVector)
          } catch {
            case scala.util.control.NonFatal(_) => None
          } finally r.dispose()
        }
      } finally in.close()
    }

    def toPng(img: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
  }

  /** REAL video container demux: AVI (RIFF) parsed structurally —
    * chunk walk over the LIST tree, true container dimensions from the
    * `avih` main header, and the `##dc`/`##db` stream chunks of the
    * `movi` list as frames. For the MJPEG flavor every `00dc` chunk IS
    * a self-contained JPEG, so sampled frames decode downstream through
    * the ordinary [[ImageCodec]] with no re-encoding. Pure-JVM byte
    * parsing (RIFF is a public spec; no external codec), bounded by the
    * payload: offsets advance strictly monotonically (a chunk whose
    * declared u32 size would not move the cursor forward — including
    * sizes >= 2^31, which a naive `.toInt` turns negative — aborts the
    * walk as corrupt), and LIST nesting is depth-capped so a crafted
    * payload of nested lists degrades instead of StackOverflowError-ing
    * the task. Returns None for non-AVI payloads — batch jobs degrade
    * to the byte-chunk path rather than dying on one bad file.
    */
  object AviDemux {
    final case class AviInfo(width: Int, height: Int,
                             frames: Vector[Array[Byte]])

    private def u32(b: Array[Byte], off: Int): Long =
      (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

    private def fourCC(b: Array[Byte], off: Int): String =
      new String(b, off, 4, "US-ASCII")

    def frames(payload: Array[Byte]): Option[AviInfo] =
      try {
        if (payload.length < 12 || fourCC(payload, 0) != "RIFF" ||
            fourCC(payload, 8) != "AVI ") None
        else {
          var width = 0
          var height = 0
          val fb = Vector.newBuilder[Array[Byte]]
          val maxDepth = 64 // RIFF in practice nests ~3 deep (hdrl/strl)
          def walk(start: Int, end: Int, depth: Int): Unit = {
            if (depth > maxDepth) return // crafted nesting — stop descending
            var off = start
            var ok = true
            while (ok && off + 8 <= end) {
              val id = fourCC(payload, off)
              val sz = u32(payload, off + 4) // unsigned, keep as Long
              val dataStart = off + 8
              val dataEnd = math.min(dataStart.toLong + sz, end.toLong)
                .toInt
              if (id == "LIST" && dataEnd - dataStart >= 4)
                walk(dataStart + 4, dataEnd, depth + 1) // hdrl/strl/movi
              else if (id == "avih" && dataEnd - dataStart >= 40) {
                width = u32(payload, dataStart + 32).toInt
                height = u32(payload, dataStart + 36).toInt
              } else if ((id.endsWith("dc") || id.endsWith("db")) &&
                  id.take(2).forall(_.isDigit))
                fb += java.util.Arrays.copyOfRange(payload, dataStart,
                  dataEnd)
              // chunks pad to even byte boundaries; Long math so a size
              // field >= 0x80000000 can't wrap negative and stall `off`
              val next = dataStart.toLong + sz + (sz & 1L)
              if (next > off && next <= Int.MaxValue) off = next.toInt
              else ok = false // corrupt size: no forward progress — stop
            }
          }
          walk(12, payload.length, 0)
          val fs = fb.result()
          if (fs.isEmpty && width == 0) None else Some(AviInfo(width,
            height, fs))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Frame sampling: every `stride`-th frame of each item. GIF payloads
    * demux for REAL (per-frame decode via [[GifDemux]], true per-frame
    * dimensions, frames re-encoded as standalone PNGs); payloads without
    * a JVM codec (audio/video containers) fall back to fixed-size byte
    * chunks so the pipeline shape stays identical either way:
    * per-partition codec, one input row fanning out to N frame rows, no
    * shuffle.
    */
  def sampleFrames(items: Dataset[MediaItem], frameSize: Int,
                   stride: Int): Dataset[Frame] = {
    import items.sparkSession.implicits._
    items.mapPartitions { rows =>
      def chunked(item: MediaItem): Iterator[Frame] = {
        val n = item.payload.length / frameSize
        (0 until n by stride).iterator.map { i =>
          val off = i * frameSize
          Frame(item.id, i, off.toLong,
            java.util.Arrays.copyOfRange(item.payload, off, off + frameSize))
        }
      }
      rows.flatMap { item =>
        if (item.mediaType == "image/gif")
          GifDemux.frames(item.payload) match {
            case Some(fs) =>
              (0 until fs.length by stride).iterator.map(i =>
                Frame(item.id, i, i.toLong, GifDemux.toPng(fs(i))))
            case None => chunked(item) // corrupt container: degrade
          }
        else if (item.mediaType == "video/avi" ||
            item.mediaType == "video/x-msvideo")
          AviDemux.frames(item.payload) match {
            case Some(info) =>
              // MJPEG stream chunks are already self-contained JPEGs —
              // no re-encode; offset carries the frame ordinal (the
              // movi list's byte offsets are container-internal)
              (0 until info.frames.length by stride).iterator.map(i =>
                Frame(item.id, i, i.toLong, info.frames(i)))
            case None => chunked(item) // corrupt container: degrade
          }
        else chunked(item)
      }
    }
  }

  /** Batch feature extraction: one codec per partition, rows streamed
    * through it. This is the Scala-native equivalent of a Pandas-UDF
    * mapInPandas decode stage — no shuffle, parallelism = input
    * partitions. Image-MIME items decode for real (ImageIO), AVI video
    * items demux for real ([[AviDemux]]: container dims from the avih
    * header, checksum folded over the stream-chunk frame bytes);
    * everything else — and any undecodable payload — takes the
    * deterministic fake.
    */
  def extractFeatures(items: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { rows =>
      // per-partition setup (a real codec's init/handle lives here)
      val codec = FakeCodec
      def avi(item: MediaItem): Option[(Int, Int, Long)] =
        AviDemux.frames(item.payload).map { info =>
          var checksum = 7L
          info.frames.foreach(_.foreach { b =>
            checksum = (checksum * 31 + (b & 0xff)) % 1000000007L
          })
          (info.width, info.height, checksum)
        }
      rows.map { item =>
        val (w, h, c) =
          if (item.mediaType.startsWith("image/"))
            ImageCodec.decode(item.payload)
              .getOrElse(codec.decode(item.payload))
          else if (item.mediaType == "video/avi" ||
              item.mediaType == "video/x-msvideo")
            avi(item).getOrElse(codec.decode(item.payload))
          else codec.decode(item.payload)
        MediaFeatures(item.id, item.mediaType, item.sizeBytes, w, h, c)
      }
    }
  }

  /** A resized media item: the thumbnailing stage of a multimodal
    * ingest. Original dimensions are kept alongside so downstream
    * training filters (min-resolution gates, aspect outlier drops) need
    * no second decode.
    */
  final case class ResizedImage(id: Long, origWidth: Int, origHeight: Int,
                                width: Int, height: Int, png: Array[Byte])

  /** REAL image resize via the JDK (Graphics2D bilinear scale):
    * aspect-preserving, longest side clamped to `maxDim`, re-encoded
    * PNG. Never upscales. Same distributed shape as
    * [[extractFeatures]]: pixel work happens where the data lives —
    * mapPartitions, no shuffle, parallelism = input partitions; a 100
    * TB image corpus thumbnails in one embarrassingly-parallel pass.
    * Undecodable or non-image payloads are DROPPED (flatMap), the
    * filter-and-transform contract of a real ingest stage — the items
    * kept are exactly those a training pipeline can consume.
    */
  def resizeImages(items: Dataset[MediaItem], maxDim: Int,
                   maxDecodePixels: Long = DefaultMaxDecodePixels)
      : Dataset[ResizedImage] = {
    import items.sparkSession.implicits._
    require(maxDim > 0, s"maxDim must be positive, got $maxDim")
    items.mapPartitions { rows =>
      rows.flatMap { item =>
        if (!item.mediaType.startsWith("image/")) Iterator.empty
        // Decompression-bomb gate: read WxH from the format header
        // (no pixel allocation) and drop oversized payloads BEFORE the
        // full decode — a hostile 40000x40000 PNG is a few KB on the
        // wire but gigabytes decoded, enough for one item to OOM an
        // executor in a 100 TB ingest. Headerless/corrupt payloads are
        // dropped here too (the full decode would fail anyway).
        else if (!headerDims(item.payload)
            .exists { case (w, h) => w.toLong * h <= maxDecodePixels })
          Iterator.empty
        else {
          val img = try {
            javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(item.payload))
          } catch { case scala.util.control.NonFatal(_) => null }
          Option(img).iterator.map { i =>
            val (w, h) = (i.getWidth, i.getHeight)
            val scale = maxDim.toDouble / math.max(w, h)
            val (nw, nh) =
              if (scale >= 1.0) (w, h) // never upscale
              else (math.max(1, math.round(w * scale).toInt),
                math.max(1, math.round(h * scale).toInt))
            val out = new java.awt.image.BufferedImage(nw, nh,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(i, 0, 0, nw, nh, null)
            } finally g.dispose()
            ResizedImage(item.id, w, h, nw, nh, GifDemux.toPng(out))
          }
        }
      }
    }
  }

  /** 64 Mpx (~256 MB decoded RGBA) — generous for any real training
    * image, far below the allocation that tips an executor over.
    */
  val DefaultMaxDecodePixels: Long = 64L * 1000 * 1000

  /** Image dimensions from the container header via ImageReader —
    * bytes-on-the-wire inspection only, no pixel buffer is allocated.
    * None for payloads no installed reader recognizes.
    */
  private def headerDims(payload: Array[Byte]): Option[(Int, Int)] = {
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          Some((r.getWidth(0), r.getHeight(0)))
        } catch { case scala.util.control.NonFatal(_) => None }
        finally r.dispose()
      }
    } finally iis.close()
  }

  /** Interleaved multimodal SEQUENCE ASSEMBLY — the step between a
    * cleaned text+media lake and a VLM training loader: each document's
    * token stream is cut into `chunkTokens`-token text elements, its
    * media items are spliced in at deterministic positions (0-indexed
    * item `j` lands after 0-indexed text chunk `j + 1` — after the
    * first `min(j + 2, n_chunks)` text chunks, clamped to the end —
    * the markup-position slot an HTML-derived corpus would carry;
    * oracle- and spec-pinned: a 2-chunk doc's imgs 0,1 lay out as
    * chunk0, chunk1, img0, img1), every
    * image costs a fixed `imageTokens` (the patch-token budget of a
    * ViT-style encoder), and the element stream is laid out with exact
    * cumulative token offsets plus a `within_budget` flag marking the
    * prefix a `budget`-token sample keeps (the l25 straddle
    * convention, per document).
    *
    * `media` carries one row per (document, media index) — metadata
    * only. The payload bytes stay in the lake: assembly decides LAYOUT,
    * and only the kept elements' payloads are ever fetched/decoded
    * (by [[extractFeatures]]/[[resizeImages]] downstream) — at 100 TB
    * the difference between shuffling token counts and shuffling the
    * images themselves.
    *
    * Every quantity is an exact integer, so the full element layout
    * hash-matches a SQL mirror (the m2 gate query). Scale shape: one
    * join on the doc id, per-doc bounded windows (a document's element
    * count, never the corpus), no corpus-sized exchange.
    */
  def interleaveSequences(docs: DataFrame, idCol: String, textCol: String,
                          media: DataFrame, mediaIdCol: String,
                          mediaIdxCol: String, chunkTokens: Int,
                          imageTokens: Int, budget: Long): DataFrame = {
    require(chunkTokens >= 1 && imageTokens >= 0 && budget >= 1)
    val base = docs.select(col(idCol).as("doc"),
      TextAnalysis.tokenCount(textCol).as("n_tokens"))
      .withColumn("n_chunks",
        expr(s"(n_tokens + ${chunkTokens - 1}) div $chunkTokens"))
    // text elements: chunk i carries min(chunkTokens, remaining) tokens.
    // sequence(0, -1) is DESCENDING in Spark, so empty docs are guarded.
    val textElems = base.filter(col("n_chunks") >= 1)
      .select(col("doc"), col("n_tokens"), col("n_chunks"),
        explode(expr("sequence(0, n_chunks - 1)")).as("pos"))
      .select(col("doc"), col("pos").cast("long").as("pos"),
        lit(0L).as("kind_rank"), lit(-1L).as("media_idx"),
        least(lit(chunkTokens.toLong),
          col("n_tokens") - col("pos") * chunkTokens).as("elem_tokens"))
    val mediaElems = media
      .select(col(mediaIdCol).as("doc"),
        col(mediaIdxCol).cast("long").as("media_idx"))
      .join(base.select(col("doc"), col("n_chunks")), Seq("doc"))
      .select(col("doc"),
        least(col("media_idx") + 1L, col("n_chunks")).as("pos"),
        lit(1L).as("kind_rank"), col("media_idx"),
        lit(imageTokens.toLong).as("elem_tokens"))
    val Win = org.apache.spark.sql.expressions.Window
    val w = Win.partitionBy("doc")
      .orderBy(col("pos"), col("kind_rank"), col("media_idx"))
    textElems.unionByName(mediaElems)
      .withColumn("elem_idx", row_number().over(w).cast("long"))
      .withColumn("cum_tokens",
        sum("elem_tokens").over(w.rowsBetween(Win.unboundedPreceding, 0)))
      .withColumn("kind",
        when(col("kind_rank") === 0L, lit("text")).otherwise(lit("image")))
      .withColumn("within_budget", (col("cum_tokens") <= budget).cast("long"))
      .select(col("doc"), col("elem_idx"), col("kind"), col("media_idx"),
        col("elem_tokens"), col("cum_tokens"), col("within_budget"))
  }

  /** 64-bit DCT perceptual hash (the classic pHash): grayscale →
    * 32×32 average-pool → 2D DCT-II → 8×8 low-frequency block →
    * bit = coefficient > median (median over the 63 AC coefficients;
    * the DC bit is pinned to 1 — it only encodes global brightness).
    * Two perceptually-equal images (re-encode, resize, small
    * brightness/contrast shifts) land within a small Hamming distance;
    * unrelated images land near 32. Pure fixed-point-free double math
    * with fixed loop order — bit-deterministic on any JVM/partitioning.
    *
    * Exact-substring/shingle dedup (l1/l2x) is blind to re-encoded
    * media; this is the image-side analogue of SimHash (l4): hash
    * map-side, band-join, verify with bit_count.
    */
  object PHash {
    val Size = 32
    val Keep = 8

    // cos((2n+1)·k·π / (2·Size)), k row = frequency, n col = sample —
    // built once per JVM, shared by every task
    private lazy val cosT: Array[Array[Double]] = Array.tabulate(Keep, Size) {
      (k, n) => math.cos((2 * n + 1) * k * math.Pi / (2.0 * Size))
    }

    /** Per-axis area weights for an exact box filter: source index i
      * covers [i·S/n, (i+1)·S/n) in target units, split across EVERY
      * cell it overlaps — one cell pair for a downscale (n >= S), a
      * run of interior cells for an upscale (n < S; the original
      * two-cell split left interior cells zero-weighted for sub-32px
      * images — caught in self-review). The fractional split is what
      * integer binning loses (half-pixel grid wobble between a 64→32
      * and a 128→32 downscale measurably shifts low-frequency phase —
      * caught by the resize-invariance spec).
      */
    private def axisSplit(i: Int, n: Int): Array[(Int, Double)] = {
      val lo = i.toDouble * Size / n
      val hi = (i + 1).toDouble * Size / n
      val c0 = math.min(Size - 1, lo.toInt)
      val c1 = math.min(Size - 1, (hi - 1e-9).toInt)
      (c0 to c1).map { c =>
        val cellLo = math.max(lo, c.toDouble)
        val cellHi = math.min(hi, c + 1.0)
        c -> (cellHi - cellLo)
      }.toArray
    }

    /** 32×32 grayscale by EXACT area-weighted box filtering of the full
      * raster (BT.601 luma in doubles, fixed order). Every source pixel
      * distributes its area across every target cell it overlaps, so
      * two renders of the same continuous image at different sizes pool
      * to near-identical rasters — down OR up.
      */
    def gray(img: java.awt.image.BufferedImage): Array[Double] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val sums = new Array[Double](Size * Size)
      val wts = new Array[Double](Size * Size)
      val rowBuf = new Array[Int](w)
      // x-axis splits are reused for every row
      val xs = Array.tabulate(w)(axisSplit(_, w))
      val ys = Array.tabulate(h)(axisSplit(_, h))
      var y = 0
      while (y < h) {
        img.getRGB(0, y, w, 1, rowBuf, 0, w)
        val ySplit = ys(y)
        var x = 0
        while (x < w) {
          val px = rowBuf(x)
          val luma = 0.299 * ((px >> 16) & 0xff) +
            0.587 * ((px >> 8) & 0xff) + 0.114 * (px & 0xff)
          val xSplit = xs(x)
          var yi = 0
          while (yi < ySplit.length) {
            val (cy, wy) = ySplit(yi)
            var xi = 0
            while (xi < xSplit.length) {
              val (cx, wx) = xSplit(xi)
              sums(cy * Size + cx) += luma * wy * wx
              wts(cy * Size + cx) += wy * wx
              xi += 1
            }
            yi += 1
          }
          x += 1
        }
        y += 1
      }
      var i = 0
      while (i < sums.length) {
        if (wts(i) > 0) sums(i) /= wts(i)
        i += 1
      }
      sums
    }

    /** Deterministic fake raster for payloads with no decodable image
      * (the [[FakeCodec]] discipline: identical signature and batch
      * shape, content derived from the bytes so equal payloads hash
      * equal and near-equal payloads stay near).
      */
    def grayFromBytes(payload: Array[Byte]): Array[Double] = {
      val g = new Array[Double](Size * Size)
      if (payload.isEmpty) return g
      var i = 0
      while (i < g.length) {
        g(i) = (payload(i % payload.length) & 0xff).toDouble
        i += 1
      }
      g
    }

    /** Top-left `Keep`×`Keep` block of the 2D DCT-II (separable: rows
      * then columns; only the `Keep` needed frequencies are computed —
      * O(Size²·Keep + Size·Keep²), not a full Size² transform).
      */
    def dctLowFreq(g: Array[Double]): Array[Double] = {
      // rows: tmp(u, y) = sum_x g(y, x) · cos_u(x)
      val tmp = new Array[Double](Keep * Size)
      var u = 0
      while (u < Keep) {
        var y = 0
        while (y < Size) {
          var acc = 0.0
          var x = 0
          while (x < Size) {
            acc += g(y * Size + x) * cosT(u)(x)
            x += 1
          }
          tmp(u * Size + y) = acc
          y += 1
        }
        u += 1
      }
      // cols: out(v, u) = sum_y tmp(u, y) · cos_v(y)
      val out = new Array[Double](Keep * Keep)
      var v = 0
      while (v < Keep) {
        var uu = 0
        while (uu < Keep) {
          var acc = 0.0
          var y = 0
          while (y < Size) {
            acc += tmp(uu * Size + y) * cosT(v)(y)
            y += 1
          }
          out(v * Keep + uu) = acc
          uu += 1
        }
        v += 1
      }
      out
    }

    /** Fold the 8×8 block into the 64-bit hash: bit i set iff
      * coefficient i exceeds the median of the 63 AC coefficients
      * (lower-half median — deterministic, no averaging); bit 0 (DC)
      * always set.
      */
    def hashOf(coeffs: Array[Double]): Long = {
      val ac = coeffs.drop(1).sorted
      val median = ac(ac.length / 2)
      var h = 1L
      var i = 1
      while (i < coeffs.length) {
        if (coeffs(i) > median) h |= (1L << i)
        i += 1
      }
      h
    }

    /** Cheap magic-byte sniff for the containers ImageIO can decode
      * (PNG/JPEG/GIF/BMP) — at corpus scale most payloads are NOT
      * images, and ImageIO's per-call reader search + stream setup on
      * every non-image row measurably dominated the wave8 probe; four
      * byte compares skip it.
      */
    private def looksLikeImage(p: Array[Byte]): Boolean =
      p.length >= 4 && (
        (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' &&
          p(3) == 'G') ||
        (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte) ||
        (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
        (p(0) == 'B' && p(1) == 'M'))

    /** Item → hash: real decode for image payloads, byte raster
      * otherwise (never throws — the corrupt-file contract).
      */
    def ofItem(payload: Array[Byte]): Long = {
      val img = if (!looksLikeImage(payload)) null else try {
        javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      } catch { case scala.util.control.NonFatal(_) => null }
      val g = if (img != null) gray(img) else grayFromBytes(payload)
      hashOf(dctLowFreq(g))
    }
  }

  /** (id, phash) per item — mapPartitions batch shape, embarrassingly
    * parallel, no shuffle; the decode cost is the whole cost.
    */
  def perceptualHashes(items: Dataset[MediaItem]): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions(_.map(it => (it.id, PHash.ofItem(it.payload))))
      .toDF("id", "phash")
  }

  /** Per-window mean-absolute PCM amplitude of an audio payload —
    * the raw material of [[audioSignatures]]. 16-bit streaming read
    * over the FIRST channel of each frame (channel choice is
    * signature-inert as long as it is consistent; the
    * [[AudioCodec.decode]] bounded-buffer discipline, and
    * AudioInputStream.read guarantees frame-aligned counts so a
    * sample never splits across buffers); None for non-audio/corrupt
    * payloads.
    */
  private[operators] def windowEnergies(payload: Array[Byte],
                                        window: Int): Option[Array[Double]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        // PCM_SIGNED only: the loop below decodes samples as signed
        // shorts, so a 16-bit PCM_UNSIGNED stream would be read
        // sign-flipped and break the gain-invariance premise.
        if (fmt.getSampleSizeInBits != 16 ||
            fmt.getEncoding !=
              javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
        else {
          val bigEndian = fmt.isBigEndian
          val frameSize = math.max(2, fmt.getFrameSize)
          val buf = new Array[Byte](8192 - 8192 % frameSize)
          val out = Vector.newBuilder[Double]
          var acc = 0.0
          var inWin = 0
          var read = in.read(buf)
          while (read > 0) {
            var i = 0
            while (i + 1 < read) { // first channel of each frame
              val s =
                if (bigEndian) ((buf(i) << 8) | (buf(i + 1) & 0xff)).toShort
                else ((buf(i + 1) << 8) | (buf(i) & 0xff)).toShort
              acc += math.abs(s.toDouble)
              inWin += 1
              if (inWin == window) {
                out += acc / window; acc = 0.0; inWin = 0
              }
              i += frameSize
            }
            read = in.read(buf)
          }
          if (inWin > 0) out += acc / inWin
          val arr = out.result().toArray
          if (arr.isEmpty) None else Some(arr)
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic 16-bit mono WAV synthesis (spec + m6 fixture): a
    * triangle base wave with period == `window` samples (so every
    * window's mean |amplitude| is EXACTLY equal before scaling) under
    * a per-window envelope drawn from `seed` — the signature's bucket
    * values are then exact integers of the envelope, making the spec's
    * invariance arms (gain ×5/4, whole-window trims) bit-checkable.
    * Base samples are multiples of 4 so a 5/4 gain stays exact.
    */
  def syntheticWav(seed: Long, windows: Int, window: Int = 1024,
                   gainNum: Int = 1, gainDen: Int = 1,
                   skipWindows: Int = 0): Array[Byte] = {
    val n = (windows - skipWindows) * window
    val samples = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val gi = i + skipWindows * window
      val w = gi / window
      // envelope 1..8 from the seed's bits, exactly reproducible
      val scale = (((seed >>> ((w % 8) * 8)) & 0x7L) + 1L).toInt
      val base = 4 * ((gi % window) - window / 2)
      val v = base * scale * gainNum / gainDen
      samples(2 * i) = (v & 0xff).toByte
      samples(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true,
      false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** (id, window_index, fhash): a GAIN-INVARIANT signature hash per
    * energy-window shingle of an audio item — the audio member of the
    * near-dup signature family (image = [[perceptualHashes]], video =
    * [[frameHashes]]). Per window of `window` PCM samples the mean
    * |amplitude| is taken RELATIVE to the track mean and bucketed on a
    * log scale (round(8·log2(e/ē)), clamped ±64): scaling every sample
    * by a constant gain scales window and track energy equally, so the
    * bucket sequence — and therefore every signature hash — is
    * unchanged (re-mastered/re-encoded copies of a recording differ by
    * exactly such gains; MultimodalSpec pins ×1.25 gain → identical
    * signature). Hashes are over `shingle`-length bucket runs, so the
    * set survives whole-window trims (interior runs persist) while
    * staying order-sensitive locally. Non-audio payloads degrade to
    * byte-chunk frame hashes ([[frameHashes]]'s fallback), keeping the
    * pipeline shape format-independent. Output column names match
    * [[videoNearDupPairs]]'s input — the set-Jaccard join is SHARED
    * across the video and audio modalities.
    */
  def audioSignatures(items: Dataset[MediaItem], window: Int = 1024,
                      shingle: Int = 3): Dataset[(Long, Int, Long)] = {
    val spark = items.sparkSession
    import spark.implicits._
    items.mapPartitions(_.flatMap { it =>
      windowEnergies(it.payload, window) match {
        case Some(es) =>
          val mean = math.max(es.sum / es.length, 1e-9)
          val buckets = es.map { e =>
            val r = math.log(math.max(e, 1e-9) / mean) / math.log(2.0)
            math.max(-64L, math.min(64L, math.round(8.0 * r)))
          }
          (0 to buckets.length - shingle).iterator.map { i =>
            var h = 1125899906842597L
            var j = i
            while (j < i + shingle) { h = h * 31 + buckets(j); j += 1 }
            (it.id, i, h)
          }
        case None => // non-audio: the frameHashes chunk degrade
          val n = it.payload.length / window
          (0 until n).iterator.map { i =>
            (it.id, i, PHash.ofItem(java.util.Arrays.copyOfRange(
              it.payload, i * window, (i + 1) * window)))
          }
      }
    }).toDF("id", "frame_index", "fhash")
      .as[(Long, Int, Long)]
  }

  /** (id, frame_index, fhash): a perceptual hash PER SAMPLED FRAME —
    * the video-level signature [[videoNearDupPairs]] consumes. Demuxed
    * containers (GIF/MJPEG-AVI) hash real decoded frames; codec-less
    * payloads hash fixed-size byte chunks (the [[sampleFrames]]
    * degrade), so the pipeline shape is format-independent. Map-only:
    * one codec per partition, one input row fanning out to its frame
    * rows, no shuffle until the caller aggregates.
    */
  def frameHashes(items: Dataset[MediaItem], frameSize: Int,
                  stride: Int): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    sampleFrames(items, frameSize, stride)
      .mapPartitions(_.map(f =>
        (f.id, f.frameIndex, PHash.ofItem(f.frameBytes))))
      .toDF("id", "frame_index", "fhash")
  }

  /** Video-level near-dup pairs: Jaccard over the DISTINCT frame-hash
    * SETS of two items >= `threshold`. The temporal complement of
    * [[phashNearPairs]] — one whole-item hash is blind to trims,
    * re-splits, and videos containing another's frames, while shared
    * frame hashes survive all three (order-free by design: set
    * Jaccard, not sequence alignment — the l2 semantics ported to
    * frames). Distributed shape IS l2's inverted index: explode to
    * (fhash, id), self-join on the 8-byte hash, count intersections,
    * join back two size rows — no pairwise comparison outside shared
    * hashes.
    *
    * `maxDf` is the hot-frame cap (the l2b treatment, same semantics:
    * Jaccard over the SUB-CAP hash universe for both the intersection
    * AND the sizes): blank/black frames are the boilerplate lines of
    * video — one hash shared by d items otherwise detonates d²/2
    * candidates through the shuffle. Default unlimited = exact.
    */
  def videoNearDupPairs(frameHashes: DataFrame, threshold: Double,
                        maxDf: Int = Int.MaxValue): DataFrame = {
    val fh = frameHashes.select("id", "fhash").distinct()
    val live = fh.join(
      fh.groupBy("fhash").agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select("fhash"),
      Seq("fhash"))
    val sizes = live.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = live.as("a")
      .join(live.as("b"),
        col("a.fhash") === col("b.fhash") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("n").as("na")), "id_a")
      .join(sizes.select(col("id").as("id_b"), col("n").as("nb")), "id_b")
      .withColumn("jaccard", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "inter", "jaccard")
  }

  /** Near-duplicate image pairs by pHash Hamming distance <= `maxDist`:
    * the hash is split into four 16-bit bands and candidates bucket-join
    * on (band, value) — pigeonhole-COMPLETE for maxDist <= 3 (four
    * disjoint bands cannot all differ), recall-bound above that. The
    * exact bit_count verify runs on candidates only. Same shape as
    * [[Dedup.simHashNearPairs]]; 16-bit bands keep bucket sizes
    * corpus-scaled (65k distinct values per band).
    *
    * Hot-bucket discipline: identical hashes are COMMON in real corpora
    * (blank/solid-color images; every empty payload hashes the same
    * via grayFromBytes), and a d-item identical-hash cluster fed
    * straight into the band self-join generates 4 x d^2/2 candidates
    * through the shuffle. The band join therefore runs over DISTINCT
    * hash values only (one row per value regardless of multiplicity),
    * with id pairs expanded afterwards by 8-byte-key joins. Exact-dup
    * groups contribute their pairs via a direct same-phash self-join —
    * d^2/2 OUTPUT rows are the contract's answer, but no band
    * multiplication and no post-join distinct ever see them.
    *
    * `maxGroup` (default unlimited = exact all-pairs, the brute-force
    * parity the spec pins): groups of identical hashes LARGER than the
    * cap switch to star form — min-id representative paired with each
    * other member (d-1 rows, Hamming 0), and only the representative
    * participates in cross-hash expansion. Connectivity-preserving for
    * dedup clustering (same components), pair-incomplete by choice —
    * the ngramJaccardPairs maxDocFreq treatment.
    */
  def phashNearPairs(hashes: DataFrame, maxDist: Int = 3,
                     maxGroup: Int = Int.MaxValue): DataFrame = {
    val groups = hashes.groupBy("phash")
      .agg(min(col("id")).as("rep"), count(lit(1)).as("grp_n"))
    val withN = hashes.join(groups, Seq("phash"))
    // Hamming-0 pairs, never through the band join: all-pairs within
    // groups at-or-under the cap, star (rep -> member) above it.
    val withinSmall = withN.filter(col("grp_n") <= maxGroup)
    val within = withinSmall.as("a")
      .join(withinSmall.as("b"),
        col("a.phash") === col("b.phash") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.phash").as("ph_a"), col("b.phash").as("ph_b"))
      .union(withN.filter(col("grp_n") > maxGroup &&
          col("id") =!= col("rep"))
        .select(col("rep").as("id_a"), col("id").as("id_b"),
          col("phash").as("ph_a"), col("phash").as("ph_b")))
    // cross-hash candidates over DISTINCT hash values; capped groups
    // are represented by their min-id member only
    val expandable = withN.filter(col("grp_n") <= maxGroup)
      .select("id", "phash")
      .union(groups.filter(col("grp_n") > maxGroup)
        .select(col("rep").as("id"), col("phash")))
    val banded = groups.select(col("phash"),
      posexplode(array((0 until 4).map(b =>
        expr(s"(phash >> ${16 * b}) & 65535")): _*))
        .as(Seq("band", "bucket")))
    val hashPairs = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.bucket") === col("y.bucket") &&
          col("x.phash") < col("y.phash"))
      .select(col("x.phash").as("ph_x"), col("y.phash").as("ph_y"))
      .distinct()
      .filter(expr("bit_count(ph_x ^ ph_y)") <= maxDist)
    val cross = hashPairs
      .join(expandable.as("ga"), col("ph_x") === col("ga.phash"))
      .join(expandable.as("gb"), col("ph_y") === col("gb.phash"))
      .select(
        least(col("ga.id"), col("gb.id")).as("id_a"),
        greatest(col("ga.id"), col("gb.id")).as("id_b"),
        when(col("ga.id") < col("gb.id"), col("ph_x"))
          .otherwise(col("ph_y")).as("ph_a"),
        when(col("ga.id") < col("gb.id"), col("ph_y"))
          .otherwise(col("ph_x")).as("ph_b"))
    within.union(cross)
      .withColumn("hamming",
        expr("bit_count(ph_a ^ ph_b)").cast("long"))
  }
}
