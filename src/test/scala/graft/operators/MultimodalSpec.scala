package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables
import graft.operators.Multimodal.{MediaFeatures, MediaItem}

class MultimodalSpec extends AnyFunSuite {
  private lazy val s = TestSpark.spark

  test("binary plumbing: documents -> media items -> batch feature " +
    "extraction is deterministic and preserves ids") {
    import s.implicits._
    val items = Multimodal.asMediaItems(
      Tables.documents(s, "/root/testdata/sf0.001").limit(50),
      "doc_id", "text").as[MediaItem]
    val feats1 = Multimodal.extractFeatures(items).collect()
      .sortBy(_.id)
    val feats2 = Multimodal.extractFeatures(items).collect()
      .sortBy(_.id)
    assert(feats1.length == 50)
    assert(feats1.toSeq == feats2.toSeq, "decode stub must be deterministic")
    assert(feats1.forall(f => f.width >= 16 && f.height >= 16))
    assert(feats1.forall(_.mediaType == "text/plain"))
    // payload length survives the pipeline
    val sizes = items.collect().map(i => i.id -> i.sizeBytes).toMap
    assert(feats1.forall(f => sizes(f.id) == f.sizeBytes))
  }

  test("frame sampling: every stride-th fixed-size chunk, ids preserved, " +
    "no partial frames") {
    import s.implicits._
    val payload = (0 until 100).map(_.toByte).toArray
    val items = Seq(Multimodal.MediaItem(7L, payload, "video/fake", 100L))
      .toDS()
    val frames = Multimodal.sampleFrames(items, frameSize = 16, stride = 2)
      .collect().sortBy(_.frameIndex)
    // 100 bytes / 16 = 6 full frames, sampled at stride 2 -> indices 0,2,4
    assert(frames.map(_.frameIndex).toSeq == Seq(0, 2, 4))
    assert(frames.forall(_.frameBytes.length == 16))
    assert(frames.forall(_.id == 7L))
    assert(frames(1).offset == 32L)
    assert(frames(1).frameBytes(0) == 32.toByte)
  }

  // Render a real PNG in memory: a w x h gradient, returned as the
  // encoded bytes a lake's binary column would hold.
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (x * 7 + y * 131) % 0xffffff)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("real PNG payloads decode to their true pixel dimensions through " +
    "the batch pipeline") {
    import s.implicits._
    val items = Seq(
      MediaItem(1L, pngBytes(23, 17), "image/png", 0L),
      MediaItem(2L, pngBytes(64, 48), "image/png", 0L),
      // same pixels re-encoded -> same checksum as item 2's pixels
      MediaItem(3L, pngBytes(64, 48), "image/png", 0L),
      // corrupt image bytes must fall back, not crash the batch
      MediaItem(4L, Array[Byte](1, 2, 3, 4), "image/png", 0L))
      .toDS()
    val out = Multimodal.extractFeatures(items).collect().sortBy(_.id)
    assert((out(0).width, out(0).height) == (23, 17))
    assert((out(1).width, out(1).height) == (64, 48))
    assert(out(1).checksum == out(2).checksum,
      "pixel-level checksum must not depend on the encoded byte stream")
    assert(out.length == 4, "corrupt payload must survive via fallback")
  }

  // Encode a real multi-frame GIF in memory: n solid-color frames of
  // w x h (primary colors survive GIF palette quantization exactly).
  private val frameColors = Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffff00)
  private def gifBytes(w: Int, h: Int, n: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until n).foreach { i =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(frameColors(i % frameColors.length)))
      g.fillRect(0, 0, w, h)
      g.dispose()
      writer.writeToSequence(
        new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  test("GIF payloads demux into REAL per-frame images: true frame count " +
    "and dimensions, stride sampling, PNG-decodable frame bytes") {
    import s.implicits._
    val payload = gifBytes(12, 9, 4)
    val items = Seq(
      MediaItem(1L, payload, "image/gif", payload.length.toLong)).toDS()
    val all = Multimodal.sampleFrames(items, frameSize = 16, stride = 1)
      .collect().sortBy(_.frameIndex)
    assert(all.map(_.frameIndex).toSeq == Seq(0, 1, 2, 3),
      "demuxer must find all four frames")
    all.foreach { f =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(f.frameBytes))
      assert((img.getWidth, img.getHeight) == (12, 9),
        s"frame ${f.frameIndex} must decode to its true dimensions")
      assert((img.getRGB(3, 3) & 0xffffff) ==
        frameColors(f.frameIndex % frameColors.length),
        s"frame ${f.frameIndex} must carry its own pixel content")
    }
    // stride sampling picks every 2nd frame
    val sampled = Multimodal.sampleFrames(items, frameSize = 16, stride = 2)
      .collect().sortBy(_.frameIndex)
    assert(sampled.map(_.frameIndex).toSeq == Seq(0, 2))
    // a corrupt container degrades to byte-chunking, never crashes
    val corrupt = Seq(MediaItem(2L,
      Array.fill[Byte](64)(0x5a), "image/gif", 64L)).toDS()
    val degraded = Multimodal.sampleFrames(corrupt, frameSize = 16,
      stride = 1).collect()
    assert(degraded.length == 4 &&
      degraded.forall(_.frameBytes.length == 16))
  }

  test("identical payloads yield identical features") {
    import s.implicits._
    val items = Seq(
      MediaItem(1L, "same bytes".getBytes("UTF-8"), "text/plain", 10L),
      MediaItem(2L, "same bytes".getBytes("UTF-8"), "text/plain", 10L))
      .toDS()
    val out = Multimodal.extractFeatures(items).collect().sortBy(_.id)
    assert(out(0).copy(id = 0L) == out(1).copy(id = 0L))
  }

  test("resize: aspect preserved, longest side clamped, no upscale, " +
    "output PNG re-decodes at the new dimensions; non-images dropped") {
    import s.implicits._
    val items = Seq(
      MediaItem(1L, pngBytes(64, 32), "image/png", 0L), // downscale 2:1
      MediaItem(2L, pngBytes(8, 6), "image/png", 0L),   // under maxDim
      MediaItem(3L, "not an image".getBytes("UTF-8"), "text/plain", 12L),
      MediaItem(4L, "corrupt".getBytes("UTF-8"), "image/png", 7L))
      .toDS()
    val out = Multimodal.resizeImages(items, maxDim = 16)
      .collect().map(r => r.id -> r).toMap
    assert(out.keySet == Set(1L, 2L)) // text + corrupt image dropped
    val r1 = out(1L)
    assert((r1.origWidth, r1.origHeight) == ((64, 32)))
    assert((r1.width, r1.height) == ((16, 8)), s"${r1.width}x${r1.height}")
    val redecoded = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r1.png))
    assert(redecoded.getWidth == 16 && redecoded.getHeight == 8)
    val r2 = out(2L)
    assert((r2.width, r2.height) == ((8, 6)), "small image must not upscale")
  }

  test("resize: decompression-bomb gate drops oversized headers " +
    "before any pixel allocation") {
    import s.implicits._
    // forge a PNG whose IHDR claims 40000x40000 (a few hundred bytes on
    // the wire, gigabytes decoded): patch the dims into a real 1x1
    // PNG's IHDR and fix the chunk CRC so the header parses cleanly
    val bomb = {
      val b = pngBytes(1, 1).clone()
      def put(off: Int, v: Int): Unit = {
        b(off) = ((v >>> 24) & 0xff).toByte
        b(off + 1) = ((v >>> 16) & 0xff).toByte
        b(off + 2) = ((v >>> 8) & 0xff).toByte
        b(off + 3) = (v & 0xff).toByte
      }
      put(16, 40000) // IHDR width
      put(20, 40000) // IHDR height
      val crc = new java.util.zip.CRC32()
      crc.update(b, 12, 17) // 'IHDR' type + 13 data bytes
      put(29, crc.getValue.toInt)
      b
    }
    val items = Seq(
      MediaItem(1L, bomb, "image/png", bomb.length.toLong),
      MediaItem(2L, pngBytes(64, 32), "image/png", 0L)).toDS()
    val out = Multimodal.resizeImages(items, maxDim = 16).collect()
    assert(out.map(_.id).toSet == Set(2L),
      "bomb must be dropped, real image kept")
    // the cap gates on true header dims, not payload size
    val strict = Multimodal.resizeImages(items, maxDim = 16,
      maxDecodePixels = 1000L).collect()
    assert(strict.isEmpty, "64x32 = 2048 px exceeds a 1000 px cap")
  }

  test("audio: real WAV decode pins sample rate, channels, frame count " +
    "and duration through the batch pipeline; corrupt/non-audio dropped") {
    import s.implicits._
    def wav(sampleRate: Float, nFrames: Int, channels: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16,
        channels, true, false)
      val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
      var i = 0
      while (i < nFrames) {
        val v = (math.sin(2 * math.Pi * 440.0 * i / sampleRate) * 12000).toInt
        var c = 0
        while (c < channels) {
          val off = (i * channels + c) * 2
          pcm(off) = (v & 0xff).toByte
          pcm(off + 1) = ((v >> 8) & 0xff).toByte
          c += 1
        }
        i += 1
      }
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val out = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }
    val items = Seq(
      MediaItem(1L, wav(8000f, 4000, 1), "audio/wav", 0L),   // 0.5 s mono
      MediaItem(2L, wav(44100f, 44100, 2), "audio/wav", 0L), // 1 s stereo
      MediaItem(3L, "not audio".getBytes("UTF-8"), "audio/wav", 9L),
      MediaItem(4L, wav(8000f, 100, 1), "text/plain", 0L)) // wrong MIME
      .toDS()
    val out = Multimodal.extractAudioFeatures(items)
      .collect().map(a => a.id -> a).toMap
    assert(out.keySet == Set(1L, 2L),
      "corrupt payload and non-audio MIME must be dropped")
    val a1 = out(1L)
    assert(a1.sampleRate == 8000 && a1.channels == 1 &&
      a1.bitsPerSample == 16)
    assert(a1.nFrames == 4000 && a1.durationMs == 500)
    val a2 = out(2L)
    assert(a2.sampleRate == 44100 && a2.channels == 2 &&
      a2.nFrames == 44100 && a2.durationMs == 1000)
    // determinism: identical payloads checksum identically
    val again = Multimodal.extractAudioFeatures(
      Seq(MediaItem(9L, wav(8000f, 4000, 1), "audio/wav", 0L)).toDS())
      .collect().head
    assert(again.checksum == a1.checksum)
  }

  test("video: a REAL MJPEG AVI demuxes to true container dims and " +
    "per-frame JPEGs that decode to their true pixel dimensions; " +
    "corrupt containers degrade to byte chunks") {
    import s.implicits._
    def jpeg(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = img.createGraphics()
      g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h)
      g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte)
         else Array.empty[Byte])
    def list(tp: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", tp.getBytes("US-ASCII") ++ children)
    // minimal-but-valid MJPEG AVI: RIFF('AVI ') > LIST(hdrl > avih
    // with dwWidth/dwHeight at data offsets 32/36) + LIST(movi >
    // one 00dc chunk per JPEG frame)
    def avi(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      val avih = new Array[Byte](56)
      le32(w).copyToArray(avih, 32)
      le32(h).copyToArray(avih, 36)
      val body = "AVI ".getBytes("US-ASCII") ++
        list("hdrl", chunk("avih", avih)) ++
        list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    val f1 = jpeg(32, 20, 0xff0000)
    val f2 = jpeg(32, 20, 0x00ff00)
    val f3 = jpeg(32, 20, 0x0000ff)
    val video = avi(32, 20, Seq(f1, f2, f3))

    // direct demux: true frame count + container dims
    val info = Multimodal.AviDemux.frames(video).get
    assert(info.width == 32 && info.height == 20)
    assert(info.frames.length == 3)

    // through the batch pipeline: extractFeatures reports the avih dims
    val items = Seq(
      MediaItem(1L, video, "video/avi", video.length.toLong),
      MediaItem(2L, "not a riff container at all".getBytes("UTF-8"),
        "video/avi", 27L)).toDS()
    val feats = Multimodal.extractFeatures(items).collect()
      .map(f => f.id -> f).toMap
    assert(feats(1L).width == 32 && feats(1L).height == 20,
      s"container dims must come from avih: ${feats(1L)}")
    // the corrupt container falls back to the deterministic fake
    assert(feats(2L) == Multimodal.extractFeatures(Seq(
      MediaItem(2L, "not a riff container at all".getBytes("UTF-8"),
        "text/plain", 27L)).toDS()).collect().head
      .copy(mediaType = "video/avi"))

    // frame sampling: stride 2 keeps frames 0 and 2, and every sampled
    // frame is a SELF-CONTAINED JPEG with true pixel dims
    val sampled = Multimodal.sampleFrames(items, frameSize = 64,
        stride = 2).collect().filter(_.id == 1L).sortBy(_.frameIndex)
    assert(sampled.map(_.frameIndex).toSeq == Seq(0, 2))
    sampled.foreach { fr =>
      val (w, h, _) = Multimodal.ImageCodec.decode(fr.frameBytes).get
      assert(w == 32 && h == 20,
        s"sampled frame ${fr.frameIndex} must decode to true dims")
    }
    // determinism across runs
    val again = Multimodal.extractFeatures(items).collect()
      .map(f => f.id -> f).toMap
    assert(again == feats)
  }

  test("video: adversarial AVI payloads terminate (huge u32 chunk " +
    "size) and survive deep LIST nesting (no StackOverflowError)") {
    def le32(v: Long): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    // a `00dc` chunk whose declared size is 0xFFFFFFF8 (negative as a
    // signed Int: -8). Pre-fix this made `off = dataStart + sz + (sz&1)`
    // land back on the SAME offset forever — the walk must now abort as
    // corrupt instead of hanging the executor task.
    val evil = "RIFF".getBytes("US-ASCII") ++ le32(1000L) ++
      "AVI ".getBytes("US-ASCII") ++
      "00dc".getBytes("US-ASCII") ++ le32(0xFFFFFFF8L) ++
      new Array[Byte](64)
    val done = java.util.concurrent.Executors.newSingleThreadExecutor()
    try {
      val fut = done.submit(new java.util.concurrent.Callable[Unit] {
        def call(): Unit = { Multimodal.AviDemux.frames(evil); () }
      })
      fut.get(10, java.util.concurrent.TimeUnit.SECONDS) // hang => timeout
    } finally done.shutdownNow()

    // ~40k nested LISTs: recursion is depth-capped, so this parses (to
    // nothing useful) instead of throwing a fatal StackOverflowError
    // that would escape the NonFatal catch and kill the task.
    val depth = 40000
    // LIST-at-k-levels-above-the-leaf has data size 8 + 12k (movi tag +
    // one nested LIST header + its data), leaf data is 4 zero bytes —
    // write the chain outermost-first in one linear pass
    val bos = new java.io.ByteArrayOutputStream(depth * 12 + 16)
    bos.write("RIFF".getBytes("US-ASCII")); bos.write(le32(depth * 12L + 8))
    bos.write("AVI ".getBytes("US-ASCII"))
    for (k <- (depth - 1) to 0 by -1) {
      bos.write("LIST".getBytes("US-ASCII")); bos.write(le32(8L + 12L * k))
      bos.write("movi".getBytes("US-ASCII"))
    }
    bos.write(new Array[Byte](4))
    val deep = bos.toByteArray
    assert(Multimodal.AviDemux.frames(deep).isEmpty) // degrades, no throw
  }

  test("interleaveSequences: hand-computed layout — chunk splits, image " +
    "splice positions incl. end-clamp, cumulative offsets, budget cut, " +
    "doc without media, media on an empty doc") {
    import s.implicits._
    // doc 1: 20 tokens -> chunks of 16+4; imgs 0,1 -> after chunks 1,2
    // doc 2: 5 tokens, no media -> one 5-token chunk
    // doc 3: empty text, one image -> image at pos 0, nothing else
    val docs = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")),
      (2L, "a b c d e"),
      (3L, "")).toDF("doc_id", "text")
    val media = Seq((1L, 0L), (1L, 1L), (3L, 0L))
      .toDF("doc_id", "media_idx")
    val out = Multimodal.interleaveSequences(docs, "doc_id", "text",
        media, "doc_id", "media_idx", chunkTokens = 16, imageTokens = 32,
        budget = 50L)
      .collect().map(r => (r.getAs[Long]("doc"), r.getAs[Long]("elem_idx"),
        r.getAs[String]("kind"), r.getAs[Long]("media_idx"),
        r.getAs[Long]("elem_tokens"), r.getAs[Long]("cum_tokens"),
        r.getAs[Long]("within_budget"))).toSet
    // doc 1, ordered by (pos, kind_rank text-before-image, media_idx):
    //  pos 0: text chunk 0 (16)          -> cum 16
    //  pos 1: text chunk 1 (4)           -> cum 20
    //  pos 1: image 0 (32)               -> cum 52 (> 50 -> outside budget)
    //  pos 2 (clamped to n_chunks=2): image 1 (32) -> cum 84
    val expectedDoc1 = Set(
      (1L, 1L, "text", -1L, 16L, 16L, 1L),
      (1L, 2L, "text", -1L, 4L, 20L, 1L),
      (1L, 3L, "image", 0L, 32L, 52L, 0L),
      (1L, 4L, "image", 1L, 32L, 84L, 0L))
    assert(out.filter(_._1 == 1L) == expectedDoc1,
      s"doc1 layout: ${out.filter(_._1 == 1L).toSeq.sortBy(_._2)}")
    assert(out.filter(_._1 == 2L) == Set((2L, 1L, "text", -1L, 5L, 5L, 1L)))
    assert(out.filter(_._1 == 3L) == Set((3L, 1L, "image", 0L, 32L, 32L, 1L)))
  }

  // Scale-invariant textured PNG: sinusoidal luma from NORMALIZED
  // coords, so the same continuous image renders at any size. A smooth
  // linear gradient is the pHash ADVERSARY (its AC spectrum is nearly
  // all zero, so median-threshold bits are rounding noise — a real
  // photo has texture); the multi-frequency texture puts unambiguous
  // energy in the low-frequency block the hash reads.
  private def gradientPng(w: Int, h: Int, shift: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      def clamp(v: Int) = math.min(255, math.max(0, v))
      val (u, vv) = ((x + 0.5) / w, (y + 0.5) / h)
      // broadband: signed energy in EVERY low-frequency bin the hash
      // reads (cos(πk·x') is the continuous DCT-II basis), amplitudes
      // summing under 127 so nothing clips — a narrowband texture
      // leaves most AC bits thresholding rounding noise
      var luma = 127.0
      for (k <- 0 to 7; l <- 0 to 7 if k + l > 0) {
        val sgn = if ((k * 3 + l * 5) % 2 == 0) 1 else -1
        luma += sgn * 13.0 / (1 + k + l) *
          math.cos(math.Pi * k * u) * math.cos(math.Pi * l * vv)
      }
      val g = clamp(luma.toInt + shift)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def noisePng(w: Int, h: Int): Array[Byte] = {
    val rnd = new scala.util.Random(99L)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, rnd.nextInt(0xffffff))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("pHash DCT matches a naive O(N^4) direct-sum reference") {
    val rnd = new scala.util.Random(42L)
    val g = Array.fill(Multimodal.PHash.Size * Multimodal.PHash.Size)(
      rnd.nextDouble() * 255.0)
    val fast = Multimodal.PHash.dctLowFreq(g)
    val n = Multimodal.PHash.Size
    val naive = Array.tabulate(Multimodal.PHash.Keep,
      Multimodal.PHash.Keep) { (v, u) =>
      var acc = 0.0
      for (y <- 0 until n; x <- 0 until n)
        acc += g(y * n + x) *
          math.cos((2 * x + 1) * u * math.Pi / (2.0 * n)) *
          math.cos((2 * y + 1) * v * math.Pi / (2.0 * n))
      acc
    }.flatten
    fast.zip(naive).zipWithIndex.foreach { case ((f, nv), i) =>
      assert(math.abs(f - nv) < 1e-6 * (1 + math.abs(nv)),
        s"coef $i: $f vs $nv")
    }
    // the hash built from either coefficient set agrees (median gaps on
    // random input dwarf the separable-vs-direct rounding delta)
    assert(Multimodal.PHash.hashOf(fast) == Multimodal.PHash.hashOf(naive))
  }

  test("pHash: re-encode and resize leave the hash nearly unchanged, " +
    "brightness shift stays close, unrelated images land far") {
    val base = Multimodal.PHash.ofItem(gradientPng(64, 48))
    def d(h: Long) = java.lang.Long.bitCount(base ^ h)
    assert(d(Multimodal.PHash.ofItem(gradientPng(64, 48))) == 0,
      "re-render of the identical image must hash identically")
    assert(d(Multimodal.PHash.ofItem(gradientPng(128, 96))) <= 6,
      "2x resize must stay within a small Hamming distance")
    assert(d(Multimodal.PHash.ofItem(gradientPng(64, 48, shift = 15))) <= 6,
      "small brightness shift must stay within a small Hamming distance")
    assert(d(Multimodal.PHash.ofItem(noisePng(64, 48))) >= 16,
      "an unrelated image must land far away")
    // UPSCALE leg: a sub-32px render pools through the multi-cell
    // split (the two-cell form left interior cells zero-weighted)
    assert(d(Multimodal.PHash.ofItem(gradientPng(16, 12))) <= 10,
      "sub-32px render of the same image must stay close")
    // corrupt payload: falls back to the byte raster, never throws
    Multimodal.PHash.ofItem(Array[Byte](9, 9, 9))
    // empty payload is safe too
    Multimodal.PHash.ofItem(Array.emptyByteArray)
  }

  test("perceptualHashes is partition-invariant; phashNearPairs equals " +
    "brute force at Hamming <= 3 (pigeonhole-complete bands)") {
    import s.implicits._
    val rnd = new scala.util.Random(7L)
    // synthetic hashes exercising the band join directly: random bases
    // plus planted partners at distances 1..4
    val bases = (0L until 60L).map(i => i -> rnd.nextLong())
    def flip(h: Long, k: Int): Long = {
      var out = h
      val picked = scala.collection.mutable.Set.empty[Int]
      while (picked.size < k) picked += rnd.nextInt(64)
      picked.foreach(b => out ^= (1L << b))
      out
    }
    val planted = Seq(
      100L -> flip(bases(0)._2, 1), 101L -> flip(bases(1)._2, 2),
      102L -> flip(bases(2)._2, 3), 103L -> flip(bases(3)._2, 4))
    val all = (bases ++ planted).toDF("id", "phash")
    val got = Multimodal.phashNearPairs(all, maxDist = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = (bases ++ planted)
    val brute = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(got == brute, s"band join diverged: got $got expect $brute")
    assert(Seq((0L, 100L), (1L, 101L), (2L, 102L)).forall(brute.contains),
      "fixture must plant pairs at distances 1..3")
    assert(!brute.contains((3L, 103L)), "distance-4 pair is out of scope")
    // partition invariance of the decode+hash path on real items
    val items = Multimodal.asMediaItems(
      Tables.documents(s, "/root/testdata/sf0.001").limit(40),
      "doc_id", "text").as[MediaItem]
    val h1 = Multimodal.perceptualHashes(items)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h2 = Multimodal.perceptualHashes(items.repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h1 == h2)
  }

  test("phashNearPairs maxGroup: oversized identical-hash groups " +
    "emit star pairs + rep-only cross expansion; default stays " +
    "brute-exact through the identical-group path") {
    import s.implicits._
    val hot = (0L until 6L).map(i => i -> 0x1234L) // 6 identical hashes
    val near = Seq(100L -> (0x1234L ^ 1L))         // Hamming 1 from hot
    val far = Seq(200L -> 0x7fff00ee00dd00ccL)     // no shared band
    val all = (hot ++ near ++ far).toDF("id", "phash")
    val capped = Multimodal
      .phashNearPairs(all, maxDist = 3, maxGroup = 4)
      .select("id_a", "id_b", "hamming").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // star within the hot group (rep 0 <-> members), rep-only cross
    val expect = (1L to 5L).map(i => (0L, i, 0L)).toSet + ((0L, 100L, 1L))
    assert(capped == expect, s"capped pairs: $capped")
    // default = exact all-pairs, identical to brute force
    val got = Multimodal.phashNearPairs(all, maxDist = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = hot ++ near ++ far
    val brute = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    assert(got == brute, s"got $got expect $brute")
    assert(brute.size == 21, "fixture: 15 within-group + 6 cross pairs")
  }

  test("audio near-dup: a gain-scaled copy signature-matches exactly, " +
    "a whole-window trim still pairs, an unrelated recording stays " +
    "unpaired — through the SAME set-Jaccard join as video") {
    import s.implicits._
    val W = 1024
    // envelope seed chosen so the 8-window cycle is aperiodic
    val a = Multimodal.syntheticWav(0x1536271845362718L, windows = 16,
      window = W)
    val gain = Multimodal.syntheticWav(0x1536271845362718L, windows = 16,
      window = W, gainNum = 5, gainDen = 4)
    val trim = Multimodal.syntheticWav(0x1536271845362718L, windows = 16,
      window = W, skipWindows = 8) // drop one full envelope cycle:
      // the remaining windows repeat the cycle, so the track mean —
      // and every bucket — is unchanged
    val other = Multimodal.syntheticWav(0x7B2D4F6E1A3C5870L, windows = 16,
      window = W)
    val items = Seq(
      MediaItem(1L, a, "audio/wav", a.length.toLong),
      MediaItem(2L, gain, "audio/wav", gain.length.toLong),
      MediaItem(3L, trim, "audio/wav", trim.length.toLong),
      MediaItem(4L, other, "audio/wav", other.length.toLong)).toDS()
    val sig = Multimodal.audioSignatures(items, window = W).toDF()
    val byId = sig.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    // gain invariance is EXACT: same windows, same hashes, same order
    assert(byId(1L).toSet.map((t: (Long, Int, Long)) => (t._2, t._3)) ==
      byId(2L).toSet.map((t: (Long, Int, Long)) => (t._2, t._3)),
      "a 5/4 gain must not move one signature hash")
    val pairs = Multimodal.videoNearDupPairs(sig, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) == 1.0,
      s"gain copy must pair at Jaccard 1: $pairs")
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) >= 0.5,
      s"whole-window trim must still pair: $pairs")
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated recording must stay unpaired: $pairs")
    // the non-audio degrade path still produces a usable signature
    val textItem = Seq(MediaItem(9L, ("z" * 5000).getBytes("UTF-8"),
      "text/plain", 5000L)).toDS()
    assert(Multimodal.audioSignatures(textItem, window = W).count() == 4L)
  }

  test("video near-dup: a trimmed + brightness-shifted re-encode of a " +
    "real MJPEG AVI pairs at its frame-overlap Jaccard; unrelated " +
    "video stays unpaired; maxDf drops hot-frame-only pairs") {
    import s.implicits._
    def le32(v: Int): Array[Byte] = Array(
      (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte)
         else Array.empty[Byte])
    def list(tp: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", tp.getBytes("US-ASCII") ++ children)
    def avi(w: Int, h: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      val avih = new Array[Byte](56)
      le32(w).copyToArray(avih, 32); le32(h).copyToArray(avih, 36)
      val body = "AVI ".getBytes("US-ASCII") ++
        list("hdrl", chunk("avih", avih)) ++
        list("movi", frames.flatMap(f => chunk("00dc", f)).toArray)
      "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    }
    // textured frames (a solid color would DCT to the same hash for
    // every frame); shift = the re-encode/brightness perturbation the
    // per-frame pHash must absorb (pinned for images above)
    def frame(seed: Int, shift: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 48,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val g0 = (x * 7 + y * 13 + seed * 57) % 199 + shift
        val g = math.min(255, math.max(0, g0))
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val a = avi(64, 48, Seq(frame(1, 0), frame(2, 0), frame(3, 0),
      frame(4, 0)))
    val bTrim = avi(64, 48, Seq(frame(2, 2), frame(3, 2), frame(4, 2)))
    val cOther = avi(64, 48, Seq(frame(9, 0), frame(10, 0)))
    val items = Seq(
      MediaItem(1L, a, "video/avi", a.length.toLong),
      MediaItem(2L, bTrim, "video/avi", bTrim.length.toLong),
      MediaItem(3L, cOther, "video/avi", cOther.length.toLong)).toDS()
    val fh = Multimodal.frameHashes(items, frameSize = 4096, stride = 1)
    // real demux: one hash per frame
    val counts = fh.groupBy("id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(1L -> 4L, 2L -> 3L, 3L -> 2L))
    val pairs = Multimodal.videoNearDupPairs(fh, threshold = 0.5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(pairs.keySet == Set((1L, 2L)),
      s"only the trim should pair: ${pairs.keySet}")
    assert(pairs((1L, 2L)) == ((3L, 0.75)),
      "3 shared frames over a 4-frame union")
    // hot-frame cap: plant one frame hash shared by ALL videos; with
    // maxDf=2 it leaves the universe, so a pair sharing ONLY it drops
    val hot = Seq((1L, 0, 42L), (2L, 0, 42L), (3L, 0, 42L),
      (4L, 0, 42L), (4L, 1, 77L))
      .toDF("id", "frame_index", "fhash")
    val uncapped = Multimodal.videoNearDupPairs(hot, threshold = 0.3)
    assert(uncapped.count() == 6L, "all pairs share the hot frame")
    val capped = Multimodal
      .videoNearDupPairs(hot, threshold = 0.3, maxDf = 2)
    assert(capped.count() == 0L,
      "sub-cap universe holds no shared frames")
  }
}
