package graft.llm

import graft.llm.Multimodal.MediaCodec

/** REAL media decoders for the [[Multimodal.MediaCodec]] seam:
  *
  *  - [[WavCodec]]: RIFF/WAVE chunk walk → 16-bit PCM samples →
  *    per-stripe summed |amplitude| (exact integers) — pure JVM byte
  *    parse, zero libraries;
  *  - [[BmpCodec]]: BITMAPFILEHEADER/INFOHEADER → 24-bpp pixel rows
  *    (bottom-up, 4-byte padded) → integer grayscale → per-stripe sums
  *    and a true 8×8 average-hash over DECODED pixels — pure JVM byte
  *    parse;
  *  - [[ImageIoCodec]]: COMPRESSED image formats (JPEG/PNG/GIF/TIFF)
  *    through the JDK's headless `javax.imageio` readers — decoded
  *    RASTER samples (never `getRGB`'s colorspace-converted view) →
  *    integer grayscale → the same stripe-sum / aHash faces as
  *    [[BmpCodec]] (the shared [[ImageCodec]] trait keeps the two
  *    bit-compatible);
  *  - [[SniffCodec]]: magic-byte routing (the per-modality dispatch of
  *    a mixed-corpus pipeline) — WAV, BMP, JPEG, PNG, GIF and TIFF
  *    decode for real; only truly-unknown formats fall back to
  *    [[Multimodal.StubDecoder]]'s raw byte sums (video containers —
  *    MP4/MKV — still need ffmpeg, which this container does not
  *    ship).
  *
  * All decoders are deterministic, null-safe, and integer-exact, so
  * their outputs are oracle-able: the `q_mm_wav_decode` /
  * `q_mm_bmp_ahash` queries construct payloads whose sample/pixel
  * values follow a closed-form arithmetic rule, decode them through
  * the REAL byte-level parser, and DuckDB recomputes the expectation
  * from the rule alone — a compensating construct/parse bug cannot
  * pass because CodecsSpec pins the parsers against handcrafted
  * fixed binaries.
  *
  * Malformed or foreign payloads decode to all-zero sums (a distinct,
  * documented signal) rather than throwing — a 100 TB corpus always
  * contains garbage rows, and one bad blob must not kill a stage.
  */
object Codecs {

  @inline private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  @inline private def leU16(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8)
  @inline private def leI16(b: Array[Byte], i: Int): Int =
    leU16(b, i).toShort.toInt
  @inline private def leU32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)) & 0xffffffffL
  @inline private def leI32(b: Array[Byte], i: Int): Int = leU32(b, i).toInt

  def isWav(p: Array[Byte]): Boolean =
    p != null && p.length >= 12 &&
      p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
      p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E'

  def isBmp(p: Array[Byte]): Boolean =
    p != null && p.length >= 54 && p(0) == 'B' && p(1) == 'M'

  def isJpeg(p: Array[Byte]): Boolean =
    p != null && p.length >= 3 &&
      u8(p, 0) == 0xff && u8(p, 1) == 0xd8 && u8(p, 2) == 0xff

  def isPng(p: Array[Byte]): Boolean =
    p != null && p.length >= 8 &&
      u8(p, 0) == 0x89 && p(1) == 'P' && p(2) == 'N' && p(3) == 'G' &&
      u8(p, 4) == 0x0d && u8(p, 5) == 0x0a && u8(p, 6) == 0x1a && u8(p, 7) == 0x0a

  def isGif(p: Array[Byte]): Boolean =
    p != null && p.length >= 6 &&
      p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8'

  def isTiff(p: Array[Byte]): Boolean =
    p != null && p.length >= 4 &&
      ((p(0) == 'I' && p(1) == 'I' && u8(p, 2) == 42 && u8(p, 3) == 0) ||
       (p(0) == 'M' && p(1) == 'M' && u8(p, 2) == 0 && u8(p, 3) == 42))

  /** Shared grayscale-image face: every image decoder reduces to
    * "top-down row-major gray pixels + dimensions", and the feature /
    * hash rules live HERE, once — [[BmpCodec]] (pure byte parse) and
    * [[ImageIoCodec]] (JDK readers) are bit-compatible by
    * construction, so a corpus mixing BMP thumbnails with JPEG/PNG
    * originals dedups and featurizes on one rule.
    */
  trait ImageCodec extends MediaCodec {
    /** Grayscale pixels in top-down row-major order plus (width,
      * height), or None for undecodable / unsupported / truncated
      * input.
      */
    def grayPixels(p: Array[Byte]): Option[(Array[Int], Int, Int)]

    def stripeSums(p: Array[Byte]): Array[Long] = {
      val out = new Array[Long](featureDim)
      grayPixels(p).foreach { case (px, _, _) =>
        var i = 0
        while (i < px.length) { out(i % featureDim) += px(i).toLong; i += 1 }
      }
      out
    }

    /** True average-hash over DECODED pixels: nearest-neighbor resample
      * of the grayscale image to an 8×8 grid, bit j set iff grid pixel
      * j strictly clears the grid mean (g·64 > Σg — exact integers),
      * packed as four 16-bit chunks (ph0..ph3), the
      * [[DedupOps.hammingNearDupsChunked]] blocking layout. None for
      * undecodable payloads.
      */
    final def aHash64(p: Array[Byte]): Option[Array[Long]] =
      grayPixels(p).map { case (px, w, h) =>
        val grid = Array.tabulate(64) { j =>
          val gx = (j % 8) * w / 8
          val gy = (j / 8) * h / 8
          px(gy * w + gx)
        }
        val tot = grid.map(_.toLong).sum
        Array.tabulate(4) { c =>
          (0 until 16).map { k =>
            if (grid(c * 16 + k) * 64L > tot) 1L << k else 0L
          }.sum
        }
      }
  }

  /** 16-bit PCM WAV: per-stripe summed absolute amplitude. A real RIFF
    * chunk walk (word-aligned chunk sizes, `fmt ` inspected for
    * PCM/16-bit, `data` located wherever it sits) — not an offset-44
    * assumption. Non-PCM / non-16-bit / truncated → zero sums.
    */
  object WavCodec extends MediaCodec {
    val featureDim = 8

    /** (dataOffset, sampleCount) of the PCM16 payload, or None. */
    def pcm16Data(p: Array[Byte]): Option[(Int, Int)] = {
      if (!isWav(p)) return None
      var pos = 12
      var fmt = -1
      var bits = -1
      var dataOff = -1
      var dataLen = 0
      while (pos + 8 <= p.length) {
        val size = leU32(p, pos + 4)
        val id = new String(p, pos, 4, "US-ASCII")
        // only the FIRST well-formed fmt chunk counts (a duplicate must
        // not overwrite it), and its declared size must cover the 16
        // PCM-format bytes we read — a short fmt chunk would otherwise
        // read the NEXT chunk's bytes and falsely validate PCM16
        if (id == "fmt " && fmt < 0 && size >= 16 && pos + 24 <= p.length) {
          fmt = leU16(p, pos + 8)
          bits = leU16(p, pos + 22)
        } else if (id == "data" && dataOff < 0) {
          dataOff = pos + 8
          dataLen = math.min(size, (p.length - dataOff).toLong).toInt
        }
        // chunks are word-aligned; a corrupt size ends the walk cleanly
        val step = 8L + size + (size & 1L)
        if (step <= 0 || pos + step > Int.MaxValue) return None
        pos += step.toInt
      }
      if (dataOff >= 0 && fmt == 1 && bits == 16) Some((dataOff, dataLen / 2))
      else None
    }

    def stripeSums(p: Array[Byte]): Array[Long] = {
      val out = new Array[Long](featureDim)
      pcm16Data(p).foreach { case (off, n) =>
        var i = 0
        while (i < n) {
          out(i % featureDim) += math.abs(leI16(p, off + 2 * i)).toLong
          i += 1
        }
      }
      out
    }

    /** Amplitude features normalize by full scale (32768), not the
      * byte scale the stub uses. */
    override def features(p: Array[Byte]): Array[Float] =
      stripeSums(p).map(s => (s / 32768.0).toFloat)

    /** Per-frame PCM stats — the substrate of silence detection /
      * trimming and clipping checks: frames of `frameSamples` samples
      * (the tail frame may be short), each reduced to
      * (nSamples, Σ|s|, max|s|) in exact integers. Empty for
      * undecodable payloads.
      */
    def frameStats(p: Array[Byte], frameSamples: Int): Array[(Int, Long, Int)] =
      pcm16Data(p) match {
        case None => Array.empty
        case Some((off, n)) =>
          val nFrames = (n + frameSamples - 1) / frameSamples
          Array.tabulate(nFrames) { f =>
            val start = f * frameSamples
            val end = math.min(start + frameSamples, n)
            var sum = 0L
            var mx = 0
            var i = start
            while (i < end) {
              val a = math.abs(leI16(p, off + 2 * i))
              sum += a
              if (a > mx) mx = a
              i += 1
            }
            (end - start, sum, mx)
          }
      }
  }

  /** 24-bpp uncompressed BMP: header parse → padded bottom-up (or
    * top-down, negative height) pixel rows → integer grayscale
    * (r·299 + g·587 + b·114) div 1000. Anything else → zero sums.
    */
  object BmpCodec extends ImageCodec {
    val featureDim = 8

    def grayPixels(p: Array[Byte]): Option[(Array[Int], Int, Int)] = {
      if (!isBmp(p)) return None
      val dataOff = leU32(p, 10)
      val width = leI32(p, 18)
      val height0 = leI32(p, 22)
      val bpp = leU16(p, 28)
      val comp = leU32(p, 30)
      if (bpp != 24 || comp != 0L || width <= 0 || height0 == 0) return None
      // ALL geometry in Long: a corrupt header with width ~2^31/3 makes
      // width*3 (and width*height) wrap negative in Int, sneaking past
      // the bounds check into a NegativeArraySizeException / multi-GB
      // allocation — and one bad blob must not kill a stage
      if (height0 == Int.MinValue) return None
      val height = math.abs(height0)
      val bottomUp = height0 > 0
      val rowBytesL = ((width.toLong * 3 + 3) / 4) * 4
      if (dataOff + rowBytesL * height > p.length) return None
      // the check above bounds width*height ≤ p.length/3 — Int-safe now
      val rowBytes = rowBytesL.toInt
      val out = new Array[Int](width * height)
      var y = 0
      while (y < height) {
        val srcRow = if (bottomUp) height - 1 - y else y
        val rowOff = dataOff.toInt + srcRow * rowBytes
        var x = 0
        while (x < width) {
          val o = rowOff + x * 3
          out(y * width + x) =
            (u8(p, o + 2) * 299 + u8(p, o + 1) * 587 + u8(p, o) * 114) / 1000
          x += 1
        }
        y += 1
      }
      Some((out, width, height))
    }
  }

  /** Compressed image formats (JPEG/PNG/GIF/TIFF) through the JDK's
    * own headless `javax.imageio` readers — no native libraries. The
    * decode reads RASTER SAMPLES, never `getRGB`: `getRGB` routes
    * gray/indexed rasters through a ColorModel → sRGB conversion whose
    * nonlinear gray ramp would silently shift every pixel, while raw
    * samples are the decoded channel values bit for bit (PNG
    * round-trips losslessly; JPEG at encode quality 1.0 is within ±2
    * of source — CodecsSpec pins both). Grayscale rule per band count:
    * 1–2 bands (gray / gray+alpha) take band 0; ≥3 bands (RGB/
    * RGBA) reduce by the same (r·299 + g·587 + b·114) div 1000 luma as
    * [[BmpCodec]] — with palette indices resolved and >8-bit samples
    * down-shifted first (see `grayOf`).
    *
    * Magic-byte gated BEFORE touching ImageIO (a format probe on every
    * garbage blob would be pure overhead at corpus scale), and every
    * decode failure — malformed payload, truncated stream, missing
    * reader — lands on the None/zero-sums contract, not an exception.
    */
  object ImageIoCodec extends ImageCodec {
    val featureDim = 8

    // once per JVM: decode through heap buffers, never ImageIO's
    // on-disk scratch cache (32 executor threads sharing /tmp)
    javax.imageio.ImageIO.setUseCache(false)

    def canDecode(p: Array[Byte]): Boolean =
      isJpeg(p) || isPng(p) || isGif(p) || isTiff(p)

    /** Decode geometry ceiling (16.7M pixels ≈ 4096×4096). Checked
      * against the HEADER dims BEFORE `ImageReader.read` — a ~100-byte
      * crafted PNG/GIF declaring 60000×60000 would otherwise make the
      * reader allocate a multi-GB BufferedImage, and the resulting
      * OutOfMemoryError is not `NonFatal`: one bad blob would kill the
      * stage, the exact failure the module contract forbids (BmpCodec
      * defends the same way with its Long-geometry bound).
      */
    val MaxPixels: Long = 1L << 24

    def grayPixels(p: Array[Byte]): Option[(Array[Int], Int, Int)] = {
      if (!canDecode(p)) return None
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(p))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) return None
          val reader = readers.next()
          try {
            reader.setInput(iis, true, true)
            // header-only dim probe: reject hostile geometry pre-decode
            val w = reader.getWidth(0)
            val h = reader.getHeight(0)
            if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return None
            val img = reader.read(0)
            if (img == null) return None
            Some((grayOf(img, w, h), w, h))
          } finally reader.dispose()
        } finally iis.close()
      } catch {
        case scala.util.control.NonFatal(_) => None // malformed → zero sums
      }
    }

    /** Raster → 0-255 gray. Raw samples by default (see the codec
      * scaladoc), with the two cases where a raw sample is NOT a
      * 0-255 channel value handled explicitly:
      *  - palette-indexed rasters (every GIF, indexed PNG/TIFF): the
      *    sample is a palette INDEX — resolve it through the
      *    `IndexColorModel`'s stored 8-bit entries (a table lookup, no
      *    sRGB ramp) before the luma reduce, else a white/black GIF
      *    decodes as gray {1,0} and the cross-format "identical pixels
      *    hash identically" contract breaks for 100% of GIFs;
      *  - high-bit-depth samples (16-bit PNG/TIFF, 0-65535): down-shift
      *    each band by its declared sample size − 8, else stripe sums /
      *    aHash / imageStats all leave the 0-255 contract.
      */
    private def grayOf(img: java.awt.image.BufferedImage,
                       w: Int, h: Int): Array[Int] = {
      val raster = img.getRaster
      val bands = raster.getNumBands
      val icm = img.getColorModel match {
        case m: java.awt.image.IndexColorModel => m
        case _                                 => null
      }
      val sm = raster.getSampleModel
      def shiftFor(b: Int): Int = math.max(0, sm.getSampleSize(b) - 8)
      val s0 = shiftFor(0)
      val s1 = if (bands >= 3) shiftFor(1) else 0
      val s2 = if (bands >= 3) shiftFor(2) else 0
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) =
            if (icm != null) {
              val idx = raster.getSample(x, y, 0)
              (icm.getRed(idx) * 299 + icm.getGreen(idx) * 587 +
               icm.getBlue(idx) * 114) / 1000
            } else if (bands >= 3)
              ((raster.getSample(x, y, 0) >> s0) * 299 +
               (raster.getSample(x, y, 1) >> s1) * 587 +
               (raster.getSample(x, y, 2) >> s2) * 114) / 1000
            else raster.getSample(x, y, 0) >> s0
          x += 1
        }
        y += 1
      }
      out
    }

    /** Encode top-down row-major gray pixels as a PNG (lossless —
      * [[grayPixels]] returns these exact values back). Fixture /
      * thumbnail-writeback face of the decoder.
      */
    /** Hand-rolled 8-bit grayscale PNG (color type 0, filter 0 per
      * scanline, one zlib IDAT) — the r14 synthesis-side fast path:
      * `ImageIO.write` pays a plugin lookup + BufferedImage + stream
      * per IMAGE, which dominated the per-row encode in
      * Multimodal.synthImages/thumbnail (tens of thousands of 8x8
      * tiles per query). PNG is lossless and the JDK reader decodes
      * any spec-valid stream, so decode-side behavior — the part the
      * oracles and CodecsSpec pin — is unchanged (the round-trip test
      * runs through this encoder). Deterministic: fixed Deflater
      * level, no ancillary chunks.
      */
    def encodeGrayPng(px: Array[Int], w: Int, h: Int): Array[Byte] = {
      require(px.length == w * h, s"expected ${w * h} pixels, got ${px.length}")
      val raw = new Array[Byte](h * (w + 1))
      var p = 0
      var y = 0
      while (y < h) {
        raw(p) = 0 // filter type 0 (None)
        p += 1
        var x = 0
        while (x < w) { raw(p) = (px(y * w + x) & 0xff).toByte; p += 1; x += 1 }
        y += 1
      }
      val defl = new java.util.zip.Deflater()
      defl.setInput(raw)
      defl.finish()
      val comp = new java.io.ByteArrayOutputStream(raw.length / 2 + 32)
      val buf = new Array[Byte](4096)
      while (!defl.finished()) comp.write(buf, 0, defl.deflate(buf))
      defl.end()
      val out = new java.io.ByteArrayOutputStream(comp.size() + 64)
      out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
      def be(i: Int) = Array[Byte](
        (i >>> 24).toByte, (i >>> 16).toByte, (i >>> 8).toByte, i.toByte)
      def chunk(typ: String, data: Array[Byte]): Unit = {
        out.write(be(data.length))
        val tb = typ.getBytes("US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(tb)
        crc.update(data)
        out.write(tb)
        out.write(data)
        out.write(be(crc.getValue.toInt))
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h)
        .put(8.toByte)  // bit depth
        .put(0.toByte)  // color type: grayscale
        .put(0.toByte).put(0.toByte).put(0.toByte) // deflate/adaptive/none
      chunk("IHDR", ihdr.array())
      chunk("IDAT", comp.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** Encode as JPEG at an explicit quality (1.0f ⇒ all-ones quant
      * tables — decoded pixels land within ±2 of source, and exactly
      * on source for DCT-sparse patterns).
      */
    def encodeGrayJpeg(px: Array[Int], w: Int, h: Int,
                       quality: Float = 1.0f): Array[Byte] =
      encodeGray(px, w, h, "jpeg", quality)

    private def encodeGray(px: Array[Int], w: Int, h: Int,
                           format: String, quality: Float): Array[Byte] = {
      require(px.length == w * h, s"expected ${w * h} pixels, got ${px.length}")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, px(y * w + x) & 0xff); x += 1 }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      if (format == "jpeg") {
        val writer = javax.imageio.ImageIO
          .getImageWritersByFormatName("jpeg").next()
        val param = writer.getDefaultWriteParam
        param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        param.setCompressionQuality(quality)
        val ios = javax.imageio.ImageIO.createImageOutputStream(out)
        try {
          writer.setOutput(ios)
          writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
        } finally { ios.close(); writer.dispose() }
      } else {
        javax.imageio.ImageIO.write(img, format, out)
      }
      out.toByteArray
    }
  }

  /** Magic-byte routing over the IMAGE codecs only: BMP to the pure
    * byte parser, JPEG/PNG/GIF/TIFF to the JDK readers — ONE decoded
    * gray-pixel surface for a corpus that stores the same picture in
    * different containers. Identical pixels hash identically through
    * [[ImageCodec.aHash64]] regardless of the on-disk format, which is
    * exactly what cross-format image dedup needs.
    */
  object AnyImageCodec extends ImageCodec {
    val featureDim = 8
    def grayPixels(p: Array[Byte]): Option[(Array[Int], Int, Int)] =
      if (isBmp(p)) BmpCodec.grayPixels(p)
      else ImageIoCodec.grayPixels(p)
  }

  /** Magic-byte routing codec for mixed corpora: decode everything the
    * JVM can (WAV, BMP, JPEG, PNG, GIF, TIFF); only truly-unknown
    * formats fall back to the stub's raw byte sums.
    */
  object SniffCodec extends MediaCodec {
    val featureDim = 8
    private def route(p: Array[Byte]): MediaCodec =
      if (isWav(p)) WavCodec
      else if (isBmp(p)) BmpCodec
      else if (ImageIoCodec.canDecode(p)) ImageIoCodec
      else Multimodal.StubDecoder
    def stripeSums(p: Array[Byte]): Array[Long] = route(p).stripeSums(p)
    override def features(p: Array[Byte]): Array[Float] = route(p).features(p)
  }
}
