package graft.llm

import graft.SparkSpec
import java.io.ByteArrayOutputStream

class CodecsSpec extends SparkSpec {
  import spark.implicits._

  // ---- binary builders (little-endian, like the formats) ----
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Canonical PCM16 mono WAV; optionally with a LIST chunk BEFORE
    * `data` so the parser must actually walk chunks.
    */
  private def wavBytes(samples: Seq[Int], extraChunk: Boolean = false,
                       audioFormat: Int = 1): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val data = samples.flatMap(s => le16(s & 0xffff)).toArray
    val list = if (extraChunk) "LIST".getBytes ++ le32(4) ++ "INFO".getBytes
               else Array.empty[Byte]
    val fmt = "fmt ".getBytes ++ le32(16) ++ le16(audioFormat) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val body = fmt ++ list ++ "data".getBytes ++ le32(data.length) ++ data
    out.write("RIFF".getBytes); out.write(le32(4 + body.length))
    out.write("WAVE".getBytes); out.write(body)
    out.toByteArray
  }

  /** 24-bpp BMP from top-down row-major (r,g,b) pixels; written
    * bottom-up with 4-byte row padding unless `topDown`.
    */
  private def bmpBytes(w: Int, h: Int, rgb: Int => (Int, Int, Int),
                       topDown: Boolean = false): Array[Byte] = {
    val rowBytes = ((w * 3 + 3) / 4) * 4
    val out = new ByteArrayOutputStream()
    out.write('B'); out.write('M')
    out.write(le32(54L + rowBytes.toLong * h)) // file size
    out.write(le32(0)); out.write(le32(54))    // reserved, data offset
    out.write(le32(40)); out.write(le32(w.toLong))
    out.write(le32(if (topDown) (-h).toLong & 0xffffffffL else h.toLong))
    out.write(le16(1)); out.write(le16(24))    // planes, bpp
    out.write(le32(0))                         // BI_RGB
    out.write(new Array[Byte](20))             // size/res/colors = 0
    val rows = if (topDown) 0 until h else (h - 1) to 0 by -1
    for (y <- rows) {
      for (x <- 0 until w) {
        val (r, g, b) = rgb(y * w + x)
        out.write(b); out.write(g); out.write(r) // BGR on disk
      }
      out.write(new Array[Byte](rowBytes - w * 3))
    }
    out.toByteArray
  }

  test("WavCodec: chunk walk finds data past a LIST chunk; stripes sum |amplitude|") {
    val samples = Seq(100, -200, 300, -400, 500, -600, 700, -800, 900, -1000)
    for (extra <- Seq(false, true)) {
      val sums = Codecs.WavCodec.stripeSums(wavBytes(samples, extraChunk = extra))
      val want = Array.tabulate(8)(j =>
        samples.zipWithIndex.filter(_._2 % 8 == j).map(s => math.abs(s._1).toLong).sum)
      assert(sums.toSeq === want.toSeq, s"extraChunk=$extra")
    }
  }

  test("WavCodec: non-PCM, truncated, and foreign payloads decode to zero sums") {
    assert(Codecs.WavCodec.stripeSums(wavBytes(Seq(5, 5), audioFormat = 3))
      .forall(_ == 0L)) // IEEE float fmt — not PCM16
    assert(Codecs.WavCodec.stripeSums(wavBytes(Seq(5, 5)).take(20)).forall(_ == 0L))
    assert(Codecs.WavCodec.stripeSums("not a wav at all".getBytes).forall(_ == 0L))
    assert(Codecs.WavCodec.stripeSums(null).forall(_ == 0L))
  }

  test("WavCodec: a short fmt chunk (declared size < 16) cannot validate PCM16") {
    // fmt declares only 4 bytes, so the format/bits fields land inside
    // the FOLLOWING chunk's bytes — a parser that reads them anyway can
    // falsely see PCM16 and decode garbage. Craft exactly that trap:
    // the 4 fmt payload bytes then a "pcmx" chunk whose first bytes
    // spell audioFormat=1, and bits=16 lands at the would-be offset.
    val data = Seq(7, -9).flatMap(s => le16(s & 0xffff)).toArray
    val shortFmt = "fmt ".getBytes ++ le32(4) ++ le16(1) ++ le16(1)
    val decoy = "pcmx".getBytes ++ le32(10) ++
      le16(1) ++ le32(8000) ++ le32(0x10000L) // bits-offset bytes = 16
    val body = shortFmt ++ decoy ++ "data".getBytes ++ le32(data.length) ++ data
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes); out.write(le32(4 + body.length))
    out.write("WAVE".getBytes); out.write(body)
    assert(Codecs.WavCodec.pcm16Data(out.toByteArray).isEmpty)
    assert(Codecs.WavCodec.stripeSums(out.toByteArray).forall(_ == 0L))
  }

  test("WavCodec: only the FIRST fmt chunk counts; a duplicate cannot overwrite it") {
    // first fmt says IEEE-float (format 3) → not PCM16; a second fmt
    // claiming PCM must NOT resurrect the payload
    val data = Seq(11, -13).flatMap(s => le16(s & 0xffff)).toArray
    val fmtFloat = "fmt ".getBytes ++ le32(16) ++ le16(3) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val fmtPcm = "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
      le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    val body = fmtFloat ++ fmtPcm ++ "data".getBytes ++ le32(data.length) ++ data
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes); out.write(le32(4 + body.length))
    out.write("WAVE".getBytes); out.write(body)
    assert(Codecs.WavCodec.pcm16Data(out.toByteArray).isEmpty)
    assert(Codecs.WavCodec.stripeSums(out.toByteArray).forall(_ == 0L))
  }

  test("BmpCodec: bottom-up padded rows decode to top-down grayscale; top-down too") {
    // 2x2: distinct channel mixes; gray = (299r + 587g + 114b) div 1000
    val px = Array((255, 0, 0), (0, 255, 0), (0, 0, 255), (100, 100, 100))
    val wantGray = Array(76, 149, 29, 100)
    for (topDown <- Seq(false, true)) {
      val (gray, w, h) =
        Codecs.BmpCodec.grayPixels(bmpBytes(2, 2, px(_), topDown)).get
      assert((w, h) === ((2, 2)))
      assert(gray.toSeq === wantGray.toSeq, s"topDown=$topDown")
    }
    val sums = Codecs.BmpCodec.stripeSums(bmpBytes(2, 2, px(_)))
    assert(sums.take(4).toSeq === wantGray.map(_.toLong).toSeq &&
      sums.drop(4).forall(_ == 0L))
  }

  test("BmpCodec.aHash64: half-dark/half-bright 8x8 sets exactly the bright bits") {
    // rows 0..3 dark (10), rows 4..7 bright (200): mean 105 → bits 32..63
    val img = bmpBytes(8, 8, i => { val v = if (i / 8 < 4) 10 else 200; (v, v, v) })
    val ph = Codecs.BmpCodec.aHash64(img).get
    assert(ph.toSeq === Seq(0L, 0L, 0xFFFFL, 0xFFFFL))
    assert(Codecs.BmpCodec.aHash64("BMnot really".getBytes ++ new Array[Byte](60)).isEmpty)
  }

  test("BmpCodec: corrupt huge-width header decodes to None, never crashes") {
    // width 0x2AAAAAAB: width*3 wraps negative in Int — the Long bounds
    // check must reject it instead of NegativeArraySizeException
    val out = new ByteArrayOutputStream()
    out.write('B'); out.write('M')
    out.write(le32(246)); out.write(le32(0)); out.write(le32(54))
    out.write(le32(40)); out.write(le32(0x2AAAAAABL))   // width
    out.write(le32(3))                                  // height
    out.write(le16(1)); out.write(le16(24)); out.write(le32(0))
    out.write(new Array[Byte](40))
    val p = out.toByteArray
    assert(Codecs.BmpCodec.grayPixels(p).isEmpty)
    assert(Codecs.BmpCodec.stripeSums(p).forall(_ == 0L))
    // Int.MinValue height (abs() stays negative) must also reject
    val out2 = new ByteArrayOutputStream()
    out2.write('B'); out2.write('M')
    out2.write(le32(246)); out2.write(le32(0)); out2.write(le32(54))
    out2.write(le32(40)); out2.write(le32(8))
    out2.write(le32(0x80000000L))                       // height = Int.MinValue
    out2.write(le16(1)); out2.write(le16(24)); out2.write(le32(0))
    out2.write(new Array[Byte](40))
    assert(Codecs.BmpCodec.grayPixels(out2.toByteArray).isEmpty)
  }

  test("BmpCodec.aHash64 resamples larger images to the 8x8 grid") {
    // 16x16 left-dark right-bright: gx = (j%8)*16/8 = 2(j%8) → bits set
    // iff column half is bright → each row contributes 0xF0 pattern
    val img = bmpBytes(16, 16, i => { val v = if (i % 16 < 8) 0 else 255; (v, v, v) })
    val ph = Codecs.BmpCodec.aHash64(img).get
    // per 8-pixel row: bits 4..7 set → nibble 0xF0; two rows per chunk
    assert(ph.toSeq === Seq(0xF0F0L, 0xF0F0L, 0xF0F0L, 0xF0F0L))
  }

  test("WavCodec.frameStats: frames reduce (n, sum|s|, max|s|); short tail frame kept") {
    val samples = Seq(100, -300, 200, 50, 7000, -1) // 2 frames of 4 → tail of 2
    val stats = Codecs.WavCodec.frameStats(wavBytes(samples), frameSamples = 4)
    assert(stats.toSeq === Seq((4, 650L, 300), (2, 7001L, 7000)))
    assert(Codecs.WavCodec.frameStats("nope".getBytes, 4).isEmpty)
    val one = Multimodal.wavFrameEnergy(
      Seq((9L, wavBytes(samples))).toDF("doc_id", "payload"), "doc_id",
      frameSamples = 4).orderBy("frame_idx").collect()
    assert(one.map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
      === Seq((0L, 4L, 650L, 300L), (1L, 2L, 7001L, 7000L)))
  }

  test("SniffCodec routes by magic: WAV decodes samples, BMP pixels, text raw bytes") {
    val wav = wavBytes(Seq(1000, -1000))
    val bmp = bmpBytes(2, 2, _ => (50, 50, 50))
    val txt = "plain text payload".getBytes
    assert(Codecs.SniffCodec.stripeSums(wav).toSeq ===
      Codecs.WavCodec.stripeSums(wav).toSeq)
    assert(Codecs.SniffCodec.stripeSums(bmp).toSeq ===
      Codecs.BmpCodec.stripeSums(bmp).toSeq)
    assert(Codecs.SniffCodec.stripeSums(txt).toSeq ===
      Multimodal.StubDecoder.stripeSums(txt).toSeq)
    // and the stub's result differs from a codec decode (raw header bytes)
    assert(Codecs.SniffCodec.stripeSums(wav).toSeq !==
      Multimodal.StubDecoder.stripeSums(wav).toSeq)
  }

  test("decodeStripeSums / decodedAHash: DataFrame faces over a mixed corpus") {
    val rows = Seq(
      (1L, wavBytes(Seq(100, 200, 300))),
      (2L, bmpBytes(8, 8, i => { val v = if (i / 8 < 4) 10 else 200; (v, v, v) })),
      (3L, "just text".getBytes))
    val df = rows.toDF("doc_id", "payload")
    val sums = Multimodal.decodeStripeSums(df, "doc_id", codec = Codecs.SniffCodec)
      .orderBy("doc_id").collect()
    assert(sums.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L))
    assert(sums(0).getLong(2) === 100L && sums(0).getLong(3) === 200L)
    val ah = Multimodal.decodedAHash(df, "doc_id").collect()
    assert(ah.length === 1 && ah.head.getLong(0) === 2L) // only the BMP decodes
    assert((1 to 4).map(ah.head.getLong) === Seq(0L, 0L, 0xFFFFL, 0xFFFFL))
  }

  // ---- ImageIoCodec (JPEG/PNG/GIF/TIFF via headless javax.imageio) ----

  test("ImageIoCodec: PNG round-trips gray pixels losslessly; stripes sum by column") {
    val px = Array.tabulate(64)(k => (5 + (k % 8) * 3 + (k / 8) * 11) % 256)
    val png = Codecs.ImageIoCodec.encodeGrayPng(px, 8, 8)
    assert(Codecs.isPng(png))
    val Some((got, w, h)) = Codecs.ImageIoCodec.grayPixels(png)
    assert((w, h) === ((8, 8)))
    assert(got.toSeq === px.toSeq)
    val want = Array.tabulate(8)(j =>
      px.zipWithIndex.filter(_._2 % 8 == j).map(_._1.toLong).sum)
    assert(Codecs.ImageIoCodec.stripeSums(png).toSeq === want.toSeq)
  }

  test("ImageIoCodec: fixed PNG binary decodes to the pinned gray pixels") {
    // 4x2 TYPE_BYTE_GRAY png of (10,200,30,250 / 0,255,128,64),
    // generated once via ImageIO and frozen — catches JDK-decode or
    // raster-read drift, independent of the encoder
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAQAAAACCAAAAABawyK/AAAAEklEQVR4XmPg" +
      "OiH3i4Hhf4MDABGPA6oGPVBMAAAAAElFTkSuQmCC")
    val Some((got, w, h)) = Codecs.ImageIoCodec.grayPixels(png)
    assert((w, h) === ((4, 2)))
    assert(got.toSeq === Seq(10, 200, 30, 250, 0, 255, 128, 64))
  }

  test("ImageIoCodec: fixed RGB PNG reduces raster samples by the BmpCodec luma rule") {
    // 2x1 TYPE_INT_RGB png of (r200,g100,b50),(r10,g20,b30) — lumas
    // (200*299+100*587+50*114)/1000 = 124 and 18
    val png = java.util.Base64.getDecoder.decode(
      "iVBORw0KGgoAAAANSUhEUgAAAAIAAAABCAIAAAB7QOjdAAAAD0lEQVR4XmM4" +
      "kWLEJSIHAAfXAZsNcffXAAAAAElFTkSuQmCC")
    val Some((got, w, h)) = Codecs.ImageIoCodec.grayPixels(png)
    assert((w, h) === ((2, 1)))
    assert(got.toSeq === Seq(124, 18))
  }

  test("ImageIoCodec: JPEG q1.0 checkerboard decodes within ±2 and aHash matches the rule") {
    val px = Array.tabulate(64)(k => if ((k % 8 + k / 8) % 2 == 1) 224 else 32)
    val jpg = Codecs.ImageIoCodec.encodeGrayJpeg(px, 8, 8)
    assert(Codecs.isJpeg(jpg))
    val Some((got, _, _)) = Codecs.ImageIoCodec.grayPixels(jpg)
    assert(got.zip(px).forall { case (g, p) => math.abs(g - p) <= 2 },
      s"q1.0 decode drifted: ${got.toSeq} vs ${px.toSeq}")
    // mean = 128 exactly; bits = the 224 squares regardless of ±2 noise
    val want = Array.tabulate(4) { c =>
      (0 until 16).map { k =>
        if (px(c * 16 + k) == 224) 1L << k else 0L
      }.sum
    }
    assert(Codecs.ImageIoCodec.aHash64(jpg).get.toSeq === want.toSeq)
  }

  test("ImageIoCodec: malformed, truncated, and foreign payloads decode to zero sums") {
    val png = Codecs.ImageIoCodec.encodeGrayPng(Array.fill(16)(100), 4, 4)
    assert(Codecs.ImageIoCodec.grayPixels(png.take(20)).isEmpty) // truncated
    // magic intact, every chunk destroyed (a single flipped body byte
    // may legitimately still decode — the JDK reader ignores CRCs)
    val corrupt = png.clone()
    java.util.Arrays.fill(corrupt, 12, corrupt.length, 0.toByte)
    assert(Codecs.ImageIoCodec.stripeSums(corrupt).forall(_ == 0L))
    assert(Codecs.ImageIoCodec.grayPixels("not an image".getBytes).isEmpty)
    assert(Codecs.ImageIoCodec.grayPixels(null).isEmpty)
    assert(Codecs.ImageIoCodec.stripeSums(null).forall(_ == 0L))
    // JPEG magic with garbage body: reader throws internally → None
    val fakeJpg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 1, 2, 3)
    assert(Codecs.ImageIoCodec.grayPixels(fakeJpg).isEmpty)
  }

  test("ImageIoCodec: GIF palette indices resolve through the IndexColorModel") {
    // GIF writers always palettize — the raster sample is an INDEX,
    // not a gray value. A white/black 2x1 image whose palette happens
    // to order white first decodes to raw samples {0,1}; the codec
    // must return the palette's gray values {255,0} (or the same image
    // re-encoded as PNG won't hash identically).
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setSample(0, 0, 0, 255)
    img.getRaster.setSample(1, 0, 0, 0)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", out))
    val gif = out.toByteArray
    assert(Codecs.isGif(gif))
    val Some((got, w, h)) = Codecs.ImageIoCodec.grayPixels(gif)
    assert((w, h) === ((2, 1)))
    assert(got.toSeq === Seq(255, 0))
    // cross-format contract: the SAME pixels as PNG hash identically
    val png = Codecs.ImageIoCodec.encodeGrayPng(Array(255, 0), 2, 1)
    assert(Codecs.AnyImageCodec.aHash64(gif).get.toSeq ===
      Codecs.AnyImageCodec.aHash64(png).get.toSeq)
  }

  test("ImageIoCodec: 16-bit gray samples down-shift to the 0-255 contract") {
    // TYPE_USHORT_GRAY png: samples 0..65535; the codec must emit
    // sample >> 8, never the raw 16-bit value (stripe sums, aHash and
    // imageStats all assume 0-255 grays)
    val img = new java.awt.image.BufferedImage(
      2, 1, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    img.getRaster.setSample(0, 0, 0, 65535)
    img.getRaster.setSample(1, 0, 0, 1000)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", out))
    val Some((got, w, h)) = Codecs.ImageIoCodec.grayPixels(out.toByteArray)
    assert((w, h) === ((2, 1)))
    assert(got.toSeq === Seq(255, 1000 >> 8))
  }

  test("ImageIoCodec: hostile header dims are rejected before decode") {
    // a PNG whose IHDR declares 60000x60000 (~3.6e9 px) from a ~70-byte
    // payload: the header probe must bail before ImageIO allocates the
    // raster (OutOfMemoryError is not NonFatal — it would kill a stage)
    val png = Codecs.ImageIoCodec.encodeGrayPng(Array.fill(4)(7), 2, 2)
    val huge = png.clone()
    def putDim(off: Int, v: Int): Unit = {
      huge(off) = ((v >> 24) & 0xff).toByte; huge(off + 1) = ((v >> 16) & 0xff).toByte
      huge(off + 2) = ((v >> 8) & 0xff).toByte; huge(off + 3) = (v & 0xff).toByte
    }
    putDim(16, 60000) // IHDR width at byte 16, height at 20
    putDim(20, 60000)
    assert(Codecs.ImageIoCodec.grayPixels(huge).isEmpty)
    assert(Codecs.ImageIoCodec.stripeSums(huge).forall(_ == 0L))
    // the bound itself: exactly MaxPixels-sized dims still pass the gate
    assert(2L * 2L < Codecs.ImageIoCodec.MaxPixels)
    assert(Codecs.ImageIoCodec.grayPixels(png).nonEmpty)
  }

  test("SniffCodec routes JPEG/PNG to ImageIoCodec, not the raw-byte stub") {
    val px = Array.tabulate(64)(k => k * 4 % 256)
    val png = Codecs.ImageIoCodec.encodeGrayPng(px, 8, 8)
    val jpg = Codecs.ImageIoCodec.encodeGrayJpeg(px, 8, 8)
    assert(Codecs.SniffCodec.stripeSums(png).toSeq ===
      Codecs.ImageIoCodec.stripeSums(png).toSeq)
    assert(Codecs.SniffCodec.stripeSums(jpg).toSeq ===
      Codecs.ImageIoCodec.stripeSums(jpg).toSeq)
    assert(Codecs.SniffCodec.stripeSums(png).toSeq !==
      Multimodal.StubDecoder.stripeSums(png).toSeq)
  }
}
