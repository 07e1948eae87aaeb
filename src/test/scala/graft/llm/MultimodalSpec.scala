package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val jpegMagic = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe0.toByte)
  private val pngMagic = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47)

  test("metadata: byte length, stable content id, magic-byte modality sniff") {
    val df = Seq(
      (1L, jpegMagic ++ Array[Byte](1, 2, 3)),
      (2L, pngMagic ++ Array[Byte](9)),
      (3L, "plain text".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val out = Multimodal.withMetadata(df).select("doc_id", "meta.*")
      .orderBy("doc_id").collect()
    assert(out(0).getAs[String]("modality") === "image/jpeg")
    assert(out(0).getAs[Int]("byte_len") === 7)
    assert(out(1).getAs[String]("modality") === "image/png")
    assert(out(2).getAs[String]("modality") === "application/octet-stream")
    assert(out(2).getAs[String]("content_id").matches("[0-9a-f]{16}"))
  }

  test("decodeFeatures: partition-batch decode yields fixed-dim deterministic features") {
    val df = Seq((1L, Array[Byte](10, 20, 30)), (2L, Array[Byte](10, 20, 30)))
      .toDF("doc_id", "payload")
    val out = Multimodal.decodeFeatures(df, "doc_id").orderBy("doc_id").collect()
    assert(out.length === 2)
    val f1 = out(0).getSeq[Float](2)
    val f2 = out(1).getSeq[Float](2)
    assert(f1.size === Multimodal.StubDecoder.featureDim)
    assert(f1 === f2) // deterministic stub
    assert(out(0).getAs[Int]("byte_len") === 3)
    assert(math.abs(f1.head - 10 / 255.0f) < 1e-6)
  }

  test("stripeSums (columnar) agrees with decodeFeatures (mapPartitions) exactly") {
    val df = Seq(
      (1L, Array[Byte](10, 20, 30)),
      (2L, (0 until 100).map(i => (i * 7 % 256).toByte).toArray),
      (3L, Array.empty[Byte]),
      (4L, "multi byte ünïcödé payload".getBytes("UTF-8"))
    ).toDF("doc_id", "payload")
    val cols = Multimodal.stripeSums(df, "doc_id").orderBy("doc_id").collect()
    val rows = Multimodal.decodeFeatures(df, "doc_id").orderBy("doc_id").collect()
    val d = Multimodal.StubDecoder.featureDim
    cols.zip(rows).foreach { case (c, r) =>
      assert(c.getLong(0) === r.getLong(0))
      assert(c.getAs[Long]("byte_len") === r.getAs[Int]("byte_len").toLong)
      val feats = r.getSeq[Float](2)
      (0 until d).foreach { j =>
        val s = c.getAs[Long](s"s$j")
        assert(feats(j) === (s / 255.0).toFloat,
          s"doc ${c.getLong(0)} stripe $j: columnar $s vs feature ${feats(j)}")
      }
    }
  }

  test("resize: nearest-neighbor byte decimation, upsampling, empty payload") {
    val df = Seq(
      (1L, (0 until 64).map(_.toByte).toArray), // 64 → 32: every 2nd byte
      (2L, Array[Byte](10, 20)),                // 2 → 32: upsample, 16× each
      (3L, Array.empty[Byte])                   // empty → empty
    ).toDF("doc_id", "payload")
    val got = Multimodal.resize(df, "doc_id", outBytes = 32)
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Array[Byte]]("resized").toSeq ===
      (0 until 64 by 2).map(_.toByte))
    assert(got(1).getAs[Array[Byte]]("resized").toSeq ===
      (Seq.fill(16)(10.toByte) ++ Seq.fill(16)(20.toByte)))
    assert(got(2).getAs[Array[Byte]]("resized").length === 0)
    assert(got.map(_.getAs[Long]("byte_len")).toSeq === Seq(64L, 2L, 0L))
  }

  test("aHash: bits follow the exact mean rule on a handcrafted payload") {
    // 64 bytes: first 32 are 0, last 32 are 100 → mean 50; bit j = 1 iff
    // byte j > 50 → bits 32..63 set. Chunks 0,1 = 0; chunks 2,3 = 0xFFFF.
    val payload = (Array.fill(32)(0.toByte) ++ Array.fill(32)(100.toByte))
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
    val r = Multimodal.aHash(df, "doc_id").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((0L, 0L, 0xFFFFL, 0xFFFFL)))
  }

  test("aHash: uniform payload hashes to all-zero bits; empty payload drops") {
    val df = Seq(
      (1L, Array.fill(100)(7.toByte)),   // p·64 > Σp never strict → 0
      (2L, Array.empty[Byte])
    ).toDF("doc_id", "payload")
    val rows = Multimodal.aHash(df, "doc_id").collect()
    assert(rows.length === 1 && rows.head.getLong(0) === 1L)
    assert((1 to 4).forall(i => rows.head.getLong(i) === 0L))
  }

  test("aHash: >34MB payload (63·n overflows 32-bit) matches the long-math reference") {
    // regression: srcByte computed j·n in Int; 63·n wraps negative past
    // ~34 MB, corrupting the sampled bytes. 40 MB exercises the wrap.
    val n = 40 * 1024 * 1024
    val payload = Array.tabulate(n)(i => ((i * 31 + i / 1013) % 251).toByte)
    val sampled = Array.tabulate(64)(j => payload(((j.toLong * n) / 64).toInt) & 0xff)
    val tot = sampled.map(_.toLong).sum
    val want = (0 until 4).map { c =>
      (0 until 16).map(k =>
        if (sampled(c * 16 + k) * 64L > tot) 1L << k else 0L).sum
    }
    val df = Seq((1L, payload)).toDF("doc_id", "payload")
    val r = Multimodal.aHash(df, "doc_id").collect().head
    assert((1 to 4).map(r.getLong) === want)
  }

  test("phashNearDups: identical and 1-byte-flip payloads pair; distinct don't") {
    val base = (0 until 256).map(_.toByte).toArray
    val flip = base.clone(); flip(10) = (flip(10) ^ 0x01).toByte
    val other = (0 until 256).map(i => (i * 37 % 251).toByte).toArray
    val df = Seq((1L, base), (2L, base.clone()), (3L, flip), (4L, other))
      .toDF("doc_id", "payload")
    val pairs = Multimodal.phashNearDups(df, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) === 0L)
    // the flipped byte moves at most one resampled pixel past the mean
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 3L)
    assert(!pairs.keys.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("sampleFrames: fixed-size frames, stride sampling, correct slicing") {
    val payload = (1 to 40).map(_.toByte).toArray // 40 bytes → 3 frames of 16
    val df = Seq((7L, payload)).toDF("doc_id", "payload")
    val out = Multimodal.sampleFrames(df, "doc_id", frameBytes = 16, stride = 2)
      .orderBy("frame_idx").collect()
    // frames 0,1,2 exist; stride 2 keeps 0 and 2
    assert(out.map(_.getAs[Int]("frame_idx")).toSeq === Seq(0, 2))
    assert(out(0).getAs[Array[Byte]]("frame").toSeq === payload.slice(0, 16).toSeq)
    assert(out(1).getAs[Array[Byte]]("frame").toSeq === payload.slice(32, 40).toSeq)
    assert(out(0).getAs[Int]("n_frames") === 3)
  }

  test("imageStats: decoded w/h/sum/min/max; undecodable rows emit nothing") {
    val px = Array(10, 250, 30, 70, 0, 255) // 3x2
    val rows = Seq(
      (1L, Codecs.ImageIoCodec.encodeGrayPng(px, 3, 2)),
      (2L, "not an image".getBytes))
    val out = Multimodal.imageStats(rows.toDF("doc_id", "payload"), "doc_id")
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
      r.getLong(4), r.getInt(5), r.getInt(6)) ===
      ((1L, 3, 2, 6L, px.map(_.toLong).sum, 0, 255)))
  }

  test("thumbnail: 2-D nearest-neighbor resample, lossless PNG round-trip") {
    // 4x4 source with distinct quadrant values; 2x2 thumb reads (0,0),
    // (2,0), (0,2), (2,2)
    val src = Array(
      11, 12, 21, 22,
      13, 14, 23, 24,
      31, 32, 41, 42,
      33, 34, 43, 44)
    val df = Seq((5L, Codecs.ImageIoCodec.encodeGrayPng(src, 4, 4)))
      .toDF("doc_id", "payload")
    val out = Multimodal.thumbnail(df, "doc_id", outW = 2, outH = 2).collect()
    assert(out.length === 1)
    val thumb = out.head.getAs[Array[Byte]]("thumb")
    val Some((got, w, h)) = Codecs.ImageIoCodec.grayPixels(thumb)
    assert((w, h) === ((2, 2)))
    assert(got.toSeq === Seq(11, 21, 31, 41))
  }

  test("AnyImageCodec: identical pixels hash identically across BMP and PNG") {
    val px = Array.tabulate(64)(k => if (k % 3 == 0) 220 else 35)
    val png = Codecs.ImageIoCodec.encodeGrayPng(px, 8, 8)
    // 8x8 24-bpp bottom-up BMP of the same pixels (r=g=b → gray exact)
    val rowBytes = 24
    val bmpOut = new java.io.ByteArrayOutputStream()
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Long) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    bmpOut.write('B'); bmpOut.write('M')
    bmpOut.write(le32(54L + rowBytes * 8)); bmpOut.write(le32(0)); bmpOut.write(le32(54))
    bmpOut.write(le32(40)); bmpOut.write(le32(8)); bmpOut.write(le32(8))
    bmpOut.write(le16(1)); bmpOut.write(le16(24)); bmpOut.write(le32(0))
    bmpOut.write(new Array[Byte](20))
    for (y <- 7 to 0 by -1; x <- 0 until 8) {
      val g = px(y * 8 + x); bmpOut.write(g); bmpOut.write(g); bmpOut.write(g)
    }
    val bmp = bmpOut.toByteArray
    val hPng = Codecs.AnyImageCodec.aHash64(png).get.toSeq
    val hBmp = Codecs.AnyImageCodec.aHash64(bmp).get.toSeq
    assert(hPng === hBmp)
    assert(Codecs.AnyImageCodec.grayPixels(bmp).get._1.toSeq === px.toSeq)
  }
}
