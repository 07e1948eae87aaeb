package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus typed metadata, with decode/feature steps structured the
  * way a production pipeline runs them — batch-at-a-time over partitions
  * (the JVM analog of pandas-batch UDFs over mapInPandas).
  *
  * Decoding goes through the pluggable [[MediaCodec]] seam. Audio and
  * images decode FOR REAL — [[graft.llm.Codecs.WavCodec]] (RIFF chunk
  * walk → PCM16 amplitude) and [[graft.llm.Codecs.BmpCodec]] (24-bpp
  * pixels) are pure-JVM byte parsers, [[graft.llm.Codecs.ImageIoCodec]]
  * decodes JPEG/PNG/GIF/TIFF through the JDK's headless `javax.imageio`
  * readers, and [[graft.llm.Codecs.SniffCodec]] routes by magic bytes.
  * Only truly-unknown formats (video containers — MP4/MKV need ffmpeg,
  * absent from this container) fall back to [[StubDecoder]]'s
  * deterministic raw byte sums. Binary schema, metadata extraction,
  * partition-batch shape, and per-modality routing are identical
  * either way (MultimodalSpec, CodecsSpec).
  */
object Multimodal {

  /** Wrap raw string/bytes content as a binary payload column. */
  def asBinary(df: DataFrame, srcCol: String, binCol: String = "payload"): DataFrame =
    df.withColumn(binCol, col(srcCol).cast(BinaryType))

  /** Cheap, codegen'd metadata: byte length, 64-bit content id, and a
    * magic-byte modality sniff (JPEG/PNG/WAV/unknown). Pure column
    * algebra — runs in the scan's WholeStageCodegen span.
    */
  def withMetadata(df: DataFrame, binCol: String = "payload"): DataFrame =
    df.withColumn("meta", struct(
      length(col(binCol)).as("byte_len"),
      substring(md5(col(binCol)), 1, 16).as("content_id"),
      when(substring(hex(col(binCol)), 1, 6) === "FFD8FF", "image/jpeg")
        .when(substring(hex(col(binCol)), 1, 8) === "89504E47", "image/png")
        .when(substring(hex(col(binCol)), 1, 8) === "52494646", "audio/wav")
        .when(substring(hex(col(binCol)), 1, 4) === "424D", "image/bmp")
        .otherwise("application/octet-stream").as("modality")))

  /** The decode seam: a per-payload codec the partition-batch decoder
    * ([[decodeFeatures]]) calls on executors. A production deployment
    * drops in an implementation backed by libjpeg/ffmpeg/soundfile
    * (decode → resample → embed) without touching the Spark plumbing —
    * the schema, partitioning, and batch shape are codec-independent.
    * Implementations must be deterministic per payload (replay safety)
    * and Serializable (the instance ships in the task closure).
    */
  trait MediaCodec extends Serializable {
    /** Length of the feature vector this codec emits. */
    def featureDim: Int
    /** Exact-integer feature accumulators for one payload (null-safe). */
    def stripeSums(payload: Array[Byte]): Array[Long]
    /** Float features, derived from the integer accumulators so the
      * result is independent of evaluation order — one float division
      * at the end, never a float running sum. */
    def features(payload: Array[Byte]): Array[Float] =
      stripeSums(payload).map(s => (s / 255.0).toFloat)
  }

  /** The unknown-format fallback [[MediaCodec]] (audio and images
    * decode for real — see [[graft.llm.Codecs]]): deterministic
    * per-stripe byte sums over the RAW payload (no decode), for the
    * formats nothing in a JVM can open (MP4/MKV video needs ffmpeg).
    * Oracle-able bit for bit — [[stripeSums(df:*]] is its columnar
    * twin — which makes the whole partition-batch pipeline testable
    * without media libraries.
    */
  object StubDecoder extends MediaCodec {
    val featureDim = 8
    def stripeSums(payload: Array[Byte]): Array[Long] = {
      val out = new Array[Long](featureDim)
      if (payload != null) {
        var idx = 0
        while (idx < payload.length) {
          out(idx % featureDim) += (payload(idx) & 0xff).toLong
          idx += 1
        }
      }
      out
    }
  }

  private val featureSchema: StructType =
    StructType(Seq(
      StructField("doc_id", LongType),
      StructField("byte_len", IntegerType),
      StructField("features", ArrayType(FloatType, containsNull = false))))

  /** Batch decode over partitions: the mapInPandas shape — each task
    * pulls a partition iterator, decodes batch-at-a-time, emits typed
    * rows. Partition count (not file count) bounds task count, so the
    * same plan runs on a 1000-executor cluster by repartitioning first.
    * The codec is pluggable ([[MediaCodec]]); the default is the
    * in-container [[StubDecoder]].
    */
  def decodeFeatures(df: DataFrame, idCol: String,
                     binCol: String = "payload",
                     codec: MediaCodec = StubDecoder): DataFrame = {
    val spark = df.sparkSession
    // rows whose id is null (or not long-castable) cannot be keyed —
    // drop them instead of NPE-ing the task on getLong (the 'one bad
    // blob must not kill a stage' contract applies to the id side too)
    val rdd = df.select(col(idCol).cast(LongType), col(binCol))
      .filter(col(idCol).isNotNull).rdd
      .mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          Row(r.getLong(0),
            if (payload == null) 0 else payload.length,
            codec.features(payload).toSeq)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Hash-exact face of a codec decode: per-stripe sums as BIGINT
    * columns (id, byte_len, s0..s{d-1}) — the integer accumulators a
    * DuckDB oracle can recompute, unlike float feature vectors. Same
    * partition-batch shape as [[decodeFeatures]]; with
    * [[graft.llm.Codecs.WavCodec]] / [[graft.llm.Codecs.BmpCodec]] the
    * decode is a REAL byte-level parse, not the stub.
    */
  def decodeStripeSums(df: DataFrame, idCol: String,
                       binCol: String = "payload",
                       codec: MediaCodec = StubDecoder): DataFrame = {
    val spark = df.sparkSession
    val d = codec.featureDim
    val schema = StructType(
      StructField("doc_id", LongType) +:
        StructField("byte_len", LongType) +:
        (0 until d).map(j => StructField(s"s$j", LongType)))
    // rows whose id is null (or not long-castable) cannot be keyed —
    // drop them instead of NPE-ing the task on getLong (the 'one bad
    // blob must not kill a stage' contract applies to the id side too)
    val rdd = df.select(col(idCol).cast(LongType), col(binCol))
      .filter(col(idCol).isNotNull).rdd
      .mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val sums = codec.stripeSums(payload)
          Row.fromSeq(r.getLong(0) +:
            (if (payload == null) 0L else payload.length.toLong) +:
            sums.toSeq)
        }
      }
    spark.createDataFrame(rdd, schema)
      .withColumnRenamed("doc_id", idCol)
  }

  /** Average-hash over DECODED image pixels (any
    * [[graft.llm.Codecs.ImageCodec]] — pure-JVM [[Codecs.BmpCodec]] by
    * default, [[Codecs.ImageIoCodec]] for JPEG/PNG/GIF/TIFF): one row
    * per decodable payload with the chunked ph0..ph3 layout — feed
    * [[DedupOps.hammingNearDupsChunked]] for real-pixel image dedup.
    * Undecodable payloads emit no row (contrast [[aHash]], which
    * hashes RAW bytes of anything non-empty).
    */
  def decodedAHash(df: DataFrame, idCol: String,
                   binCol: String = "payload",
                   codec: Codecs.ImageCodec = Codecs.BmpCodec): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(
      StructField("doc_id", LongType) +:
        (0 until 4).map(c => StructField(s"ph$c", LongType)))
    // rows whose id is null (or not long-castable) cannot be keyed —
    // drop them instead of NPE-ing the task on getLong (the 'one bad
    // blob must not kill a stage' contract applies to the id side too)
    val rdd = df.select(col(idCol).cast(LongType), col(binCol))
      .filter(col(idCol).isNotNull).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          codec.aHash64(r.getAs[Array[Byte]](1))
            .map(ph => Row.fromSeq(r.getLong(0) +: ph.toSeq))
        }
      }
    spark.createDataFrame(rdd, schema).withColumnRenamed("doc_id", idCol)
  }

  /** Per-image decoded-pixel statistics — the vision-corpus quality
    * gate: blank/near-blank frames (max ≈ min), all-black captures
    * (sum ≈ 0), and washed-out scans (tiny contrast) are the images a
    * training pipeline drops before featurizing. One row per DECODABLE
    * payload: (id, width, height, n_px, sum_g, min_g, max_g) — all
    * exact integers, so the whole report is oracle-able; derive mean /
    * contrast downstream in column algebra. Undecodable payloads emit
    * no row (route them to the quarantine face instead).
    */
  def imageStats(df: DataFrame, idCol: String,
                 binCol: String = "payload",
                 codec: Codecs.ImageCodec = Codecs.AnyImageCodec): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_px", LongType),
      StructField("sum_g", LongType),
      StructField("min_g", IntegerType),
      StructField("max_g", IntegerType)))
    // rows whose id is null (or not long-castable) cannot be keyed —
    // drop them instead of NPE-ing the task on getLong (the 'one bad
    // blob must not kill a stage' contract applies to the id side too)
    val rdd = df.select(col(idCol).cast(LongType), col(binCol))
      .filter(col(idCol).isNotNull).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          codec.grayPixels(r.getAs[Array[Byte]](1)).map { case (px, w, h) =>
            // bounds from the data, not an assumed 0-255 range: a
            // codec emitting out-of-range grays must yield the TRUE
            // min/max, never a fabricated 255/0 endpoint
            var sum = 0L
            var mn = if (px.isEmpty) 0 else Int.MaxValue
            var mx = if (px.isEmpty) 0 else Int.MinValue
            var i = 0
            while (i < px.length) {
              val g = px(i)
              sum += g
              if (g < mn) mn = g
              if (g > mx) mx = g
              i += 1
            }
            Row(r.getLong(0), w, h, px.length.toLong, sum, mn, mx)
          }
        }
      }
    spark.createDataFrame(rdd, schema).withColumnRenamed("doc_id", idCol)
  }

  /** REAL thumbnail pipeline: decode (any [[Codecs.ImageCodec]]) →
    * 2-D nearest-neighbor resample to `outW`×`outH` → re-encode as a
    * lossless gray PNG. The decode → transform → writeback shape of an
    * image-preprocessing stage, distributed one image per task row;
    * because every step is lossless past the decode, re-decoding the
    * thumbnail yields exactly the resampled pixels — which is how the
    * q_mm_thumbnail oracle checks the whole chain. Undecodable
    * payloads emit no row.
    */
  def thumbnail(df: DataFrame, idCol: String,
                binCol: String = "payload",
                outW: Int = 8, outH: Int = 8,
                codec: Codecs.ImageCodec = Codecs.AnyImageCodec): DataFrame = {
    require(outW > 0 && outH > 0, s"bad thumbnail geometry: ${outW}x$outH")
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("thumb", BinaryType)))
    val rdd = df.select(col(idCol).cast(LongType), col(binCol))
      .filter(col(idCol).isNotNull).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          codec.grayPixels(r.getAs[Array[Byte]](1)).map { case (px, w, h) =>
            val out = Array.tabulate(outW * outH) { k =>
              val sx = (k % outW) * w / outW
              val sy = (k / outW) * h / outH
              px(sy * w + sx)
            }
            Row(r.getLong(0), Codecs.ImageIoCodec.encodeGrayPng(out, outW, outH))
          }
        }
      }
    spark.createDataFrame(rdd, schema).withColumnRenamed("doc_id", idCol)
  }

  /** Synthesize one rule-valued grayscale image per id — the fixture /
    * thumbnail-generation face of [[Codecs.ImageIoCodec]]: `gray(id,
    * x, y)` paints a w×h image, encoded per row as PNG (lossless) or
    * JPEG (quality 1.0). Distributed (the encode runs in tasks, one
    * image per input row), so a 100 TB corpus's worth of ids
    * synthesizes without driver involvement. Returns `(idCol,
    * payload)`.
    */
  def synthImages(df: DataFrame, idCol: String, w: Int, h: Int,
                  jpeg: Boolean)(gray: (Long, Int, Int) => Int): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType)))
    val rdd = df.select(col(idCol).cast(LongType))
      .filter(col(idCol).isNotNull).rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val px = Array.tabulate(w * h)(k => gray(id, k % w, k / w) & 0xff)
          Row(id,
            if (jpeg) Codecs.ImageIoCodec.encodeGrayJpeg(px, w, h)
            else Codecs.ImageIoCodec.encodeGrayPng(px, w, h))
        }
      }
    spark.createDataFrame(rdd, schema).withColumnRenamed("doc_id", idCol)
  }

  /** Audio frame analysis over REAL WAV decode
    * ([[graft.llm.Codecs.WavCodec.frameStats]]): one row per PCM frame
    * with exact-integer energy stats — the silence-detection /
    * trim / clipping substrate. Undecodable payloads emit no rows.
    * Columns: (id, frame_idx, n_samples, sum_abs, max_abs).
    */
  def wavFrameEnergy(df: DataFrame, idCol: String,
                     binCol: String = "payload",
                     frameSamples: Int = 4): DataFrame = {
    require(frameSamples > 0, "frameSamples must be positive")
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", LongType),
      StructField("n_samples", LongType),
      StructField("sum_abs", LongType),
      StructField("max_abs", LongType)))
    // rows whose id is null (or not long-castable) cannot be keyed —
    // drop them instead of NPE-ing the task on getLong (the 'one bad
    // blob must not kill a stage' contract applies to the id side too)
    val rdd = df.select(col(idCol).cast(LongType), col(binCol))
      .filter(col(idCol).isNotNull).rdd
      .mapPartitions { it =>
        it.flatMap { r =>
          val id = r.getLong(0)
          Codecs.WavCodec.frameStats(r.getAs[Array[Byte]](1), frameSamples)
            .iterator.zipWithIndex.map { case ((n, sum, mx), f) =>
              Row(id, f.toLong, n.toLong, sum, mx.toLong)
            }
        }
      }
    spark.createDataFrame(rdd, schema).withColumnRenamed("doc_id", idCol)
  }

  /** Columnar fast path for the stub decode: per-stripe byte sums as
    * exact BIGINTs, pure column algebra (hex + aggregate/transform over
    * the byte positions) — stays inside WholeStageCodegen instead of
    * dropping to `.rdd` like [[decodeFeatures]]. Output is hashable and
    * order-independent, so it is also the oracle-able face of the
    * decode: features = s_j / 255 (MultimodalSpec asserts parity with
    * the mapPartitions path).
    */
  def stripeSums(df: DataFrame, idCol: String,
                 binCol: String = "payload"): DataFrame = {
    val d = StubDecoder.featureDim
    val n = length(col(binCol))
    val byteAt = (hx: Column, i: Column) =>
      conv(hx.substr(i * 2 + 1, lit(2)), 16, 10).cast("long")
    // guard n==0: sequence(0, -1) would generate a DESCENDING range
    val sums = when(n > 0,
      aggregate(
        sequence(lit(0), n - 1),
        array_repeat(lit(0L), d),
        (acc, i) => transform(acc, (v, k) =>
          when(k === i % d, v + byteAt(col("_hx"), i)).otherwise(v))))
      .otherwise(array_repeat(lit(0L), d))
    df.withColumn("_hx", hex(col(binCol)))
      .withColumn("_ss", sums)
      .select(col(idCol) +: n.cast("long").as("byte_len") +:
        (0 until d).map(j => element_at(col("_ss"), j + 1).as(s"s$j")): _*)
  }

  /** Frame-sampling plumbing for video-like payloads: split a payload
    * into fixed-size "frames" (stub for real frame extraction), keep
    * every `stride`-th, explode to one row per sampled frame. The
    * schema/partitioning shape of real frame sampling.
    */
  def sampleFrames(df: DataFrame, idCol: String, binCol: String = "payload",
                   frameBytes: Int = 16, stride: Int = 2): DataFrame = {
    val nFrames = ceil(length(col(binCol)) / lit(frameBytes.toDouble)).cast("int")
    df.select(col(idCol), col(binCol), nFrames.as("n_frames"))
      .withColumn("frame_idx",
        explode(when(col("n_frames") > 0,
          filter(sequence(lit(0), col("n_frames") - 1), i => i % stride === 0))
          .otherwise(array())))
      .withColumn("frame", expr(
        s"substring($binCol, frame_idx * $frameBytes + 1, $frameBytes)"))
      .select(col(idCol), col("frame_idx"), col("frame"), col("n_frames"))
  }

  /** Average perceptual hash (aHash) over a binary payload — the image
    * near-dup hash, on the same 1-D stub geometry as [[resize]]: the
    * payload is nearest-neighbor resampled to 64 "pixels" (a real codec
    * would decode and resample an 8×8 grayscale grid; this samples
    * bytes), and bit j is set iff pixel j clears the payload mean
    * (strict `p·64 > Σp` — exact integers, engine-reproducible). The
    * 64 bits pack as four 16-bit chunks `ph0..ph3`, the
    * [[DedupOps.hammingNearDupsChunked]] blocking layout. Empty
    * payloads produce no row. Pure codegen'd column algebra over one
    * hex projection — no UDF.
    */
  def aHash(df: DataFrame, idCol: String, binCol: String = "payload"): DataFrame = {
    // j·n in LONG: an int multiply overflows once 63·n > 2^31 (payloads
    // over ~34 MB — exactly the video-sized blobs this module targets)
    val srcByte = (j: Column) => ((j.cast("long") * col("_n")) / 64).cast("int")
    val byteAt = (j: Column) =>
      conv(col("_hx").substr(srcByte(j) * 2 + 1, lit(2)), 16, 10).cast("long")
    df.filter(length(col(binCol)) > 0)
      .withColumn("_n", length(col(binCol)))
      .withColumn("_hx", hex(col(binCol)))
      .withColumn("_bv", transform(sequence(lit(0), lit(63)), byteAt))
      .withColumn("_tot", aggregate(col("_bv"), lit(0L), _ + _))
      .select(col(idCol) +: (0 until 4).map { c =>
        (0 until 16).map { k =>
          when(element_at(col("_bv"), c * 16 + k + 1) * 64 > col("_tot"),
            lit(1L << k)).otherwise(0L)
        }.reduce(_ + _).as(s"ph$c")
      }: _*)
  }

  /** Perceptual-hash near-duplicates: payload pairs whose [[aHash]]es
    * differ in at most `maxDist` ≤ 3 bits — the image-dedup face of the
    * chunked-Hamming family; candidates form only inside shared
    * (chunk, value) buckets, never all-pairs, with total recall.
    */
  def phashNearDups(df: DataFrame, idCol: String,
                    binCol: String = "payload", maxDist: Int = 3): DataFrame = {
    require(maxDist >= 0 && maxDist <= 3,
      "4 chunks of 16 bits guarantee recall only for maxDist <= 3")
    DedupOps.hammingNearDupsChunked(aHash(df, idCol, binCol), idCol,
      Seq("ph0", "ph1", "ph2", "ph3"), maxDist)
  }

  /** Resize plumbing: nearest-neighbor byte decimation to a fixed
    * `outBytes` length — out[j] = payload[⌊j·n/outBytes⌋], the 1-D
    * analog of image nearest-neighbor resampling (a real codec would
    * decode → resample pixels → re-encode; this preserves the schema,
    * determinism, and fixed-output-size contract of that operator).
    * Pure column algebra over the hex view — codegen'd, no UDF, and
    * oracle-able byte for byte. Payloads shorter than `outBytes`
    * upsample by byte repetition (nearest neighbor both directions);
    * empty payloads resize to empty.
    */
  def resize(df: DataFrame, idCol: String, binCol: String = "payload",
             outBytes: Int = 32): DataFrame = {
    val n = length(col(binCol))
    // j·n in LONG (int multiply overflows for (outBytes-1)·n > 2^31);
    // integral div truncates toward zero = floor for non-negatives
    val srcByte = (j: Column) => ((j.cast("long") * n) / lit(outBytes)).cast("int")
    val resizedHex = when(n > 0,
      array_join(transform(sequence(lit(0), lit(outBytes - 1)),
        j => col("_hx").substr(srcByte(j) * 2 + 1, lit(2))), ""))
      .otherwise(lit(""))
    df.withColumn("_hx", hex(col(binCol))) // hex'd once, not per j
      .select(col(idCol), n.cast("long").as("byte_len"),
        unhex(resizedHex).as("resized"))
  }
}
