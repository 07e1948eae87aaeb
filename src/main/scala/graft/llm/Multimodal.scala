package graft.llm

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns plus typed metadata, with decode/feature steps structured the
  * way a production pipeline runs them — batch-at-a-time over partitions
  * (the JVM analog of pandas-batch UDFs over mapInPandas).
  *
  * The actual media decoding is STUBBED (this container has no
  * image/audio codecs): [[StubDecoder]] produces deterministic fake
  * features from the bytes. Everything around it — binary schema,
  * metadata extraction, partition-batch shape, per-modality routing — is
  * real and tested (MultimodalSpec).
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
        .otherwise("application/octet-stream").as("modality")))

  /** Fake feature vector: deterministic bytes → float[8]. Stands in for
    * a real decode+embed; marked clearly as a stub.
    */
  object StubDecoder {
    val featureDim = 8
    def features(payload: Array[Byte]): Array[Float] = {
      // ??? real decode goes here (libjpeg/ffmpeg/... not in container);
      // deterministic fake: rolling byte sums per stripe.
      val out = new Array[Float](featureDim)
      if (payload != null) {
        var idx = 0
        while (idx < payload.length) {
          out(idx % featureDim) += (payload(idx) & 0xff) / 255.0f
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
    */
  def decodeFeatures(df: DataFrame, idCol: String,
                     binCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast(LongType), col(binCol)).rdd
      .mapPartitions { it =>
        it.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          Row(r.getLong(0),
            if (payload == null) 0 else payload.length,
            StubDecoder.features(payload).toSeq)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
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
}
