package graft.streaming

import graft.core.Fs
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

/** The shared delta-store protocol under the streaming folds
  * (IncrDedupStream / PackStream / SplitStream): one immutable
  * `ingest_batch=<tag>/` parquet delta per batch, tag =
  * `<queryId>_<batchId>` (the transaction id — a replay self-excludes
  * its own tag and overwrites), committed-dirs-only reads, and a
  * staged+swapped compaction. Extracted in r11 after the third store
  * re-implemented it by hand (review finding: the copies were already
  * drifting — the first-batch recovery wedge below existed in all
  * three).
  */
private[streaming] object DeltaStore {

  def tagOf(queryId: String, batchId: Long): String = {
    val qid = if (queryId.isEmpty) "q" else queryId
    s"${qid}_$batchId"
  }

  /** Delta dirs that finished their write (`_SUCCESS` present). */
  def committedDirs(path: String,
                    conf: org.apache.hadoop.conf.Configuration): Seq[String] =
    if (!Fs.exists(path, conf)) Seq.empty
    else Fs.listDirs(path, conf)
      .filter(d => Fs.exists(s"${d.getPath.toString}/_SUCCESS", conf))
      .map(_.getPath.toString)

  /** All COMMITTED delta rows of a store dir as one frame, with
    * `ingest_batch` riding as the partition column; `template` (any
    * frame with the delta schema, minus the tag column) types the empty
    * result when the store is new.
    *
    * Committed dirs only, read by explicit path: a plain
    * `read.parquet(path)` dies with 'Unable to infer schema' when the
    * store's ONLY content is a crashed write's `_temporary` — and that
    * read runs BEFORE the replay's healing overwrite, so the stream
    * would wedge permanently on restart (r11 review finding). The
    * caller still filters out its OWN tag — a committed-but-unacked
    * delta of the replaying batch is excluded by tag, uncommitted
    * partials by the `_SUCCESS` gate here.
    */
  def readCommitted(template: DataFrame, path: String): DataFrame = {
    val spark = template.sparkSession
    val dirs = committedDirs(path, spark.sparkContext.hadoopConfiguration)
    if (dirs.nonEmpty)
      spark.read.option("basePath", path).parquet(dirs: _*)
    else template.limit(0).withColumn("ingest_batch", lit(""))
  }

  /** Sweep uncommitted (crashed) delta dirs — the direct-caller path's
    * pre-write hygiene in the dedup/pack stores.
    */
  def sweepUncommitted(path: String,
                       conf: org.apache.hadoop.conf.Configuration): Unit =
    if (Fs.exists(path, conf))
      Fs.listDirs(path, conf)
        .filter(d => !Fs.exists(s"${d.getPath.toString}/_SUCCESS", conf))
        .foreach(d => Fs.delete(d.getPath.toString, conf, recursive = true))

  /** Absorb all committed deltas into ONE `ingest_batch=compacted_<n>`
    * delta whose content is `fold` of their union — staged and swapped
    * whole so readers never see partial compactions; uncommitted
    * partials are discarded by the swap (their writer is dead;
    * single-writer rule covers in-flight ones). Owning process only,
    * between committed batches. No-op on an empty/absent store.
    */
  def compactWith(spark: SparkSession, path: String)
                 (fold: DataFrame => DataFrame): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    if (!Fs.exists(path, conf)) return
    val nDirs = Fs.listDirs(path, conf).length
    val dirs = committedDirs(path, conf)
    if (dirs.isEmpty) return
    val staging = s"$path.staging"
    fold(spark.read.parquet(dirs: _*))
      .write.mode("overwrite")
      .parquet(s"$staging/ingest_batch=compacted_$nDirs")
    Fs.swapInPlace(path, staging, conf)
  }
}
