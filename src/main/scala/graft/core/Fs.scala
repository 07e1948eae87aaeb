package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}

/** Metadata-plane filesystem helper over the Hadoop FileSystem API: the
  * same listings/deletes/existence probes work on local disk (file://),
  * HDFS, and the object-store connectors (s3a://, gs://, abfs://). The
  * reference's equivalents walk local disk (`delete_old_files.sh:15-20`,
  * `automate_file_delete.py:119-145`, `automate_table_extraction.py:52-57`)
  * — faithful locally, but a 100 TB deployment lists an object store, so
  * every metadata-plane call site (Maintenance, Reports, LogStore)
  * routes through here, the same API Pipeline's distributed existence
  * probes already use.
  *
  * All calls are driver-side, O(listing) metadata RPCs — bulk data never
  * moves through this class. For worker-side fan-out over many paths use
  * Pipeline's parallelized probe instead.
  */
object Fs {

  def exists(path: String, conf: Configuration): Boolean = {
    val p = new Path(path)
    p.getFileSystem(conf).exists(p)
  }

  /** Create `dir` and any missing parents (idempotent). Needed before
    * renaming INTO a brand-new directory: HDFS/S3A `rename` returns
    * false when the destination's parent does not exist, while the
    * local FS silently copy-creates it — a local-only test would never
    * see the failure.
    */
  def mkdirs(dir: String, conf: Configuration): Unit = {
    val p = new Path(dir)
    p.getFileSystem(conf).mkdirs(p)
    ()
  }

  /** Direct children of `dir`; empty if the directory doesn't exist. */
  def list(dir: String, conf: Configuration): Seq[FileStatus] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    // no exists-then-list: a reader racing swapInPlace (the rename
    // window) would pass exists() and then crash in listStatus — the
    // same TOCTOU readText's doc condemns. Missing dir = empty listing.
    try fs.listStatus(p).toIndexedSeq
    catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  def listDirs(dir: String, conf: Configuration): Seq[FileStatus] =
    list(dir, conf).filter(_.isDirectory)

  def listFiles(dir: String, conf: Configuration): Seq[FileStatus] =
    list(dir, conf).filter(_.isFile)

  /** Delete a file (or, with `recursive`, a directory tree). False when
    * the path didn't exist.
    */
  def delete(path: String, conf: Configuration, recursive: Boolean = false): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    // no exists() pre-check: FileSystem.delete already returns false
    // for a missing path, and the extra HEAD doubles metadata RPCs on
    // object stores while adding a TOCTOU window
    fs.delete(p, recursive)
  }

  /** Checked rename (move): `FileSystem.rename` signals failure — missing
    * source, existing destination, cross-filesystem move — by returning
    * false rather than throwing, which lets a half-done directory swap
    * pass silently. Callers that need move-or-die (LogStore.compact's
    * swap protocol) use this wrapper, which throws on false.
    */
  def rename(src: String, dst: String, conf: Configuration): Unit = {
    val s = new Path(src)
    val d = new Path(dst)
    if (!s.getFileSystem(conf).rename(s, d))
      throw new java.io.IOException(s"rename $src -> $dst failed")
  }

  /** Crash-safe in-place directory replacement: move `live` → `_old`
    * (checked), move `compacted` → `live` (checked; on failure `_old`
    * is restored so the live path never stays missing), then delete
    * `_old` (checked). The swap protocol shared by LogStore.compact and
    * Maintenance.compactStagingTable — all Hadoop FS, object-store
    * portable.
    *
    * Entry guard: a STALE `_old` from a prior crash is resolved first —
    * `FileSystem.rename` into an existing directory silently NESTS the
    * source as a child (and returns true), so without the guard the
    * "checked" rename would pass and a later restore could reinstate
    * stale data as the live table. If `live` exists the stale `_old` is
    * leftover from a completed-but-uncleaned swap → delete it; if
    * `live` is missing the prior swap died in the window where only
    * `_old` held the data → restore it before proceeding.
    */
  def swapInPlace(live: String, compacted: String, conf: Configuration): Unit = {
    val old = live + "_old"
    if (exists(old, conf)) {
      if (exists(live, conf)) {
        if (!delete(old, conf, recursive = true))
          throw new java.io.IOException(
            s"swap of $live: could not clear stale $old")
      } else rename(old, live, conf) // prior crash mid-swap: recover first
    }
    rename(live, old, conf)
    try rename(compacted, live, conf)
    catch {
      case e: java.io.IOException =>
        rename(old, live, conf) // restore: live path never stays missing
        throw new java.io.IOException(
          s"swap of $live failed, original directory restored", e)
    }
    if (!delete(old, conf, recursive = true))
      throw new java.io.IOException(
        s"swap of $live completed but $old could not be removed " +
          "(next swap would treat it as stale)")
    ()
  }

  /** Write a small text marker (overwrite). Underscore-prefixed names
    * (`_graft_batch_id`) are invisible to Spark's parquet reader — the
    * same convention as `_SUCCESS` — so a marker can live INSIDE a
    * parquet directory and travel through [[swapInPlace]] atomically
    * with the data it describes.
    */
  def writeText(path: String, content: String, conf: Configuration): Unit = {
    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a small text marker; None when absent. Open-and-catch rather
    * than exists-then-open: a concurrent [[swapInPlace]] can remove the
    * path between the two calls, and a reader racing a swap should see
    * "absent", not crash.
    */
  def readText(path: String, conf: Configuration): Option[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    try {
      val in = fs.open(p)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](4096)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        Some(new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    } catch {
      case _: java.io.FileNotFoundException => None
    }
  }

  /** Broadcast the SESSION hadoop configuration for use inside tasks.
    * Executors must never fall back to `new Configuration()`: that drops
    * every `spark.hadoop.*` override — object-store credentials,
    * endpoints, fs impls — so distributed metadata loops (Pipeline's
    * existence probes, Maintenance.deleteFiles) would silently misreport
    * "file not found" on a real cluster while passing on local disk.
    */
  def broadcastConf(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.broadcast.Broadcast[org.apache.spark.util.SerializableConfiguration] =
    spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))

  /** Total bytes of the files directly under `dir`. */
  def dirBytes(dir: String, conf: Configuration): Long =
    listFiles(dir, conf).map(_.getLen).sum

  /** Total bytes under `dir`, descending into subdirectories (the
    * partitioned-table layout). Driver-side metadata RPCs, O(listing).
    */
  def dirBytesRecursive(dir: String, conf: Configuration): Long =
    list(dir, conf).map { s =>
      if (s.isDirectory) dirBytesRecursive(s.getPath.toString, conf)
      else s.getLen
    }.sum

  final case class DataFileStats(files: Long, bytes: Long)

  /** Count + bytes of the DATA files under `dir` (recursive), skipping
    * write markers and hidden bookkeeping (`_SUCCESS`, `_metadata`,
    * dot-files) — the fragmentation probe for compaction triggers,
    * where counting markers as "files" would inflate every healthy
    * single-append table toward the threshold. Driver-side metadata
    * RPCs, O(listing).
    */
  def dataFileStats(dir: String, conf: Configuration): DataFileStats =
    list(dir, conf).foldLeft(DataFileStats(0L, 0L)) { (acc, s) =>
      val name = s.getPath.getName
      // hidden/bookkeeping names gate DIRECTORIES too: a crashed
      // write's _temporary tree or a streaming sink's _spark_metadata
      // holds real-looking files that are NOT table data — counting
      // them would fire compaction triggers on healthy tables
      if (name.startsWith("_") || name.startsWith(".")) acc
      else if (s.isDirectory) {
        val sub = dataFileStats(s.getPath.toString, conf)
        DataFileStats(acc.files + sub.files, acc.bytes + sub.bytes)
      } else DataFileStats(acc.files + 1, acc.bytes + s.getLen)
    }
}
