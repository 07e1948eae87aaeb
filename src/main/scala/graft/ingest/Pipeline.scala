package graft.ingest

import graft.logs.LogStore
import graft.model.{FileName, SchemaRegistry, SyncState}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end micro-batch ingestion (SURVEY §3.1-§3.3 re-expressed
  * Spark-first).
  *
  * Shape differences vs the reference, by design (scale):
  *  - per-file loop → per-entity bulk reads: one distributed
  *    `spark.read.json(paths*)` per staging table, provenance recovered
  *    from `input_file_name()`. Task count tracks bytes, not files.
  *  - 2 idempotency probes per file (file_loader.py:328-336,356-366) →
  *    ONE broadcast semi/anti join per run (J5 re-planned).
  *  - facility thread pool (multi_file_ingestion_process.py:107-123) →
  *    native partition parallelism.
  *  - `UPDATE sync_file/...` → append + latest-wins views (LogStore).
  *  - DSD quarantine: the reference's `_bad_dates` writer exists but its
  *    call is commented out (dsd_loader.py:553-604,668) — skipped records
  *    are silently dropped. We route them to the quarantine table in BOTH
  *    modes (a deliberate, documented improvement; the record-skip
  *    file-status semantics are preserved).
  *
  * The work list itself is bounded by the reference's own batch cap
  * (50k/20k rows), so staging the file list on the driver is O(cap),
  * not O(table).
  */
object Pipeline {

  final case class Config(
      parentDir: String, // <parent>/<facility_id>/<decrypted file>
      warehouseDir: String, // staging-table parquet root
      logStore: LogStore,
      batchCap: Int = 50000,
      watermark: String = "2025-01-01",
      dsdMode: Boolean = false,
      // partition staging tables by this column (normally stg_datim_id):
      // at 100 TB facility-partitioned layout gives partition pruning for
      // the per-facility reports and deletes. Off by default locally —
      // thousands of tiny files per micro-batch at test scale.
      partitionStagingBy: Option[String] = None)

  final case class RunResult(
      logId: String,
      filesSeen: Long,
      filesIngested: Long,
      filesFailed: Long,
      filesMissing: Long,
      recordsIngested: Long,
      recordsQuarantined: Long)

  private val dsdPrefixes = SchemaRegistry.dsdFamilies

  /** S3+P5+O1: the work-list scan. `dsdMode` selects the complementary
    * prefix predicate (dsd_loader.py:251-260 vs file_loader.py:247-255).
    */
  def worklist(syncFile: DataFrame, cfg: Config): DataFrame = {
    val prefixMatch = dsdPrefixes
      .map(p => lower(col("decrypted_file_name")).startsWith(p))
      .reduce(_ || _)
    syncFile
      .filter(col("processed") === SyncState.Ready &&
        col("modified_date") >= lit(cfg.watermark).cast("timestamp") &&
        (if (cfg.dsdMode) prefixMatch else !prefixMatch))
      .select("id", "facility_id", "file_name", "decrypted_file_name",
        "modified_date")
      .orderBy(col("modified_date").asc, col("file_name").asc)
      .limit(cfg.batchCap)
  }

  /** J5 re-planned: one pass splits the work list into
    * (alreadyLoaded, toProcess) against the success set of the ingestion
    * log — broadcast both ways since the work list is capped.
    */
  def idempotencySplit(work: DataFrame, ingestionLog: DataFrame)
      : (DataFrame, DataFrame) = {
    val successes = ingestionLog
      .filter(col("load_status_check") === "success")
      .select("file_name", "facility_id").distinct()
    val already = work.join(broadcast(successes),
      work("decrypted_file_name") === successes("file_name") &&
        work("facility_id") === successes("facility_id"), "left_semi")
    val todo = work.join(broadcast(successes),
      work("decrypted_file_name") === successes("file_name") &&
        work("facility_id") === successes("facility_id"), "left_anti")
    (already, todo)
  }

  def run(spark: SparkSession, cfg: Config): RunResult = {
    import spark.implicits._
    val store = cfg.logStore
    val startedAt = java.time.LocalDateTime.now()
    val runId = Stages.logId(if (cfg.dsdMode) "DPID" else "IPID", startedAt)
    val loadTime = java.sql.Timestamp.valueOf(startedAt)

    val syncFile = store.latestOrEmpty("sync_file", Seq("id"), SchemaRegistry.syncFile)
    val ingestionLog = store.latestOrEmpty("file_ingestion_log",
      Seq("file_name", "facility_id", "load_start_time"), SchemaRegistry.fileIngestionLog)

    val work = worklist(syncFile, cfg).cache()
    val (already, todo) = idempotencySplit(work, ingestionLog)

    // already-succeeded files: just flip the sync flag (file_loader.py:406-410)
    val alreadyRows = already.collect()
    val todoRows = todo.collect()

    // locate files on disk; missing → state 3 (file_loader.py:274-278)
    val located = todoRows.map { r =>
      val fac = r.getAs[String]("facility_id")
      val f = r.getAs[String]("decrypted_file_name")
      val p = s"${cfg.parentDir}/$fac/$f"
      (r.getAs[Long]("id"), fac, f, p, new java.io.File(p).exists())
    }
    val (present, missing) = located.partition(_._5)

    // group per entity: ONE bulk read per staging table
    val byTable = present.groupBy { case (_, _, f, _, _) => FileName.stagingTable(f) }

    var recordsIngested = 0L
    var recordsQuarantined = 0L
    val fileStatus = scala.collection.mutable.Map[(String, String), (String, Long, String)]()

    byTable.foreach { case (stagingTable, files) =>
      val paths = files.map(_._4).toSeq
      val raw = JsonSource.readInferred(spark, paths)
      val withProv = Stages.stampProvenanceFromPath(
        Stages.emptyToNull(
          Stages.entityTransforms(stagingTable)(
            Stages.dropAllNull(raw))), loadTime)
      val (valid, bad) = Stages.dateSplit(withProv, idCol = Some("id"))
      val validC = valid.cache(); val badC = bad.cache()

      // per-file counts via aggregation (not a driver loop over files);
      // these actions also materialize the caches, and their totals gate
      // the writes — no separate existence-probe jobs.
      val okCounts = validC.groupBy("stg_file_name", "stg_datim_id").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val badCounts = badC.groupBy("stg_file_name", "stg_datim_id").count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

      def writer(df: org.apache.spark.sql.DataFrame) = {
        val w = df.write.mode("append")
        cfg.partitionStagingBy.fold(w)(c => w.partitionBy(c))
      }
      if (okCounts.valuesIterator.sum > 0)
        writer(validC).parquet(s"${cfg.warehouseDir}/$stagingTable")
      if (badCounts.valuesIterator.sum > 0)
        writer(badC)
          .parquet(s"${cfg.warehouseDir}/${SchemaRegistry.quarantineTable(stagingTable)}")

      files.foreach { case (_, fac, f, _, _) =>
        val ok = okCounts.getOrElse((f, fac), 0L)
        val nBad = badCounts.getOrElse((f, fac), 0L)
        recordsIngested += ok; recordsQuarantined += nBad
        // main loader: any bad row marks the FILE failed though the valid
        // rows were ingested (file_loader.py:627-645). DSD loader: skipped
        // records don't fail the file (dsd_loader.py:684-687).
        val status =
          if (ok + nBad == 0) ("failed", 0L, "empty file")
          else if (nBad > 0 && !cfg.dsdMode)
            ("failed", ok, s"$nBad row(s) quarantined: invalid date values")
          else ("success", ok, null: String)
        fileStatus((f, fac)) = status
      }
      validC.unpersist(); badC.unpersist()
    }

    // ---- control-plane writes (one append per table per run) ----
    val endTime = java.sql.Timestamp.valueOf(java.time.LocalDateTime.now())

    val logRows = fileStatus.toSeq.map { case ((f, fac), (status, n, err)) =>
      (loadTime, endTime, status, FileName.stagingTable(f), f, fac, n.toInt,
        Option(err).map(Stages.formatError(_)).orNull)
    }.toDF("load_start_time", "load_end_time", "load_status_check",
      "table_name", "file_name", "facility_id", "json_rec_count",
      "error_message")
    if (fileStatus.nonEmpty) store.append("file_ingestion_log", logRows)

    val monitoringRows = fileStatus.toSeq.map { case ((f, fac), (status, n, err)) =>
      (fac, FileName.batchId(f), f, FileName.stagingTable(f), loadTime,
        n.toInt, if (status == "success") "N" else "F", err)
    }.toDF("datim_id", "batch_id", "file_name", "table_name", "load_time",
      "json_rec_count", "processed", "error_message")
    if (fileStatus.nonEmpty) store.append("stg_monitoring", monitoringRows)

    // sync_file state transitions as version appends (S11): join the
    // capped update set (broadcast) against the current view, rewrite the
    // touched columns, append new versions.
    def syncUpdate(rows: Seq[(Long, String, String, Int, String)]): Unit =
      if (rows.nonEmpty) {
        val upd = rows.toDF("uid", "u_file", "u_fac", "u_state", "u_err")
        val out = syncFile.join(broadcast(upd), syncFile("id") === col("uid"))
          .withColumn("processed", col("u_state"))
          .withColumn("ingest_start_time", lit(loadTime))
          .withColumn("ingest_end_time", lit(endTime))
          .withColumn("ingest_status_check",
            when(col("u_state") === SyncState.Ingested, "success")
              .when(col("u_state") === SyncState.Failed, "failed")
              .otherwise(lit(null: String)))
          .withColumn("ingest_error_message",
            substring(col("u_err"), 0, 10000)) // file_loader.py:189
          .drop("uid", "u_file", "u_fac", "u_state", "u_err")
        store.update("sync_file", out)
      }

    val statusByKey = fileStatus.toMap
    val todoUpdates = located.collect {
      case (id, fac, f, _, true) =>
        val (status, _, err) = statusByKey.getOrElse((f, fac), ("failed", 0L, "not processed"))
        (id, f, fac,
          if (status == "success") SyncState.Ingested else SyncState.Failed,
          Option(err).orNull)
    }.toSeq
    val missingUpdates = missing.map { case (id, fac, f, _, _) =>
      (id, f, fac, SyncState.MissingOrPast, "file missing: loaded in the past")
    }.toSeq
    val alreadyUpdates = alreadyRows.map { r =>
      (r.getAs[Long]("id"), r.getAs[String]("decrypted_file_name"),
        r.getAs[String]("facility_id"), SyncState.Ingested,
        null: String)
    }.toSeq
    syncUpdate(todoUpdates ++ missingUpdates ++ alreadyUpdates)

    // run-level pipeline log (file_ingestion_process.py:24-37)
    val nFailed = fileStatus.values.count(_._1 == "failed")
    store.append("file_ingestion_pipeline_log", Seq(
      (runId, loadTime, endTime, "completed",
        if (cfg.dsdMode) "dsd_ingest_process" else "file_ingest_process",
        null: String, recordsIngested.toInt)
    ).toDF("log_id", "start_time", "end_time", "status", "process_type",
      "error_message", "records_processed"))

    val res = RunResult(runId, work.count(),
      fileStatus.values.count(_._1 == "success"), nFailed,
      missing.length, recordsIngested, recordsQuarantined)
    work.unpersist()
    res
  }
}
