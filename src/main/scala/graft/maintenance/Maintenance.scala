package graft.maintenance

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maintenance jobs (SURVEY §7.1.5): duplicate detection/cleanup, sync
  * healing, deletion eligibility, staged-record deletion, file retention.
  * All set-based — the reference's per-row UPDATE/DELETE statements become
  * window/semi/anti-join dataflows.
  */
object Maintenance {

  /** W1: duplicate sync rows per (file_name, facility_id), latest first
    * (quality_assessments/duplicates_check.sql:1-17). Returns rows with
    * `row_num`; `row_num > 1` are the duplicates to report/delete.
    */
  def duplicateSyncRows(syncFile: DataFrame): DataFrame = {
    val w = Window.partitionBy("file_name", "facility_id")
      .orderBy(col("modified_date").desc)
    syncFile.withColumn("row_num", row_number().over(w))
  }

  /** J3: the dedup DELETE re-expressed — keep only row_num = 1
    * (duplicates_check.sql:26-54). Returns the retained frame.
    */
  def dedupSyncFile(syncFile: DataFrame): DataFrame =
    duplicateSyncRows(syncFile).filter(col("row_num") === 1).drop("row_num")

  /** J1: self-join heal — rows whose (file_name) has a successful twin
    * (processed=2 on another id) get ingest_error_message='No errors'
    * (duplicates_check.sql:20-23). Equi join on file_name + theta
    * residuals, then a conditional rewrite.
    */
  def healSyncErrors(syncFile: DataFrame): DataFrame = {
    val healed = syncFile.filter(col("processed") === 2)
      .select(col("file_name").as("h_file"), col("id").as("h_id"),
        col("processed").as("h_processed"))
    val healKeys = syncFile.join(healed,
        col("file_name") === col("h_file") &&
          col("processed") =!= col("h_processed") &&
          col("id") =!= col("h_id"))
      .select("id").distinct()
    syncFile.join(healKeys.withColumnRenamed("id", "heal_id"),
        col("id") === col("heal_id"), "left")
      .withColumn("ingest_error_message",
        when(col("heal_id").isNotNull, lit("No errors"))
          .otherwise(col("ingest_error_message")))
      .drop("heal_id")
  }

  /** P6 + J2 + O1: deletion-eligible files — terminal status, recent
    * enough, fully logged, and NOT already in the deletion log
    * (automate_file_delete.py:91-103). One anti-join, batch-capped.
    */
  def deletionEligible(syncFile: DataFrame, deletionLog: DataFrame,
                       watermark: String = "2024-09-01",
                       cap: Int = 13000): DataFrame = {
    val logged = deletionLog
      .filter(col("deletion_status_check").isin("success", "failed"))
      .select(col("file_name").as("del_file"))
      .distinct()
    syncFile
      .filter(col("processed").isin(2, -2) &&
        col("modified_date") >= lit(watermark).cast("timestamp") &&
        col("ingest_end_time").isNotNull && col("file_name").isNotNull)
      .join(logged, col("file_name") === col("del_file"), "left_anti")
      .orderBy(col("modified_date").asc, col("file_name").asc)
      .limit(cap)
  }

  /** S16: staged-record deletion — drop staged rows already migrated
    * (proc_delete_stg_records analog). Returns the retained frame; the
    * caller overwrites the staging table.
    */
  def deleteMigrated(staging: DataFrame, migratedKeys: DataFrame,
                     keyCols: Seq[String]): DataFrame =
    staging.join(migratedKeys.select(keyCols.map(col): _*).distinct(),
      keyCols, "left_anti")

  /** S15: pattern-based retention sweep (delete_old_files.sh:15-20) —
    * list facility dirs, match file names against the retention pattern,
    * delete (or dry-run). Driver-side FS walk: file *metadata* ops, not
    * data — at real scale this is a HDFS/object-store listing, still a
    * metadata-plane operation.
    */
  def retentionSweep(parentDir: String, namePattern: String,
                     dryRun: Boolean = true): Seq[String] = {
    val root = new java.io.File(parentDir)
    val rx = namePattern.r
    val hits = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
      .flatMap(fac => Option(fac.listFiles()).getOrElse(Array.empty))
      .filter(f => f.isFile && rx.findFirstIn(f.getName).isDefined)
      .map(_.getPath).toSeq
    if (!dryRun) hits.foreach(p => new java.io.File(p).delete())
    hits
  }

  /** S7: export a quarantine table to CSV
    * (automate_table_extraction.py:64-66).
    */
  def exportBadRecords(spark: SparkSession, tableDir: String,
                       outDir: String): Unit =
    spark.read.parquet(tableDir)
      .write.mode("overwrite").option("header", "true").csv(outDir)

  /** S6: quarantine-table discovery — every warehouse table ending
    * `_bad_dates` (automate_table_extraction.py:52-57's
    * information_schema ILIKE, as a catalog/FS listing).
    */
  def quarantineTables(warehouseDir: String): Seq[String] =
    Option(new java.io.File(warehouseDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.endsWith("_bad_dates"))
      .map(_.getName).sorted.toSeq

  /** One file-deletion outcome (S14). */
  final case class DeletionResult(fileName: String, facilityId: String,
                                  deletedDecrypted: Boolean, deletedEncrypted: Boolean,
                                  status: String)

  /** S14: physically delete ingested encrypted+decrypted file pairs,
    * one log row per file (automate_file_delete.py:119-145). Input is
    * the [[deletionEligible]] frame (capped), so the driver-side FS loop
    * is O(batch cap), not O(table).
    */
  def deleteFiles(eligible: Seq[(String, String)], parentDir: String)
      : Seq[DeletionResult] =
    eligible.map { case (fileName, facilityId) =>
      val enc = new java.io.File(s"$parentDir/$facilityId/$fileName")
      val dec = new java.io.File(s"$parentDir/$facilityId/" +
        graft.model.FileName.decryptedName(fileName))
      val dDec = dec.exists() && dec.delete()
      val dEnc = enc.exists() && enc.delete()
      DeletionResult(fileName, facilityId, dDec, dEnc,
        if (dDec || dEnc) "success" else "failed")
    }
}
