package graft.ingest

import graft.logs.LogStore
import graft.model.SyncState
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Facility-parallel batching (SURVEY §3.2,
  * multi_file_ingestion_process.py): the reference seeds a
  * batch_facility_processing claim table from a LIMIT-50 slice of pending
  * sync rows (INSERT…SELECT GROUP BY facility_id) and fans facilities out
  * over a 20-thread pool with optimistic claim/ack updates.
  *
  * Spark-first shape: the thread pool disappears — partition parallelism
  * over facilities replaces it — but the claim-table *protocol* is kept
  * (it is observable state the reference's reports read). Claims/acks are
  * LogStore appends with latest-wins resolution.
  */
object FacilityBatches {

  val Unprocessed = "UNPROCESSED"
  val Processed = "PROCESSED"
  val FailedStatus = "FAILED"

  /** Seed batch rows: pending-file counts per facility over a capped
    * slice of the work list (multi_file_ingestion_process.py:31-66,
    * LIMIT 50 seed → GROUP BY facility_id).
    */
  def seedBatches(syncFile: DataFrame, sliceCap: Int = 50): DataFrame =
    syncFile
      .filter(col("processed") === SyncState.Ready)
      .orderBy(col("modified_date").asc, col("file_name").asc)
      .limit(sliceCap)
      .groupBy("facility_id")
      .agg(count(lit(1)).cast("int").as("file_count"))
      .withColumn("status", lit(Unprocessed))

  /** Claim the next batch of unprocessed facilities (the reference's
    * SELECT ... WHERE status='UNPROCESSED' + ThreadPool batches of 20).
    */
  def claim(batches: DataFrame, batchSize: Int = 20): DataFrame =
    batches.filter(col("status") === Unprocessed)
      .orderBy(col("facility_id"))
      .limit(batchSize)

  /** Ack a facility's completion: new version rows with the outcome
    * (multi_file_ingestion_process.py:69-84's conditional UPDATE).
    */
  def ack(store: LogStore, table: String, batches: DataFrame,
          facilityId: String, ok: Boolean, error: Option[String] = None): Unit = {
    val updated = batches.filter(col("facility_id") === facilityId)
      .withColumn("status", lit(if (ok) Processed else FailedStatus))
      .withColumn("error_message", lit(error.orNull))
    store.update(table, updated)
  }
}
