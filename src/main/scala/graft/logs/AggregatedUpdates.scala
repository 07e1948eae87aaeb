package graft.logs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S13: aggregated-update sinks — aggregate a staging table, then write
  * the aggregate back into a keyed mapping table
  * (staging_records_ingestion/file_loader.py:211-228: COUNT(DISTINCT uuid)
  * per facility → UPDATE central_partner_mapping.patient_count).
  *
  * The reference runs one aggregate + one UPDATE per touched facility;
  * here ONE distributed aggregate covers every facility, and the "update"
  * is a broadcast join producing the new mapping rows (append to LogStore,
  * latest-wins view resolves). At 100 TB the aggregate is the only
  * data-sized job; the mapping side is dimension-sized.
  */
object AggregatedUpdates {

  /** Patients per facility: COUNT(DISTINCT uuid) WHERE archived=0,
    * grouped by stg_datim_id (file_loader.py:211-216). The DSD flavor
    * (dsd_loader.py:215-218) passes archivedFilter=false.
    */
  def patientCounts(staging: DataFrame, archivedFilter: Boolean = true): DataFrame = {
    val base = if (archivedFilter) staging.filter(col("archived") === 0) else staging
    base.groupBy(col("stg_datim_id").as("datim_id"))
      .agg(countDistinct(col("uuid")).cast("int").as("patient_count"))
  }

  /** Apply the aggregate to the mapping table: rows for facilities
    * present in `counts` get the new patient_count, others pass through
    * unchanged. Returns the full updated mapping (append via
    * LogStore.update for MVCC semantics).
    */
  def refreshPatientCounts(mapping: DataFrame, counts: DataFrame): DataFrame =
    mapping.join(broadcast(counts.withColumnRenamed("patient_count", "new_count")),
        Seq("datim_id"), "left")
      .withColumn("patient_count",
        coalesce(col("new_count"), col("patient_count")))
      .drop("new_count")
}
