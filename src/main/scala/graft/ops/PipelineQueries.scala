package graft.ops

import graft.core.Tables
import graft.ingest.Pipeline
import graft.logs.LogStore
import org.apache.spark.sql.functions._

/** End-to-end ingestion benchmark query: materializes a reference-shaped
  * facility tree of JSON sync files from the `documents` table, runs the
  * REAL micro-batch Pipeline over it (work-list → idempotency join →
  * per-entity bulk read → transforms → staging/quarantine appends → log
  * appends), and returns the resulting ingestion-log rows. The projected
  * columns are fully determined by the fixture construction (every
  * created_date is valid, so every file ingests cleanly), so the oracle
  * derives the expected log rows straight from `documents`: one row per
  * (source, doc_id/20) group, file name re-built by the same
  * <entity>_<file_no>_<ts><seq>_decrypted.json convention. PipelineSpec's
  * golden scenarios cover the failure paths; the bench records ingestion
  * throughput (BASELINE.md's "files/sec, rows/sec" suite).
  */
object PipelineQueries {

  val all: Map[String, Q] = Map(
    "q_pipeline_ingest_e2e" -> Q(
      """WITH grp AS (
        |  SELECT source AS facility_id, CAST(doc_id // 20 AS INTEGER) AS file_no,
        |         count(*) AS n
        |  FROM documents WHERE doc_id < 300
        |  GROUP BY source, CAST(doc_id // 20 AS INTEGER)),
        |named AS (
        |  SELECT facility_id, n,
        |    'doc_corpus_' || CAST(file_no AS VARCHAR) || '_2024050100'
        |      || lpad(CAST(row_number() OVER (ORDER BY facility_id, file_no) - 1 AS VARCHAR), 4, '0')
        |      || '_decrypted.json' AS file_name
        |  FROM grp)
        |SELECT file_name, facility_id, 'success' AS load_status_check,
        |       CAST(n AS BIGINT) AS json_rec_count
        |FROM named ORDER BY facility_id, file_name""".stripMargin) { (s, dir) =>
      import s.implicits._
      val docs = Tables(s, dir).documents.filter(col("doc_id") < 300)
      val root = java.nio.file.Files.createTempDirectory("graft_e2e_").toFile
      root.deleteOnExit()
      val parent = new java.io.File(root, "temp")

      // one facility per source; 20 docs per sync file; files named by
      // the reference convention <entity>_<batch>_<ts>_decrypted.json
      val rows = docs
        .select(col("source"), (col("doc_id") / 20).cast("int").as("file_no"),
          to_json(struct(col("doc_id").as("id"), col("text"), col("lang"),
            col("n_chars"), lit("2024-05-01").as("created_date"))).as("j"))
        .collect()
      val syncRows = rows.groupBy(r => (r.getString(0), r.getInt(1))).toSeq
        .sortBy(_._1).zipWithIndex.map { case (((fac, fileNo), rs), i) =>
          val enc = s"doc_corpus_${fileNo}_2024050100${"%04d".format(i)}.json"
          val dec = graft.model.FileName.decryptedName(enc)
          val d = new java.io.File(parent, fac); d.mkdirs()
          java.nio.file.Files.writeString(new java.io.File(d, dec).toPath,
            rs.map(_.getString(2)).mkString("[\n", ",\n", "\n]"))
          (i.toLong, fac, enc, dec, graft.model.SyncState.Ready,
            java.sql.Timestamp.valueOf("2025-02-01 00:00:00"),
            java.sql.Timestamp.valueOf("2025-02-01 10:00:00"),
            null.asInstanceOf[java.sql.Timestamp],
            null.asInstanceOf[java.sql.Timestamp],
            null.asInstanceOf[String], null.asInstanceOf[String],
            null.asInstanceOf[String], null.asInstanceOf[Integer],
            null.asInstanceOf[String])
        }
      val store = LogStore(s, new java.io.File(root, "logs").getPath)
      store.append("sync_file", syncRows.toDF(
        "id", "facility_id", "file_name", "decrypted_file_name", "processed",
        "create_date", "modified_date", "ingest_start_time", "ingest_end_time",
        "ingest_file_name", "ingest_table_name", "ingest_status_check",
        "json_rec_count", "ingest_error_message"))

      val cfg = Pipeline.Config(
        parentDir = parent.getPath,
        warehouseDir = new java.io.File(root, "warehouse").getPath,
        logStore = store)
      val result = Pipeline.run(s, cfg)
      require(result.filesIngested > 0 && result.recordsIngested > 0,
        s"pipeline ingested nothing: $result")
      store.history("file_ingestion_log")
        .select(col("file_name"), col("facility_id"), col("load_status_check"),
          col("json_rec_count").cast("long").as("json_rec_count"))
        .orderBy("facility_id", "file_name")
    }
  )
}
