package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON sync-file sources (SURVEY §2.1 S1/S2).
  *
  * The reference reads one file per task (`pd.read_json`,
  * staging_records_ingestion/file_loader.py:588) — at 100 TB the unit of
  * work must be the *entity batch*, not the file: one
  * `spark.read.json(paths*)` per entity ingests thousands of files in a
  * single distributed scan, with per-file provenance recovered from
  * `input_file_name()` (Stages.stampProvenanceFromPath). That keeps task
  * count proportional to data size, not file count, and lets Spark pack
  * many small JSON files into each partition
  * (spark.sql.files.maxPartitionBytes).
  */
object JsonSource {

  /** S1: read a batch of JSON-array files of one entity. `multiLine=true`
    * because each file is one JSON array (pretty-printed or not);
    * PERMISSIVE mode captures corrupt payloads in `_corrupt_record`
    * instead of failing the whole batch.
    */
  def readEntityBatch(spark: SparkSession, schema: StructType,
                      paths: Seq[String]): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(paths: _*)

  /** Schema-inferred flavor for exploratory/one-file use (the reference's
    * behavior: the file drives column presence, SURVEY §1.3). Prefer
    * [[readEntityBatch]] + SchemaRegistry in production paths — schema
    * inference is an extra full pass over the data.
    */
  def readInferred(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.option("multiLine", "true").json(paths: _*)
}
